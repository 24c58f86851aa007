def main():
    raise SystemExit("jsdr-tpu CLI: coming in this round")
