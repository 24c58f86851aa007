"""End-to-end TUI smoke test in a real pseudo-terminal.

The curses runner (``run_tui`` / ``PipelineThread``, app/tui.py) is
otherwise only exercised through the pure TuiModel unit tests; this
drives the actual ``jsdr-tpu ui`` process through a pty: open a file
source, switch to the record tab and toggle recording (the capture file
growing proves blocks are flowing through the real pipeline thread),
toggle the hamming window on the FFT tab, quit with Ctrl-Q, and assert
the config was saved (jsdr.java:547-550 analog).

curses paints diffs with cursor-move escapes, so assertions rely on the
initial full paint plus on-disk side effects, not on screen scraping.
"""

import os
import pty
import select
import subprocess
import sys
import time

import numpy as np
import pytest


def _read_until(fd, predicate, timeout=90.0, buf=b""):
    """Drain the pty until predicate(accumulated_text) or timeout.
    Returns (found, buf)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        r, _, _ = select.select([fd], [], [], 0.5)
        if fd in r:
            try:
                chunk = os.read(fd, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
        if predicate(buf.decode("utf-8", "replace")):
            return True, buf
    return False, buf


def _wait_for(cond, timeout=60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.5)
    return False


def test_tui_pty_smoke(tmp_path):
    from jsdr_tpu.io.convert import complex_to_s16le
    from jsdr_tpu.io.sources import synth_sine

    rate = 9600
    raw = tmp_path / "tone.raw"
    raw.write_bytes(complex_to_s16le(synth_sine(rate * 2, 1000.0, rate)))
    rec = tmp_path / "rec.raw"
    cfgp = tmp_path / "jsdr.properties"
    cfgp.write_text("jsdr-tpu-version=1\njsdr-funcube-demods=1\n"
                    f"recorder-path={rec}\n")

    master, slave = pty.openpty()
    # pin the pty's window size (a fresh pty reports 0x0; ncurses
    # prefers the ioctl over COLUMNS/LINES when a tty is present)
    import fcntl
    import struct
    import termios
    fcntl.ioctl(slave, termios.TIOCSWINSZ, struct.pack("HHHH", 30, 100, 0, 0))
    env = dict(os.environ, TERM="xterm-256color",
               COLUMNS="100", LINES="30")
    p = subprocess.Popen(
        [sys.executable, "-m", "jsdr_tpu.app.main", "--cpu",
         "--rate", str(rate), "--config", str(cfgp),
         "ui", f"file:{raw}", "--no-pace"],
        stdin=slave, stdout=slave, stderr=subprocess.PIPE, env=env,
        close_fds=True)
    os.close(slave)
    try:
        # initial full paint proves the curses shell is up with tabs
        # the curses shell is up once escape-sequence traffic flows
        # (curses may paint pure diffs from the start, so don't insist
        # on seeing the full header text — the on-disk side effects
        # below are the real assertions)
        found, buf = _read_until(master, lambda t: len(t) >= 64)
        if not found:
            alive = p.poll()
            p.kill()
            p.wait(timeout=10)
            err = p.stderr.read().decode("utf-8", "replace")
            raise AssertionError(
                f"TUI never painted its header; poll={alive} "
                f"got {len(buf)} bytes: {buf[-200:]!r} "
                f"stderr tail: {err[-600:]}")
        os.write(master, b"4")           # record tab
        os.write(master, b"e")           # toggle recording on
        # the recorder file growing proves blocks flow through the real
        # PipelineThread -> Session -> RecorderStage path
        assert _wait_for(lambda: rec.exists() and rec.stat().st_size > 0,
                         timeout=120), "no blocks recorded"
        os.write(master, b"e")           # recording off
        os.write(master, b"2")           # FFT tab
        os.write(master, b"h")           # hamming toggle (FFT-tab scoped)
        os.write(master, b"1")           # phase tab (persisted on quit)
        time.sleep(1.0)
        os.write(master, b"\x11")        # Ctrl-Q: quit + save config
        p.wait(timeout=60)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait(timeout=10)
        os.close(master)
    err = p.stderr.read().decode("utf-8", "replace")
    assert p.returncode == 0, f"TUI exited {p.returncode}: {err[-800:]}"
    saved = cfgp.read_text()
    assert "jsdr-tab-focus=0" in saved          # phase tab persisted
    assert "fft-hamming=0" in saved             # toggle persisted
    assert "FUNcube0-bpsk-tuning=12000" in saved
    # recorded IQ is a replayable fixture (recorder.java role): S16LE
    vals = np.frombuffer(rec.read_bytes(), dtype="<i2")
    assert len(vals) >= 2 * (rate // 10) and len(vals) % 2 == 0
