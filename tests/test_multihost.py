"""Two-process multi-host test: exercises ``init_multihost`` /
``jax.distributed.initialize`` with real separate processes and a
("dp", "sp") mesh spanning both — the DCN code path (parallel/mesh.py)
that single-process virtual-device tests cannot reach."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_collectives_and_spectrum():
    coord = f"127.0.0.1:{_free_port()}"
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("JAX_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests._multihost_worker",
             coord, "2", str(pid)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out:\n"
                    + "\n".join(o or "" for o in outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid}: OK" in out
        # the flagship ran across the process boundary and the
        # real-collectives sp-scaling datapoint was recorded
        assert f"proc {pid}: flagship-over-DCN bit-equal" in out
        assert "sp-trend ratio" in out
    for line in outs[0].splitlines():
        if "sp-trend" in line or "flagship" in line:
            print(line)
