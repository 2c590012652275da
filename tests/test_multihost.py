"""TRUE multi-process SPMD: 2 cooperating jax processes (Gloo over
localhost, 2 virtual CPU devices each) run one data-parallel train step with
per-host batch slicing — the end-to-end proof of the multi-host path that
the in-process 8-device tests can't give."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step():
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.update(PYTHONPATH="", JAX_PLATFORM_NAME="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, port, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    for tag in ("LOSS=", "BANKLOSS="):
        vals = [
            line.split("=", 1)[1]
            for out in outs
            for line in out.splitlines()
            if line.startswith(tag)
        ]
        assert len(vals) == 2, (tag, outs)
        assert vals[0] == vals[1], (tag, vals)  # SPMD: identical everywhere
        assert float(vals[0]) == float(vals[0])  # finite
