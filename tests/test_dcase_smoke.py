"""dcase-mode supervised CLI smoke: the weak-stream batch layout must hold
(n_weak < batch_size; strong + weak sub-batches with per-sample flags)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dcase_supervised_smoke(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.update(PYTHONPATH="", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_sedt.py"),
         "--dataname", "dcase", "--synthetic_smoke",
         "--epochs", "1", "--batch_size", "8", "--n_weak", "2",
         "--enc_layers", "1", "--dec_layers", "1", "--backbone", "resnet18",
         "--exp_root", str(tmp_path)],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Epoch 0: loss" in r.stdout
    # finite loss line, e.g. "Epoch 0: loss 8.0489"
    loss = float(r.stdout.split("Epoch 0: loss", 1)[1].split()[0])
    assert loss == loss and loss < 1e4
