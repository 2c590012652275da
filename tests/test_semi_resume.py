"""Semi-trainer periodic checkpoints + resume (reference train_ss_sedt.py
:161-175,212-218 saves student + EMA teacher + epoch; the watchdog's
auto-resume needs the periodic ``<info>_<epoch>`` files)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARGS = [
    "--synthetic_smoke", "--smoke_clips", "16", "--semi_batch_size", "8",
    "--enc_layers", "1", "--dec_layers", "1", "--backbone", "resnet18",
    "--checkpoint_epochs", "1", "--seed", "7", "--info", "rsm",
]


def _run(tmp_path, extra):
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.update(PYTHONPATH="", JAX_PLATFORM_NAME="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "train_ss_sedt.py"),
         *ARGS, "--exp_root", str(tmp_path), *extra],
        capture_output=True, text=True, timeout=1200, cwd=REPO, env=env,
    )


@pytest.mark.slow
def test_semi_periodic_checkpoint_and_resume(tmp_path):
    r = _run(tmp_path, ["--epochs", "2"])
    assert r.returncode == 0, r.stdout[-1500:] + r.stderr[-1500:]
    # the semi trainer is dcase-only (cli.py asserts it), so the smoke's
    # store_dir is <exp_root>/dcase even in synthetic mode
    mdir = tmp_path / "dcase" / "model"
    assert (mdir / "rsm_0").exists() and (mdir / "rsm_1").exists()

    # the periodic checkpoint must carry FULL resume state: AdamW moments,
    # step counter (LR schedule), and SaveBest/EarlyStopping policies —
    # otherwise a watchdog auto-resume silently resets the optimizer
    from sound_event_detection_transformer_tpu.utils.checkpoint import (
        load_checkpoint,
    )

    ck = load_checkpoint(str(mdir / "rsm_1"))
    assert {"opt_state", "step", "policies", "classwise_threshold"} <= set(ck)
    assert int(ck["step"]) > 0
    assert "early" in ck["policies"] and "best_saver" in ck["policies"]

    r2 = _run(tmp_path, ["--epochs", "3", "--resume", "rsm_1"])
    assert r2.returncode == 0, r2.stdout[-1500:] + r2.stderr[-1500:]
    assert "resumed from rsm_1 at epoch 2" in r2.stdout
    # only epoch 2 trains after the resume
    assert "Epoch 2: loss" in r2.stdout and "Epoch 1: loss" not in r2.stdout
