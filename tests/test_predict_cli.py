"""predict.py end-to-end on CPU: wavs + checkpoint -> events TSV."""
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGS = [
    "--dataname", "urbansed", "--backbone", "resnet18",
    "--enc_layers", "1", "--dec_layers", "1", "--num_queries", "5",
    "--batch_size", "2", "--dec_at",
]


@pytest.mark.slow
def test_predict_cli_writes_tsv(tmp_path):
    from scipy.io import wavfile

    from sound_event_detection_transformer_tpu.models import build_model
    from sound_event_detection_transformer_tpu.train_lib import (
        args_to_config, get_parser,
    )
    from sound_event_detection_transformer_tpu.utils.checkpoint import (
        save_checkpoint,
    )
    import jax
    import jax.numpy as jnp

    # two 1 s noise wavs (predict zero-pads to the 10 s clip length)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        y = (rng.randn(44100) * 3000).astype(np.int16)
        wavfile.write(str(wav_dir / f"c{i}.wav"), 44100, y)

    # untrained checkpoint with the exact flag-derived architecture
    parser = get_parser()
    args = parser.parse_args(FLAGS)
    cfg = args_to_config(args)
    model, _ = build_model(cfg)
    T, F = cfg.model.max_frames, cfg.model.n_mels
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, T, F, 1)), jnp.zeros((1, T), bool), True,
    )
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, {"params": variables["params"],
                           "frozen": variables.get("frozen", {})})

    out = str(tmp_path / "pred.tsv")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.update(PYTHONPATH="", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "predict.py"),
         "--checkpoint", ckpt, "--wav_dir", str(wav_dir), "--out", out,
         "--threshold", "0.0"] + FLAGS,
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "wrote" in r.stdout
    df = pd.read_csv(out, sep="\t")
    assert list(df.columns) == ["filename", "onset", "offset",
                                "event_label", "score"]
    if len(df):  # untrained net may emit nothing past the fusion/min-dur rules
        assert (df.onset <= df.offset).all()
        assert df.filename.isin(["c0.wav", "c1.wav"]).all()
