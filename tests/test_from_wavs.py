"""--from_wavs: raw-waveform streaming train path with the in-graph frontend.

The fused wav->logmel step itself is parity-pinned in test_fused_frontend.py;
these tests cover the TRAINER surface VERDICT r4 #5 asked for: WavLoadDf
batches, and train_sedt running end to end from wav files with
``frontend_fn`` fused into the jitted step (SURVEY §7 step 2, reference
SedData.py:195-217).
"""
import os

import numpy as np

from sound_event_detection_transformer_tpu.data.dataset import (
    WavLoadDf,
    collate,
)
from sound_event_detection_transformer_tpu.data.encoder import BoxEncoder
from sound_event_detection_transformer_tpu.data.features import SedData

from test_real_data_path import CLASSES, SR, _write_dataset


def test_wavloaddf_batches(tmp_path, rng):
    root = str(tmp_path / "ds")
    tsv = _write_dataset(root, rng)
    ds = SedData("dcase", base_feature_dir=os.path.join(root, "features"),
                 compute_log=False)
    df = ds.initialize_and_get_df(tsv)
    assert "wav_filename" in df.columns

    enc = BoxEncoder(CLASSES, seconds=10.0)
    data = WavLoadDf(df, enc.encode_strong_df, n_samples=SR * 10, sr=SR,
                     in_memory=True)
    assert len(data) == 4
    wave, y = data[0]
    assert wave.shape == (SR * 10,) and wave.dtype == np.float32
    # labels identical to what the TSV says (seconds-domain encoding)
    assert abs(float(y["boxes"][0, 0]) - (2.0 + 0.75) / 10.0) < 1e-5

    batch = collate([data[i] for i in range(4)], max_events=8, seconds=10.0)
    assert batch.feats.shape == (4, SR * 10, 1)
    # wav batches carry a placeholder [B, 1] mask (the in-graph frontend
    # rebuilds the real one; collate must not ship [B, 160k] bools)
    assert batch.pad_mask.shape == (4, 1)
    # in-memory cache: second load returns the cached array
    w2, _ = data[0]
    assert w2 is wave

    # features_only feeds a bank with raw waveforms
    w3, t_raw = data.features_only(1)
    assert w3.shape == (SR * 10,) and t_raw == SR * 10


def test_train_sedt_from_wavs_end_to_end(tmp_path, rng):
    """train_sedt --from_wavs: one epoch from wav files only, loss finite,
    eval runs (the streaming counterpart of the cached-feature path)."""
    from sound_event_detection_transformer_tpu.train_lib import (
        get_parser,
        run_supervised,
    )

    droot = str(tmp_path / "data" / "urbansed")
    os.makedirs(os.path.join(droot, "metadata"), exist_ok=True)
    # urbansed layout: train/validate/test TSVs + audio/<split>
    import pandas as pd
    from scipy.io import wavfile

    for split, n in (("train", 6), ("validate", 2), ("test", 2)):
        adir = os.path.join(droot, "audio", split)
        os.makedirs(adir, exist_ok=True)
        rows = []
        for i in range(n):
            fname = f"{split}_{i}.wav"
            y = rng.randn(44100 * 10).astype(np.float32) * 0.01
            c = i % 3
            t = np.arange(44100)
            y[44100 * 2 : 44100 * 3] += 0.2 * np.sin(
                2 * np.pi * 400 * (c + 1) * t / 44100
            ).astype(np.float32)
            wavfile.write(os.path.join(adir, fname), 44100,
                          (y * 32767).astype(np.int16))
            rows.append((fname, 2.0, 3.0,
                         ["air_conditioner", "car_horn", "children_playing"][c]))
        pd.DataFrame(
            rows, columns=["filename", "onset", "offset", "event_label"]
        ).to_csv(os.path.join(droot, "metadata", f"{split}.tsv"),
                 sep="\t", index=False)

    args = get_parser().parse_args([
        "--dataname", "urbansed",
        "--data_root", str(tmp_path / "data"),
        "--exp_root", str(tmp_path / "exp"),
        "--backbone", "resnet18",
        "--from_wavs",
        "--epochs", "1",
        "--epochs_ls", "1",
        "--batch_size", "2",
        "--enc_layers", "1",
        "--dec_layers", "1",
        "--num_classes", "3",
        "--num_queries", "4",
        "--eval_interval", "1",
    ])
    args.synthetic_smoke = False
    metrics = run_supervised(args)
    assert all(np.isfinite(v) for v in metrics.values())
