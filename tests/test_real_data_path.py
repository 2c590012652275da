"""Real-data pipeline: generated wav files -> SedData features -> DataLoadDf
-> dense batches (the path real datasets take; reference SedData.py flow)."""
import os

import numpy as np
import pandas as pd
import pytest

from sound_event_detection_transformer_tpu.data.dataset import DataLoadDf, collate
from sound_event_detection_transformer_tpu.data.encoder import BoxEncoder
from sound_event_detection_transformer_tpu.data.features import (
    SedData,
    get_dfs,
    read_audio,
)
from sound_event_detection_transformer_tpu.data.scaler import Scaler
from sound_event_detection_transformer_tpu.data.transforms import get_transforms

CLASSES = ["car_horn", "dog_bark", "siren"]
SR = 16000  # use the dcase geometry: faster than 44.1 kHz in tests


def _write_dataset(root, rng, n=4):
    from scipy.io import wavfile

    adir = os.path.join(root, "audio", "train")
    os.makedirs(adir, exist_ok=True)
    rows = []
    for i in range(n):
        fname = f"clip_{i}.wav"
        y = rng.randn(SR * 10).astype(np.float32) * 0.01
        c = i % len(CLASSES)
        on, dur = 2.0 + i * 0.5, 1.5
        t = np.arange(int(dur * SR)) / SR
        y[int(on * SR):int(on * SR) + len(t)] += 0.2 * np.sin(
            2 * np.pi * 400 * (c + 1) * t
        ).astype(np.float32)
        wavfile.write(os.path.join(adir, fname), SR, (y * 32767).astype(np.int16))
        rows.append((fname, on, on + dur, CLASSES[c]))
    mdir = os.path.join(root, "metadata")
    os.makedirs(mdir, exist_ok=True)
    tsv = os.path.join(mdir, "train.tsv")
    pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"]).to_csv(
        tsv, sep="\t", index=False
    )
    return tsv


def test_wav_to_dense_batch(tmp_path, rng):
    root = str(tmp_path / "ds")
    tsv = _write_dataset(root, rng)

    ds = SedData("dcase", base_feature_dir=os.path.join(root, "features"),
                 compute_log=False)
    df = ds.initialize_and_get_df(tsv)
    assert len(df) == 4 and df.feature_filename.nunique() == 4
    feat = np.load(df.feature_filename.iloc[0])
    assert feat.shape == (1 + SR * 10 // 323, 64)  # 496 frames (config.py:44)

    # cache hit: second init must not recompute (same mtimes)
    mtime = os.path.getmtime(df.feature_filename.iloc[0])
    df2 = ds.initialize_and_get_df(tsv)
    assert os.path.getmtime(df2.feature_filename.iloc[0]) == mtime

    enc = BoxEncoder(CLASSES, seconds=10.0)
    base_tf = get_transforms(496, None, compute_log=True)
    pre = DataLoadDf(df, enc.encode_strong_df, base_tf)
    scaler = Scaler()
    scaler.calculate_scaler(pre)
    tf = get_transforms(496, scaler, compute_log=True)
    data = DataLoadDf(df, enc.encode_strong_df, tf, in_memory=True)

    batch = collate([data[i] for i in range(4)], max_events=8, seconds=10.0)
    assert batch.feats.shape == (4, 496, 64, 1)
    assert batch.strong.all()
    # each clip has exactly one event with correct normalized box
    assert (np.asarray(batch.targets.box_valid.sum(-1)) == 1).all()
    c0 = float(batch.targets.boxes[0, 0, 0])
    assert abs(c0 - (2.0 + 0.75) / 10.0) < 1e-5
    # normalized features roughly standardized
    assert abs(float(np.mean(batch.feats))) < 1.0


def test_read_audio_resample(tmp_path, rng):
    from scipy.io import wavfile

    p = str(tmp_path / "a.wav")
    y = (rng.randn(44100) * 3000).astype(np.int16)
    wavfile.write(p, 44100, y)
    audio, fs = read_audio(p, target_fs=16000)
    assert fs == 16000
    assert abs(len(audio) - 16000) <= 2
    # stereo downmix
    wavfile.write(p, 44100, np.stack([y, y], -1))
    audio2, _ = read_audio(p, target_fs=16000)
    np.testing.assert_allclose(audio, audio2, atol=1e-4)


def _write_at_dataset(root, rng, classes):
    """dcase-style layout for the audio-tag trainer: weak (event_labels
    column) + synthetic (strong rows) + validation (strong rows)."""
    from scipy.io import wavfile

    CLASSES = classes

    def wavs(sub, names):
        adir = os.path.join(root, "audio", *sub)
        os.makedirs(adir, exist_ok=True)
        for f in names:
            y = (rng.randn(SR * 10) * 0.01 * 32767).astype(np.int16)
            wavfile.write(os.path.join(adir, f), SR, y)

    mdir = os.path.join(root, "metadata")
    os.makedirs(os.path.join(mdir, "train", "synthetic_2019"), exist_ok=True)
    os.makedirs(os.path.join(mdir, "validation"), exist_ok=True)

    weak_names = [f"w{i}.wav" for i in range(4)]
    wavs(("train", "weak"), weak_names)
    pd.DataFrame(
        {"filename": weak_names,
         "event_labels": [",".join(CLASSES[: 1 + i % 2]) for i in range(4)]}
    ).to_csv(os.path.join(mdir, "train", "weak.tsv"), sep="\t", index=False)

    syn_names = [f"s{i}.wav" for i in range(4)]
    wavs(("train", "synthetic_2019", "soundscapes"), syn_names)
    pd.DataFrame(
        [(f, 1.0, 3.0, CLASSES[i % 3]) for i, f in enumerate(syn_names)],
        columns=["filename", "onset", "offset", "event_label"],
    ).to_csv(
        os.path.join(mdir, "train", "synthetic_2019", "soundscapes.tsv"),
        sep="\t", index=False,
    )

    val_names = [f"v{i}.wav" for i in range(2)]
    wavs(("validation",), val_names)
    pd.DataFrame(
        [(f, 2.0, 4.0, CLASSES[i]) for i, f in enumerate(val_names)],
        columns=["filename", "onset", "offset", "event_label"],
    ).to_csv(os.path.join(mdir, "validation", "validation.tsv"),
             sep="\t", index=False)


def test_run_audio_tag_real_data(tmp_path, rng):
    """run_audio_tag trains on TSV-backed data end to end (VERDICT r1 #4:
    previously raised SystemExit; reference train_at.py:50-249)."""
    from sound_event_detection_transformer_tpu.train_lib import (
        get_parser, run_audio_tag,
    )

    from sound_event_detection_transformer_tpu.config import DCASE_CLASSES

    root = str(tmp_path / "data" / "dcase")
    os.makedirs(root, exist_ok=True)
    _write_at_dataset(root, rng, DCASE_CLASSES[:3])
    args = get_parser().parse_args([
        "--dataname", "dcase",
        "--data_root", str(tmp_path / "data"),
        "--exp_root", str(tmp_path / "exp"),
        "--backbone", "resnet18",
        "--epochs", "1",
        # batch 8 == the conftest's 8 virtual devices: exercises the AT
        # trainer's data-parallel mesh path (replicated params, sharded batch)
        "--batch_size", "8",
        "--num_classes", "3",
        "--lr", "1e-4",
    ])
    args.synthetic_smoke = False
    f1 = run_audio_tag(args)
    assert np.isfinite(f1)
    # best checkpoint written
    mdir = os.path.join(str(tmp_path / "exp"), "dcase", "model")
    assert any(f.startswith("at_") for f in os.listdir(mdir))


def test_cache_transformed_exact(tmp_path, rng):
    """cache_transformed returns bit-identical samples to the uncached path
    (the transform chain is deterministic; cache must be exact)."""
    root = str(tmp_path / "ds2")
    tsv = _write_dataset(root, rng)
    ds = SedData("dcase", base_feature_dir=os.path.join(root, "features"),
                 compute_log=False)
    df = ds.initialize_and_get_df(tsv)
    enc = BoxEncoder(CLASSES, seconds=10.0)
    tf = get_transforms(496, None, compute_log=True)
    plain = DataLoadDf(df, enc.encode_strong_df, tf)
    cached = DataLoadDf(df, enc.encode_strong_df, tf, cache_transformed=True)
    for i in range(len(plain)):
        d0, y0 = plain[i]
        d1, y1 = cached[i]
        d2, y2 = cached[i]  # second access: from cache
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(d0, d2)
        np.testing.assert_array_equal(y0["boxes"], y2["boxes"])
        assert d2 is d1  # cache hit returns the stored object


def test_cap_strong_clips_subsets_only_named_clips():
    """--max_strong_clips keeps the first N distinct clips (all their event
    rows) and leaves order deterministic — the label-scarcity knob used by
    the semi-supervised controls (ACCURACY.md Run 10e)."""
    from sound_event_detection_transformer_tpu.train_lib import cap_strong_clips

    df = pd.DataFrame(
        {
            "filename": ["a.wav", "a.wav", "b.wav", "c.wav", "c.wav", "d.wav"],
            "onset": [0.0, 2.0, 1.0, 0.5, 3.0, 4.0],
            "offset": [1.0, 3.0, 2.0, 1.5, 4.0, 5.0],
            "event_label": ["x", "y", "x", "y", "x", "y"],
        }
    )
    out = cap_strong_clips(df, 2)
    assert sorted(out["filename"].unique()) == ["a.wav", "b.wav"]
    assert len(out) == 3  # both of a.wav's events survive
    assert list(out.index) == [0, 1, 2]
    # idempotent / stable: same n -> same subset
    pd.testing.assert_frame_equal(out, cap_strong_clips(df, 2))
    # n beyond the clip count is a no-op
    pd.testing.assert_frame_equal(cap_strong_clips(df, 99), df)
