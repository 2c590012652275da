#!/usr/bin/env python
"""Generate a wav-backed synthetic dataset on disk in the URBAN-SED layout.

Purpose: drive the REAL-data path (TSVs -> SedData feature extraction ->
.npy cache -> Scaler -> DataLoadDf, reference train_sedt.py:163-224 /
SedData.py:143-299) at accuracy scale, which the in-memory
``--synthetic_smoke`` path bypasses.  Output layout::

    <root>/urbansed/audio/{train,validate,test}/clip_*.wav   (44.1 kHz int16)
    <root>/urbansed/metadata/{train,validate,test}.tsv

Each clip is a -30 dB noise floor plus 1-3 class-specific tone-stack bursts
(fundamental 220*(c+1) Hz + 2 harmonics, 10 ms attack/release envelope) at
known (onset, offset) — the audio-domain analogue of
``data/synthetic.py::make_clip``, so expected F1 behavior matches the
in-memory benchmark family (ACCURACY.md).

Usage: python tools/make_wav_dataset.py --root ./data --train 2048 \
          --validate 512 --test 512 [--seed 0]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from sound_event_detection_transformer_tpu.config import URBAN_CLASSES

SR = 44100
SECONDS = 10.0


def synth_clip(rng: np.random.RandomState, n_classes: int, max_events: int = 3,
               min_events: int = 1):
    """One 10 s waveform + its event list [(label_idx, onset_s, offset_s)]."""
    n = int(SR * SECONDS)
    y = rng.randn(n).astype(np.float32) * 0.03  # ~-30 dB noise floor
    events = []
    for _ in range(rng.randint(min_events, max_events + 1)):
        ci = rng.randint(n_classes)
        dur = rng.uniform(0.8, 3.5)  # seconds — same band as make_clip
        on = rng.uniform(0.0, SECONDS - dur)
        t = np.arange(int(dur * SR)) / SR
        f0 = 220.0 * (ci + 1)
        burst = np.zeros_like(t, np.float32)
        for h, amp in ((1, 1.0), (2, 0.5), (3, 0.25)):
            burst += amp * np.sin(2 * np.pi * f0 * h * t).astype(np.float32)
        # 10 ms linear attack/release so the band edge is not a click
        env = np.minimum(1.0, np.minimum(t, dur - t) / 0.01).astype(np.float32)
        burst *= 0.2 * env * rng.uniform(0.7, 1.3)
        i0 = int(on * SR)
        y[i0:i0 + len(t)] += burst
        events.append((ci, on, on + dur))
    return y, events


def write_split(root: str, split: str, n_clips: int, classes, seed: int):
    from scipy.io import wavfile
    import pandas as pd

    rng = np.random.RandomState(seed)
    adir = osp.join(root, "audio", split)
    os.makedirs(adir, exist_ok=True)
    rows = []
    for i in range(n_clips):
        fname = f"{split}_clip_{i}.wav"
        y, events = synth_clip(rng, len(classes))
        wavfile.write(
            osp.join(adir, fname), SR,
            (np.clip(y, -1, 1) * 32767).astype(np.int16),
        )
        for ci, on, off in events:
            rows.append((fname, round(on, 3), round(off, 3), classes[ci]))
        if (i + 1) % 256 == 0:
            print(f"  {split}: {i + 1}/{n_clips}")
    mdir = osp.join(root, "metadata")
    os.makedirs(mdir, exist_ok=True)
    pd.DataFrame(
        rows, columns=["filename", "onset", "offset", "event_label"]
    ).to_csv(osp.join(mdir, f"{split}.tsv"), sep="\t", index=False)
    print(f"{split}: {n_clips} clips, {len(rows)} events")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data")
    ap.add_argument("--train", default=2048, type=int)
    ap.add_argument("--validate", default=512, type=int)
    ap.add_argument("--test", default=512, type=int)
    ap.add_argument("--num_classes", default=10, type=int)
    ap.add_argument("--seed", default=0, type=int)
    args = ap.parse_args()

    classes = URBAN_CLASSES[: args.num_classes]
    root = osp.join(args.root, "urbansed")
    # disjoint seeds per split (same convention as SyntheticDataset usage)
    write_split(root, "train", args.train, classes, args.seed)
    write_split(root, "validate", args.validate, classes, args.seed + 1)
    write_split(root, "test", args.test, classes, args.seed + 2)


if __name__ == "__main__":
    main()
