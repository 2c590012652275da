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

``--dataname dcase`` instead emits the DCASE2019-task4 layout the dcase code
path expects (reference config.py:14-32, train_ss_sedt.py:100-113): 16 kHz
audio, strong labels under ``metadata/train/synthetic_2019/soundscapes.tsv``,
weak clip tags (``event_labels`` comma list) under ``metadata/train/weak.tsv``,
an unlabeled ``metadata/train/unlabel_in_domain.tsv`` (filenames only),
validation audio directly under ``audio/validation``:

    python tools/make_wav_dataset.py --root ./datadc --dataname dcase \
        --strong 2048 --weak 2048 --unlabel 8192 --validate 1024 --test 1024
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from sound_event_detection_transformer_tpu.config import DCASE_CLASSES, URBAN_CLASSES

SR = 44100
SECONDS = 10.0

# Generator parameter domains (semi-supervised information-headroom design).
# 'legacy' reproduces the original fixed generator bit-for-bit (all prior
# ACCURACY runs).  'restricted' is a narrow slice of the acoustic parameter
# space — loud, long, single-timbre events on a fixed noise floor.  'full' is
# the superset the restricted slice is drawn from: quieter events (down to
# ~-11 dB relative), shorter events, three timbre families, +/-2% detune and
# a varying noise floor.  The mean-teacher experiment labels the restricted
# slice and leaves the full space unlabeled, mirroring DCASE2019-task4's
# synthetic-strong vs real-unlabeled structure (reference README.md:119-137):
# the unlabeled pool then carries acoustic variation the strong labels lack,
# which is the information a semi-supervised system can win.
TIMBRES = {
    "A": ((1, 1.0), (2, 0.5), (3, 0.25)),          # the legacy stack
    "B": ((1, 1.0), (2, 0.15), (3, 0.6), (4, 0.3)),  # bright / hollow
    "C": ((1, 1.0), (3, 0.33), (5, 0.2)),            # odd harmonics (square-ish)
}
DOMAINS = {
    "legacy": dict(amp=(0.7, 1.3), dur=(0.8, 3.5), noise=(0.03, 0.03),
                   timbres="A", detune=0.0),
    "restricted": dict(amp=(0.9, 1.3), dur=(1.6, 3.5), noise=(0.03, 0.03),
                       timbres="A", detune=0.0),
    "full": dict(amp=(0.35, 1.3), dur=(0.7, 3.5), noise=(0.02, 0.05),
                 timbres="ABC", detune=0.02),
}


def synth_clip(rng: np.random.RandomState, n_classes: int, max_events: int = 3,
               min_events: int = 1, sr: int = SR, domain: str = "legacy"):
    """One 10 s waveform + its event list [(label_idx, onset_s, offset_s)]."""
    dom = DOMAINS[domain]
    n = int(sr * SECONDS)
    # fixed-width ranges take NO rng draw so 'legacy' stays bit-identical to
    # the original generator (prior ACCURACY datasets are reproducible)
    lo, hi = dom["noise"]
    y = rng.randn(n).astype(np.float32) * (lo if lo == hi else rng.uniform(lo, hi))
    events = []
    for _ in range(rng.randint(min_events, max_events + 1)):
        ci = rng.randint(n_classes)
        dur = rng.uniform(*dom["dur"])  # seconds
        on = rng.uniform(0.0, SECONDS - dur)
        t = np.arange(int(dur * sr)) / sr
        f0 = 220.0 * (ci + 1)
        if dom["detune"]:
            f0 *= rng.uniform(1.0 - dom["detune"], 1.0 + dom["detune"])
        fam = dom["timbres"]
        fam = fam if len(fam) == 1 else fam[rng.randint(len(fam))]
        burst = np.zeros_like(t, np.float32)
        for h, amp in TIMBRES[fam]:
            burst += amp * np.sin(2 * np.pi * f0 * h * t).astype(np.float32)
        # 10 ms linear attack/release so the band edge is not a click
        env = np.minimum(1.0, np.minimum(t, dur - t) / 0.01).astype(np.float32)
        burst *= 0.2 * env * rng.uniform(*dom["amp"])
        i0 = int(on * sr)
        y[i0:i0 + len(t)] += burst
        events.append((ci, on, on + dur))
    return y, events


def write_split(root: str, split: str, n_clips: int, classes, seed: int,
                sr: int = SR, audio_sub: str = None, tsv_path: str = None,
                label_mode: str = "strong", domain: str = "legacy"):
    """Emit one split: wavs under ``audio/<audio_sub or split>`` plus its TSV.

    ``label_mode``: 'strong' = (filename, onset, offset, event_label) rows;
    'weak' = (filename, event_labels) comma-joined clip tags (the DCASE
    weak.tsv format the dataset reads via ``DataLoadDf._raw_label``);
    'unlabel' = a filename-only TSV (unlabel_in_domain.tsv).
    """
    from scipy.io import wavfile
    import pandas as pd

    rng = np.random.RandomState(seed)
    adir = osp.join(root, "audio", audio_sub or split)
    os.makedirs(adir, exist_ok=True)
    rows = []
    for i in range(n_clips):
        fname = f"{split}_clip_{i}.wav"
        y, events = synth_clip(rng, len(classes), sr=sr, domain=domain)
        wavfile.write(
            osp.join(adir, fname), sr,
            (np.clip(y, -1, 1) * 32767).astype(np.int16),
        )
        if label_mode == "strong":
            for ci, on, off in events:
                rows.append((fname, round(on, 3), round(off, 3), classes[ci]))
        elif label_mode == "weak":
            tags = sorted({classes[ci] for ci, _, _ in events})
            rows.append((fname, ",".join(tags)))
        else:  # unlabel
            rows.append((fname,))
        if (i + 1) % 512 == 0:
            print(f"  {split}: {i + 1}/{n_clips}", flush=True)
    tsv = tsv_path or osp.join(root, "metadata", f"{split}.tsv")
    os.makedirs(osp.dirname(tsv), exist_ok=True)
    cols = {
        "strong": ["filename", "onset", "offset", "event_label"],
        "weak": ["filename", "event_labels"],
        "unlabel": ["filename"],
    }[label_mode]
    pd.DataFrame(rows, columns=cols).to_csv(tsv, sep="\t", index=False)
    print(f"{split}: {n_clips} clips, {len(rows)} rows ({label_mode}, {domain})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data")
    ap.add_argument("--dataname", default="urbansed", choices=["urbansed", "dcase"])
    ap.add_argument("--train", default=2048, type=int, help="urbansed strong train")
    ap.add_argument("--strong", default=2048, type=int, help="dcase synthetic_2019")
    ap.add_argument("--weak", default=2048, type=int)
    ap.add_argument("--unlabel", default=8192, type=int)
    ap.add_argument("--validate", default=512, type=int)
    ap.add_argument("--test", default=512, type=int)
    ap.add_argument("--num_classes", default=10, type=int)
    ap.add_argument("--seed", default=0, type=int)
    ap.add_argument(
        "--headroom", action="store_true",
        help="dcase only: strong labels from the RESTRICTED generator slice; "
        "weak/unlabeled/validation/eval from the FULL space — gives the "
        "unlabeled pool information the strong labels lack (the regime the "
        "reference's mean-teacher +10.9 rides; see DOMAINS above)")
    args = ap.parse_args()

    if args.dataname == "urbansed":
        classes = URBAN_CLASSES[: args.num_classes]
        root = osp.join(args.root, "urbansed")
        # disjoint seeds per split (same convention as SyntheticDataset usage)
        write_split(root, "train", args.train, classes, args.seed)
        write_split(root, "validate", args.validate, classes, args.seed + 1)
        write_split(root, "test", args.test, classes, args.seed + 2)
        return
    # DCASE2019-task4 layout (16 kHz; paths mirror build_real_data +
    # run_semi/run_spsedt expectations, train_lib.py:322-336, 878, 1098)
    classes = DCASE_CLASSES[: args.num_classes]
    root = osp.join(args.root, "dcase")
    sr = 16000
    # --headroom: strong = restricted slice, everything else = full space
    # (DCASE2019's own structure: synthetic strong vs real weak/unlabeled/val)
    d_strong = "restricted" if args.headroom else "legacy"
    d_wild = "full" if args.headroom else "legacy"
    meta = lambda *p: osp.join(root, "metadata", *p)
    write_split(root, "synthetic", args.strong, classes, args.seed, sr=sr,
                audio_sub=osp.join("train", "synthetic_2019", "soundscapes"),
                tsv_path=meta("train", "synthetic_2019", "soundscapes.tsv"),
                domain=d_strong)
    write_split(root, "weak", args.weak, classes, args.seed + 3, sr=sr,
                audio_sub=osp.join("train", "weak"),
                tsv_path=meta("train", "weak.tsv"), label_mode="weak",
                domain=d_wild)
    write_split(root, "unlabel", args.unlabel, classes, args.seed + 4, sr=sr,
                audio_sub=osp.join("train", "unlabel_in_domain"),
                tsv_path=meta("train", "unlabel_in_domain.tsv"),
                label_mode="unlabel", domain=d_wild)
    # validation audio lives directly under audio/validation (config.py:26)
    write_split(root, "validation", args.validate, classes, args.seed + 1,
                sr=sr, audio_sub="validation",
                tsv_path=meta("validation", "validation.tsv"), domain=d_wild)
    write_split(root, "public", args.test, classes, args.seed + 2, sr=sr,
                audio_sub=osp.join("eval", "public"),
                tsv_path=meta("eval", "public.tsv"), domain=d_wild)


if __name__ == "__main__":
    main()
