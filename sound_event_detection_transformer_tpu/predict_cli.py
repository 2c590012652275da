#!/usr/bin/env python
"""Inference CLI (installed as ``sedt-predict``): wav files (or cached features) -> detected-event TSV.

A user-facing capability the reference lacks (its only inference path is the
in-training eval loop).  Loads a checkpoint saved by ``train_sedt.py``, runs
the fused waveform->log-mel->SEDT pipeline on device, decodes events with the
standard fusion strategy + min-duration/overlap rules, and writes a
sed_eval-compatible TSV.

Example:
  python predict.py --checkpoint exp/urbansed/model/<info>_1_best \\
    --dataname urbansed --wav_dir ./my_clips --out predictions.tsv --dec_at
"""
from __future__ import annotations

import argparse
import glob
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from .data.encoder import BoxEncoder
from .data.features import read_audio
from .data.scaler import Scaler
from .models import build_model, postprocess
from .ops.frontend import make_frontend_fn
from .train_lib import args_to_config, get_parser
from .utils.checkpoint import load_checkpoint


def main() -> None:
    parser = get_parser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--wav_dir", required=True)
    parser.add_argument("--out", default="predictions.tsv")
    parser.add_argument("--scaler", default="",
                        help="scaler json from training; defaults to the one "
                             "the trainer saved at <exp_root>/<dataname>.json "
                             "when present (pass 'none' to skip normalization)")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--at_m", type=int, default=1)
    args = parser.parse_args()
    cfg = args_to_config(args)

    model, _ = build_model(cfg)
    ck = load_checkpoint(args.checkpoint)
    params, frozen = ck["params"], ck.get("frozen", {})

    # Default to the dataset scaler the trainer saved (train_lib.py:341):
    # predicting without the training normalization silently degrades a
    # trained checkpoint, so discovery is automatic and opt-out.
    if not args.scaler:
        cand = osp.join(cfg.data.exp_root, cfg.data.dataset_name + ".json")
        if osp.isfile(cand):
            args.scaler = cand
            print(f"using training scaler {cand}")
    scaler_mean = scaler_std = None
    if args.scaler and args.scaler != "none":
        sc = Scaler()
        sc.load(args.scaler)
        scaler_mean, scaler_std = sc.mean_, sc.std_

    fc = cfg.features
    frontend = make_frontend_fn(
        sr=fc.sample_rate, n_fft=fc.n_fft, n_window=fc.n_window,
        hop=fc.hop_size, n_mels=fc.n_mels, max_frames=cfg.model.max_frames,
        scaler_mean=scaler_mean, scaler_std=scaler_std,
        compute_log=fc.compute_log,
    )

    @jax.jit
    def infer(waves):
        feats = frontend(waves)
        pad = jnp.zeros(feats.shape[:2], bool)
        out = model.apply({"params": params, "frozen": frozen}, feats, pad, True)
        tags = (out["at"] > 0.5).astype(jnp.float32) if "at" in out else None
        sizes = jnp.full((waves.shape[0],), fc.max_len_seconds)
        pp = postprocess(out, sizes, audio_tags=tags, at_m=args.at_m)
        return pp.scores, pp.labels, pp.boxes

    enc = BoxEncoder(list(cfg.data.classes), seconds=fc.max_len_seconds)
    n_samples = int(fc.max_len_seconds * fc.sample_rate)
    wavs = sorted(glob.glob(osp.join(args.wav_dir, "*.wav")))
    assert wavs, f"no wav files under {args.wav_dir}"
    rows = []
    bs = max(1, args.batch_size)
    for i in range(0, len(wavs), bs):
        chunk = wavs[i : i + bs]
        # fixed batch shape: the ragged tail is zero-padded so the jitted
        # program compiles exactly once (a second compile costs minutes
        # through this backend's compile service)
        batch = np.zeros((bs, n_samples), np.float32)
        for j, w in enumerate(chunk):
            audio, _ = read_audio(w, fc.sample_rate)
            n = min(len(audio), n_samples)
            batch[j, :n] = audio[:n]
        scores, labels, boxes = infer(jnp.asarray(batch))
        scores, labels, boxes = map(np.asarray, (scores, labels, boxes))
        for j, w in enumerate(chunk):
            for lbl, on, off, sc in enc.decode_strong(
                {"scores": scores[j], "labels": labels[j], "boxes": boxes[j]},
                threshold=args.threshold,
            ):
                rows.append(
                    (osp.basename(w),
                     float(np.clip(on, 0, fc.max_len_seconds)),
                     float(np.clip(off, 0, fc.max_len_seconds)),
                     lbl, float(sc))
                )
    import pandas as pd

    df = pd.DataFrame(rows, columns=["filename", "onset", "offset",
                                     "event_label", "score"])
    df.to_csv(args.out, sep="\t", index=False)
    print(f"wrote {len(df)} events for {len(wavs)} files to {args.out}")


if __name__ == "__main__":
    main()
