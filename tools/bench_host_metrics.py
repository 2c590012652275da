#!/usr/bin/env python
"""Host-side metric benchmark: compute_metrics + the 9-threshold PSDS sweep.

Synthesizes a 2048-clip evaluation (2 GT events + ~5 detections per clip,
10 classes) and times the two host scoring paths that sit at the end of
every eval: ``compute_metrics`` (event/segment/clip F1) and a PSDS sweep
over 9 decode thresholds.

Round-3 reference numbers on this box (single CPU core):
  compute_metrics      29.8 s  ->  ~4.3 s   (single-pass grouping, crosstab)
  PSDS sweep matching  181.6 s/point -> ~4.9 s TOTAL (pairwise-numpy DTC/GTC
                       over factorized (file, class) interval runs)

Run on CPU:  JAX_PLATFORM_NAME=cpu python tools/bench_host_metrics.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from sound_event_detection_transformer_tpu.data.encoder import BoxEncoder
from sound_event_detection_transformer_tpu.metrics import (
    PSDSEval, compute_metrics, psds_score,
)

CLASSES = [f"c{i}" for i in range(10)]
N, Q, B = 2048, 10, 64


def main():
    rng = np.random.RandomState(0)
    gt_rows = []
    for i in range(N):
        for _ in range(2):
            o = rng.uniform(0, 8)
            gt_rows.append(
                (f"f{i}.wav", o, o + rng.uniform(0.3, 2), CLASSES[rng.randint(10)])
            )
    ref = pd.DataFrame(gt_rows, columns=["filename", "onset", "offset",
                                         "event_label"])
    det_rows = []
    for i in range(N):
        for _ in range(5):
            o = rng.uniform(0, 9)
            det_rows.append(
                (f"f{i}.wav", o, o + rng.uniform(0.1, 3),
                 CLASSES[rng.randint(10)], rng.rand())
            )
    pred = pd.DataFrame(det_rows, columns=["filename", "onset", "offset",
                                           "event_label", "score"])

    t0 = time.time()
    compute_metrics(pred, ref, cal_seg=True, cal_clip=True)
    print(f"compute_metrics ({len(pred)} dets, {N} clips): "
          f"{time.time() - t0:.2f}s")

    # raw per-batch eval outputs, as evaluate() stores them for --psds
    enc = BoxEncoder(CLASSES, seconds=10.0)
    batches = []
    for s in range(0, N, B):
        scores = rng.beta(0.7, 3.0, (B, Q)).astype(np.float32)
        labels = rng.randint(0, 10, (B, Q))
        on = rng.uniform(0, 9, (B, Q))
        dur = rng.uniform(0.05, 3, (B, Q))
        boxes = np.stack([on, np.minimum(on + dur, 10.0)], -1).astype(np.float32)
        batches.append((scores, labels, boxes, np.arange(s, s + B)))
    filenames = pd.Series([f"f{i}.wav" for i in range(N)])
    meta = pd.DataFrame({"filename": ref.filename.unique(), "duration": 10.0})

    psds = PSDSEval(ground_truth=ref, metadata=meta)
    dec_t = op_t = 0.0
    for thr in np.arange(0.1, 1.0, 0.1):
        t1 = time.time()
        rows = []
        for scores, labels, boxes, idxs in batches:
            for j, p in enc.decode_strong_batch(
                scores, labels, boxes, threshold=thr
            ).items():
                for lbl, on, off, sc in p:
                    rows.append((filenames.iloc[idxs[j]],
                                 float(np.clip(on, 0, 10)),
                                 float(np.clip(off, 0, 10)), lbl))
        t2 = time.time()
        dec_t += t2 - t1
        psds.add_operating_point(
            pd.DataFrame(rows, columns=["filename", "onset", "offset",
                                        "event_label"])
        )
        op_t += time.time() - t2
    t3 = time.time()
    psds_score(psds)
    print(f"PSDS sweep: decode {dec_t:.2f}s, matching {op_t:.2f}s, "
          f"score {time.time() - t3:.2f}s")


if __name__ == "__main__":
    main()
