#!/usr/bin/env python
"""Extract the validation Eb_F1 trend from a train_sedt.py log.

Usage: python tools/parse_acc_log.py /tmp/acc_f32.log [more.log ...]

Prints one line per evaluation: epoch, predicted events, macro Eb_F1 — plus
the best value, for the ACCURACY.md artifact.
"""
from __future__ import annotations

import re
import sys


def parse(path: str):
    """Yield (epoch, n_events, macro_f1_pct) per validation evaluation."""
    epoch = None
    n_events = None
    in_validation = False
    took_f1 = True
    out = []
    with open(path, errors="replace") as f:
        for line in f:
            m = re.search(r"Epoch (\d+): loss", line)
            if m:
                epoch = int(m.group(1))
            if ("Metric on validation" in line
                    or "model validation" in line):  # semi loop's marker
                in_validation = True
            elif "Metric on eval" in line:
                in_validation = False
            m = re.search(r"Fusion strategy: \d+ \((\d+) events\)", line)
            if m:
                n_events = int(m.group(1))
                took_f1 = False
            m = re.search(r"macro-average\s+([\d.]+)%", line)
            if m and in_validation and not took_f1:
                # first macro-average after a "Fusion strategy" line is the
                # event-based table; a second one (final test) is segment-based
                took_f1 = True
                out.append((epoch, n_events, float(m.group(1))))
    return out


def main():
    for path in sys.argv[1:]:
        rows = parse(path)
        print(f"== {path} ({len(rows)} validation evals)")
        for ep, ne, f1 in rows:
            print(f"  epoch {ep if ep is not None else '?':>4}  "
                  f"events {ne:>5}  Eb_F1 {f1:5.1f}%")
        if rows:
            best = max(rows, key=lambda r: r[2])
            print(f"  BEST: Eb_F1 {best[2]:.1f}% at epoch {best[0]}")


if __name__ == "__main__":
    main()
