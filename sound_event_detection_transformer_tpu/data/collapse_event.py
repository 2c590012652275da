"""URBAN-SED metadata preparation.

Port of /root/reference/data_utils/collapse_event.py:14-58: merges the
per-file ``.txt`` annotation files into train/validate/test TSVs and collapses
overlapping same-class events into single spans.
"""
from __future__ import annotations

import glob
import os
import os.path as osp
from typing import Optional


def collapse(df):
    """Merge overlapping same-class events per file (collapse_event.py:14-38)."""
    import pandas as pd

    out = []
    for (fname, label), grp in df.groupby(["filename", "event_label"]):
        grp = grp.sort_values("onset")
        cur_on, cur_off = None, None
        for _, row in grp.iterrows():
            if cur_on is None:
                cur_on, cur_off = row.onset, row.offset
            elif row.onset <= cur_off:  # overlap or touch: extend
                cur_off = max(cur_off, row.offset)
            else:
                out.append((fname, cur_on, cur_off, label))
                cur_on, cur_off = row.onset, row.offset
        if cur_on is not None:
            out.append((fname, cur_on, cur_off, label))
    return pd.DataFrame(out, columns=["filename", "onset", "offset", "event_label"]) \
        .sort_values(["filename", "onset"]).reset_index(drop=True)


def build_urbansed_tsvs(urbansed_dir: str, out_dir: Optional[str] = None) -> None:
    """annotations/<split>/*.txt -> metadata/<split>.tsv
    (collapse_event.py:41-58).  Annotation rows: onset\toffset\tlabel."""
    import pandas as pd

    out_dir = out_dir or osp.join(urbansed_dir, "metadata")
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "validate", "test"):
        rows = []
        ann_dir = osp.join(urbansed_dir, "annotations", split)
        for txt in sorted(glob.glob(osp.join(ann_dir, "*.txt"))):
            fname = osp.splitext(osp.basename(txt))[0] + ".wav"
            ann = pd.read_csv(
                txt, sep="\t", names=["onset", "offset", "event_label"]
            )
            for _, r in ann.iterrows():
                rows.append((fname, r.onset, r.offset, r.event_label))
        df = pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"])
        df = collapse(df)
        df.to_csv(osp.join(out_dir, f"{split}.tsv"), sep="\t", index=False)


if __name__ == "__main__":
    import sys

    build_urbansed_tsvs(sys.argv[1] if len(sys.argv) > 1 else "./data/URBAN-SED_v2.0.0")
