"""Synthetic dataset fixture: random spectrograms with planted events.

The reference has no test suite (SURVEY.md §4); this fixture is the basis of
ours: clips are noise floors with class-specific rectangular "energy blobs" at
known (onset, offset), so a working pipeline can overfit to near-perfect F1 on
them and every stage (encoding, matching, decoding, metrics) is exercised with
known ground truth.  Also used by ``--synthetic_smoke`` CLI runs and bench.py
when no real dataset is present.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def make_clip(
    rng: np.random.RandomState,
    classes: Sequence[str],
    frames: int,
    mels: int,
    max_events: int,
    seconds: float = 10.0,
    min_events: int = 1,
) -> Tuple[np.ndarray, List[Tuple[str, float, float]]]:
    """One synthetic log-mel clip + its event list (label, onset_s, offset_s)."""
    data = rng.randn(frames, mels).astype(np.float32) * 0.3 - 2.0
    n_events = rng.randint(min_events, max_events + 1)
    events = []
    for _ in range(n_events):
        ci = rng.randint(len(classes))
        dur = rng.uniform(0.08, 0.35)  # fraction of clip
        start = rng.uniform(0.0, 1.0 - dur)
        f0 = (ci * mels) // (len(classes) + 1)
        f1 = min(mels, f0 + max(3, mels // (len(classes) + 1)))
        t0, t1 = int(start * frames), int((start + dur) * frames)
        data[t0:t1, f0:f1] += 4.0 + rng.rand()
        events.append((classes[ci], start * seconds, (start + dur) * seconds))
    return data, events


class SyntheticDataset:
    """DataLoadDf-compatible in-memory dataset of synthetic clips."""

    def __init__(
        self,
        n_clips: int,
        classes: Sequence[str],
        frames: int,
        mels: int,
        encode_function,
        max_events: int = 3,
        seconds: float = 10.0,
        seed: int = 0,
        weak_only: bool = False,
        unlabel: bool = False,
        transform=None,
        num_patches: Optional[int] = None,
        fixed_patch_size: bool = False,
        device_patches: bool = False,
    ):
        rng = np.random.RandomState(seed)
        self.items = []
        self.rows = []
        self.encode_function = encode_function
        self.transform = transform
        self.num_patches = num_patches
        self.fixed_patch_size = fixed_patch_size
        self.device_patches = device_patches
        self._filenames = []
        for i in range(n_clips):
            data, events = make_clip(rng, classes, frames, mels, max_events, seconds)
            fname = f"synthetic_{seed}_{i}.wav"
            self._filenames.append(fname)
            if unlabel:
                label_arg = "empty"
            elif weak_only:
                label_arg = sorted({e[0] for e in events})
            else:
                label_arg = [[lbl, on, off] for lbl, on, off in events]
            self.items.append((data, label_arg))
            for lbl, on, off in events:
                self.rows.append(
                    dict(filename=fname, onset=on, offset=off, event_label=lbl)
                )
        self.seconds = seconds
        self.frames = frames

    @property
    def filenames(self):
        import pandas as pd

        return pd.Series(self._filenames)

    def ref_df(self):
        import pandas as pd

        return pd.DataFrame(self.rows, columns=["filename", "onset", "offset", "event_label"])

    def __len__(self):
        return len(self.items)

    def features_only(self, idx: int):
        """Post-transform features + frame count (FeatureBank protocol).

        Patch boxes in ``__getitem__`` are drawn against the POST-transform
        shape here (features are generated at the target geometry), so the
        returned frame count is post-transform.
        """
        data = self.items[idx][0]
        if self.transform is not None:
            data, _ = self.transform((data, None))
        return data, data.shape[0]

    def targets_only(self, idx: int, t_raw: int):
        """Label dict matching ``__getitem__``, minus feature work."""
        y = self.encode_function(self.items[idx][1])
        if self.num_patches is not None:
            from .transforms import get_random_patch_boxes

            boxes = get_random_patch_boxes(
                t_raw, self.num_patches,
                fixed_patch_size=self.fixed_patch_size,
            )
            y = dict(y)
            y["labels"] = np.zeros(len(boxes), np.int64)
            y["boxes"] = boxes
            y.pop("patches", None)  # crops gathered in-graph
        return y

    def __getitem__(self, idx: int):
        data, label_arg = self.items[idx]
        y = self.encode_function(label_arg)
        if self.transform is not None:
            data, y = self.transform((data, y))
        if self.num_patches is not None:
            from .transforms import extract_patches, get_random_patch_boxes

            boxes = get_random_patch_boxes(
                data.shape[0], self.num_patches,
                fixed_patch_size=self.fixed_patch_size,
            )
            y = dict(y)
            y["labels"] = np.zeros(len(boxes), np.int64)
            y["boxes"] = boxes
            if self.device_patches:  # crops gathered in-graph instead
                y.pop("patches", None)
            else:
                y["patches"] = extract_patches(data, boxes)
        return data, y
