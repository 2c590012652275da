"""Label codecs: box encoder (events <-> 1-D time boxes) and frame encoder.

Host-side ports of /root/reference/utilities/BoxEncoder.py and
FrameEncoder.py (tiny, irregular, pandas-facing — deliberately kept on host,
SURVEY.md §7 step 7), plus the dense-tensor bridge that turns ragged
per-sample encodings into the fixed-capacity :class:`DenseTargets` pytree the
jitted pipeline consumes.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import pandas as pd
except Exception:  # pragma: no cover
    pd = None

from ..models.criterion import DenseTargets


class BoxEncoder:
    """Strong/weak event labels <-> normalized (center, length) boxes.

    Port of /root/reference/utilities/BoxEncoder.py:7-236 minus the
    dcase_util dependency.
    """

    def __init__(self, labels, seconds: float, generate_patch: bool = False):
        if isinstance(labels, np.ndarray):
            labels = labels.tolist()
        self.labels = list(labels) if not isinstance(labels, int) else labels
        self.seconds = seconds
        self.generate_patch = generate_patch

    def _index(self, label: str) -> int:
        return 0 if isinstance(self.labels, int) else int(self.labels.index(label))

    def encode_unlabel(self, boxes) -> Dict[str, np.ndarray]:
        """Patch/unlabeled encoding (BoxEncoder.py:29-41)."""
        y = {
            "labels": np.asarray([0] * len(boxes), dtype=np.int64),
            "boxes": np.asarray(boxes, dtype=np.float32),
            "orig_size": np.asarray(self.seconds),
        }
        if self.generate_patch:
            y["patches"] = []
        return y

    def encode_weak(self, labels) -> Dict[str, np.ndarray]:
        """Weak (clip-level) labels -> class ids only (BoxEncoder.py:44-78)."""
        y = {"labels": [], "boxes": [], "orig_size": []}
        if isinstance(labels, str):
            if labels == "empty":
                labels = []
            else:
                labels = labels.split(",")
        if pd is not None and isinstance(labels, pd.DataFrame):
            labels = [] if labels.empty else (
                labels["event_label"] if "event_label" in labels.columns else []
            )
        for label in labels:
            if label is not None and not (isinstance(label, float) and np.isnan(label)):
                y["labels"].append(self._index(label))
        y["labels"] = np.asarray(y["labels"], dtype=np.int64)
        y["boxes"] = np.asarray(y["boxes"], dtype=np.float32)
        y["orig_size"] = np.asarray(self.seconds)
        if self.generate_patch:
            y["patches"] = []
        return y

    def encode_strong_df(self, label_df) -> Dict[str, np.ndarray]:
        """Strong rows -> class ids + [(on+off)/2s, (off-on)/s] boxes
        (BoxEncoder.py:80-161)."""
        y = {"labels": [], "boxes": []}
        assert self.seconds is not None

        def add(label, onset, offset):
            y["labels"].append(self._index(label))
            onset = float(onset) / self.seconds
            offset = float(offset) / self.seconds
            y["boxes"].append([(onset + offset) / 2, offset - onset])

        if isinstance(label_df, str):
            pass  # 'empty'
        elif pd is not None and isinstance(label_df, pd.DataFrame):
            if {"onset", "offset", "event_label"}.issubset(label_df.columns):
                for _, row in label_df.iterrows():
                    if not pd.isna(row["event_label"]):
                        add(row["event_label"], row["onset"], row["offset"])
        else:  # list-like of [label, onset, offset] or plain labels
            for ev in label_df:
                if isinstance(ev, str):
                    if ev != "":
                        y["labels"].append(self._index(ev))
                elif len(ev) == 3:
                    if ev[0] != "":
                        add(ev[0], ev[1], ev[2])
                else:
                    raise NotImplementedError(type(ev))
        out = {
            "labels": np.asarray(y["labels"], dtype=np.int64),
            "boxes": np.asarray(y["boxes"], dtype=np.float32),
            "orig_size": np.asarray(self.seconds),
        }
        if self.generate_patch:
            out["patches"] = []
        return out

    def decode_weak(self, labels) -> List[str]:
        return [self.labels[i] for i, v in enumerate(labels) if v == 1]

    def decode_strong(
        self, labels: Dict[str, np.ndarray], threshold: float = 0.5,
        del_overlap: bool = True, min_duration: float = 0.2,
    ) -> List[List]:
        """Per-query (score, label, box) -> event list with the 0.2 s
        min-duration filter and same-class greedy overlap suppression
        (BoxEncoder.py:179-226).  Returns [[label, onset, offset, score]...].
        """
        scores = np.asarray(labels["scores"])
        cls = np.asarray(labels["labels"])
        boxes = np.asarray(labels["boxes"])
        result = []
        if not del_overlap:
            for i in range(len(scores)):
                if scores[i] > threshold:
                    onset, offset = boxes[i]
                    if offset - onset >= min_duration:
                        result.append([self.labels[cls[i]], onset, offset, scores[i]])
            return result
        assert not isinstance(self.labels, int), (
            "del_overlap unsupported in self-supervised (single-class) mode"
        )
        event_dict: Dict[str, List[np.ndarray]] = {}
        for i in range(len(scores)):
            if scores[i] >= threshold:
                onset, offset = boxes[i]
                if offset - onset >= min_duration:
                    event_dict.setdefault(self.labels[cls[i]], []).append(
                        np.asarray([scores[i], onset, offset])
                    )
        for event, rows in event_dict.items():
            arr = np.vstack(rows)
            arr = arr[np.argsort(arr[:, 1])]  # by onset
            i = 1
            while i < len(arr):
                if arr[i][1] < arr[i - 1][2]:  # overlap with previous
                    if arr[i][0] > arr[i - 1][0]:
                        arr = np.delete(arr, i - 1, axis=0)
                    else:
                        arr = np.delete(arr, i, axis=0)
                    continue
                i += 1
            for row in arr:
                result.append([event, row[1], row[2], row[0]])
        return result

    def decode_strong_batch(
        self, scores: np.ndarray, labels: np.ndarray, boxes: np.ndarray,
        threshold: float = 0.5, min_duration: float = 0.2,
    ) -> Dict[int, List[List]]:
        """Batch decode: [B, Q] arrays -> {sample: decode_strong(sample)}.

        Exact same per-sample results as :meth:`decode_strong`; the score /
        min-duration prefilter runs vectorized over the whole batch first so
        the python loop only visits surviving (sample, query) entries —
        an order-of-magnitude cut for the multi-threshold PSDS sweep, where
        high thresholds keep almost nothing (train_lib.evaluate).
        """
        scores = np.asarray(scores)
        labels = np.asarray(labels)
        boxes = np.asarray(boxes)
        keep = (scores >= threshold) & (
            (boxes[..., 1] - boxes[..., 0]) >= min_duration
        )
        out: Dict[int, List[List]] = {}
        for b in np.nonzero(keep.any(axis=1))[0]:
            k = keep[b]
            out[int(b)] = self.decode_strong(
                {"scores": scores[b][k], "labels": labels[b][k],
                 "boxes": boxes[b][k]},
                threshold=threshold, min_duration=min_duration,
            )
        return out

    def state_dict(self):
        return {"labels": self.labels, "n_frames": self.seconds}

    @classmethod
    def load_state_dict(cls, state_dict):
        return cls(state_dict["labels"], state_dict["n_frames"])


class ManyHotEncoder:
    """Frame-level multi-hot codec for the audio-tagging trainer.

    Port of /root/reference/utilities/FrameEncoder.py:5-157 (minus
    dcase_util): weak labels -> [C] multi-hot; strong -> [n_frames, C];
    decode via contiguous-region extraction.
    """

    def __init__(self, labels, n_frames: Optional[int] = None):
        if isinstance(labels, np.ndarray):
            labels = labels.tolist()
        self.labels = list(labels)
        self.n_frames = n_frames

    def encode_weak(self, labels) -> np.ndarray:
        y = np.zeros(len(self.labels), dtype=np.float32)
        if isinstance(labels, str):
            labels = [] if labels == "empty" else labels.split(",")
        if pd is not None and isinstance(labels, pd.DataFrame):
            labels = [] if labels.empty else (
                labels["event_label"] if "event_label" in labels.columns else []
            )
        for label in labels:
            if label is not None and not (isinstance(label, float) and np.isnan(label)):
                y[self.labels.index(label)] = 1
        return y

    def encode_strong_df(self, label_df) -> np.ndarray:
        assert self.n_frames is not None
        y = np.zeros((self.n_frames, len(self.labels)), dtype=np.float32)
        if pd is not None and isinstance(label_df, pd.DataFrame):
            if {"onset", "offset", "event_label"}.issubset(label_df.columns):
                for _, row in label_df.iterrows():
                    if not pd.isna(row["event_label"]):
                        i = self.labels.index(row["event_label"])
                        onset = int(round(row["onset"]))
                        offset = int(round(row["offset"]))
                        y[onset:offset, i] = 1
        return y

    @staticmethod
    def find_contiguous_regions(activity: np.ndarray) -> np.ndarray:
        """[T] 0/1 -> [n, 2] (onset, offset) frame indices."""
        change = np.logical_xor(activity[1:], activity[:-1]).nonzero()[0] + 1
        if activity[0]:
            change = np.r_[0, change]
        if activity[-1]:
            change = np.r_[change, len(activity)]
        return change.reshape(-1, 2)

    def decode_strong(self, labels: np.ndarray) -> List[List]:
        result = []
        for i, label_col in enumerate(labels.T):
            for row in self.find_contiguous_regions(label_col > 0.5):
                result.append([self.labels[i], row[0], row[1]])
        return result

    def decode_weak(self, labels) -> List[str]:
        return [self.labels[i] for i, v in enumerate(labels) if v == 1]

    def state_dict(self):
        return {"labels": self.labels, "n_frames": self.n_frames}

    @classmethod
    def load_state_dict(cls, state_dict):
        return cls(state_dict["labels"], state_dict["n_frames"])


def to_dense_targets(
    encoded: Sequence[Dict[str, np.ndarray]],
    max_events: int,
    seconds: float,
) -> Tuple[DenseTargets, np.ndarray, np.ndarray]:
    """Ragged encoder outputs -> (DenseTargets arrays, strong, weak flags).

    The dense reformulation of the reference's list-of-dicts targets
    (SURVEY.md §7 "hard parts" #2).  Events beyond ``max_events`` are dropped
    (the reference caps mixes at 20 events, mixup.py:13).
    """
    B, M = len(encoded), max_events
    labels = np.zeros((B, M), np.int32)
    boxes = np.zeros((B, M, 2), np.float32)
    box_valid = np.zeros((B, M), bool)
    label_valid = np.zeros((B, M), bool)
    ratio = np.ones((B, M), np.float32)
    orig = np.full((B,), seconds, np.float32)
    strong = np.zeros((B,), bool)
    weak = np.zeros((B,), bool)
    for b, y in enumerate(encoded):
        ls = np.asarray(y.get("labels", []), dtype=np.int64).reshape(-1)
        bs = np.asarray(y.get("boxes", []), dtype=np.float32).reshape(-1, 2) if len(
            np.asarray(y.get("boxes", []))
        ) else np.zeros((0, 2), np.float32)
        nl = min(len(ls), M)
        nb = min(len(bs), M, nl) if len(bs) else 0
        labels[b, :nl] = ls[:nl]
        label_valid[b, :nl] = True
        if nb:
            boxes[b, :nb] = bs[:nb]
            box_valid[b, :nb] = True
        if "orig_size" in y and np.size(y["orig_size"]):
            orig[b] = float(np.asarray(y["orig_size"]).reshape(-1)[0])
        strong[b] = nb > 0
        weak[b] = nb == 0 and nl > 0
    return (
        DenseTargets(labels, boxes, box_valid, label_valid, ratio, orig),
        strong,
        weak,
    )
