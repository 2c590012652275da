"""Polyphonic Sound Detection Score (PSDS) — native implementation.

The reference wraps the external ``psds_eval`` package
(/root/reference/utilities/metrics.py:120-144,325-330).  This module
implements the published PSDS definitions (Bilen et al., ICASSP 2020)
directly:

  * DTC: a detection is valid when its total intersection with same-class
    ground truths covers >= dtc_threshold of the detection's duration;
  * GTC: a ground truth counts as TP when DTC-valid detections cover
    >= gtc_threshold of its duration;
  * invalid detections are FPs; a FP cross-triggers class k when it overlaps
    k's ground truth by >= cttc_threshold of its duration;
  * per class and operating point: TPR = TP / Nref,
    FPR = FPs per hour of dataset audio, CTR_{c,k} = cross-triggers per hour
    of class-k ground-truth duration;
  * PSDS(alpha_ct, alpha_st, max_efpr): monotone per-class TPR staircases over
    eFPR = FPR + alpha_ct * mean CTR, effective TPR
    mu(e) = mean_c - alpha_st * std_c, area under mu up to max_efpr divided by
    max_efpr.

Numbers may differ from ``psds_eval`` in tie-handling minutiae but follow the
same definitions.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


@dataclass
class PSDSResult:
    value: float
    alpha_ct: float
    alpha_st: float
    max_efpr: float
    efpr_grid: np.ndarray
    etpr_curve: np.ndarray
    # per-class monotone TPR envelopes over eFPR: {class: (efpr[], tpr[])}
    per_class_curves: Optional[Dict[str, tuple]] = None


def _intersection(a_on, a_off, b_on, b_off) -> float:
    return max(0.0, min(a_off, b_off) - max(a_on, b_on))


def _by_file_class(df, classes=None) -> Dict:
    """DataFrame -> {filename: {class: (onset[], offset[]) float arrays}}.

    Factorize + lexsort + contiguous-run slicing: nested pandas groupbys
    spend ~1 ms materializing each (file, class) sub-frame, which dominated
    the PSDS sweep at 10k detections (12.5k sub-frames, 11 s of a 13 s
    operating point).
    """
    import pandas as pd

    out: Dict = {}
    if df is None or not len(df):
        return out
    files, file_keys = pd.factorize(df.filename.values)
    labels, label_keys = pd.factorize(df.event_label.values)  # NaN -> -1
    on = df.onset.values.astype(float)
    off = df.offset.values.astype(float)
    order = np.lexsort((labels, files))
    files, labels, on, off = files[order], labels[order], on[order], off[order]
    change = np.nonzero((np.diff(files) != 0) | (np.diff(labels) != 0))[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(files)]))
    for s, e in zip(starts, ends):
        if labels[s] < 0:
            continue  # NaN label (groupby drops these too)
        c = label_keys[labels[s]]
        if classes is not None and c not in classes:
            continue  # detections outside the GT label set are ignored
        out.setdefault(file_keys[files[s]], {})[c] = (on[s:e], off[s:e])
    return out


def _pair_intersections(d_on, d_off, g_on, g_off) -> np.ndarray:
    """[D, G] pairwise interval intersections."""
    return np.clip(
        np.minimum(d_off[:, None], g_off[None, :])
        - np.maximum(d_on[:, None], g_on[None, :]),
        0.0,
        None,
    )


class PSDSEval:
    def __init__(
        self,
        dtc_threshold: float = 0.5,
        gtc_threshold: float = 0.5,
        cttc_threshold: float = 0.3,
        ground_truth=None,
        metadata=None,
    ):
        self.dtc = dtc_threshold
        self.gtc = gtc_threshold
        self.cttc = cttc_threshold
        self.gt = ground_truth
        self.metadata = metadata
        self.classes = sorted(ground_truth.event_label.dropna().unique())
        if metadata is not None and "duration" in metadata.columns:
            self.total_hours = metadata.duration.sum() / 3600.0
        else:
            # fall back: one clip = max offset (10 s clips in practice)
            per_file = ground_truth.groupby("filename").offset.max()
            self.total_hours = float(per_file.clip(lower=10.0).sum()) / 3600.0
        self.gt_hours_per_class = {
            c: float(
                (ground_truth[ground_truth.event_label == c].offset
                 - ground_truth[ground_truth.event_label == c].onset).sum()
            ) / 3600.0
            for c in self.classes
        }
        self.operating_points: List[Dict] = []
        # ground truth never changes across operating points: group its
        # intervals per (file, class) ONCE — re-filtering pandas frames per
        # detection made the 9-threshold PSDS sweep take minutes per point
        self._gt_np = _by_file_class(ground_truth)

    def _evaluate_op(self, detections) -> Dict:
        tpr = {}
        fpr = {}
        ctr = {c: {k: 0.0 for k in self.classes if k != c} for c in self.classes}
        class_set = set(self.classes)
        det_np = _by_file_class(detections, classes=class_set)
        tp_count = {c: 0 for c in self.classes}
        fp_count = {c: 0 for c in self.classes}
        nref = {
            c: int((self.gt.event_label == c).sum()) for c in self.classes
        }
        empty = np.zeros(0)
        # Iterate the UNION of files: detections on a clip with no ground-truth
        # rows are still false positives (psds_eval scores every metadata file).
        for fname in set(self._gt_np) | set(det_np):
            gts = self._gt_np.get(fname, {})
            dets = det_np.get(fname, {})
            # classes absent from BOTH contribute nothing (even under
            # degenerate thresholds: no dets -> no FPs, no gts -> no TPs)
            for c in set(gts) | set(dets):
                g_on, g_off = gts.get(c, (empty, empty))
                d_on, d_off = dets.get(c, (empty, empty))
                # [D, G] pairwise intersections drive both DTC and GTC
                inter = _pair_intersections(d_on, d_off, g_on, g_off)
                dur = np.maximum(d_off - d_on, 1e-9)
                valid = inter.sum(axis=1) / dur >= self.dtc
                gdur = np.maximum(g_off - g_on, 1e-9)
                tp_count[c] += int(
                    (inter[valid].sum(axis=0) / gdur >= self.gtc).sum()
                )
                inv = ~valid
                fp_count[c] += int(inv.sum())
                if not inv.any():
                    continue
                # cross-triggers: invalid dets of class c vs other classes'
                # ground truth in the same file (classes without GT here can
                # only cross-trigger under a degenerate cttc <= 0)
                ks = (
                    [k for k in self.classes if k != c]
                    if self.cttc <= 0
                    else [k for k in gts if k != c]
                )
                don_i, doff_i, dur_i = d_on[inv], d_off[inv], dur[inv]
                for k in ks:
                    k_on, k_off = gts.get(k, (empty, empty))
                    inter_k = _pair_intersections(
                        don_i, doff_i, k_on, k_off
                    ).sum(axis=1)
                    ctr[c][k] += float((inter_k / dur_i >= self.cttc).sum())
        for c in self.classes:
            tpr[c] = tp_count[c] / nref[c] if nref[c] else 0.0
            fpr[c] = fp_count[c] / max(self.total_hours, 1e-9)
            for k in ctr[c]:
                ctr[c][k] /= max(self.gt_hours_per_class.get(k, 0.0), 1e-9)
        return {"tpr": tpr, "fpr": fpr, "ctr": ctr}

    def add_operating_point(self, detections) -> None:
        self.operating_points.append(self._evaluate_op(detections))

    def psds(
        self, alpha_ct: float = 0.0, alpha_st: float = 0.0, max_efpr: float = 100.0
    ) -> PSDSResult:
        assert self.operating_points, "no operating points added"
        # per-class (efpr, tpr) points
        curves = {}
        for c in self.classes:
            pts = [(0.0, 0.0)]
            for op in self.operating_points:
                e = op["fpr"][c]
                if alpha_ct > 0 and op["ctr"][c]:
                    e = e + alpha_ct * float(np.mean(list(op["ctr"][c].values())))
                pts.append((e, op["tpr"][c]))
            pts.sort()
            # monotone non-decreasing TPR envelope
            xs, ys = [], []
            best = 0.0
            for e, t in pts:
                best = max(best, t)
                xs.append(e)
                ys.append(best)
            curves[c] = (np.array(xs), np.array(ys))

        grid = np.unique(
            np.concatenate(
                [xs for xs, _ in curves.values()] + [np.array([0.0, max_efpr])]
            )
        )
        grid = grid[grid <= max_efpr]
        # previous-value (staircase) interpolation of each class's envelope
        tprs = np.stack(
            [
                ys[np.clip(np.searchsorted(xs, grid, side="right") - 1, 0, len(ys) - 1)]
                for xs, ys in curves.values()
            ]
        )
        mu = tprs.mean(axis=0) - alpha_st * tprs.std(axis=0)
        mu = np.clip(mu, 0.0, None)
        if len(grid) < 2:
            value = 0.0
        else:
            # extend to max_efpr and integrate the staircase
            area = float(
                np.sum(mu[:-1] * np.diff(grid)) + mu[-1] * (max_efpr - grid[-1])
            )
            value = area / max_efpr
        return PSDSResult(value, alpha_ct, alpha_st, max_efpr, grid, mu, curves)

    def compute_macro_f_score(self, detections):
        """Single-OP DTC/GTC-based macro F1 (psds_eval API parity)."""
        op = self._evaluate_op(detections)
        fs = []
        per_class = {}
        for c in self.classes:
            nref = int((self.gt.event_label == c).sum())
            tp = op["tpr"][c] * nref
            nsys = int((detections.event_label == c).sum()) if len(detections) else 0
            fp = nsys - tp
            denom = 2 * tp + fp + (nref - tp)
            f = 2 * tp / denom if denom > 0 else 0.0
            per_class[c] = f
            fs.append(f)
        return float(np.mean(fs)) if fs else 0.0, per_class


def psds_score(psds: PSDSEval, filename_roc_curves: Optional[str] = None):
    """Print the three standard PSDS scores (reference metrics.py:120-144).

    When ``filename_roc_curves`` is given, the per-class TPR/eFPR ROC
    staircases and the effective-TPR curve of each scenario are written next
    to that path — a ``.csv`` always, plus a ``.png`` plot when matplotlib is
    available (the reference delegates this to ``psds_eval.plot_psd_roc``,
    /root/reference/utilities/metrics.py:135-140).
    """
    try:
        for a_ct, a_st in ((0, 0), (1, 0), (0, 1)):
            res = psds.psds(alpha_ct=a_ct, alpha_st=a_st, max_efpr=100)
            print(f"\nPSD-Score ({a_ct}, {a_st}, 100): {res.value:.5f}")
            if filename_roc_curves:
                write_roc_curves(res, filename_roc_curves)
    except Exception as e:  # pragma: no cover
        print("psds score did not work ....")
        print(e)


def write_roc_curves(res: PSDSResult, base_path: str) -> List[str]:
    """Persist one scenario's ROC data: per-class envelopes + effective TPR.

    ``base_path`` may be a directory or a path prefix; files are suffixed
    ``_ct<alpha_ct>_st<alpha_st>.csv`` (and ``.png`` when matplotlib exists).
    Returns the written paths.
    """
    import os

    tag = f"ct{res.alpha_ct:g}_st{res.alpha_st:g}"
    if os.path.isdir(base_path) or base_path.endswith(os.sep):
        os.makedirs(base_path, exist_ok=True)
        prefix = os.path.join(base_path, "psds_roc")
    else:
        d = os.path.dirname(base_path)
        if d:
            os.makedirs(d, exist_ok=True)
        prefix = base_path
    written = []
    csv_path = f"{prefix}_{tag}.csv"
    with open(csv_path, "w") as f:
        f.write("curve,efpr_per_hour,tpr\n")
        for c, (xs, ys) in (res.per_class_curves or {}).items():
            for x, y in zip(xs, ys):
                f.write(f"{c},{x:.6f},{y:.6f}\n")
        for x, y in zip(res.efpr_grid, res.etpr_curve):
            f.write(f"effective_tpr,{x:.6f},{y:.6f}\n")
    written.append(csv_path)
    try:  # optional plot (matplotlib may be absent in minimal images)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        for c, (xs, ys) in (res.per_class_curves or {}).items():
            ax.step(xs, ys, where="post", alpha=0.5, label=str(c))
        ax.step(res.efpr_grid, res.etpr_curve, where="post", color="black",
                linewidth=2.0, label="effective TPR")
        ax.set_xlim(0, res.max_efpr)
        ax.set_ylim(0, 1.0)
        ax.set_xlabel("eFPR (per hour)")
        ax.set_ylabel("TPR")
        ax.set_title(
            f"PSDS ROC (alpha_ct={res.alpha_ct:g}, alpha_st={res.alpha_st:g}, "
            f"PSDS={res.value:.4f})"
        )
        ax.legend(fontsize=7, ncol=2)
        png_path = f"{prefix}_{tag}.png"
        fig.savefig(png_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(png_path)
    except Exception:  # pragma: no cover - matplotlib missing
        pass
    print(f"ROC curves written: {', '.join(written)}")
    return written
