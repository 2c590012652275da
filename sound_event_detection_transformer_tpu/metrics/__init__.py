"""Evaluation metrics: event/segment-based F1, audio tagging, PSDS.

Mirrors the public surface of /root/reference/utilities/metrics.py but with
native scorers (sed_eval / psds_eval / dcase_util are not vendored here; see
``event_based.py`` / ``psds.py`` for the re-implemented semantics).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .event_based import EventBasedMetrics, SegmentBasedMetrics
from .psds import PSDSEval, psds_score


def get_event_list_current_file(df, fname: str) -> List[Dict]:
    """(reference metrics.py:24-39)"""
    import pandas as pd

    event_file = df[df["filename"] == fname]
    if len(event_file) == 1 and pd.isna(event_file["event_label"].iloc[0]):
        return [{"filename": fname}]
    return event_file.to_dict("records")


def _event_lists_by_file(df) -> Dict[str, List[Dict]]:
    """All files' event lists in ONE pass over the frame.

    Same per-file results as :func:`get_event_list_current_file`, which
    rescans the whole DataFrame per filename — O(files x rows) pandas
    masking that dominated evaluation at 2048 clips (31 s of a 42 s
    compute_metrics call).
    """
    import pandas as pd

    out: Dict[str, List[Dict]] = {}
    cols = list(df.columns)
    for row in df.itertuples(index=False):
        rec = dict(zip(cols, row))
        out.setdefault(rec["filename"], []).append(rec)
    for fname, recs in out.items():
        # a lone NaN-label row marks "file exists, no events"
        if len(recs) == 1 and pd.isna(recs[0].get("event_label")):
            out[fname] = [{"filename": fname}]
    return out


def _classes_union(reference, estimated) -> List[str]:
    classes = list(reference.event_label.dropna().unique())
    classes.extend(estimated.event_label.dropna().unique())
    return sorted(set(classes))


def event_based_evaluation_df(
    reference, estimated, t_collar: float = 0.200, percentage_of_length: float = 0.2
) -> EventBasedMetrics:
    """(reference metrics.py:43-81)"""
    metric = EventBasedMetrics(
        _classes_union(reference, estimated), t_collar, percentage_of_length
    )
    ref_lists = _event_lists_by_file(reference)
    est_lists = _event_lists_by_file(estimated)
    for fname in reference["filename"].unique():
        metric.evaluate(ref_lists[fname], est_lists.get(fname, []))
    return metric


def segment_based_evaluation_df(
    reference, estimated, time_resolution: float = 1.0
) -> SegmentBasedMetrics:
    """(reference metrics.py:84-116)"""
    metric = SegmentBasedMetrics(_classes_union(reference, estimated), time_resolution)
    ref_lists = _event_lists_by_file(reference)
    est_lists = _event_lists_by_file(estimated)
    for fname in reference["filename"].unique():
        metric.evaluate(ref_lists[fname], est_lists.get(fname, []))
    return metric


def compute_sed_eval_metrics(predictions, groundtruth, report: bool = True,
                             cal_seg: bool = False):
    """(reference metrics.py:147-157)"""
    metric_event = event_based_evaluation_df(
        groundtruth, predictions, t_collar=0.200, percentage_of_length=0.2
    )
    if report:
        print(metric_event)
    metric_segment = None
    if cal_seg:
        metric_segment = segment_based_evaluation_df(
            groundtruth, predictions, time_resolution=1.0
        )
        print(metric_segment)
    return metric_event, metric_segment


def intermediate_at_measures(encoded_ref: np.ndarray, encoded_est: np.ndarray):
    """(reference metrics.py:250-259)"""
    tp = ((encoded_est + encoded_ref) == 2).sum(axis=0)
    fp = ((encoded_est - encoded_ref) == 1).sum(axis=0)
    fn = ((encoded_ref - encoded_est) == 1).sum(axis=0)
    tn = ((encoded_est + encoded_ref) == 0).sum(axis=0)
    return tp, fp, fn, tn


def macro_f_measure(tp, fp, fn) -> np.ndarray:
    """(reference metrics.py:262-277)"""
    f = np.zeros(tp.shape[-1])
    mask = (2 * tp + fp + fn) != 0
    f[mask] = 2 * tp[mask] / (2 * tp + fp + fn)[mask]
    return f


def audio_tagging_results(reference, estimated):
    """Class-wise clip-level P/R/F DataFrame (reference metrics.py:281-322)."""
    import pandas as pd

    from ..data.encoder import ManyHotEncoder

    classes = _classes_union(reference, estimated)
    mhe = ManyHotEncoder(classes)

    def format_df(df):
        if "onset" in df.columns or "offset" in df.columns:
            # one crosstab instead of per-file groupby + encode_weak; files
            # with only NaN labels drop out, which can only change the (unused)
            # true-negative count
            sub = df[["filename", "event_label"]].dropna(subset=["event_label"])
            ct = (
                pd.crosstab(sub.filename, sub.event_label)
                .clip(upper=1)
                .reindex(columns=list(mhe.labels), fill_value=0)
            )
            df = pd.DataFrame(
                {"filename": ct.index.to_numpy(),
                 "event_label": list(ct.to_numpy(dtype=float))},
                columns=["filename", "event_label"],
            )
        return df

    reference = format_df(reference)
    estimated = format_df(estimated)
    matching = reference.merge(
        estimated, how="outer", on="filename", suffixes=["_ref", "_pred"]
    )

    def na_values(val):
        if isinstance(val, np.ndarray):
            return val
        return np.zeros(len(classes))

    if not estimated.empty:
        matching.event_label_pred = matching.event_label_pred.apply(na_values)
        matching.event_label_ref = matching.event_label_ref.apply(na_values)
        tp, fp, fn, tn = intermediate_at_measures(
            np.array(matching.event_label_ref.tolist()),
            np.array(matching.event_label_pred.tolist()),
        )
        f = macro_f_measure(tp, fp, fn)
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.where(tp + fp > 0, tp / np.maximum(tp + fp, 1), 0.0)
            r = np.where(tp + fn > 0, tp / np.maximum(tp + fn, 1), 0.0)
    else:
        f = p = r = np.zeros(len(classes))
    data = np.asarray([f, p, r]).T
    out = pd.DataFrame(data, columns=["f", "p", "r"], index=mhe.labels)
    out.loc["avg"] = data.mean(0)
    return out


def compute_metrics(predictions, gtruth_df, meta_df=None, cal_seg: bool = True,
                    cal_clip: bool = True) -> float:
    """Event-based macro F1 (+ optional segment/clip report); returns Eb_F1
    (reference metrics.py:333-368)."""
    import pandas as pd

    if predictions.empty:
        return 0.0
    events_metric, segments_metric = compute_sed_eval_metrics(
        predictions, gtruth_df, report=True, cal_seg=cal_seg
    )
    em = events_metric.results_class_wise_average_metrics()["f_measure"]
    clip_macro_f1 = None
    if cal_clip:
        clip_metric = audio_tagging_results(gtruth_df, predictions)
        clip_macro_f1 = clip_metric.loc["avg", "f"]
        print("Class-wise clip metrics")
        print("=" * 50)
        print(clip_metric)
    if segments_metric is not None:
        sm = segments_metric.results_class_wise_average_metrics()["f_measure"]
        row = [
            f"{em['f_measure'] * 100:.2f}%", f"{em['precision'] * 100:.2f}%",
            f"{em['recall'] * 100:.2f}%", f"{sm['f_measure'] * 100:.2f}%",
            f"{sm['precision'] * 100:.2f}%", f"{sm['recall'] * 100:.2f}%",
            f"{(clip_macro_f1 or 0) * 100:.2f}%",
        ]
        table = pd.DataFrame(
            [row], columns=["Eb_F1", "Eb_P", "Eb_R", "Sb_F", "Sb_P", "Sb_R", "At_F1"]
        )
        print("\nAll Metrics")
        print("=" * 55)
        print(table)
        print("=" * 55)
    return em["f_measure"]


def compute_psds_from_operating_points(
    list_predictions, groundtruth_df, meta_df, dtc_threshold=0.5,
    gtc_threshold=0.5, cttc_threshold=0.3,
):
    """(reference metrics.py:325-330)"""
    psds = PSDSEval(
        dtc_threshold, gtc_threshold, cttc_threshold,
        ground_truth=groundtruth_df, metadata=meta_df,
    )
    for pred in list_predictions:
        psds.add_operating_point(pred)
    return psds
