"""PSDS golden-value tests: hand-computed DTC/GTC/CTTC cases.

metrics/psds.py is a from-definition implementation of Bilen et al. (ICASSP
2020) — the reference wraps the external ``psds_eval`` package
(/root/reference/utilities/metrics.py:120-144).  These fixtures pin the
counting rules and the staircase-area math to hand-derived values so the
implementation can be trusted without psds_eval installed.
"""
import numpy as np
import pandas as pd

from sound_event_detection_transformer_tpu.metrics.psds import PSDSEval


def _df(rows):
    return pd.DataFrame(rows, columns=["filename", "onset", "offset", "event_label"])


META = pd.DataFrame({"filename": ["f1.wav"], "duration": [10.0]})


def test_dtc_gtc_counting():
    """GT A@[2,6]; det1 A@[2,4] is DTC-valid (2/2=1.0>=0.5) and covers
    2/4=0.5>=0.5 of the GT -> TP; det2 A@[7,9] has zero intersection -> FP.
    tpr = 1/1, fpr = 1 FP / (10s/3600) = 360 per hour."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    psds = PSDSEval(dtc_threshold=0.5, gtc_threshold=0.5, ground_truth=gt,
                    metadata=META)
    det = _df([("f1.wav", 2.0, 4.0, "A"), ("f1.wav", 7.0, 9.0, "A")])
    op = psds._evaluate_op(det)
    assert op["tpr"]["A"] == 1.0
    np.testing.assert_allclose(op["fpr"]["A"], 360.0)


def test_dtc_threshold_boundary():
    """det A@[0,8] vs GT A@[2,6]: intersection 4 / duration 8 = 0.5.
    At dtc=0.5 the detection is valid (>=) and fully covers the GT -> TP;
    at dtc=0.7 it is invalid -> FP and the GT goes uncovered."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    det = _df([("f1.wav", 0.0, 8.0, "A")])

    loose = PSDSEval(dtc_threshold=0.5, gtc_threshold=0.5, ground_truth=gt,
                     metadata=META)
    op = loose._evaluate_op(det)
    assert op["tpr"]["A"] == 1.0 and op["fpr"]["A"] == 0.0

    strict = PSDSEval(dtc_threshold=0.7, gtc_threshold=0.5, ground_truth=gt,
                      metadata=META)
    op = strict._evaluate_op(det)
    assert op["tpr"]["A"] == 0.0
    np.testing.assert_allclose(op["fpr"]["A"], 360.0)


def test_gtc_requires_joint_coverage():
    """Two short valid detections jointly cover 2/4 = 0.5 of the GT -> TP at
    gtc=0.5, but not at gtc=0.6."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    det = _df([("f1.wav", 2.0, 3.0, "A"), ("f1.wav", 5.0, 6.0, "A")])
    for gtc, expect in ((0.5, 1.0), (0.6, 0.0)):
        psds = PSDSEval(dtc_threshold=0.5, gtc_threshold=gtc, ground_truth=gt,
                        metadata=META)
        assert psds._evaluate_op(det)["tpr"]["A"] == expect


def test_cross_trigger_rate():
    """Invalid class-A detection lying on B's GT cross-triggers B:
    ctr[A][B] = 1 count / (4s of B ground truth / 3600) = 900 per hour."""
    gt = _df([("f1.wav", 0.0, 4.0, "A"), ("f1.wav", 5.0, 9.0, "B")])
    psds = PSDSEval(dtc_threshold=0.5, gtc_threshold=0.5, cttc_threshold=0.3,
                    ground_truth=gt, metadata=META)
    det = _df([("f1.wav", 5.0, 9.0, "A")])  # zero overlap with A's GT
    op = psds._evaluate_op(det)
    np.testing.assert_allclose(op["fpr"]["A"], 360.0)  # it is an FP
    np.testing.assert_allclose(op["ctr"]["A"]["B"], 900.0)


def test_psds_staircase_area_single_class():
    """Two OPs at (fpr=25, tpr=0.5) and (fpr=50, tpr=0.8):
    staircase is 0 on [0,25), 0.5 on [25,50), 0.8 on [50,100]
    -> area/100 = (0.5*25 + 0.8*50)/100 = 0.525."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    psds = PSDSEval(ground_truth=gt, metadata=META)
    psds.operating_points = [
        {"tpr": {"A": 0.5}, "fpr": {"A": 25.0}, "ctr": {"A": {}}},
        {"tpr": {"A": 0.8}, "fpr": {"A": 50.0}, "ctr": {"A": {}}},
    ]
    res = psds.psds(alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    np.testing.assert_allclose(res.value, 0.525)


def test_psds_alpha_st_penalty():
    """Two classes at constant tpr 0.8 / 0.4 from eFPR 0: mean 0.6, std 0.2;
    alpha_st=1 -> mu = 0.4 everywhere -> PSDS 0.4."""
    gt = _df([("f1.wav", 0.0, 4.0, "A"), ("f1.wav", 5.0, 9.0, "B")])
    psds = PSDSEval(ground_truth=gt, metadata=META)
    psds.operating_points = [
        {"tpr": {"A": 0.8, "B": 0.4}, "fpr": {"A": 0.0, "B": 0.0},
         "ctr": {"A": {"B": 0.0}, "B": {"A": 0.0}}},
    ]
    res0 = psds.psds(alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    np.testing.assert_allclose(res0.value, 0.6)
    res1 = psds.psds(alpha_ct=0.0, alpha_st=1.0, max_efpr=100.0)
    np.testing.assert_allclose(res1.value, 0.4)


def test_psds_alpha_ct_shifts_efpr():
    """alpha_ct moves the OP right by the mean cross-trigger rate:
    OP at fpr=20 with mean ctr=30 lands at eFPR 50 when alpha_ct=1
    -> area = 0.8*(100-50)/100 = 0.4 (vs 0.64 at alpha_ct=0)."""
    gt = _df([("f1.wav", 0.0, 4.0, "A"), ("f1.wav", 5.0, 9.0, "B")])
    psds = PSDSEval(ground_truth=gt, metadata=META)
    psds.operating_points = [
        {"tpr": {"A": 0.8, "B": 0.8}, "fpr": {"A": 20.0, "B": 20.0},
         "ctr": {"A": {"B": 30.0}, "B": {"A": 30.0}}},
    ]
    res0 = psds.psds(alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    np.testing.assert_allclose(res0.value, 0.8 * (100 - 20) / 100)
    res1 = psds.psds(alpha_ct=1.0, alpha_st=0.0, max_efpr=100.0)
    np.testing.assert_allclose(res1.value, 0.8 * (100 - 50) / 100)


def test_macro_f_score_golden():
    """tp=1, one extra FP det: F = 2tp/(2tp+fp+fn) = 2/3."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    psds = PSDSEval(ground_truth=gt, metadata=META)
    det = _df([("f1.wav", 2.0, 6.0, "A"), ("f1.wav", 8.0, 9.0, "A")])
    macro, per_class = psds.compute_macro_f_score(det)
    np.testing.assert_allclose(per_class["A"], 2.0 / 3.0)
    np.testing.assert_allclose(macro, 2.0 / 3.0)


def test_psds_tied_efpr_takes_max_tpr():
    """Two OPs at the SAME eFPR with different TPR (the tie case psds.py's
    header flags): the monotone envelope must keep the larger TPR and the
    zero-width segment contributes no area.  OPs (25, 0.3), (25, 0.7) ->
    staircase 0 on [0,25), 0.7 on [25,100] -> 0.7*75/100 = 0.525."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    psds = PSDSEval(ground_truth=gt, metadata=META)
    psds.operating_points = [
        {"tpr": {"A": 0.3}, "fpr": {"A": 25.0}, "ctr": {"A": {}}},
        {"tpr": {"A": 0.7}, "fpr": {"A": 25.0}, "ctr": {"A": {}}},
    ]
    res = psds.psds(alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    np.testing.assert_allclose(res.value, 0.525)


def test_psds_duplicate_operating_points_are_idempotent():
    """Registering the identical OP twice (duplicate decode thresholds
    produce identical detections) must not change the score."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    one = PSDSEval(ground_truth=gt, metadata=META)
    one.operating_points = [
        {"tpr": {"A": 0.5}, "fpr": {"A": 25.0}, "ctr": {"A": {}}},
    ]
    two = PSDSEval(ground_truth=gt, metadata=META)
    two.operating_points = one.operating_points * 2
    np.testing.assert_allclose(
        one.psds(0.0, 0.0, 100.0).value, two.psds(0.0, 0.0, 100.0).value
    )
    np.testing.assert_allclose(one.psds(0.0, 0.0, 100.0).value, 0.375)


def test_psds_non_monotone_tpr_enveloped():
    """A worse OP at higher eFPR (more FPs, fewer TPs) must be absorbed by
    the monotone envelope: OPs (25, 0.8), (50, 0.5) -> staircase 0.8 from
    eFPR 25 on -> 0.8*75/100 = 0.6."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    psds = PSDSEval(ground_truth=gt, metadata=META)
    psds.operating_points = [
        {"tpr": {"A": 0.8}, "fpr": {"A": 25.0}, "ctr": {"A": {}}},
        {"tpr": {"A": 0.5}, "fpr": {"A": 50.0}, "ctr": {"A": {}}},
    ]
    res = psds.psds(alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    np.testing.assert_allclose(res.value, 0.6)


def test_psds_op_at_max_efpr_boundary():
    """An OP exactly AT max_efpr adds a zero-width segment: (50, 0.5) +
    (100, 1.0) at max_efpr=100 -> 0.5 on [50,100), no width left for the
    1.0 point -> 0.25."""
    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    psds = PSDSEval(ground_truth=gt, metadata=META)
    psds.operating_points = [
        {"tpr": {"A": 0.5}, "fpr": {"A": 50.0}, "ctr": {"A": {}}},
        {"tpr": {"A": 1.0}, "fpr": {"A": 100.0}, "ctr": {"A": {}}},
    ]
    res = psds.psds(alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    np.testing.assert_allclose(res.value, 0.25)


def test_roc_curve_artifact(tmp_path):
    """write_roc_curves emits the per-class staircase CSV (+ PNG when
    matplotlib is present), matching the reference's filename_roc_curves
    capability (utilities/metrics.py:135-140)."""
    from sound_event_detection_transformer_tpu.metrics.psds import (
        psds_score, write_roc_curves,
    )

    gt = _df([("f1.wav", 2.0, 6.0, "A")])
    psds = PSDSEval(ground_truth=gt, metadata=META)
    psds.operating_points = [
        {"tpr": {"A": 0.5}, "fpr": {"A": 25.0}, "ctr": {"A": {}}},
        {"tpr": {"A": 0.9}, "fpr": {"A": 75.0}, "ctr": {"A": {}}},
    ]
    res = psds.psds(alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    written = write_roc_curves(res, str(tmp_path) + "/")
    csvs = [w for w in written if w.endswith(".csv")]
    assert len(csvs) == 1
    rows = open(csvs[0]).read().splitlines()
    assert rows[0] == "curve,efpr_per_hour,tpr"
    # per-class envelope points present: (0,0), (25,0.5), (75,0.9)
    a_rows = [r for r in rows if r.startswith("A,")]
    assert len(a_rows) == 3 and a_rows[-1].startswith("A,75.0")
    eff = [r for r in rows if r.startswith("effective_tpr,")]
    assert eff and eff[-1].endswith("0.900000")

    # psds_score with filename_roc_curves writes one CSV per scenario
    psds_score(psds, filename_roc_curves=str(tmp_path / "roc"))
    import glob

    assert len(glob.glob(str(tmp_path / "roc_ct*_st*.csv"))) == 3
