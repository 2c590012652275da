"""Randomized cross-check of metrics/psds.py against a brute-force oracle.

The golden tests (test_psds_golden.py) pin hand-derived values; this file adds
a structurally independent re-implementation of the PSDS definitions (Bilen et
al., ICASSP 2020 — the reference wraps the external ``psds_eval`` package,
/root/reference/utilities/metrics.py:120-144) and compares the two on
randomized ground truths / detection sets.  The oracle deliberately shares no
mechanics with the production code: plain event tuples instead of pandas
groupby, direct max-over-ops scans per grid point instead of the
sort + monotone-envelope + searchsorted staircase.
"""
import numpy as np
import pandas as pd
import pytest

from sound_event_detection_transformer_tpu.metrics.psds import PSDSEval

COLS = ["filename", "onset", "offset", "event_label"]


# ---------------------------------------------------------------------------
# brute-force oracle
# ---------------------------------------------------------------------------


def _inter(a, b, c, d):
    return max(0.0, min(b, d) - max(a, c))


def oracle_op(gt_rows, det_rows, classes, total_hours, gt_hours, dtc, gtc, cttc):
    """One operating point from flat (file, on, off, label) tuples."""
    files = {r[0] for r in gt_rows} | {r[0] for r in det_rows}
    tp = {c: 0 for c in classes}
    fp = {c: 0 for c in classes}
    ct = {c: {k: 0.0 for k in classes if k != c} for c in classes}
    for f in files:
        g_f = [r for r in gt_rows if r[0] == f]
        d_f = [r for r in det_rows if r[0] == f]
        for c in classes:
            g = [(on, off) for _, on, off, lab in g_f if lab == c]
            d = [(on, off) for _, on, off, lab in d_f if lab == c]
            valid = []
            for don, doff in d:
                cov = sum(_inter(don, doff, gon, goff) for gon, goff in g)
                valid.append(cov / max(doff - don, 1e-9) >= dtc)
            for gon, goff in g:
                cov = sum(
                    _inter(don, doff, gon, goff)
                    for (don, doff), v in zip(d, valid) if v
                )
                if cov / max(goff - gon, 1e-9) >= gtc:
                    tp[c] += 1
            for (don, doff), v in zip(d, valid):
                if v:
                    continue
                fp[c] += 1
                for k in classes:
                    if k == c:
                        continue
                    gk = [(on, off) for _, on, off, lab in g_f if lab == k]
                    cov = sum(_inter(don, doff, gon, goff) for gon, goff in gk)
                    if cov / max(doff - don, 1e-9) >= cttc:
                        ct[c][k] += 1.0
    nref = {c: sum(1 for r in gt_rows if r[3] == c) for c in classes}
    return {
        "tpr": {c: tp[c] / nref[c] if nref[c] else 0.0 for c in classes},
        "fpr": {c: fp[c] / max(total_hours, 1e-9) for c in classes},
        "ctr": {
            c: {k: v / max(gt_hours.get(k, 0.0), 1e-9) for k, v in ct[c].items()}
            for c in classes
        },
    }


def oracle_psds(ops, classes, alpha_ct, alpha_st, max_efpr):
    """Direct per-grid-point max scan — no sorting, no envelope arrays."""

    def efpr(op, c):
        e = op["fpr"][c]
        if alpha_ct > 0 and op["ctr"][c]:
            e += alpha_ct * float(np.mean(list(op["ctr"][c].values())))
        return e

    grid = sorted(
        {0.0, max_efpr}
        | {efpr(op, c) for op in ops for c in classes if efpr(op, c) <= max_efpr}
    )
    mu = []
    for g in grid:
        tprs = [
            max([0.0] + [op["tpr"][c] for op in ops if efpr(op, c) <= g])
            for c in classes
        ]
        m = float(np.mean(tprs)) - alpha_st * float(np.std(tprs))
        mu.append(max(m, 0.0))
    area = sum(
        mu[i] * (grid[i + 1] - grid[i]) for i in range(len(grid) - 1)
    ) + mu[-1] * (max_efpr - grid[-1])
    return area / max_efpr


# ---------------------------------------------------------------------------
# randomized fixtures
# ---------------------------------------------------------------------------


def _random_events(rng, files, classes, n, min_dur=0.3, clip_len=10.0):
    rows = []
    for _ in range(n):
        on = float(rng.uniform(0, clip_len - min_dur))
        off = float(rng.uniform(on + min_dur, clip_len))
        rows.append(
            (str(rng.choice(files)), on, off, str(rng.choice(classes)))
        )
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_operating_point_counts_match_oracle(seed):
    rng = np.random.default_rng(seed)
    files = [f"f{i}.wav" for i in range(4)]
    classes = ["A", "B", "C"]
    gt_rows = _random_events(rng, files, classes, 12)
    det_rows = _random_events(rng, files, classes, 20)
    gt = pd.DataFrame(gt_rows, columns=COLS)
    meta = pd.DataFrame({"filename": files, "duration": [10.0] * len(files)})

    ev = PSDSEval(dtc_threshold=0.5, gtc_threshold=0.5, cttc_threshold=0.3,
                  ground_truth=gt, metadata=meta)
    got = ev._evaluate_op(pd.DataFrame(det_rows, columns=COLS))
    want = oracle_op(gt_rows, det_rows, ev.classes, ev.total_hours,
                     ev.gt_hours_per_class, 0.5, 0.5, 0.3)
    for c in ev.classes:
        np.testing.assert_allclose(got["tpr"][c], want["tpr"][c], err_msg=c)
        np.testing.assert_allclose(got["fpr"][c], want["fpr"][c], err_msg=c)
        for k in want["ctr"][c]:
            np.testing.assert_allclose(
                got["ctr"][c][k], want["ctr"][c][k], err_msg=f"{c}->{k}"
            )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("alphas", [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0),
                                    (0.5, 0.7)])
def test_psds_area_matches_oracle(seed, alphas):
    """Multi-OP PSDS: thresholded random score sweeps, all three standard
    (alpha_ct, alpha_st) settings plus a mixed one."""
    alpha_ct, alpha_st = alphas
    rng = np.random.default_rng(100 + seed)
    files = [f"f{i}.wav" for i in range(3)]
    classes = ["A", "B"]
    gt_rows = _random_events(rng, files, classes, 10)
    gt = pd.DataFrame(gt_rows, columns=COLS)
    meta = pd.DataFrame({"filename": files, "duration": [10.0] * len(files)})

    ev = PSDSEval(ground_truth=gt, metadata=meta)
    # candidate pool with scores; each operating point keeps score >= thr
    pool = _random_events(rng, files, classes, 30)
    scores = rng.uniform(size=len(pool))
    for thr in (0.2, 0.4, 0.6, 0.8):
        kept = [r for r, s in zip(pool, scores) if s >= thr]
        ev.add_operating_point(pd.DataFrame(kept, columns=COLS))

    got = ev.psds(alpha_ct=alpha_ct, alpha_st=alpha_st, max_efpr=100.0).value
    want = oracle_psds(ev.operating_points, ev.classes, alpha_ct, alpha_st,
                       100.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_detections_in_gt_free_file_count_as_fps():
    """A detection on a clip with NO ground-truth rows is still an FP
    (psds_eval scores every metadata file; regression for the groupby-only
    file iteration)."""
    gt = pd.DataFrame([("f1.wav", 2.0, 6.0, "A")], columns=COLS)
    meta = pd.DataFrame({"filename": ["f1.wav", "f2.wav"],
                         "duration": [10.0, 10.0]})
    ev = PSDSEval(ground_truth=gt, metadata=meta)
    det = pd.DataFrame([("f2.wav", 1.0, 3.0, "A")], columns=COLS)
    op = ev._evaluate_op(det)
    assert op["tpr"]["A"] == 0.0
    np.testing.assert_allclose(op["fpr"]["A"], 1.0 / ev.total_hours)
