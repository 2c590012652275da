"""Randomized cross-check of metrics/event_based.py against brute-force oracles.

The golden tests (test_encoder_metrics.py) pin hand-derived values; this file
adds structurally independent re-implementations of the sed_eval event-based
and segment-based scoring rules (the reference's acceptance oracle,
/root/reference/utilities/metrics.py:43-116) and fuzzes them against the
production scorers over randomized event sets, the same protocol as
test_psds_crosscheck.py.

Deliberate independence from the production code:
  * unique matching by Kuhn's augmenting-path maximum bipartite matching on
    the boolean hit graph — the production code reduces to a min-cost
    rectangular LSAP over (1 - hit), whose hit-count it CLAIMS equals the
    maximum matching cardinality (event_based.py:37-59); this test checks
    that claim rather than assuming it;
  * collar predicates evaluated per pair in pure Python floats;
  * segment activity from interval overlap per (segment, event) pair instead
    of floor/ceil index arithmetic;
  * accumulation in per-(class, stat) dicts built per file from scratch.

Fuzz cases snap a fraction of times to a coarse grid so exact-collar ties
(|onset_est - onset_ref| == t_collar) and duplicate events occur, and draw
durations across the percentage_of_length crossover (dur < or > t_collar /
percentage_of_length, i.e. the max() picking either arm).
"""
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.metrics.event_based import (
    EventBasedMetrics,
    SegmentBasedMetrics,
)

CLASSES = ["A", "B", "C"]


# ---------------------------------------------------------------------------
# oracle: event-based
# ---------------------------------------------------------------------------


def _kuhn_max_matching(adj):
    """Maximum bipartite matching cardinality; adj[i] = iterable of right ids."""
    match_r = {}

    def try_augment(i, seen):
        for j in adj[i]:
            if j in seen:
                continue
            seen.add(j)
            if j not in match_r or try_augment(match_r[j], seen):
                match_r[j] = i
                return True
        return False

    return sum(try_augment(i, set()) for i in range(len(adj)))


def oracle_event_scores(files_ref, files_est, classes, t_collar, pct):
    """Accumulate Nref/Nsys/Ntp over files from flat (on, off, label) tuples,
    then P/R/F per class and macro averages — sed_eval semantics."""
    stats = {c: [0, 0, 0] for c in classes}  # Nref, Nsys, Ntp
    for ref_rows, est_rows in zip(files_ref, files_est):
        for c in classes:
            ref = [(on, off) for on, off, lab in ref_rows if lab == c]
            est = [(on, off) for on, off, lab in est_rows if lab == c]
            adj = []
            for eon, eoff in est:
                ok = []
                for k, (ron, roff) in enumerate(ref):
                    off_col = max(t_collar, pct * (roff - ron))
                    if abs(eon - ron) <= t_collar and abs(eoff - roff) <= off_col:
                        ok.append(k)
                adj.append(ok)
            stats[c][0] += len(ref)
            stats[c][1] += len(est)
            stats[c][2] += _kuhn_max_matching(adj)
    per_class = {}
    for c, (nref, nsys, ntp) in stats.items():
        denom = nref + nsys
        per_class[c] = {
            "f": 2.0 * ntp / denom if denom else 0.0,
            "p": ntp / nsys if nsys else 0.0,
            "r": ntp / nref if nref else 0.0,
        }
    macro = {
        k: float(np.mean([v[k] for v in per_class.values()]))
        for k in ("f", "p", "r")
    }
    return per_class, macro


# ---------------------------------------------------------------------------
# oracle: segment-based
# ---------------------------------------------------------------------------


def oracle_segment_scores(files_ref, files_est, classes, res):
    """Segment activity by interval overlap (zero-length events activate the
    segment containing their onset, matching the lo+1 guard)."""

    def active(rows, c, k):
        for on, off, lab in rows:
            if lab != c:
                continue
            if off > on:
                if min(off, (k + 1) * res) - max(on, k * res) > 0:
                    return True
            elif int(np.floor(on / res)) == k:
                return True
        return False

    stats = {c: [0, 0, 0] for c in classes}
    for ref_rows, est_rows in zip(files_ref, files_est):
        max_off = max(
            [off for _, off, _ in list(ref_rows) + list(est_rows)] + [0.0]
        )
        n_seg = max(int(np.ceil(max_off / res)), 1)
        for c in classes:
            for k in range(n_seg):
                r = active(ref_rows, c, k)
                s = active(est_rows, c, k)
                stats[c][0] += r
                stats[c][1] += s
                stats[c][2] += r and s
    per_class = {}
    for c, (nref, nsys, ntp) in stats.items():
        denom = nref + nsys
        per_class[c] = {
            "f": 2.0 * ntp / denom if denom else 0.0,
            "p": ntp / nsys if nsys else 0.0,
            "r": ntp / nref if nref else 0.0,
        }
    macro = {
        k: float(np.mean([v[k] for v in per_class.values()]))
        for k in ("f", "p", "r")
    }
    return per_class, macro


# ---------------------------------------------------------------------------
# randomized fixtures
# ---------------------------------------------------------------------------


def _random_file(rng, n_events, clip_len=10.0, grid=None, classes=CLASSES):
    """(on, off, label) tuples; `grid` snaps times to multiples (collar ties)."""
    rows = []
    for _ in range(n_events):
        # durations straddle the pct*len vs t_collar crossover (1.0 s at
        # defaults) and include very short events
        dur = float(rng.choice([0.05, 0.2, 0.5, 1.0, 1.5, 3.0])) * float(
            rng.uniform(0.9, 1.1)
        )
        on = float(rng.uniform(0, clip_len - dur))
        if grid:
            on, dur = round(on / grid) * grid, max(round(dur / grid) * grid, grid)
        rows.append((on, on + dur, str(rng.choice(classes))))
    return rows


def _to_records(rows):
    return [
        {"event_label": lab, "onset": on, "offset": off} for on, off, lab in rows
    ]


@pytest.mark.parametrize("seed", range(25))
@pytest.mark.parametrize("grid", [None, 0.2])
def test_event_based_matches_oracle(seed, grid):
    """50 randomized multi-file cases (grid=0.2 makes |Δonset| == t_collar
    exact ties and duplicate events common) vs the Kuhn-matching oracle."""
    rng = np.random.default_rng(seed if grid is None else 1000 + seed)
    n_files = int(rng.integers(1, 5))
    files_ref = [_random_file(rng, int(rng.integers(0, 7)), grid=grid)
                 for _ in range(n_files)]
    files_est = [_random_file(rng, int(rng.integers(0, 9)), grid=grid)
                 for _ in range(n_files)]

    ev = EventBasedMetrics(CLASSES, t_collar=0.200, percentage_of_length=0.2)
    for ref, est in zip(files_ref, files_est):
        ev.evaluate(_to_records(ref), _to_records(est))
    want_cw, want_macro = oracle_event_scores(
        files_ref, files_est, CLASSES, 0.200, 0.2
    )

    got_cw = ev.class_wise()
    for c in CLASSES:
        np.testing.assert_allclose(got_cw[c]["f_measure"], want_cw[c]["f"],
                                   err_msg=c)
        np.testing.assert_allclose(got_cw[c]["precision"], want_cw[c]["p"],
                                   err_msg=c)
        np.testing.assert_allclose(got_cw[c]["recall"], want_cw[c]["r"],
                                   err_msg=c)
    got = ev.results_class_wise_average_metrics()["f_measure"]
    np.testing.assert_allclose(got["f_measure"], want_macro["f"])
    np.testing.assert_allclose(got["precision"], want_macro["p"])
    np.testing.assert_allclose(got["recall"], want_macro["r"])


@pytest.mark.parametrize("seed", range(25))
@pytest.mark.parametrize("res", [1.0, 0.35])
def test_segment_based_matches_oracle(seed, res):
    """50 randomized cases vs the interval-overlap segment oracle, at the
    standard 1 s resolution and a non-divisor one (boundary rounding)."""
    rng = np.random.default_rng(2000 + seed)
    n_files = int(rng.integers(1, 5))
    files_ref = [_random_file(rng, int(rng.integers(0, 7)),
                              grid=0.5 if seed % 3 == 0 else None)
                 for _ in range(n_files)]
    files_est = [_random_file(rng, int(rng.integers(0, 9)),
                              grid=0.5 if seed % 3 == 0 else None)
                 for _ in range(n_files)]

    sg = SegmentBasedMetrics(CLASSES, time_resolution=res)
    for ref, est in zip(files_ref, files_est):
        sg.evaluate(_to_records(ref), _to_records(est))
    want_cw, want_macro = oracle_segment_scores(files_ref, files_est, CLASSES,
                                                res)
    got_cw = sg.class_wise()
    for c in CLASSES:
        for k, kk in (("f_measure", "f"), ("precision", "p"), ("recall", "r")):
            np.testing.assert_allclose(got_cw[c][k], want_cw[c][kk],
                                       err_msg=f"{c}:{k}")
    got = sg.results_class_wise_average_metrics()["f_measure"]
    np.testing.assert_allclose(got["f_measure"], want_macro["f"])


def test_event_collar_boundary_exact():
    """|Δonset| exactly t_collar matches; epsilon past it does not; the offset
    collar is max(t_collar, pct·len) — long events get the percentage arm."""
    ev = EventBasedMetrics(["A"], t_collar=0.2, percentage_of_length=0.2)
    ref = [{"event_label": "A", "onset": 1.0, "offset": 6.0}]  # len 5 → ±1.0
    est = [{"event_label": "A", "onset": 1.2, "offset": 7.0}]  # Δ=0.2, Δ=1.0
    ev.evaluate(ref, est)
    assert ev.stats["A"]["Ntp"] == 1
    ev2 = EventBasedMetrics(["A"], t_collar=0.2, percentage_of_length=0.2)
    est2 = [{"event_label": "A", "onset": 1.2000001, "offset": 7.0}]
    ev2.evaluate(ref, est2)
    assert ev2.stats["A"]["Ntp"] == 0
    # short event: percentage arm (0.2*0.5=0.1) loses to t_collar 0.2
    ev3 = EventBasedMetrics(["A"], t_collar=0.2, percentage_of_length=0.2)
    ref3 = [{"event_label": "A", "onset": 2.0, "offset": 2.5}]
    est3 = [{"event_label": "A", "onset": 2.0, "offset": 2.69}]  # Δoff=0.19
    ev3.evaluate(ref3, est3)
    assert ev3.stats["A"]["Ntp"] == 1


def test_event_unique_matching_prefers_cardinality():
    """Two estimates both inside one reference's collar but only one of two
    references reachable: greedy-by-order would double-count; maximum matching
    must yield 2 TPs by routing each estimate to a different reference."""
    ev = EventBasedMetrics(["A"], t_collar=0.5, percentage_of_length=0.0)
    ref = [
        {"event_label": "A", "onset": 1.0, "offset": 2.0},
        {"event_label": "A", "onset": 1.4, "offset": 2.4},
    ]
    # est0 reaches both refs; est1 reaches only ref0 → est0 MUST take ref1
    est = [
        {"event_label": "A", "onset": 1.2, "offset": 2.2},
        {"event_label": "A", "onset": 0.9, "offset": 1.9},
    ]
    ev.evaluate(ref, est)
    assert ev.stats["A"]["Ntp"] == 2
