"""Matcher tests: exact LSAP parity vs scipy + dense assignment semantics
(the on-device replacement for /root/reference/sedt/matcher.py:92-95)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from sound_event_detection_transformer_tpu.ops.matcher import (
    BIG,
    batched_hungarian,
    compute_cost_matrix,
    match,
)


def test_hungarian_optimal_cost_parity(rng):
    N, B = 22, 32
    costs = np.full((B, N, N), BIG, dtype=np.float32)
    sizes = rng.randint(2, N + 1, size=B)
    for b in range(B):
        n = sizes[b]
        costs[b, :n, :n] = rng.randn(n, n) * rng.uniform(0.1, 10)
    out = np.asarray(jax.jit(batched_hungarian)(jnp.asarray(costs)))
    for b in range(B):
        r, c = linear_sum_assignment(costs[b])
        scipy_cost = costs[b][r, c].sum()
        ours = sum(costs[b][out[b, j], j] for j in range(N))
        assert abs(ours - scipy_cost) <= 1e-2 * max(1.0, abs(scipy_cost))


def _random_problem(rng, B=3, Q=10, C=5, M=6):
    logits = jnp.asarray(rng.randn(B, Q, C + 1), jnp.float32)
    boxes = jax.nn.sigmoid(jnp.asarray(rng.randn(B, Q, 2), jnp.float32))
    tl = jnp.asarray(rng.randint(0, C, (B, M)), jnp.int32)
    tb = jax.nn.sigmoid(jnp.asarray(rng.randn(B, M, 2), jnp.float32))
    return logits, boxes, tl, tb


def test_match_against_scipy_full_pipeline(rng):
    """Dense match == scipy assignment on the same cost matrix."""
    logits, boxes, tl, tb = _random_problem(rng)
    B, Q, M = boxes.shape[0], boxes.shape[1], tl.shape[1]
    valid = jnp.asarray(rng.rand(B, M) < 0.7)
    cost = np.asarray(
        compute_cost_matrix(logits, boxes, tl, tb, valid, 1.0, 5.0, 2.0)
    )
    res = match(logits, boxes, tl, tb, valid)
    for b in range(B):
        cols = np.where(np.asarray(valid[b]))[0]
        if len(cols) == 0:
            assert not np.asarray(res.query_matched[b]).any()
            continue
        r, c = linear_sum_assignment(cost[b][:, cols])
        scipy_cost = cost[b][:, cols][r, c].sum()
        ours_pairs = [
            (q, int(res.tgt_for_query[b, q]))
            for q in range(Q)
            if bool(res.query_matched[b, q])
        ]
        assert len(ours_pairs) == min(Q, len(cols))
        ours_cost = sum(cost[b][q, t] for q, t in ours_pairs)
        assert abs(ours_cost - scipy_cost) <= 1e-2 * max(1.0, abs(scipy_cost))


def test_match_ratio_coef(rng):
    logits, boxes, tl, tb = _random_problem(rng, B=2, Q=6, C=3, M=4)
    valid = jnp.ones((2, 4), bool)
    ratio = jnp.asarray(rng.rand(2, 4), jnp.float32)
    res = match(logits, boxes, tl, tb, valid, tgt_ratio=ratio)
    # every valid target matched (Q > M); coef == its ratio
    np.testing.assert_allclose(
        np.asarray(res.num_boxes), np.asarray(ratio.sum(-1)), atol=1e-5
    )


def test_match_normalize_gives_unit_coef(rng):
    logits, boxes, tl, tb = _random_problem(rng, B=2, Q=6, C=3, M=4)
    valid = jnp.ones((2, 4), bool)
    res = match(logits, boxes, tl, tb, valid, normalize=True)
    got = np.asarray(res.coef)[np.asarray(res.query_matched)]
    np.testing.assert_allclose(got, 1.0, atol=1e-6)  # 1-1 matching -> counts 1


def test_focal_cost_changes_assignment_shape(rng):
    logits, boxes, tl, tb = _random_problem(rng)
    valid = jnp.ones(tl.shape, bool)
    res = match(logits, boxes, tl, tb, valid, focal=True)
    assert np.asarray(res.query_matched).sum(-1).tolist() == [6, 6, 6]


def test_fine_tune_relaxed_matching_adds_queries(rng):
    logits, boxes, tl, tb = _random_problem(rng, B=2, Q=8, C=3, M=2)
    valid = jnp.ones((2, 2), bool)
    base = match(logits, boxes, tl, tb, valid)
    # epsilon huge + alpha huge: every query reserved and kept
    relaxed = match(
        logits, boxes, tl, tb, valid,
        fine_tune=True, epsilon=1e6, alpha=1e6, rng=jax.random.PRNGKey(0),
    )
    assert np.asarray(relaxed.query_matched).all()
    # nearest-gt assignment for extra queries is a valid target index
    assert (np.asarray(relaxed.tgt_for_query) >= 0).all()
    assert (np.asarray(relaxed.tgt_for_query) < 2).all()
    # epsilon tiny: only originally-matched queries that pass epsilon remain
    tight = match(
        logits, boxes, tl, tb, valid,
        fine_tune=True, epsilon=-1e6, alpha=1e6, rng=jax.random.PRNGKey(0),
    )
    assert not np.asarray(tight.query_matched).any()


def test_pallas_hungarian_interpret_parity(rng):
    """The VMEM-resident Pallas JV kernel (interpret mode) is exact."""
    from sound_event_detection_transformer_tpu.ops.pallas.hungarian import (
        pallas_hungarian,
    )

    N, B = 16, 8
    costs = np.full((B, N, N), BIG, dtype=np.float32)
    for b in range(B):
        n = rng.randint(2, N + 1)
        costs[b, :n, :n] = rng.randn(n, n) * rng.uniform(0.1, 10)
    out = np.asarray(pallas_hungarian(jnp.asarray(costs), interpret=True))
    for b in range(B):
        r, c = linear_sum_assignment(costs[b])
        sc = costs[b][r, c].sum()
        op = sum(costs[b][out[b, j], j] for j in range(N))
        assert abs(op - sc) <= 1e-2 * max(1.0, abs(sc))


def test_pallas_hungarian_packed_interpret_parity(rng):
    """Sublane-packed JV kernel parity (interpret mode; this is the kernel
    solve_lsap dispatches on TPU)."""
    from sound_event_detection_transformer_tpu.ops.pallas.hungarian import (
        pallas_hungarian_packed,
    )

    N, B = 14, 11  # odd B exercises the SUBS padding
    costs = np.full((B, N, N), BIG, dtype=np.float32)
    for b in range(B):
        n = rng.randint(2, N + 1)
        costs[b, :n, :n] = rng.randn(n, n) * rng.uniform(0.1, 10)
    out = np.asarray(pallas_hungarian_packed(jnp.asarray(costs), interpret=True))
    for b in range(B):
        r, c = linear_sum_assignment(costs[b])
        sc = costs[b][r, c].sum()
        op = sum(costs[b][out[b, j], j] for j in range(N))
        assert abs(op - sc) <= 1e-2 * max(1.0, abs(sc))


def test_pallas_hungarian_packed_rectangular(rng):
    """Rectangular solve (rows inserted = Q only) is optimal-cost-exact vs
    scipy's rectangular linear_sum_assignment; free columns report -1."""
    from sound_event_detection_transformer_tpu.ops.pallas.hungarian import (
        pallas_hungarian_packed,
    )

    for Q, M, B in ((10, 20, 9), (3, 7, 4), (1, 5, 2), (8, 8, 3)):
        costs = (rng.randn(B, Q, M) * rng.uniform(0.1, 10)).astype(np.float32)
        out = np.asarray(
            pallas_hungarian_packed(jnp.asarray(costs), interpret=True)
        )
        assert out.shape == (B, M)
        for b in range(B):
            r, c = linear_sum_assignment(costs[b])
            sc = costs[b][r, c].sum()
            assigned = [(out[b, j], j) for j in range(M) if out[b, j] >= 0]
            assert len(assigned) == Q  # every row matched exactly once
            assert sorted(q for q, _ in assigned) == list(range(Q))
            op = sum(costs[b][q, j] for q, j in assigned)
            assert abs(op - sc) <= 1e-2 * max(1.0, abs(sc)), (Q, M, b)


def test_assign_rectangular_orientations(rng):
    """assign() agrees with scipy for Q<M and Q>M (CPU square-pad path)."""
    from sound_event_detection_transformer_tpu.ops.matcher import assign

    for Q, M in ((4, 9), (9, 4)):
        B = 3
        costs = rng.randn(B, Q, M).astype(np.float32)
        valid = rng.rand(B, M) < 0.7
        valid[:, 0] = True
        masked = np.where(valid[:, None, :], costs, BIG)
        t4q, qm, q4t, tm = (
            np.asarray(x) for x in assign(jnp.asarray(masked), jnp.asarray(valid))
        )
        for b in range(B):
            r, c = linear_sum_assignment(masked[b])
            pairs = {(int(q), int(t)) for q, t in zip(r, c)
                     if valid[b, t] and masked[b, q, t] < BIG / 2}
            got = {(int(q), int(t4q[b, q])) for q in range(Q) if qm[b, q]}
            # optimal cost equality (assignments may tie-swap)
            sc = sum(masked[b][q, t] for q, t in pairs)
            op = sum(masked[b][q, t] for q, t in got)
            assert len(got) == len(pairs), (Q, M, b, got, pairs)
            assert abs(op - sc) <= 1e-2 * max(1.0, abs(sc))
            # inverse mapping consistency
            for q, t in got:
                assert q4t[b, t] == q and tm[b, t]


def test_pallas_hungarian_packed_edge_sizes(rng):
    """Degenerate n=1 and the DCASE shape n=21 (num_queries 20 + 1 pad)."""
    from sound_event_detection_transformer_tpu.ops.pallas.hungarian import (
        pallas_hungarian_packed,
    )

    for N, B in ((1, 3), (21, 8)):
        costs = rng.randn(B, N, N).astype(np.float32)
        out = np.asarray(
            pallas_hungarian_packed(jnp.asarray(costs), interpret=True)
        )
        for b in range(B):
            r, c = linear_sum_assignment(costs[b])
            sc = costs[b][r, c].sum()
            op = sum(costs[b][out[b, j], j] for j in range(N))
            assert abs(op - sc) <= 1e-2 * max(1.0, abs(sc)), (N, b)


def test_pallas_hungarian_packed_dispatch_paths(rng):
    """Lane-segmented (nc+1 <= 32), forced-sublane, and wide-auto-fallback
    (nc+1 > 32) paths all agree with scipy and with each other."""
    from sound_event_detection_transformer_tpu.ops.pallas.hungarian import (
        LSEG,
        pallas_hungarian_packed,
    )

    def check(costs, **kw):
        B, Q, M = costs.shape
        out = np.asarray(
            pallas_hungarian_packed(jnp.asarray(costs), interpret=True, **kw)
        )
        assert out.shape == (B, M)
        for b in range(B):
            r, c = linear_sum_assignment(costs[b])
            sc = costs[b][r, c].sum()
            assigned = [(out[b, j], j) for j in range(M) if out[b, j] >= 0]
            assert len(assigned) == Q
            op = sum(costs[b][q, j] for q, j in assigned)
            assert abs(op - sc) <= 1e-2 * max(1.0, abs(sc)), (Q, M, b)
        return out

    # B=37 exercises padding to the 32-problems/program lane pack factor
    costs = (rng.randn(37, 10, 20) * rng.uniform(0.1, 10)).astype(np.float32)
    lane = check(costs)
    sub = check(costs, force_sublane=True)
    np.testing.assert_array_equal(lane, sub)  # identical tie-breaking
    # lseg boundary: nc = LSEG - 1 is the widest lane-packed problem
    check((rng.randn(5, 8, LSEG - 1) * 3).astype(np.float32))
    # nc + 1 > LSEG auto-falls back to the sublane kernel
    check((rng.randn(5, 10, 40) * 3).astype(np.float32))
