"""Pallas TPU kernel for the batched Jonker-Volgenant assignment solve.

The lax/vmap implementation in ``ops/matcher.py`` is correct but sequential-
control-flow bound: ~n^2 tiny fused ops per solve.  This kernel runs one
problem per grid program with the cost matrix and all solver state resident
in VMEM, so the inner Dijkstra iterations are register/VMEM-speed VPU ops
with no HBM traffic.

The algorithm body (:func:`jv_body`) is the classical 1-indexed shortest-
augmenting-path JV with every scatter update reformulated as a masked
``where`` over [1, LANES] row vectors (TPU-friendly: 2-D iota, no dynamic
scatters).  Storage is lane-padded to 128; columns beyond the logical n+1 are
permanently masked.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pragma: no cover - TPU-only import
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

INF = 1.0e18
LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def jv_body(row_getter, C: int, n1: int) -> jnp.ndarray:
    """Solve one padded LSAP.

    Args:
      row_getter: fn(i) -> [1, C] row i of the 1-indexed cost matrix (the
        (n+1)x(n+1) problem sits in the top-left; col 0 unused).  Abstracted
        so the Pallas kernel can read rows straight from the VMEM ref
        (Mosaic has no dynamic_slice on values).
      C: lane-padded width.
      n1: logical n + 1.
    Returns:
      p [1, C]: col -> row (1-indexed) assignment for cols 1..n1-1.
    """
    ids = lax.broadcasted_iota(jnp.int32, (1, C), 1)  # [1, C]
    in_range = (ids >= 1) & (ids < n1)

    def solve_row(i, carry):
        u, v, p = carry  # each [1, C]
        p = jnp.where(ids == 0, i, p)
        minv = jnp.full((1, C), INF, dtype=jnp.float32)
        # masks carried as f32 (Mosaic cannot carry i1 vectors through scf.while)
        used = jnp.zeros((1, C), dtype=jnp.float32)
        way = jnp.zeros((1, C), dtype=jnp.int32)
        row_in_tree = jnp.zeros((1, C), dtype=jnp.float32)
        j0 = jnp.int32(0)

        def at(vec, j):
            return jnp.sum(jnp.where(ids == j, vec, jnp.zeros_like(vec)))

        def cond(state):
            _, _, p, _, _, _, _, j0 = state
            return at(p, j0) != 0

        def body(state):
            u, v, p, minv, used, way, row_in_tree, j0 = state
            used = jnp.maximum(used, (ids == j0).astype(jnp.float32))
            i0 = at(p, j0).astype(jnp.int32)
            row_in_tree = jnp.maximum(
                row_in_tree, (ids == i0).astype(jnp.float32)
            )
            a_row = row_getter(i0)
            u_i0 = at(u, i0)
            cur = a_row - u_i0 - v
            valid = in_range & (used == 0.0)
            better = valid & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(valid, minv, INF)
            j1 = jnp.argmin(masked[0]).astype(jnp.int32)
            delta = jnp.min(masked)
            u = u + delta * row_in_tree
            v = v - delta * used
            minv = minv - delta * (1.0 - used)
            return (u, v, p, minv, used, way, row_in_tree, j1)

        state = (u, v, p, minv, used, way, row_in_tree, j0)
        u, v, p, minv, used, way, row_in_tree, j0 = lax.while_loop(
            cond, body, state
        )

        def aug_cond(state):
            _, j0 = state
            return j0 != 0

        def aug_body(state):
            p, j0 = state
            j1 = at(way, j0).astype(jnp.int32)
            pj1 = at(p, j1).astype(jnp.int32)
            p = jnp.where(ids == j0, pj1, p)
            return (p, j1)

        p, _ = lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p)

    u0 = jnp.zeros((1, C), dtype=jnp.float32)
    v0 = jnp.zeros((1, C), dtype=jnp.float32)
    p0 = jnp.zeros((1, C), dtype=jnp.int32)
    _, _, p = lax.fori_loop(1, n1, solve_row, (u0, v0, p0))
    return p


def _jv_kernel(cost_ref, out_ref, *, n1: int):
    """One grid program = one assignment problem, fully in VMEM.

    Reference formulation; ``solve_lsap`` dispatches the sublane-packed
    kernel below (~3x faster at train-step shapes: 1.25 ms vs 3.8 ms for
    192 problems of n=11).
    """
    C = cost_ref.shape[2]
    row_getter = lambda i0: cost_ref[0, pl.ds(i0, 1), :].astype(jnp.float32)
    p = jv_body(row_getter, C, n1)  # [1, C]
    # output block is [1, 8, C] for sublane alignment; row 0 carries the result
    out_ref[0] = jnp.broadcast_to(p - 1, (8, p.shape[1]))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_hungarian(cost: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched exact LSAP: cost [B, n, n] f32 -> row4col [B, n] int32."""
    b, n, _ = cost.shape
    n1 = n + 1
    R = _round_up(n1, 8)
    C = _round_up(n1, LANES)
    # pad with +INF-ish outside the logical problem; kernel masks by n1
    a = jnp.zeros((b, R, C), jnp.float32).at[:, 1 : n + 1, 1 : n + 1].set(cost)
    mem = pltpu.VMEM if _HAS_PLTPU else None
    kw = {"memory_space": mem} if mem is not None else {}
    out = pl.pallas_call(
        functools.partial(_jv_kernel, n1=n1),
        out_shape=jax.ShapeDtypeStruct((b, 8, C), jnp.int32),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, R, C), lambda i: (i, 0, 0), **kw)],
        out_specs=pl.BlockSpec((1, 8, C), lambda i: (i, 0, 0), **kw),
        interpret=interpret,
    )(a)
    return out[:, 0, 1 : n + 1]


# ---------------------------------------------------------------------------
# Sublane-packed variant: SUBS problems solved simultaneously per program.
#
# The single-problem kernel keeps all state in [1, C] row vectors, using 1/8
# of the VPU's sublanes, and the grid serializes on the one TensorCore per
# chip.  Packing SUBS=8 problems into [SUBS, C] state vectorizes the entire
# Dijkstra iteration across sublanes — 8 problems per vreg op.
#
# Mosaic cannot compile `scf.while` whose carries hold lane-replicated values
# ("Invalid relayout: non-singleton dimension replicated in destination but
# not in source"), which killed the natural data-dependent formulation.  This
# version has NO while loops: the outer row-insertion loop is Python-unrolled
# (n1 is static), and both inner loops are `fori_loop`s with the *exact* JV
# worst-case bounds — inserting row i needs at most i Dijkstra expansions
# (each expansion consumes the virtual root or one of the i-1 already
# assigned columns before reaching a free column) and an augmenting path of
# at most i links.  Per-problem `active`/`walk` masks freeze sub-problems
# that converge early, so total inner work is sum_i i = n(n+1)/2 — the same
# as the while-loop formulation's worst case.  Dynamic row reads become
# one-hot masked sums over the VMEM-resident cost block (no dynamic_slice,
# which Mosaic also can't lower on values).
# ---------------------------------------------------------------------------

# A second packing axis — 4 problems along the 128 lanes (32-lane segments,
# nc1 <= 32) — is implemented below (`_jv_lane_kernel`) and measured 2.5-4.5x
# faster at the trainer geometries (round 5; an earlier estimate here argued
# it couldn't pay, assuming ~40 vreg ops per segment reduction — in practice
# the within-segment min is a log2(32)=5-step masked pltpu.roll butterfly and
# the segment *selects* ride the MXU as one [S,128]x[128,128] block-diagonal
# matmul, so the iteration grows ~2x while serving 4x the problems):
#   [192,10,20]: 4.6 -> 1.02 ms   [384,20,20]: 9.1 -> 3.66 ms
#   [1200,20,20]: 28.5 -> 10.6 ms  (scan-chained microbench, TPU v5e)
# `solve_lsap`'s geometries all have nc1 = 21 <= 32, so the lane-segmented
# kernel is the default dispatch; this sublane-only variant remains the
# fallback for nc1 > 32.  An early-exit scf.while variant is a dead end
# either way: a vector-reduction loop condition costs ~35 us PER ITERATION
# on Mosaic (13x slower overall, measured).
SUBS = 8
LSEG = 32  # lane-segment width of the lane-packed kernel (nc1 <= LSEG)


def _jv_packed_kernel(cost_ref, out_ref, *, nr1: int, nc1: int, subs: int):
    """nr1/nc1: logical rows+1 / cols+1.  Rectangular (nr <= nc) is solved
    directly by inserting only the nr real rows — for SEDT's 10 queries x 20
    target slots that is sum(1..10)=55 Dijkstra expansions instead of the
    square-padded sum(1..20)=210, a ~3.8x iteration cut; columns left free
    report 0 (decoded to -1)."""
    R = cost_ref.shape[2]
    C = cost_ref.shape[3]
    cost = cost_ref[0].astype(jnp.float32)  # [S, R, C], VMEM-resident
    ids = lax.broadcasted_iota(jnp.int32, (subs, C), 1)  # lane index
    rids = lax.broadcasted_iota(jnp.int32, (subs, R), 1)  # sub-row index
    in_range = (ids >= 1) & (ids < nc1)

    def pick(vec, j):  # vec [S, C], j [S, 1] int -> vec[s, j[s]] as [S, 1]
        sel = jnp.where(ids == j, vec.astype(jnp.float32), 0.0)
        return jnp.sum(sel, axis=1, keepdims=True)

    def row_of(i0):  # i0 [S, 1] int -> per-problem cost row [S, C]
        oh = (rids == i0).astype(jnp.float32)  # [S, R]
        return jnp.sum(cost * oh[:, :, None], axis=1)

    def nonrep(x):
        """Force a non-replicated Mosaic layout onto a constant loop init.

        Mosaic gives splat-constant scf.for/scf.while carries a
        *-replicated vector layout; when the body then yields a genuinely
        varying value the required {0,0} -> {*,0} relayout is invalid and
        kills compilation.  Adding a provably-zero iota-derived term (which
        MLIR's folder cannot constant-fold away) pins the init to {0,0}.
        """
        z = jnp.minimum(
            lax.broadcasted_iota(jnp.int32, x.shape, 0)
            + lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1),
            0,
        )
        return x + z.astype(x.dtype)

    u = nonrep(jnp.zeros((subs, C), jnp.float32))
    v = nonrep(jnp.zeros((subs, C), jnp.float32))
    # col -> row assignment, 1-indexed
    p = nonrep(jnp.zeros((subs, C), jnp.int32))

    for i in range(1, nr1):  # insert row i (static unroll: nr is small)
        p = jnp.where(ids == 0, i, p)

        def dij(_, st, p=p):
            u, v, minv, used, way, row_in_tree, j0, active = st
            act = active > 0.0  # [S, 1]
            used = jnp.where(act & (ids == j0), 1.0, used)
            i0 = pick(p, j0).astype(jnp.int32)  # [S, 1]
            row_in_tree = jnp.where(act & (ids == i0), 1.0, row_in_tree)
            cur = row_of(i0) - pick(u, i0) - v
            valid = in_range & (used == 0.0)
            better = act & valid & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(valid, minv, INF)
            delta = jnp.min(masked, axis=1, keepdims=True)  # [S, 1]
            j1 = jnp.min(
                jnp.where(masked <= delta, ids, nc1 + C), axis=1, keepdims=True
            )
            delta = jnp.where(act, delta, 0.0)  # avoid 0 * INF below
            u = u + delta * row_in_tree * active
            v = v - delta * used * active
            minv = minv - delta * (1.0 - used) * active
            j0 = jnp.where(act, j1, j0)
            active = jnp.where(act & (pick(p, j1) != 0.0), 1.0, 0.0)
            return (u, v, minv, used, way, row_in_tree, j0, active)

        st = (
            u,
            v,
            nonrep(jnp.full((subs, C), INF, jnp.float32)),  # minv
            nonrep(jnp.zeros((subs, C), jnp.float32)),  # used
            nonrep(jnp.zeros((subs, C), jnp.int32)),  # way
            nonrep(jnp.zeros((subs, C), jnp.float32)),  # row_in_tree
            nonrep(jnp.zeros((subs, 1), jnp.int32)),  # j0
            nonrep(jnp.ones((subs, 1), jnp.float32)),  # active
        )
        u, v, _, _, way, _, j0, _ = lax.fori_loop(0, i, dij, st)

        def aug(_, st):
            p, j0, walk = st
            act = walk > 0.0  # [S, 1]
            j1 = pick(way, j0).astype(jnp.int32)
            pj1 = pick(p, j1).astype(jnp.int32)
            p = jnp.where(act & (ids == j0), pj1, p)
            j0 = jnp.where(act, j1, j0)
            walk = jnp.where(act & (j0 != 0), 1.0, 0.0)
            return (p, j0, walk)

        p, _, _ = lax.fori_loop(
            0, i, aug, (p, j0, nonrep(jnp.ones((subs, 1), jnp.float32)))
        )

    out_ref[0] = p - 1


def _roll(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Cyclic roll along the lane axis: out[..., i] = x[..., i - shift]."""
    if _HAS_PLTPU:
        return pltpu.roll(x, shift, 1)
    return jnp.roll(x, shift, axis=1)  # pragma: no cover - CPU fallback


def _jv_lane_kernel(cost_ref, out_ref, *, nr1: int, nc1: int, subs: int,
                    lseg: int):
    """Lane-segmented + sublane-packed JV: subs * (LANES // lseg) problems
    per grid program, each in an lseg-lane segment of the 128-lane vregs.

    Same masked-vector JV as :func:`_jv_packed_kernel`, with the two scalar-
    per-problem reductions turned into segment-local ones:
      * segment select/broadcast (``pick``, ``row_of``) — one-hot mask then
        an MXU matmul against a [C, C] block-diagonal ones matrix;
      * segment min (``delta``, ``j1``) — a log2(lseg)-step butterfly of
        masked intra-segment cyclic rolls.
    All per-problem scalars (j0, i0, delta, active) therefore live as
    segment-replicated f32 lanes; ids stay f32 (exact to 2^24) because the
    MXU path is f32.
    """
    R = cost_ref.shape[2]
    C = cost_ref.shape[3]
    cost = cost_ref[0].astype(jnp.float32)  # [S, R, C], VMEM-resident
    lane = lax.broadcasted_iota(jnp.int32, (subs, C), 1)
    lp32 = lane % lseg  # column index within the segment (0 = virtual root)
    in_range = (lp32 >= 1) & (lp32 < nc1)

    li = lax.broadcasted_iota(jnp.int32, (C, C), 0)
    lj = lax.broadcasted_iota(jnp.int32, (C, C), 1)
    segmat = ((li // lseg) == (lj // lseg)).astype(jnp.float32)  # [C, C]

    def seg_sum(x):  # [S, C] f32 -> segment sums broadcast to every lane
        return jnp.dot(x, segmat, preferred_element_type=jnp.float32)

    def pick(vec, j):  # vec[s, seg_start + j] broadcast over the segment
        sel = jnp.where(lp32 == j, vec.astype(jnp.float32), 0.0)
        return seg_sum(sel)

    def seg_min(x):  # [S, C] f32 -> segment min broadcast to every lane
        s = lseg // 2
        while s >= 1:
            r1 = _roll(x, C - s)     # lane l <- x[l + s (mod C)]
            r2 = _roll(x, lseg - s)  # lane l <- x[l + s - lseg]: seg wrap
            x = jnp.minimum(x, jnp.where(lp32 < lseg - s, r1, r2))
            s //= 2
        return x

    def nonrep(x):  # see _jv_packed_kernel.nonrep
        z = jnp.minimum(
            lax.broadcasted_iota(jnp.int32, x.shape, 0)
            + lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1),
            0,
        )
        return x + z.astype(x.dtype)

    u = nonrep(jnp.zeros((subs, C), jnp.float32))
    v = nonrep(jnp.zeros((subs, C), jnp.float32))
    p = nonrep(jnp.zeros((subs, C), jnp.float32))  # col -> row, 1-indexed

    for i in range(1, nr1):  # insert row i (static unroll: nr is small)
        p = jnp.where(lp32 == 0, float(i), p)

        def dij(_, st, p=p):
            u, v, minv, used, way, row_in_tree, j0, active = st
            act = active > 0.0  # [S, C] segment-replicated
            used = jnp.where(act & (lp32 == j0), 1.0, used)
            i0 = pick(p, j0)  # [S, C] f32 row id, segment-replicated
            row_in_tree = jnp.where(act & (lp32 == i0), 1.0, row_in_tree)
            # select row i0 of each segment's (R x lseg) block
            a_row = jnp.zeros((subs, C), jnp.float32)
            for r in range(1, nr1):
                a_row = a_row + jnp.where(i0 == float(r), cost[:, r, :], 0.0)
            cur = a_row - pick(u, i0) - v
            valid = in_range & (used == 0.0)
            better = act & valid & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(valid, minv, INF)
            delta = seg_min(masked)
            j1 = seg_min(
                jnp.where(masked <= delta, lp32.astype(jnp.float32), 2.0 * C)
            )
            delta = jnp.where(act, delta, 0.0)  # avoid 0 * INF below
            u = u + delta * row_in_tree * active
            v = v - delta * used * active
            minv = minv - delta * (1.0 - used) * active
            j0 = jnp.where(act, j1, j0)
            active = jnp.where(act & (pick(p, j1) != 0.0), 1.0, 0.0)
            return (u, v, minv, used, way, row_in_tree, j0, active)

        st = (
            u,
            v,
            nonrep(jnp.full((subs, C), INF, jnp.float32)),  # minv
            nonrep(jnp.zeros((subs, C), jnp.float32)),  # used
            nonrep(jnp.zeros((subs, C), jnp.float32)),  # way (f32 col ids)
            nonrep(jnp.zeros((subs, C), jnp.float32)),  # row_in_tree
            nonrep(jnp.zeros((subs, C), jnp.float32)),  # j0
            nonrep(jnp.ones((subs, C), jnp.float32)),  # active
        )
        u, v, _, _, way, _, j0, _ = lax.fori_loop(0, i, dij, st)

        def aug(_, st):
            p, j0, walk = st
            act = walk > 0.0
            j1 = pick(way, j0)
            pj1 = pick(p, j1)
            p = jnp.where(act & (lp32 == j0), pj1, p)
            j0 = jnp.where(act, j1, j0)
            walk = jnp.where(act & (j0 != 0.0), 1.0, 0.0)
            return (p, j0, walk)

        p, _, _ = lax.fori_loop(
            0, i, aug, (p, j0, nonrep(jnp.ones((subs, C), jnp.float32)))
        )

    out_ref[0] = p.astype(jnp.int32) - 1


def _lane_packed(cost: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    b, nr, nc = cost.shape
    nr1, nc1 = nr + 1, nc + 1
    R = _round_up(nr1, 8)
    lp = LANES // LSEG  # problems per lane-segment row
    per = SUBS * lp  # problems per grid program
    g = -(-b // per)
    a = jnp.zeros((g * per, R, LSEG), jnp.float32)
    a = a.at[:b, 1 : nr + 1, 1 : nc + 1].set(cost)
    # problem index b = (g*S + s)*lp + l  ->  [g, S, R, lp*lseg]
    a = a.reshape(g, SUBS, lp, R, LSEG).transpose(0, 1, 3, 2, 4)
    a = a.reshape(g, SUBS, R, LANES)
    mem = pltpu.VMEM if _HAS_PLTPU else None
    kw = {"memory_space": mem} if mem is not None else {}
    out = pl.pallas_call(
        functools.partial(
            _jv_lane_kernel, nr1=nr1, nc1=nc1, subs=SUBS, lseg=LSEG
        ),
        out_shape=jax.ShapeDtypeStruct((g, SUBS, LANES), jnp.int32),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, SUBS, R, LANES), lambda i: (i, 0, 0, 0), **kw)],
        out_specs=pl.BlockSpec((1, SUBS, LANES), lambda i: (i, 0, 0), **kw),
        interpret=interpret,
    )(a)
    out = out.reshape(g, SUBS, lp, LSEG).reshape(g * per, LSEG)
    return out[:b, 1 : nc + 1]


def _sublane_packed(cost: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    b, nr, nc = cost.shape
    nr1, nc1 = nr + 1, nc + 1
    R = _round_up(nr1, 8)
    C = _round_up(nc1, LANES)
    g = -(-b // SUBS)  # programs
    a = jnp.zeros((g * SUBS, R, C), jnp.float32)
    a = a.at[:b, 1 : nr + 1, 1 : nc + 1].set(cost)
    a = a.reshape(g, SUBS, R, C)
    mem = pltpu.VMEM if _HAS_PLTPU else None
    kw = {"memory_space": mem} if mem is not None else {}
    out = pl.pallas_call(
        functools.partial(_jv_packed_kernel, nr1=nr1, nc1=nc1, subs=SUBS),
        out_shape=jax.ShapeDtypeStruct((g, SUBS, C), jnp.int32),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, SUBS, R, C), lambda i: (i, 0, 0, 0), **kw)],
        out_specs=pl.BlockSpec((1, SUBS, C), lambda i: (i, 0, 0), **kw),
        interpret=interpret,
    )(a)
    return out.reshape(g * SUBS, C)[:b, 1 : nc + 1]


@functools.partial(jax.jit, static_argnames=("interpret", "force_sublane"))
def pallas_hungarian_packed(
    cost: jnp.ndarray, interpret: bool = False, force_sublane: bool = False
) -> jnp.ndarray:
    """Batched exact LSAP, SUBS (sublane) x 4 (lane-segment) problems per
    grid program when nc + 1 <= LSEG (every trainer geometry), else SUBS.

    cost [B, nr, nc] f32 with nr <= nc -> row4col [B, nc] int32: for each
    column the assigned row, or -1 for the nc-nr columns left unassigned.
    Square inputs behave exactly like the previous square-only version
    (every column assigned).  B is padded up to the pack factor internally.
    ``force_sublane`` pins the sublane-only kernel (testing/fallback).
    """
    b, nr, nc = cost.shape
    assert nr <= nc, "rectangular solve requires rows <= cols (transpose)"
    if nc + 1 <= LSEG and not force_sublane:
        return _lane_packed(cost, interpret)
    return _sublane_packed(cost, interpret)
