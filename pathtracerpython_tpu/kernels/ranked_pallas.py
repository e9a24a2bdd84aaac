"""Per-ray ranked-round traversal — exact-work intersection sweeps.

The cluster-sparse path (kernels/sparse_pallas.py) executes the UNION of
a 512-lane block's candidate clusters: measured on the 100k-triangle box
field, that is ~46 clusters per lane against a per-ray exact mean of
2-6 with front-to-back termination — an ~8-25x block-granularity tax the
sort-key study showed cannot be sorted away (docs/PERFORMANCE.md).

This module restructures the sweep around PER-RAY candidate lists:

1. **Candidate build (XLA, chunked)**: every ray slab-tests every
   cluster AABB once and keeps its ``kmax`` nearest candidates sorted by
   exact per-ray entry distance (``lax.top_k``), plus the entry bounds
   themselves — the per-ray analogue of the block candidate list.
2. **Ranked rounds**: round ``r`` sorts the wavefront by each lane's
   rank-``r`` cluster id, so a 512-lane block holds at most a few
   DISTINCT clusters — its work list is those segments, not a block
   union. The existing sparse kernels run unchanged on the gathered
   lanes; results scatter back through the sort order and merge with the
   running best via the same order-independent lexicographic (t, index)
   minimum. A lane is finished when its best beats its next candidate's
   entry bound (the classic front-to-back BVH termination, now exact per
   ray); finished lanes key to the end of the next sort and stop
   generating work.
3. **Residue**: lanes still unfinished after ``ROUNDS`` rounds (deep
   tails), and rays whose candidate count overflowed ``kmax``, fall back
   to the exact cluster-sparse sweep on the compacted survivor set —
   never dropping a candidate, so results stay bit-identical to the
   dense megakernel.

Executed Möller–Trumbore work approaches the per-ray exact optimum at
the cost of one wavefront sort + gather per round — the structure GPU
wavefront tracers get from per-warp ray binning, built TPU-style from
XLA sorts around a static-grid Pallas kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from pathtracerpython_tpu.kernels.intersect_pallas import BIG
from pathtracerpython_tpu.kernels import sparse_pallas as sp
from pathtracerpython_tpu.kernels.sparse_pallas import (
    CHUNK_RB,
    IMAX,
    R_BLK,
    SLAB_EPS,
    W_SMEM_ENTRIES,
    _ACT_BIT,
    _CL_BITS,
    _SEG_BIT,
    _check_limits,
    _pack_for_sparse,
    _pad_repeat_last,
    _scatter_packed,
    cluster_aabbs,
    sparse_any_hit_cm,
    sparse_nearest_t_idx_cm,
)

KMAX = 32        # per-ray candidate clusters kept (front-to-back)
ROUNDS = 6       # ranked rounds before the residue fallback
CAND_CHUNK = 16384  # rays per candidate-build chunk (bounds the [n, C]
#                     slab intermediate at ~50 MB for 784 clusters)
W_PER_RB_RANKED = 16  # work-list slots per ray block per round


def _per_ray_candidates_chunk(o3, d3, tmax, aabb8, kmax: int):
    """Exact per-ray candidate clusters, front-to-back. Returns
    (cand i32[n, kmax], entry f32[n, kmax] — BIG past the count,
    count i32[n] clamped to kmax, overflow bool[n])."""
    c = aabb8.shape[0]
    nonempty = aabb8[:, 0] <= aabb8[:, 3]

    enter, exit_ = sp._lane_slab_enter_exit(
        o3[:, :, None], d3[:, :, None],            # [3, n, 1]
        aabb8[:, 0:3].T[:, None, :], aabb8[:, 3:6].T[:, None, :],  # [3,1,c]
    )                                              # -> [n, c]
    hit = (
        nonempty[None, :]
        & (exit_ >= jnp.maximum(enter, 0.0) - SLAB_EPS)
        & (enter <= tmax[:, None] + SLAB_EPS)
    )
    key = jnp.where(hit, jnp.maximum(enter, 0.0), BIG)
    kk = min(kmax, c)
    vals, idxs = lax.top_k(-key, kk)          # [n, kk] front-to-back
    entry = -vals
    count_full = jnp.sum(hit, axis=1, dtype=jnp.int32)
    if kk < kmax:  # tiny scenes: pad the static kmax columns
        pad = kmax - kk
        idxs = jnp.concatenate(
            [idxs, jnp.zeros((idxs.shape[0], pad), jnp.int32)], axis=1
        )
        entry = jnp.concatenate(
            [entry, jnp.full((entry.shape[0], pad), BIG, entry.dtype)],
            axis=1,
        )
    return (
        idxs.astype(jnp.int32),
        entry,
        jnp.minimum(count_full, kmax),
        count_full > kmax,
    )


def per_ray_candidates(o3, d3, tmax, aabb8, kmax: int = KMAX,
                       chunk: int = CAND_CHUNK):
    """Chunk-mapped exact per-ray candidate build (bounds the [n, C]
    slab intermediates)."""
    n = o3.shape[1]
    if n <= chunk:
        return _per_ray_candidates_chunk(o3, d3, tmax, aabb8, kmax)
    o3p = _pad_repeat_last(o3, chunk)
    d3p = _pad_repeat_last(d3, chunk)
    tmx = _pad_repeat_last(tmax[None, :], chunk)[0]
    k = o3p.shape[1] // chunk

    def split(x, minor):
        xs = x.reshape(x.shape[:-1] + (k, chunk)) if minor else x
        return jnp.moveaxis(xs, -2, 0)

    outs = lax.map(
        lambda args: _per_ray_candidates_chunk(*args, aabb8, kmax),
        (split(o3p, True), split(d3p, True),
         jnp.moveaxis(tmx.reshape(k, chunk), 0, 0)),
    )
    cand = outs[0].reshape(-1, kmax)[:n]
    entry = outs[1].reshape(-1, kmax)[:n]
    count = outs[2].reshape(-1)[:n]
    over = outs[3].reshape(-1)[:n]
    return cand, entry, count, over


def _round_worklist(cl_sorted, r_blk: int, w_cap: int):
    """Work list for one ranked round from the SORTED lane->cluster ids
    (IMAX = no work). Items are the distinct clusters of each 512-lane
    block — segments of the globally sorted id vector. Returns
    (packed i32[w_cap], ncand i32[nrb], overflow)."""
    n = cl_sorted.shape[0]
    nrb = n // r_blk
    lanes = jnp.arange(n, dtype=jnp.int32)
    valid = cl_sorted != IMAX
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), cl_sorted[:-1]])
    seg_start = valid & ((lanes % r_blk == 0) | (cl_sorted != prev))

    blk = lanes // r_blk
    ncand = jnp.zeros(nrb, jnp.int32).at[blk].add(
        seg_start.astype(jnp.int32)
    )
    # within-block rank of each segment start: inclusive-prefix count of
    # segment starts minus the count before this lane's block, minus one
    csum = jnp.cumsum(seg_start.astype(jnp.int32))
    before_blk = jnp.take(csum, blk * r_blk) - jnp.take(
        seg_start.astype(jnp.int32), blk * r_blk
    )
    rank = csum - before_blk - 1  # 0 at the block's first segment start
    offsets = jnp.cumsum(ncand) - ncand
    total = jnp.sum(ncand)
    pos = jnp.where(seg_start, jnp.take(offsets, blk) + rank, w_cap)
    word = (
        cl_sorted
        | (blk << _CL_BITS)
        | (1 << _ACT_BIT)
        | jnp.where(rank == 0, 1 << _SEG_BIT, 0)
    )
    packed = _scatter_packed(
        word, pos, total, w_cap, clear=(1 << _ACT_BIT) | (1 << _SEG_BIT)
    )
    return packed, ncand, total > w_cap


def _merge_nearest(best_t, best_idx, t_new, i_new):
    better = (i_new >= 0) & (
        (t_new < best_t) | ((t_new == best_t) & (i_new < best_idx))
    )
    return (
        jnp.where(better, t_new, best_t),
        jnp.where(better, i_new, best_idx),
    )


def _launch_rounds(o3, d3, maxd, tripack, aabb8, cand, entry, count,
                   *, c_tri: int, r_blk: int, rounds: int, any_hit: bool):
    """Shared ranked-round driver. Returns (best_t, best_idx, occ,
    unfinished) over the padded wavefront; for any-hit best_t/best_idx
    are unused and occ holds the occlusion bits."""

    n = o3.shape[1]
    nrb = n // r_blk
    _check_limits(nrb, aabb8.shape[0])
    # the round launches pass no sub-AABB operands; _sparse_grid_spec
    # would expect them if sub-tile gating were ever re-enabled
    assert sp._n_sub(c_tri) == 1, (
        "ranked rounds do not support SUB_TILE gating (a measured "
        "negative — sparse_pallas.py); set sparse_pallas.SUB_TILE = 0"
    )
    w_cap = sp._cap_interp(min(nrb * W_PER_RB_RANKED, W_SMEM_ENTRIES))

    best_t = jnp.full((n,), BIG, o3.dtype)
    best_idx = jnp.full((n,), -1, jnp.int32)
    occ = jnp.zeros((n,), bool)
    finished = jnp.zeros((n,), bool)

    for r in range(rounds):
        active = (~finished) & (r < count)
        cl_r = jnp.where(active, cand[:, r], IMAX)
        order = jnp.argsort(cl_r).astype(jnp.int32)
        cl_s = jnp.take(cl_r, order)
        og = jnp.take(o3, order, axis=1)
        dg = jnp.take(d3, order, axis=1)

        packed, ncand, overflow = _round_worklist(cl_s, r_blk, w_cap)

        if any_hit:
            mg = jnp.take(maxd, order)
            res_s = _round_launch_any(
                packed, ncand, og, dg, mg, tripack, aabb8, c_tri, r_blk,
                w_cap, overflow,
            )
            occ_r = jnp.zeros((n,), bool).at[order].set(res_s)
            occ = occ | occ_r
            nxt = entry[:, min(r + 1, entry.shape[1] - 1)]
            # mirror of the kernel's sweep predicate (enter < bound + eps):
            # a lane is final when its next candidate would NOT be swept
            finished = finished | occ | (~active) | (
                nxt >= maxd + SLAB_EPS
            ) | (r + 1 >= count)
        else:
            t_s, i_s = _round_launch_nearest(
                packed, ncand, og, dg, tripack, aabb8, c_tri, r_blk,
                w_cap, overflow,
            )
            t_r = jnp.zeros((n,), o3.dtype).at[order].set(t_s)
            i_r = jnp.full((n,), -1, jnp.int32).at[order].set(i_s)
            best_t, best_idx = _merge_nearest(best_t, best_idx, t_r, i_r)
            nxt = entry[:, min(r + 1, entry.shape[1] - 1)]
            finished = finished | (~active) | (
                nxt >= best_t + SLAB_EPS
            ) | (r + 1 >= count)

    unfinished = ~finished
    return best_t, best_idx, occ, unfinished


def _round_launch_nearest(packed, ncand, og, dg, tripack, aabb8, c_tri,
                          r_blk, w_cap, overflow):
    """One round's kernel launch on the sorted lanes (exact XLA sweep on
    work-list overflow — extremely rare: items per block are the block's
    distinct rank-r clusters)."""

    n = og.shape[1]

    def launch(cap):
        def go(_):
            t_out, idx_out = pl.pallas_call(
                sp._sparse_nearest_kernel,
                grid_spec=sp._sparse_grid_spec(cap, c_tri, r_blk, n_outs=2),
                out_shape=[
                    jax.ShapeDtypeStruct((1, n), og.dtype),
                    jax.ShapeDtypeStruct((1, n), jnp.int32),
                ],
                cost_estimate=pl.CostEstimate(
                    flops=90 * cap * c_tri * r_blk,
                    bytes_accessed=(n * 6 + cap * c_tri * 12) * 4,
                    transcendentals=0,
                ),
                interpret=sp._interpret(),
            )(packed[:cap], tripack, aabb8[:, None, :], og, dg)
            visited = sp._visited_mask(ncand, r_blk, n)
            return (
                jnp.where(visited, t_out[0], BIG),
                jnp.where(visited, idx_out[0], -1),
            )
        return go

    def sparse_branch(_):
        return sp._grid_cascade(launch, ncand, ncand.shape[0], w_cap)

    def fallback_branch(_):
        return sp._xla_nearest_t_idx(og, dg, tripack)

    return lax.cond(overflow, fallback_branch, sparse_branch, None)


def _round_launch_any(packed, ncand, og, dg, mg, tripack, aabb8, c_tri,
                      r_blk, w_cap, overflow):

    n = og.shape[1]
    mg_row = mg[None, :]

    def launch(cap):
        def go(_):
            out = pl.pallas_call(
                sp._sparse_any_hit_kernel,
                grid_spec=sp._sparse_grid_spec(
                    cap, c_tri, r_blk, n_outs=1, n_extra_ray_ins=1,
                ),
                out_shape=[jax.ShapeDtypeStruct((1, n), og.dtype)],
                cost_estimate=pl.CostEstimate(
                    flops=90 * cap * c_tri * r_blk,
                    bytes_accessed=(n * 7 + cap * c_tri * 12) * 4,
                    transcendentals=0,
                ),
                interpret=sp._interpret(),
            )(packed[:cap], tripack, aabb8[:, None, :], og, dg, mg_row)[0]
            visited = sp._visited_mask(ncand, r_blk, n)
            return jnp.where(visited, out[0] > 0.5, False)
        return go

    def sparse_branch(_):
        return sp._grid_cascade(launch, ncand, ncand.shape[0], w_cap)

    def fallback_branch(_):
        return sp._xla_any_hit(og, dg, mg, tripack)

    return lax.cond(overflow, fallback_branch, sparse_branch, None)


def _residue_nearest(o3, d3, tripack, need, best_t, best_idx, c_tri,
                     r_blk, chunk_rb, m_div: int = 2):
    """Exact cluster-sparse sweep on the compacted residue lanes (rays
    whose candidate list overflowed kmax or who outlived the rounds)."""
    from pathtracerpython_tpu.kernels.sparse_pallas import (
        MAXC,
        W_PER_RB,
        _compact_select,
        _gather_parked,
        _pass2_size,
        _scatter_back,
    )

    statics = (c_tri, r_blk, MAXC, W_PER_RB, 1)

    def run(o, d):
        # raw (t=BIG on miss) convention, matching the ranked merge
        return sp._sparse_nearest_entry(
            o, d, tripack, statics, chunk_rb, 0, m_div
        )

    n = o3.shape[1]
    m = _pass2_size(n, r_blk, m_div)
    sel, cnt = _compact_select(need, m)

    def small(_):
        o2, d2, valid = _gather_parked(o3, d3, sel, cnt)
        t2, i2 = run(o2, d2)
        return (
            _scatter_back(best_t, sel, valid, t2[:m], n),
            _scatter_back(best_idx, sel, valid, i2[:m], n),
        )

    def big(_):
        # _sparse_nearest_entry pads to a CHUNK_RB*R_BLK multiple and
        # returns the padded length — slice back to this wavefront's
        # (r_blk-padded) length before merging.
        t2, i2 = run(o3, d3)
        return (
            jnp.where(need, t2[:n], best_t),
            jnp.where(need, i2[:n], best_idx),
        )

    return lax.cond(cnt <= m, small, big, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ranked_nearest_entry(o3, d3, tripack, statics):
    """Padded-wavefront ranked nearest with the sparse entry's gradient
    discipline: forward runs the rounds + residue; backward re-solves
    Möller–Trumbore on each ray's winning triangle (the shared
    _nearest_bwd — the winner index is the only residual)."""
    sg = lax.stop_gradient
    o3, d3, tripack = sg(o3), sg(d3), sg(tripack)
    c_tri, r_blk, kmax, rounds, chunk_rb = statics
    aabb8 = cluster_aabbs(tripack, c_tri)
    npad = o3.shape[1]
    tmax = jnp.full((npad,), BIG, o3.dtype)
    cand, entry, count, over = per_ray_candidates(o3, d3, tmax, aabb8, kmax)
    best_t, best_idx, _, unfinished = _launch_rounds(
        o3, d3, None, tripack, aabb8, cand, entry, count,
        c_tri=c_tri, r_blk=r_blk, rounds=rounds, any_hit=False,
    )
    need = over | unfinished
    return lax.cond(
        jnp.any(need),
        lambda _: _residue_nearest(
            o3, d3, tripack, need, best_t, best_idx, c_tri, r_blk,
            chunk_rb,
        ),
        lambda _: (best_t, best_idx),
        None,
    )


def _ranked_fwd(o3, d3, tripack, statics):
    t, idx = _ranked_nearest_entry(o3, d3, tripack, statics)
    return (t, idx), (o3, d3, tripack, idx)


def _ranked_bwd(statics, res, cots):
    from pathtracerpython_tpu.kernels.intersect_pallas import _nearest_bwd

    return _nearest_bwd(res, (cots[0], None))


_ranked_nearest_entry.defvjp(_ranked_fwd, _ranked_bwd)


def ranked_nearest_t_idx_cm(
    o3, d3_unit, scene, *,
    c_tri: int | None = None, r_blk: int = R_BLK, kmax: int | None = None,
    rounds: int | None = None, chunk_rb: int = CHUNK_RB,
):
    """Component-major ranked-round nearest hit; returns (t [N] — 0 on
    miss, idx [N] — -1), equal to the dense kernel's result. ``kmax`` /
    ``rounds`` default to the module knobs (read at call time so bench
    scripts can tune them)."""
    c_tri = sp.C_TRI if c_tri is None else c_tri
    kmax = KMAX if kmax is None else kmax
    rounds = ROUNDS if rounds is None else rounds
    n = o3.shape[1]
    if -(-n // r_blk) > (1 << sp._RB_BITS):
        # The ranked rounds run the whole wavefront in one launch (the
        # per-round sort must see every lane) and the packed work-item
        # rb field holds 2^14 ray blocks. Wavefronts past that (~8.4M
        # rays at r_blk=512) route to the chunked sparse sweeps — same
        # bit-exact results.
        return sparse_nearest_t_idx_cm(
            o3, d3_unit, scene, c_tri=c_tri, r_blk=r_blk,
            chunk_rb=chunk_rb,
        )
    tripack = _pack_for_sparse(scene, c_tri)
    o3p = _pad_repeat_last(o3, r_blk)
    d3p = _pad_repeat_last(d3_unit, r_blk)
    t, idx = _ranked_nearest_entry(
        o3p, d3p, tripack, (c_tri, r_blk, kmax, rounds, chunk_rb)
    )
    t, idx = t[:n], idx[:n]
    return jnp.where(idx >= 0, t, 0.0), idx


def ranked_any_hit_cm(
    o3, d3_unit, max_dist, scene, *,
    c_tri: int | None = None, r_blk: int = R_BLK, kmax: int | None = None,
    rounds: int | None = None, chunk_rb: int = CHUNK_RB,
):
    """Component-major ranked-round shadow occlusion (detached)."""
    c_tri = sp.C_TRI if c_tri is None else c_tri
    kmax = KMAX if kmax is None else kmax
    rounds = ROUNDS if rounds is None else rounds
    sg = lax.stop_gradient
    n = o3.shape[1]
    if -(-n // r_blk) > (1 << sp._RB_BITS):
        # same single-launch rb-field bound as ranked_nearest_t_idx_cm
        return sparse_any_hit_cm(
            o3, d3_unit, max_dist, scene, c_tri=c_tri, r_blk=r_blk,
            chunk_rb=chunk_rb,
        )
    o3s, d3s, mds = sg(o3), sg(d3_unit), sg(max_dist)
    tripack = sg(_pack_for_sparse(scene, c_tri))
    aabb8 = cluster_aabbs(tripack, c_tri)
    o3p = _pad_repeat_last(o3s, r_blk)
    d3p = _pad_repeat_last(d3s, r_blk)
    mdp = _pad_repeat_last(mds[None, :], r_blk)[0]
    cand, entry, count, over = per_ray_candidates(
        o3p, d3p, mdp, aabb8, kmax
    )
    _, _, occ, unfinished = _launch_rounds(
        o3p, d3p, mdp, tripack, aabb8, cand, entry, count,
        c_tri=c_tri, r_blk=r_blk, rounds=rounds, any_hit=True,
    )
    need = (over | unfinished) & ~occ

    def resolve(_):
        from pathtracerpython_tpu.kernels.sparse_pallas import (
            _compact_select,
            _gather_parked,
            _pass2_size,
            _scatter_back,
        )

        npad = o3p.shape[1]
        m = _pass2_size(npad, r_blk, 2)
        sel, cnt = _compact_select(need, m)

        def small(_):
            o2, d2, valid = _gather_parked(o3p, d3p, sel, cnt)
            md2 = jnp.where(valid, jnp.take(mdp, sel), 1.0)
            occ2 = sparse_any_hit_cm(o2, d2, md2, scene, two_pass=0)
            return _scatter_back(occ, sel, valid, occ2[:m], npad)

        def big(_):
            occ2 = sparse_any_hit_cm(o3p, d3p, mdp, scene, two_pass=0)
            return jnp.where(need, occ2, occ)

        return lax.cond(cnt <= m, small, big, None)

    occ = lax.cond(jnp.any(need), resolve, lambda _: occ, None)
    return occ[:n]
