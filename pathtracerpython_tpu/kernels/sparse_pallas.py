"""Cluster-sparse intersection sweeps — the acceleration hierarchy.

The dense megakernels (``kernels/intersect_pallas.py``) test every ray
block against every triangle block: O(N·T) work that replaces, but does
not beat, the reference's brute-force scan (``/root/reference/main.py:
94-109``). This module adds the TPU-native hierarchy for large scenes:

- **clusters**: the (morton-ordered) triangle buffer is cut into
  ``c_tri``-triangle clusters with XLA-computed AABBs — the leaf level of
  a two-level hierarchy whose top level is the candidate list below;
- **candidate lists (XLA)**: per ray block, a conservative interval slab
  test of the block's (origin-box × direction-box) ray family against
  every cluster AABB yields the clusters any ray in the block could hit,
  **sorted front-to-back** by conservative entry distance (``lax.top_k``
  on the entry bound) and compacted into a flat work list;
- **sparse sweep (Pallas)**: the kernel grid iterates the work list; a
  ``PrefetchScalarGridSpec`` lets the BlockSpec index maps read it from
  SMEM, so only candidate clusters are ever DMA'd. Each work item is
  PACKED into one int32 word — [seg 1][active 1][rb 14][cl 12] — because
  the prefetch arrays live in SMEM, whose v5e capacity is 1.00 MiB
  total (measured: a 1 MB operand fails to compile with a clean
  "Ran out of memory in memory space smem"; 512 KB runs — the round-2
  "worker hard-crash at ~512 KB" was the bench watchdog, see
  docs/PERFORMANCE.md round-3 section). Wavefronts are chunked at
  CHUNK_RB ray blocks per launch to bound the work list at 256 KB,
  leaving headroom. In-kernel, a per-ray
  slab test against the cluster AABB skips the Möller–Trumbore tile
  unless some ray still needs it (``entry < best_t`` — front-to-back
  order makes this an early-termination test, the classic BVH benefit);
- **fallback**: candidate overflow (pathological incoherence) falls back
  under ``lax.cond`` to an XLA tile-scan sweep — never drops a
  candidate, so results stay exact, and nothing expensive compiles (the
  dense megakernel's compile at 100k triangles is minutes; the XLA scan
  and the sparse kernel compile in seconds).

Ray-block coherence is the performance model: the integrator re-sorts
the wavefront by (octant, origin, direction) morton keys each bounce
(ops/sort.py) so candidate lists stay short.

Result contract: identical to the dense kernels for every pair except
u/v boundary-grazing hits (vertex/edge-aimed rays), where the compiled
fma contraction of differently-shaped kernels legitimately differs by
one ulp and flips ``u >= 0``-class predicates — the same measure-zero
class the pallas-vs-XLA backend comparison tolerates
(tests/test_pallas.py; grazing mismatches are verified as such by f64
barycentric margin in tests/test_sparse.py). The winner is the
lexicographic minimum over
(t, global triangle index) — exactly the dense sweep's ascending-index,
strict-less-than tie-break (= the reference's first-minimum ``min``,
``main.py:115``), but order-independent so candidate order cannot
change it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracerpython_tpu.kernels import intersect_pallas as _ip
from pathtracerpython_tpu.kernels.intersect_pallas import (
    BIG,
    _interpret,
    _mt_block,
    _nearest_bwd,
    _pad_dim,
    _plucker_block,
    _plucker_packs,
    pack_triangles,
)
from pathtracerpython_tpu.ops.geometry import intersect_moller

IMAX = 2**31 - 1

# Defaults, tuned on the v5e (see docs/PERFORMANCE.md "Large scenes").
# Measured on the 100k-tri box field at 512^2 (the BASELINE config-5
# shape): primary blocks average ~50 candidate clusters, bounce/NEE
# blocks ~110-290 — but a handful of blocks per bounce touch MOST
# clusters, so any per-block cap below n_clusters triggers the fallback
# for a whole chunk. MAXC therefore defaults to the packed-field maximum
# (= "keep every candidate"); overflow is a TOTAL-budget event only.
C_TRI = 128
C_TRI_BASE = 128  # the granularity the W_PER_RB/CHUNK_RB budget was tuned at
R_BLK = 512       # rays per block (r1024 is ~10% slower end-to-end; the
#                   round-1/2 "r256 crashes" were the bench watchdog, see
#                   docs/PERFORMANCE.md round-3 section)
MAXC = 4096       # per-block candidate cap; 4096 = the cl-field limit,
#                   i.e. no cap beyond _check_limits' cluster bound
W_PER_RB = 512    # average work-list slots per ray block in a launch
W_PER_RB_SORTED = 128  # tighter budget for wavefronts the CALLER knows
#                   are coherence-sorted + relevance-parked (shade_nee's
#                   shadow lanes): their measured per-block unions are
#                   5-6x smaller (mean 25 groups vs a 64-group budget at
#                   g2), and the work-list grid is statically sized by
#                   the budget — every padded inactive entry pays its
#                   decode/slab prologue. NOT the global default:
#                   unsorted unions overflow this into whole-chunk dense
#                   fallbacks (the r3 storm pathology).
CHUNK_RB_SORTED = 256  # more blocks per launch for the same call site
#                   (fewer kernel launches; pooled-cap headroom is what
#                   makes it safe there). Together with W_PER_RB_SORTED:
#                   822 -> 790 ms on the 100k config (BENCHLOG_r4
#                   r4_budget_resweep).
# Ray blocks per sparse LAUNCH. The packed work list is a scalar-prefetch
# operand resident in SMEM for the whole launch; v5e SMEM is 1.00 MiB
# total and exceeding it is a clean compile error (measured round 3 —
# the round-2 "hard-crash at ~512 KB" claim was the bench watchdog).
# Chunking the wavefront at CHUNK_RB blocks bounds the list at
# CHUNK_RB * W_PER_RB * 4 B = 256 KB per launch (headroom for the aabb
# operands and grouped variants) — and makes candidate overflow LOCAL
# (one chunk falls back to the XLA sweep, the rest stay sparse).
CHUNK_RB = 128
W_SMEM_ENTRIES = CHUNK_RB * W_PER_RB  # 65536 words = 256 KB
# The HYBRID's nearest sweep (grid kernels, NEE on the walker) runs
# wider ray blocks than the r512 both-sweeps tuning: the walker's
# big-block win (r5_walker_rblk) re-priced block width for the nearest
# grid sweep too — r1024/w1024 measures 668.0/671.2 ms on the 100k
# config vs 682 at r512 (r2048 703, r1536 691, r1280 696; BENCHLOG_r5
# r5_sparse_nearest_rblk). Scoped to the hybrid dispatch so the tuned
# r512 accel="sparse" both-sweeps path is untouched.
R_BLK_HYBRID_NEAREST = 1024
W_PER_RB_HYBRID_NEAREST = 1024
CHUNK_RB_HYBRID_NEAREST = 64  # fewer blocks per launch at the wide
#   shape: the pooled SMEM work-list cap binds at 64 blocks already, so
#   halving the chunk gives each block more effective slots without
#   changing the cap; measured 658.7/659.4/666.7 ms vs 668.0-671.2 at
#   chunk 128 (walker chunk 64 is a wash, 32 worse — BENCHLOG_r5
#   r5_launch_chunks)
SLAB_EPS = 1e-3   # conservative slack on all slab comparisons

# packed work-item layout: [seg 1][active 1][rb 14][cl 12]
_CL_BITS = 12
_RB_BITS = 14
_ACT_BIT = _CL_BITS + _RB_BITS        # 26
_SEG_BIT = _ACT_BIT + 1               # 27

# "auto" accel threshold: below this padded triangle count the dense sweep
# is already a handful of blocks and the candidate machinery cannot pay.
SPARSE_MIN_TRIS = 4096


# What accel="auto" selects for large scenes (>= SPARSE_MIN_TRIS padded
# triangles). Rounds 2/3 crowned the cluster-sparse grid sweeps over the
# then-negative walker; round 5 re-priced the walker under the
# sorted+parked NEE regime (its c128 shape beat the grid kernels
# end-to-end: 744.5/763.1 vs 789.0/792.7 ms), and the phase split
# behind that win (r5_phase_by_accel: walker wins the NEE any-hit 399
# vs 449 ms, the grid kernels win the nearest phase 377 vs 393) led to
# the production HYBRID: grid-kernel NEAREST + walker NEE any-hit —
# 719.7/729.3 ms = 8.74/8.63 Mrays/s on the 100k config (BENCHLOG_r5
# r5_hybrid; docs/PERFORMANCE.md round-5 section). "sparse"/"walker"
# force a single hierarchy for both sweeps; sparse remains the only one
# with the occluder-cache and two-pass protocols (both measured-off
# anyway).
AUTO_LARGE = "hybrid"


def resolve_accel(accel: str, n_padded_tris: int) -> str:
    """Resolve the config's accel choice to a concrete hierarchy:
    "none", "sparse", "walker", or "hybrid" (grid-kernel nearest +
    walker NEE any-hit — the AUTO_LARGE choice for large scenes since
    round 5; see kernels/walker_pallas.py for the measurements).
    Shared by the geometry entry points and the fused-kernel/sort gates
    so every dispatch site agrees on what "auto" means; dispatch sites
    must handle all FOUR values."""
    if accel == "auto":
        return (
            AUTO_LARGE if n_padded_tris >= SPARSE_MIN_TRIS else "none"
        )
    return accel


def use_sparse(accel: str, n_padded_tris: int) -> bool:
    """True when the sweeps run a cluster hierarchy (sparse grid
    kernels, the in-kernel walker, or the hybrid split) — the gate for
    the coherence machinery (wavefront sorting, NEE shadow-lane
    sorting, relevance parking), which serves every hierarchy
    identically."""
    return resolve_accel(accel, n_padded_tris) in (
        "sparse", "walker", "hybrid"
    )


# Sub-tile gating: within a visited cluster, Möller–Trumbore can run per
# SUB_TILE-triangle slice, each gated by its own (much tighter) AABB.
# MEASURED NEGATIVE on the v5e (docs/PERFORMANCE.md): the sweep kernel is
# per-item-overhead-bound, not MT-flop-bound — every sub-tile granularity
# (16/32/64) lost 9-18% end-to-end because the extra @pl.when predication
# inhibits Mosaic's load pipelining (same effect as the round-1 culling
# lesson). 0 disables the sub loop (one full-tile MT per item); the
# machinery stays for future finer-granularity experiments.
SUB_TILE = 0


def _n_sub(c_tri: int) -> int:
    if SUB_TILE <= 0 or c_tri % SUB_TILE or c_tri == SUB_TILE:
        return 1
    return c_tri // SUB_TILE


def cluster_sub_aabbs(tripack: jax.Array, c_tri: int) -> jax.Array:
    """Per-sub-tile AABBs f32[C, 1, nsub*8], each 8-float group =
    (min.xyz | max.xyz | 0 | 0); invalid-only slices get inverted boxes.
    The trailing (1, nsub*8) matches the SMEM block exactly (same
    non-tile-aligned lowering trick as the cluster AABB operand)."""
    nsub = _n_sub(c_tri)
    sub = c_tri // nsub
    t = tripack.shape[0]
    c = t // c_tri
    tp = tripack.reshape(c * nsub, sub, 12)
    valid = (tp[:, :, 9:10] > 0.5)[..., None]
    vs = tp[:, :, 0:9].reshape(c * nsub, sub, 3, 3)
    # inflate by an absolute epsilon: coplanar (axis-aligned face) slices
    # have ZERO thickness, and the slab test's clamped inverse direction
    # magnifies f32 rounding into huge spurious entry times for rays
    # near-parallel to the flat axis — a thin shell makes the degenerate
    # axis unconstrained instead (conservative: only adds candidates)
    vmin = jnp.min(jnp.where(valid, vs, BIG), axis=(1, 2)) - 1e-4
    vmax = jnp.max(jnp.where(valid, vs, -BIG), axis=(1, 2)) + 1e-4
    boxes = jnp.concatenate(
        [vmin, vmax, jnp.zeros((c * nsub, 2), tripack.dtype)], axis=1
    )  # [C*nsub, 8]
    return boxes.reshape(c, 1, nsub * 8)


def cluster_aabbs(tripack: jax.Array, c_tri: int) -> jax.Array:
    """Per-cluster AABBs f32[C, 8] = (min.xyz | max.xyz | 0 | 0), masking
    invalid (padding) lanes; empty clusters get an inverted box."""
    t = tripack.shape[0]
    c = t // c_tri
    tp = tripack.reshape(c, c_tri, 12)
    valid = (tp[:, :, 9:10] > 0.5)[..., None]
    vs = tp[:, :, 0:9].reshape(c, c_tri, 3, 3)
    vmin = jnp.min(jnp.where(valid, vs, BIG), axis=(1, 2))
    vmax = jnp.max(jnp.where(valid, vs, -BIG), axis=(1, 2))
    return jnp.concatenate(
        [vmin, vmax, jnp.zeros((c, 2), tripack.dtype)], axis=1
    )


def _candidate_enter_hit(aabb8, o3p, d3p, tmax_rb, r_blk):
    """Interval slab test of every ray block's (origin box × direction
    box) family against every cluster AABB. Returns (enter [nrb, c]
    conservative entry bound, hit [nrb, c] candidate mask)."""
    c = aabb8.shape[0]
    nrb = o3p.shape[1] // r_blk
    o = o3p.reshape(3, nrb, r_blk)
    d = d3p.reshape(3, nrb, r_blk)
    olo, ohi = o.min(axis=2), o.max(axis=2)   # [3, nrb]
    dlo, dhi = d.min(axis=2), d.max(axis=2)
    blo = aabb8[:, 0:3].T                     # [3, c]
    bhi = aabb8[:, 3:6].T
    nonempty = aabb8[:, 0] <= aabb8[:, 3]     # [c]

    enter = jnp.full((nrb, c), -BIG, o3p.dtype)
    exit_ = jnp.full((nrb, c), BIG, o3p.dtype)
    for k in range(3):
        n1 = blo[k][None, :] - ohi[k][:, None]   # [nrb, c] numerator lo
        n2 = bhi[k][None, :] - olo[k][:, None]   # numerator hi (n1 <= n2)
        straddles = (dlo[k] <= 0.0) & (dhi[k] >= 0.0)  # [nrb]

        def safe_inv(x):
            ax = jnp.maximum(jnp.abs(x), 1e-12)
            return jnp.sign(jnp.where(x == 0.0, 1.0, x)) / ax

        i1 = safe_inv(dlo[k])[:, None]
        i2 = safe_inv(dhi[k])[:, None]
        p11, p12, p21, p22 = n1 * i1, n1 * i2, n2 * i1, n2 * i2
        lo_k = jnp.minimum(jnp.minimum(p11, p12), jnp.minimum(p21, p22))
        hi_k = jnp.maximum(jnp.maximum(p11, p12), jnp.maximum(p21, p22))
        lo_k = jnp.where(straddles[:, None], -BIG, lo_k)
        hi_k = jnp.where(straddles[:, None], BIG, hi_k)
        enter = jnp.maximum(enter, lo_k)
        exit_ = jnp.minimum(exit_, hi_k)

    hit = (
        nonempty[None, :]
        & (enter <= exit_ + SLAB_EPS)
        & (exit_ >= -SLAB_EPS)
        & (enter <= tmax_rb[:, None] + SLAB_EPS)
    )
    return enter, hit


def _list_positions(counts, max_slots: int, w_cap: int):
    """Work-list slot of entry ``s`` of block ``b`` (s < counts[b]);
    out-of-list slots get the ``w_cap`` drop sentinel. Returns
    (pos i32[nrb, max_slots], total)."""
    offsets = jnp.cumsum(counts) - counts
    total = jnp.sum(counts)
    slot = jnp.arange(max_slots, dtype=jnp.int32)[None, :]
    in_list = slot < counts[:, None]
    pos = jnp.where(in_list, offsets[:, None] + slot, w_cap)
    return pos, total


def _scatter_packed(word, pos, total, w_cap: int, clear: int):
    """Scatter per-slot words into the flat work list and pad the tail
    with repeats of the last real word (same block indices -> no extra
    DMAs) with the ``clear`` bits masked off."""
    packed = jnp.zeros(w_cap, jnp.int32).at[pos.ravel()].set(
        word.ravel(), mode="drop"
    )
    iw = jnp.arange(w_cap, dtype=jnp.int32)
    last = jnp.maximum(total - 1, 0)
    tail_word = packed[last] & ~clear
    return jnp.where(iw < total, packed, tail_word)


def candidate_worklist(
    aabb8: jax.Array, o3p: jax.Array, d3p: jax.Array, tmax_rb: jax.Array,
    *, r_blk: int, maxc: int, w_cap: int, trunc_k: int | None = None,
):
    """Conservative per-ray-block candidate clusters, front-to-back.

    The slab test runs on the interval family {origin ∈ block origin box,
    direction ∈ block direction box}: with per-axis numerator interval
    [blo - ohi, bhi - olo] and inverse-direction interval endpoints, the
    4 endpoint products bound every ray's slab crossing times, so
    ``enter_lo = max_k lo_k > exit_hi = min_k hi_k`` proves NO ray in the
    block hits the cluster (safe to cull). An axis whose direction
    interval straddles zero gives no constraint — which is why the
    integrator sorts rays into direction-coherent blocks first.

    Returns (packed work list i32[w_cap], ncand i32[nrb], overflow bool,
    next_entry f32[nrb]); ``overflow`` true means the caller must use the
    exact fallback.

    ``trunc_k`` enables the two-pass protocol: keep only the first
    ``trunc_k`` front-to-back candidates per block — NOT an overflow
    event (the caller resolves unfinished lanes in a second pass) —
    and report ``next_entry``, the conservative entry bound of the first
    candidate DROPPED per block (BIG when nothing was dropped). Any
    unseen cluster's per-ray entry is >= this bound, so a lane whose
    best-so-far beats it is provably final.
    """
    enter, hit = _candidate_enter_hit(aabb8, o3p, d3p, tmax_rb, r_blk)
    c = aabb8.shape[0]
    nrb = hit.shape[0]

    # front-to-back compaction: top_k of negative entry bound = the maxc
    # nearest candidate clusters per block, already sorted by entry
    mc = min(trunc_k if trunc_k is not None else maxc, c)
    key = jnp.where(hit, jnp.maximum(enter, 0.0), BIG)
    lane_m = min(LANE_M, max(c - mc, 0)) if trunc_k is not None else 0
    nk = min(mc + lane_m + 1, c) if trunc_k is not None else mc
    vals, idxs = lax.top_k(-key, nk)                    # [nrb, nk]
    drops = None
    if trunc_k is not None and nk > mc:
        # entry bound of the first dropped candidate; key is BIG for
        # non-candidates, so blocks with <= mc candidates report BIG
        next_entry = -vals[:, mc]
        if lane_m:
            # the first lane_m dropped clusters, for the PER-LANE
            # finality refinement (_lane_unseen_bound): their ids, their
            # block keys (BIG = not a candidate -> ignore), and the
            # block-level bound past them (BIG when the drops already
            # cover every remaining cluster)
            far = (
                -vals[:, mc + lane_m] if mc + lane_m < c
                else jnp.full((nrb,), BIG, o3p.dtype)
            )
            drops = (idxs[:, mc:mc + lane_m], -vals[:, mc:mc + lane_m], far)
        idxs = idxs[:, :mc]
    else:
        next_entry = jnp.full((nrb,), BIG, o3p.dtype)
    ncand_full = jnp.sum(hit, axis=1, dtype=jnp.int32)  # [nrb]
    ncand = jnp.minimum(ncand_full, mc)

    pos, total = _list_positions(ncand, mc, w_cap)
    rb_ids = jnp.broadcast_to(
        jnp.arange(nrb, dtype=jnp.int32)[:, None], pos.shape
    )
    slot = jnp.arange(mc, dtype=jnp.int32)[None, :]
    word = (
        idxs.astype(jnp.int32)
        | (rb_ids << _CL_BITS)
        | (1 << _ACT_BIT)
        | jnp.where(slot == 0, 1 << _SEG_BIT, 0)
    )
    packed = _scatter_packed(
        word, pos, total, w_cap, clear=(1 << _ACT_BIT) | (1 << _SEG_BIT)
    )

    if trunc_k is not None:
        overflow = total > w_cap  # truncation is NOT overflow
    else:
        overflow = jnp.any(ncand_full > mc) | (total > w_cap)
    return packed, ncand, overflow, next_entry, drops


# Per-lane finality refinement for truncated (two-pass) sweeps: how many
# dropped clusters get an EXACT per-lane slab entry (the rest fall back
# to the block-level bound). The block bound alone degenerates on bounce
# wavefronts — origins sit inside many overlapping entry-0 cluster AABBs
# so ne == 0 marks every lane unfinished (the measured round-2 negative);
# a lane's own entry to those clusters is usually positive.
LANE_M = 8


def _lane_slab_enter_exit(o3, d3, blo, bhi):
    """Exact per-lane slab interval. Inputs are per-axis stacks
    broadcastable against each other past the leading 3-axis:
    ``o3``/``d3`` [3, *ray-shape], ``blo``/``bhi`` [3, *box-shape].
    Returns (enter, exit) of the broadcast shape. The 1e-12
    safe-inverse clamp is the exactness contract shared by the ranked
    candidate build and the per-lane finality bound — one copy only."""
    enter = None
    exit_ = None
    for k in range(3):
        d_k = d3[k]
        safe_d = jnp.where(
            jnp.abs(d_k) < 1e-12, jnp.where(d_k >= 0, 1e-12, -1e-12), d_k
        )
        inv = 1.0 / safe_d
        lo = (blo[k] - o3[k]) * inv
        hi = (bhi[k] - o3[k]) * inv
        tn = jnp.minimum(lo, hi)
        tf = jnp.maximum(lo, hi)
        enter = tn if enter is None else jnp.maximum(enter, tn)
        exit_ = tf if exit_ is None else jnp.minimum(exit_, tf)
    return enter, exit_


def _lane_unseen_bound(o3p, d3p, aabb8, drops, r_blk):
    """Per-lane lower bound on the entry distance of every cluster the
    truncated pass-1 list dropped. [n]; BIG when nothing was dropped.

    For the first LANE_M dropped clusters (block front-to-back order)
    the bound is the lane's own exact slab entry (misses contribute
    nothing — the cluster cannot intersect that lane at all); every
    further cluster is bounded by its block-level key, which the
    front-to-back order makes monotone."""
    drop_ids, drop_keys, far = drops
    nrb, m = drop_ids.shape
    n = o3p.shape[1]
    o = o3p.reshape(3, nrb, 1, r_blk)
    d = d3p.reshape(3, nrb, 1, r_blk)
    boxes = aabb8[drop_ids]                  # [nrb, m, 8]
    # a drop slot names a real dropped candidate iff its block key is
    # finite (top_k pads non-candidates with BIG keys)
    valid = drop_keys < BIG

    blo = jnp.moveaxis(boxes[:, :, 0:3], -1, 0)[..., None]  # [3, nrb, m, 1]
    bhi = jnp.moveaxis(boxes[:, :, 3:6], -1, 0)[..., None]
    enter, exit_ = _lane_slab_enter_exit(o, d, blo, bhi)  # [nrb, m, r_blk]
    hit = exit_ >= jnp.maximum(enter, 0.0) - SLAB_EPS
    lane_entry = jnp.where(
        hit & valid[:, :, None], jnp.maximum(enter, 0.0), BIG
    )
    bound = jnp.minimum(
        jnp.min(lane_entry, axis=1),                    # [nrb, r_blk]
        far[:, None],
    )
    return bound.reshape(n)


def _inv_rows(d_rows):
    """Hoisted safe reciprocal of the direction rows (3 divisions per
    item, shared by the cluster test and every sub-box test)."""
    out = []
    for k in range(3):
        d_k = d_rows[k]
        safe_d = jnp.where(
            jnp.abs(d_k) < 1e-12, jnp.where(d_k >= 0, 1e-12, -1e-12), d_k
        )
        out.append(1.0 / safe_d)
    return out


def _slab_rows_inv(box6, o_rows, inv_rows):
    """Per-ray slab test vs one AABB given as 6 SMEM scalars
    (min.xyz | max.xyz). Returns (hit [1, R] bool, enter [1, R]) — enter
    clamped to >= 0. Empty (inverted) boxes fail for every lane."""
    enter = None
    exit_ = None
    for k in range(3):
        lo = (box6[k] - o_rows[k]) * inv_rows[k]
        hi = (box6[k + 3] - o_rows[k]) * inv_rows[k]
        tn = jnp.minimum(lo, hi)
        tf = jnp.maximum(lo, hi)
        enter = tn if enter is None else jnp.maximum(enter, tn)
        exit_ = tf if exit_ is None else jnp.minimum(exit_, tf)
    hit = (exit_ >= jnp.maximum(enter, 0.0) - SLAB_EPS)
    return hit, jnp.maximum(enter, 0.0)


def _slab_rows(aabb_ref, o_rows, d_rows):
    """Per-ray slab test vs one cluster AABB ((1, 1, 8) SMEM ref)."""
    return _slab_rows_inv(
        [aabb_ref[0, 0, k] for k in range(6)], o_rows, _inv_rows(d_rows)
    )


def _ray_rows(ref):
    return [ref[k:k + 1, :] for k in range(3)]


def _decode(word):
    cl = word & ((1 << _CL_BITS) - 1)
    rb = (word >> _CL_BITS) & ((1 << _RB_BITS) - 1)
    active = (word >> _ACT_BIT) & 1
    seg = (word >> _SEG_BIT) & 1
    return cl, rb, active, seg


def _sparse_nearest_kernel(
    pref, tri_ref, aabb_ref, *rest,
):
    sub_ref = rest[0] if len(rest) == 5 else None
    o_ref, d_ref, t_out, idx_out = rest[-4:]
    w = pl.program_id(0)
    cl, _, active, seg = _decode(pref[w])

    @pl.when(seg == 1)
    def _():
        t_out[:] = jnp.full_like(t_out, BIG)
        idx_out[:] = jnp.full_like(idx_out, -1)

    @pl.when(active == 1)
    def _():
        o_rows = _ray_rows(o_ref)
        inv_rows = _inv_rows(_ray_rows(d_ref))
        hit_l, enter = _slab_rows_inv(
            [aabb_ref[0, 0, k] for k in range(6)], o_rows, inv_rows
        )
        needed = hit_l & (enter < t_out[:] + SLAB_EPS)

        @pl.when(jnp.any(needed))
        def _():
            n_t = tri_ref.shape[0]
            nsub = sub_ref.shape[2] // 8 if sub_ref is not None else 1
            sub = n_t // nsub
            for s in range(nsub):
                # gate each SUB_TILE-triangle slice on its own tight box
                if nsub > 1:
                    s_hit, s_enter = _slab_rows_inv(
                        [sub_ref[0, 0, s * 8 + k] for k in range(6)],
                        o_rows, inv_rows,
                    )
                    need_s = needed & s_hit & (
                        s_enter < t_out[:] + SLAB_EPS
                    )
                else:
                    need_s = needed

                @pl.when(jnp.any(need_s))
                def _(s=s):
                    # slice the REF per column (inside _mt_rows), exactly
                    # like the dense kernel's whole-tile form — loading
                    # the slice as an array first changes XLA's fma
                    # contraction and flips u/v==0 boundary pairs by one
                    # ulp, breaking the bit-identical-to-dense contract
                    hit, t = _mt_block(
                        tri_ref, o_ref, d_ref,
                        rows=(s * sub, (s + 1) * sub),
                    )
                    key = jnp.where(hit, t, BIG)
                    tile_min = jnp.min(key, axis=0, keepdims=True)  # [1, R]
                    gidx = (
                        jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
                        + (cl * n_t + s * sub)
                    )
                    cand = jnp.where((key == tile_min) & hit, gidx, IMAX)
                    tile_idx = jnp.min(cand, axis=0, keepdims=True)  # [1, R]
                    # lexicographic (t, index) minimum: order-independent,
                    # equals the dense sweep's ascending-index strict-<
                    # tie-break (sequential slice merge preserves it: min
                    # is exact, equal-t keeps the smaller global index)
                    better = (tile_idx != IMAX) & (
                        (tile_min < t_out[:])
                        | ((tile_min == t_out[:]) & (tile_idx < idx_out[:]))
                    )
                    t_out[:] = jnp.where(better, tile_min, t_out[:])
                    idx_out[:] = jnp.where(better, tile_idx, idx_out[:])


def _sparse_any_hit_kernel(
    pref, tri_ref, aabb_ref, *rest,
):
    sub_ref = rest[0] if len(rest) == 5 else None
    o_ref, d_ref, maxd_ref, occ_out = rest[-4:]
    w = pl.program_id(0)
    _, _, active, seg = _decode(pref[w])

    @pl.when(seg == 1)
    def _():
        occ_out[:] = jnp.zeros_like(occ_out)

    @pl.when(active == 1)
    def _():
        o_rows = _ray_rows(o_ref)
        inv_rows = _inv_rows(_ray_rows(d_ref))
        hit_l, enter = _slab_rows_inv(
            [aabb_ref[0, 0, k] for k in range(6)], o_rows, inv_rows
        )
        needed = hit_l & (enter < maxd_ref[:] + SLAB_EPS) & (occ_out[:] < 0.5)

        @pl.when(jnp.any(needed))
        def _():
            n_t = tri_ref.shape[0]
            nsub = sub_ref.shape[2] // 8 if sub_ref is not None else 1
            sub = n_t // nsub
            for s in range(nsub):
                if nsub > 1:
                    s_hit, s_enter = _slab_rows_inv(
                        [sub_ref[0, 0, s * 8 + k] for k in range(6)],
                        o_rows, inv_rows,
                    )
                    need_s = needed & s_hit & (
                        s_enter < maxd_ref[:] + SLAB_EPS
                    ) & (occ_out[:] < 0.5)
                else:
                    need_s = needed

                @pl.when(jnp.any(need_s))
                def _(s=s):
                    hit, t = _mt_block(
                        tri_ref, o_ref, d_ref,
                        rows=(s * sub, (s + 1) * sub),
                    )
                    occluder = tri_ref[s * sub:(s + 1) * sub, 10:11] > 0.5
                    blocking = hit & occluder & (t < maxd_ref[:] - 1e-4)
                    any_block = jnp.max(
                        jnp.where(blocking, 1.0, 0.0), axis=0, keepdims=True
                    )
                    occ_out[:] = jnp.maximum(occ_out[:], any_block)


def _sparse_grid_spec(w_cap, c_tri, r_blk, *, n_outs, n_extra_ray_ins=0):
    def cl_of(p, w):
        return p[w] & ((1 << _CL_BITS) - 1)

    def rb_of(p, w):
        return (p[w] >> _CL_BITS) & ((1 << _RB_BITS) - 1)

    tri_spec = pl.BlockSpec(
        (c_tri, 12), lambda w, p: (cl_of(p, w), 0),
        memory_space=pltpu.VMEM,
    )
    # (1, 1, 8) over [C, 1, 8]: the TPU lowering requires the last two
    # block dims to equal the array dims when not tile-aligned (same
    # trick as the dense kernel's aabb operand)
    aabb_spec = pl.BlockSpec(
        (1, 1, 8), lambda w, p: (cl_of(p, w), 0, 0),
        memory_space=pltpu.SMEM,
    )
    nsub = _n_sub(c_tri)
    sub_spec = pl.BlockSpec(
        (1, 1, nsub * 8), lambda w, p: (cl_of(p, w), 0, 0),
        memory_space=pltpu.SMEM,
    )
    ray_spec = pl.BlockSpec(
        (3, r_blk), lambda w, p: (0, rb_of(p, w)),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, r_blk), lambda w, p: (0, rb_of(p, w)),
        memory_space=pltpu.VMEM,
    )
    in_specs = [tri_spec, aabb_spec]
    if nsub > 1:
        in_specs.append(sub_spec)
    in_specs += [ray_spec, ray_spec]
    in_specs += [row_spec] * n_extra_ray_ins
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(w_cap,),
        in_specs=in_specs,
        out_specs=[row_spec] * n_outs,
    )


def _visited_mask(ncand, r_blk, n):
    return jnp.repeat(ncand > 0, r_blk, total_repeat_length=n)


def _pad_repeat_last(x, mult):
    """Pad the minor axis to a multiple of ``mult`` by repeating the last
    column — keeps the padded block's ray bounds tight (a 1e6-style pad
    ray would blow up the last block's frustum and its candidate list)."""
    n = x.shape[-1]
    pad = (-n) % mult
    if pad == 0:
        return x
    tail = jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (pad,))
    return jnp.concatenate([x, tail], axis=-1)


# Interpret-mode (CPU test) work-list cap: the interpreter unrolls the
# grid at trace time, so a 512-entry work list inside nested lax.conds
# is a ~50k-op HLO per cascade variant — slow to compile and heavy
# enough to stress the XLA CPU compiler. Real totals in the test scenes
# are far below this cap; exceeding it just takes the exact fallback.
W_INTERP_CAP = 256


def _cap_interp(w: int) -> int:
    return min(w, W_INTERP_CAP) if _interpret() else w


def _w_cap(nrb: int, w_per_rb: int) -> int:
    return _cap_interp(min(nrb * w_per_rb, W_SMEM_ENTRIES))


def _scaled_budget(c_tri: int, w_per_rb: int, chunk_rb: int):
    """Work-list budget scaled to the cluster granularity.

    Halving ``c_tri`` roughly doubles every block's candidate-cluster
    count, but the SMEM work list is a fixed byte budget — at the
    C_TRI_BASE-tuned defaults a c64/c32 run overflows whole chunks onto
    the O(T) XLA fallback (measured 37 s/render vs 1.1 s at c128, r3
    queue). Trading blocks-per-launch for slots-per-block keeps the
    per-block candidate capacity ∝ cluster count at the same SMEM bytes
    per launch."""
    f = max(1, C_TRI_BASE // c_tri)
    return w_per_rb * f, max(8, chunk_rb // f)


def _check_limits(nrb: int, n_clusters: int) -> None:
    assert n_clusters <= (1 << _CL_BITS), (
        f"{n_clusters} clusters exceed the packed work-item field; raise "
        "c_tri or shard geometry over a mesh axis (parallel/ring.py)"
    )
    assert nrb <= (1 << _RB_BITS), (
        f"{nrb} ray blocks exceed the packed work-item field; chunk the "
        "wavefront (utils.render_progressive) or raise r_blk"
    )


# ---------------------------------------------------------------------------
# Grouped work items: G candidate clusters per grid step. The sparse
# kernels are per-item-overhead-bound (docs/PERFORMANCE.md "Large
# scenes": exact per-ray work is ~8-25x less than executed), so folding
# G consecutive front-to-back candidates of a block into ONE grid step
# amortizes the per-step cost (grid sequencing, predication, DMA
# bookkeeping) over G Möller–Trumbore tiles. The tiles run unconditionally
# under a single union `@pl.when` — per-tile predication is the measured
# sub-tiling negative. Tie-break and early termination are unchanged:
# tiles merge sequentially with the order-independent lexicographic
# (t, index) minimum, and the union `needed` test still uses front-to-
# back entry bounds, so termination coarsens from per-cluster to
# per-group only. `group=1` keeps the original kernels.

GROUP = 2  # default work-item group size (>1 = grouped path). Chip
#            measurement (BENCHLOG_r2, 100k-tri field 512^2/2spp/3b):
#            G=2 5.27 Mrays/s vs G=1 4.49 / G=4 5.24 — grouping amortizes
#            the per-grid-step overhead that bounds the sparse sweeps.

# Exact-refinement of the candidate lists (round 5): the interval slab
# test unions a block's (origin box x direction box) RAY FAMILY against
# each cluster — conservative by design, and the measured sorted-NEE
# unions (mean 49 clusters/block) are ~15x the per-ray proof depth. The
# r5 queue showed the sweeps are bound by per-cluster-VISIT work (g4 is
# a wash: halving grid steps at the same cluster count moved nothing),
# so the remaining lever is fewer visits. REFINE_K > 0 re-tests the
# first REFINE_K front-to-back candidates of every block with the
# EXACT per-lane slab test (the same test the kernel's `needed` gate
# runs) and drops members no lane hits inside its own window. Safe by
# construction: a dropped member would have had `needed == false` for
# every lane in-kernel — the MT tile was never going to run; only its
# prologue cost is removed. The filter uses a 10x-wider epsilon than
# the kernel so XLA-vs-Mosaic ulp differences cannot drop a
# kernel-visible member. 0 = off. NOTE the filter materializes
# [nrb, K, r_blk] f32 intermediates in one shot (nrb is already bounded
# by the caller's launch chunking at CHUNK_RB blocks — ~50 MB at the
# production 256-block/K=96 shape); measured NEGATIVE end-to-end on the
# 100k config (889 vs 789 ms, BENCHLOG_r5 r5_refine32/96 +
# r5_refine_stats: sorted unions are ~80% real lane hits, so the filter
# can only drop 11-23% of visits and its XLA pass costs more).
REFINE_K = 0

_VAL_BIT = _CL_BITS  # grouped follower words: [valid 1][cl 12]


def _refine_exact(aabb8, o3p, d3p, maxd_lanes, idxs, ncand, r_blk):
    """Drop the front-to-back candidates that NO lane exactly slab-hits
    inside its own window (see REFINE_K). Only the first REFINE_K slots
    per block are tested (sorted unions are short — mean 25 groups);
    later slots are kept unconditionally. Stable: survivors keep their
    front-to-back order. Returns (idxs', ncand')."""
    nrb, mc = idxs.shape
    k = min(REFINE_K, mc)
    idx_k = idxs[:, :k]
    boxes = aabb8[idx_k]                                  # [nrb, k, 8]
    o = o3p.reshape(3, nrb, 1, r_blk)
    d = d3p.reshape(3, nrb, 1, r_blk)
    blo = jnp.moveaxis(boxes[:, :, 0:3], -1, 0)[..., None]  # [3, nrb, k, 1]
    bhi = jnp.moveaxis(boxes[:, :, 3:6], -1, 0)[..., None]
    enter, exit_ = _lane_slab_enter_exit(o, d, blo, bhi)  # [nrb, k, r_blk]
    # 10x the kernel's epsilon: XLA-vs-Mosaic fma contraction may move a
    # boundary crossing by ulps — never drop a member the kernel's own
    # `needed` gate could see as hit
    eps = SLAB_EPS * 10.0
    en0 = jnp.maximum(enter, 0.0)
    hit = exit_ >= en0 - eps
    if maxd_lanes is not None:
        md = maxd_lanes.reshape(nrb, 1, r_blk)
        hit = hit & (en0 <= md + eps)
    hit_any = jnp.any(hit, axis=2)                        # [nrb, k]

    slot = jnp.arange(mc, dtype=jnp.int32)[None, :]
    in_list = slot < ncand[:, None]
    keep = in_list & jnp.pad(
        hit_any, ((0, 0), (0, mc - k)), constant_values=True
    )
    # stable compaction: kept slots first, front-to-back order preserved
    order = jnp.argsort(~keep, axis=1, stable=True)
    idxs2 = jnp.take_along_axis(idxs, order, axis=1)
    return idxs2, jnp.sum(keep, axis=1, dtype=jnp.int32)


def grouped_worklist(
    aabb8, o3p, d3p, tmax_rb, *, r_blk: int, maxc: int, w_cap: int,
    group: int, maxd_lanes=None,
):
    """Candidate work list in G-cluster groups.

    Returns (packed list[i32[w_cap]] of length ``group``, ncand, overflow).
    Word 0 carries [seg][active][rb][cl0] (slot-0 cluster of a group is
    always valid); follower word k carries [valid][cl_k]. ``w_cap`` is in
    GROUPS (each SMEM operand is w_cap words).

    ``maxd_lanes`` f32[n] (optional): per-lane occlusion windows for the
    REFINE_K exact-refinement filter (any-hit sweeps); None refines by
    slab hit alone (nearest sweeps — the kernel's dynamic best-t bound
    cannot be known statically)."""
    enter, hit = _candidate_enter_hit(aabb8, o3p, d3p, tmax_rb, r_blk)
    c = aabb8.shape[0]
    mc = min(maxc, c)
    key = jnp.where(hit, jnp.maximum(enter, 0.0), BIG)
    _, idxs = lax.top_k(-key, mc)                       # [nrb, mc]
    ncand_full = jnp.sum(hit, axis=1, dtype=jnp.int32)  # [nrb]
    ncand = jnp.minimum(ncand_full, mc)
    if REFINE_K > 0:
        idxs, ncand = _refine_exact(
            aabb8, o3p, d3p, maxd_lanes, idxs, ncand, r_blk
        )
    # invalid followers of a block's partial last group carry the
    # PREVIOUS group's cluster (same block index as the preceding grid
    # step -> Mosaic skips the DMA); see _pack_grouped
    packed, total = _pack_grouped(idxs, ncand, w_cap, group)
    overflow = jnp.any(ncand_full > mc) | (total > w_cap)
    return packed, ncand, overflow


def _decode_follower(word):
    cl = word & ((1 << _CL_BITS) - 1)
    valid = (word >> _VAL_BIT) & 1
    return cl, valid


def _grouped_grid_spec(
    w_cap, c_tri, r_blk, group, *, n_outs, n_extra_ray_ins=0,
):
    def cl_of(p, w):
        return p[w] & ((1 << _CL_BITS) - 1)

    def rb_of(p, w):
        return (p[w] >> _CL_BITS) & ((1 << _RB_BITS) - 1)

    tri_specs = [
        pl.BlockSpec(
            (c_tri, 12),
            (lambda k: lambda w, *ps: (cl_of(ps[k], w), 0))(k),
            memory_space=pltpu.VMEM,
        )
        for k in range(group)
    ]
    aabb_specs = [
        pl.BlockSpec(
            (1, 1, 8),
            (lambda k: lambda w, *ps: (cl_of(ps[k], w), 0, 0))(k),
            memory_space=pltpu.SMEM,
        )
        for k in range(group)
    ]
    ray_spec = pl.BlockSpec(
        (3, r_blk), lambda w, *ps: (0, rb_of(ps[0], w)),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, r_blk), lambda w, *ps: (0, rb_of(ps[0], w)),
        memory_space=pltpu.VMEM,
    )
    in_specs = tri_specs + aabb_specs + [ray_spec, ray_spec]
    in_specs += [row_spec] * n_extra_ray_ins
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=group,
        grid=(w_cap,),
        in_specs=in_specs,
        out_specs=[row_spec] * n_outs,
    )


def _make_grouped_nearest_kernel(group: int, c_tri: int):
    def kernel(*refs):
        prefs = refs[:group]
        tris = refs[group:2 * group]
        aabbs = refs[2 * group:3 * group]
        o_ref, d_ref, t_out, idx_out = refs[3 * group:]
        w = pl.program_id(0)
        _, _, active, seg = _decode(prefs[0][w])

        @pl.when(seg == 1)
        def _():
            t_out[:] = jnp.full_like(t_out, BIG)
            idx_out[:] = jnp.full_like(idx_out, -1)

        @pl.when(active == 1)
        def _():
            o_rows = _ray_rows(o_ref)
            inv_rows = _inv_rows(_ray_rows(d_ref))
            cls, vals, needed = [], [], None
            for k in range(group):
                if k == 0:
                    cl_k, _, _, _ = _decode(prefs[0][w])
                    v_k = jnp.int32(1)
                else:
                    cl_k, v_k = _decode_follower(prefs[k][w])
                hit_k, enter_k = _slab_rows_inv(
                    [aabbs[k][0, 0, j] for j in range(6)], o_rows, inv_rows
                )
                need_k = (
                    (v_k == 1) & hit_k & (enter_k < t_out[:] + SLAB_EPS)
                )
                needed = need_k if needed is None else needed | need_k
                cls.append(cl_k)
                vals.append(v_k)

            @pl.when(jnp.any(needed))
            def _():
                for k in range(group):
                    hit, t = _mt_block(tris[k], o_ref, d_ref)
                    hit = hit & (vals[k] == 1)
                    key = jnp.where(hit, t, BIG)
                    tile_min = jnp.min(key, axis=0, keepdims=True)
                    gidx = (
                        jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
                        + cls[k] * c_tri
                    )
                    cand = jnp.where((key == tile_min) & hit, gidx, IMAX)
                    tile_idx = jnp.min(cand, axis=0, keepdims=True)
                    better = (tile_idx != IMAX) & (
                        (tile_min < t_out[:])
                        | ((tile_min == t_out[:]) & (tile_idx < idx_out[:]))
                    )
                    t_out[:] = jnp.where(better, tile_min, t_out[:])
                    idx_out[:] = jnp.where(better, tile_idx, idx_out[:])

    return kernel


def _make_grouped_any_hit_kernel(group: int, c_tri: int):
    def kernel(*refs):
        prefs = refs[:group]
        tris = refs[group:2 * group]
        aabbs = refs[2 * group:3 * group]
        o_ref, d_ref, maxd_ref, occ_out = refs[3 * group:]
        w = pl.program_id(0)
        _, _, active, seg = _decode(prefs[0][w])

        @pl.when(seg == 1)
        def _():
            occ_out[:] = jnp.zeros_like(occ_out)

        @pl.when(active == 1)
        def _():
            o_rows = _ray_rows(o_ref)
            inv_rows = _inv_rows(_ray_rows(d_ref))
            vals, needed = [], None
            for k in range(group):
                if k == 0:
                    v_k = jnp.int32(1)
                else:
                    _, v_k = _decode_follower(prefs[k][w])
                hit_k, enter_k = _slab_rows_inv(
                    [aabbs[k][0, 0, j] for j in range(6)], o_rows, inv_rows
                )
                need_k = (
                    (v_k == 1) & hit_k
                    & (enter_k < maxd_ref[:] + SLAB_EPS)
                )
                needed = need_k if needed is None else needed | need_k
                vals.append(v_k)
            needed = needed & (occ_out[:] < 0.5)

            @pl.when(jnp.any(needed))
            def _():
                for k in range(group):
                    hit, t = _mt_block(tris[k], o_ref, d_ref)
                    hit = hit & (vals[k] == 1)
                    occluder = tris[k][:, 10:11] > 0.5
                    blocking = hit & occluder & (t < maxd_ref[:] - 1e-4)
                    any_block = jnp.max(
                        jnp.where(blocking, 1.0, 0.0), axis=0, keepdims=True
                    )
                    occ_out[:] = jnp.maximum(occ_out[:], any_block)

    return kernel


# ---------------------------------------------------------------------------
# Occluder-cluster caching (round-4, VERDICT r3 task 1): the NEE any-hit
# sweep is 67% of the 100k-config render, 99.6% of its shadow rays are
# occluded, and proving occlusion needs a mean of 3.34 clusters per ray —
# yet block-granularity sweeps execute ~48 (docs/PERFORMANCE.md). The
# statistical lever the granularity axis cannot touch: an occluder that
# blocked a lane's shadow ray LAST bounce almost always still blocks it.
#
# Protocol (exact by construction, any cache contents):
#   pass 1  sweep each ray block against the top-K_GUESS clusters VOTED
#           by its lanes' cached occluder ids (a tiny work list); lanes
#           the pass proves occluded are FINAL — the kernel tests real
#           triangles, so a hit is a hit;
#   pass 2  the survivors (true-unoccluded + cache misses) compact into a
#           fraction of the wavefront and re-sweep their FULL candidate
#           lists (the round-2 two-pass machinery, reused).
# Both passes also report WHICH cluster blocked each lane (the `idx`
# kernels below) — that is the next bounce's cache. A cold cache (-1)
# degenerates to the plain sweep via the cnt > m big-branch.

K_GUESS = 8   # voted guess clusters per ray block in pass 1
CACHE_M_DIV = 2  # pass-2 compaction cap = n / CACHE_M_DIV


def _pack_grouped(idxs, ncand, w_cap: int, group: int):
    """Pack per-block candidate columns ``idxs`` [nrb, mc] (first
    ``ncand[b]`` valid per block) into G-cluster grouped work lists —
    the scatter/tail/follower protocol of ``grouped_worklist``, factored
    so vote-ordered (guess) lists reuse it. Returns (packed list of
    ``group`` i32[w_cap], total_groups)."""
    nrb, mc = idxs.shape
    g = group
    mc_g = -(-mc // g)
    pad_cols = mc_g * g - mc
    if pad_cols:
        idxs = jnp.concatenate([idxs] + [idxs[:, -1:]] * pad_cols, axis=1)
    ng = -(-ncand // g)
    pos, total = _list_positions(ng, mc_g, w_cap)
    rb_ids = jnp.broadcast_to(
        jnp.arange(nrb, dtype=jnp.int32)[:, None], pos.shape
    )
    slot = jnp.arange(mc_g, dtype=jnp.int32)[None, :]

    packed = []
    for k in range(g):
        cols = idxs[:, k::g].astype(jnp.int32)
        if k == 0:
            word = (
                cols
                | (rb_ids << _CL_BITS)
                | (1 << _ACT_BIT)
                | jnp.where(slot == 0, 1 << _SEG_BIT, 0)
            )
            clear = (1 << _ACT_BIT) | (1 << _SEG_BIT)
        else:
            valid_k = (slot * g + k) < ncand[:, None]
            prev = jnp.concatenate(
                [idxs[:, 0:1].astype(jnp.int32), cols[:, :-1]], axis=1
            )
            filled = jnp.where(valid_k, cols, prev)
            word = filled | jnp.where(valid_k, 1 << _VAL_BIT, 0)
            clear = 1 << _VAL_BIT
        packed.append(_scatter_packed(word, pos, total, w_cap, clear=clear))
    return packed, total


def guess_worklist(
    guess_lanes, *, r_blk: int, n_clusters: int, k_guess: int, group: int,
):
    """Work list of each block's top-``k_guess`` lane-voted clusters.

    ``guess_lanes``: i32[n] cached occluder cluster per lane (-1 = none).
    Vote order (not entry order — any-hit needs no front-to-back): the
    most-shared occluder is tested first, maximizing early termination.
    Returns (packed list of ``group`` i32[w_cap], ncand [nrb], w_cap)."""
    n = guess_lanes.shape[0]
    nrb = n // r_blk
    gl = guess_lanes.reshape(nrb, r_blk)
    blk = jnp.broadcast_to(
        jnp.arange(nrb, dtype=jnp.int32)[:, None], gl.shape
    )
    # out-of-range / empty guesses vote into a dropped overflow column
    cl = jnp.where((gl >= 0) & (gl < n_clusters), gl, n_clusters)
    votes = jnp.zeros((nrb, n_clusters + 1), jnp.int32).at[
        blk.ravel(), cl.ravel()
    ].add(1)[:, :n_clusters]
    k = min(k_guess, n_clusters)
    vcnt, idxs = lax.top_k(votes, k)
    ncand = jnp.minimum(
        jnp.sum(votes > 0, axis=1, dtype=jnp.int32), k
    )
    w_cap = _cap_interp(nrb * -(-k // group))
    packed, _ = _pack_grouped(idxs, ncand, w_cap, group)
    return packed, ncand, w_cap


def _make_grouped_any_hit_idx_kernel(group: int, c_tri: int):
    """Grouped any-hit that also reports the BLOCKING cluster id per lane
    (-1 none) — the cache-producing form of the any-hit kernel. Same
    blocking predicate, same early termination; the id written is the
    first blocking cluster in visit order."""
    def kernel(*refs):
        prefs = refs[:group]
        tris = refs[group:2 * group]
        aabbs = refs[2 * group:3 * group]
        o_ref, d_ref, maxd_ref, occ_out, cl_out = refs[3 * group:]
        w = pl.program_id(0)
        _, _, active, seg = _decode(prefs[0][w])

        @pl.when(seg == 1)
        def _():
            occ_out[:] = jnp.zeros_like(occ_out)
            cl_out[:] = jnp.full_like(cl_out, -1)

        @pl.when(active == 1)
        def _():
            cls, vals, needed = _grouped_header(
                prefs, aabbs, group, o_ref, d_ref, maxd_ref[:], w
            )
            needed = needed & (occ_out[:] < 0.5)

            @pl.when(jnp.any(needed))
            def _():
                for k in range(group):
                    hit, t = _mt_block(tris[k], o_ref, d_ref)
                    hit = hit & (vals[k] == 1)
                    occluder = tris[k][:, 10:11] > 0.5
                    blocking = hit & occluder & (t < maxd_ref[:] - 1e-4)
                    any_block = jnp.max(
                        jnp.where(blocking, 1.0, 0.0), axis=0, keepdims=True
                    )
                    newly = (any_block > 0.5) & (occ_out[:] < 0.5)
                    cl_out[:] = jnp.where(newly, cls[k], cl_out[:])
                    occ_out[:] = jnp.maximum(occ_out[:], any_block)

    return kernel


def _any_hit_idx_chunk(o3, d3, maxd, guess, tripack, statics):
    """One-chunk any-hit reporting (occ bool[n], blocking cluster i32[n]).

    ``guess`` i32[n] >= -1 selects the PASS-1 protocol: sweep only the
    block's lane-voted guess clusters (no overflow possible, unresolved
    lanes are simply not occluded yet). ``guess = None`` sweeps the full
    candidate list (pass 2 / cache-refresh form of ``_any_hit_chunk``)."""
    c_tri, r_blk, maxc, w_per_rb, group = statics
    n = o3.shape[1]
    nrb = n // r_blk
    n_clusters = tripack.shape[0] // c_tri
    _check_limits(nrb, n_clusters)
    aabb8 = cluster_aabbs(tripack, c_tri)
    if guess is not None:
        packs, ncand, w_cap = guess_worklist(
            guess, r_blk=r_blk, n_clusters=n_clusters, k_guess=K_GUESS,
            group=group,
        )
        overflow = jnp.asarray(False)
    else:
        tmax_rb = jnp.max(maxd.reshape(nrb, r_blk), axis=1)
        w_cap = _cap_interp(min(
            nrb * max(1, w_per_rb // group), W_SMEM_ENTRIES // group
        ))
        packs, ncand, overflow = grouped_worklist(
            aabb8, o3, d3, tmax_rb, r_blk=r_blk, maxc=maxc, w_cap=w_cap,
            group=group, maxd_lanes=maxd,
        )
    maxd_row = maxd[None, :]

    def launch(cap):
        def go(_):
            kernel = _make_grouped_any_hit_idx_kernel(group, c_tri)
            gspec = _grouped_grid_spec(
                cap, c_tri, r_blk, group, n_outs=2, n_extra_ray_ins=1,
            )
            occ, cl = pl.pallas_call(
                kernel,
                grid_spec=gspec,
                out_shape=[
                    jax.ShapeDtypeStruct((1, n), o3.dtype),
                    jax.ShapeDtypeStruct((1, n), jnp.int32),
                ],
                cost_estimate=pl.CostEstimate(
                    flops=90 * cap * group * c_tri * r_blk,
                    bytes_accessed=(
                        n * 8 + cap * group * c_tri * 12
                    ) * 4,
                    transcendentals=0,
                ),
                interpret=_interpret(),
            )(*[p[:cap] for p in packs],
              *([tripack] * group), *([aabb8[:, None, :]] * group),
              o3, d3, maxd_row)
            visited = _visited_mask(ncand, r_blk, n)
            return (
                jnp.where(visited, occ[0] > 0.5, False),
                jnp.where(visited, cl[0], -1),
            )
        return go

    def sparse_branch(_):
        return _grid_cascade(launch, -(-ncand // group), nrb, w_cap)

    def fallback_branch(_):
        # exact but anonymous: the XLA sweep has no cluster attribution,
        # so the cache simply is not refreshed for this chunk
        occ = _xla_any_hit(o3, d3, maxd, tripack)
        return occ, jnp.full((n,), -1, jnp.int32)

    return lax.cond(overflow, fallback_branch, sparse_branch, None)


def sparse_any_hit_cached_cm(
    o3, d3_unit, max_dist, scene, guess_cl, *,
    relevant=None,
    c_tri: int | None = None, r_blk: int | None = None,
    maxc: int = MAXC,
    w_per_rb: int | None = None, chunk_rb: int | None = None,
    group: int | None = None, m_div: int | None = None,
):
    """Occluder-cached shadow occlusion. ``guess_cl`` i32[N] carries each
    lane's cached blocking cluster (-1 = no guess, e.g. the first
    bounce). Returns (occ bool[N], blocked_cl i32[N] — the cluster that
    proved each occluded lane, -1 for unoccluded lanes / XLA-fallback
    chunks).

    occ is EXACTLY ``sparse_any_hit_cm``'s result for any guess contents:
    pass-1 occlusions are real triangle hits, and every unresolved lane
    re-sweeps its full candidate list in pass 2 (compacted when the
    survivors fit ``n / m_div``; a cold cache overflows that cap and
    takes the full sweep wholesale). Detached from autodiff like the
    uncached entry.

    ``relevant`` bool[N] (optional): lanes whose result the caller will
    discard (False) are treated as RESOLVED after pass 1 — they never
    reach pass 2, so exactness holds only on relevant lanes. On the 100k
    config this is what lets warm bounces take the compacted branch at
    all: 62% of bounce-3 lanes are pass-1-unresolved, but only 16% are
    unresolved AND relevant (scripts/cache_stats.py)."""
    c_tri = C_TRI if c_tri is None else c_tri
    r_blk = R_BLK if r_blk is None else r_blk
    w_per_rb = W_PER_RB if w_per_rb is None else w_per_rb
    chunk_rb = CHUNK_RB if chunk_rb is None else chunk_rb
    m_div = CACHE_M_DIV if m_div is None else m_div  # trace-time (benches
    #                                                  sweep the module knob)
    w_per_rb, chunk_rb = _scaled_budget(c_tri, w_per_rb, chunk_rb)
    n = o3.shape[1]
    sg = lax.stop_gradient
    tripack = sg(_pack_for_sparse(scene, c_tri))
    o3, d3_unit = sg(o3), sg(d3_unit)
    max_dist = sg(max_dist)
    guess_cl = sg(guess_cl)
    if relevant is not None:
        # parked lanes must not vote their stale guesses into pass-1
        # work lists (their blocks would sweep dead clusters)
        guess_cl = jnp.where(sg(relevant), guess_cl, -1)
    statics = (c_tri, r_blk, maxc, w_per_rb, GROUP if group is None
               else group)

    def run(o, d, md, gu):
        extra = [md[None, :]] + ([gu[None, :]] if gu is not None else [])
        return _map_ray_chunks(
            lambda oc, dc, mc, *rest: _any_hit_idx_chunk(
                oc, dc, mc[0], rest[0][0] if rest else None, tripack,
                statics,
            ),
            [o, d] + extra, r_blk, chunk_rb,
        )

    occ1, cl1 = run(o3, d3_unit, max_dist, guess_cl)
    n_pad = occ1.shape[0]
    pad_mult = chunk_rb * r_blk if n > chunk_rb * r_blk else r_blk
    o3_p = _pad_repeat_last(o3, pad_mult)
    d3_p = _pad_repeat_last(d3_unit, pad_mult)
    md_p = _pad_repeat_last(max_dist[None, :], pad_mult)[0]
    unfinished = ~occ1
    if relevant is not None:
        unfinished = unfinished & jnp.pad(
            sg(relevant), (0, n_pad - n), constant_values=False
        )
    m = _pass2_size(n_pad, r_blk, m_div)
    sel, cnt = _compact_select(unfinished, m)

    def small(_):
        o2, d2, valid = _gather_parked(o3_p, d3_p, sel, cnt)
        md2 = jnp.where(valid, jnp.take(md_p, sel), 1.0)
        occ2, cl2 = run(o2, d2, md2, None)
        return (
            _scatter_back(occ1, sel, valid, occ2[:m], n_pad),
            _scatter_back(cl1, sel, valid, cl2[:m], n_pad),
        )

    def big(_):
        return run(o3, d3_unit, max_dist, None)

    occ, cl = lax.cond(cnt <= m, small, big, None)
    return occ[:n], cl[:n]


# ---------------------------------------------------------------------------
# MXU Plücker sparse sweeps (MT_IMPL = "plucker", the trace-time knob in
# kernels.intersect_pallas). Same work-list/early-termination machinery
# as the classic grouped kernels; the per-tile in-triangle test runs as
# K=8 edge side-test matmuls on the MXU (idle in the classic kernels)
# with the subtract-first plane t on the VPU — ``_plucker_block``,
# shared with the dense sweeps. NOT in the bit-exactness family:
# boundary-grazing winners can differ from classic MT by design (same
# contract as the dense plucker kernels, tests/test_plucker.py).
# Engaged through the GROUPED path for any group >= 1 (the grouped
# machinery subsumes the single-item kernel at group=1); the two-pass
# (trunc_k) protocol stays classic.


def _grouped_grid_spec_plucker(
    w_cap, c_tri, r_blk, group, *, n_outs, n_extra_ray_ins=0,
):
    def cl_of(p, w):
        return p[w] & ((1 << _CL_BITS) - 1)

    def rb_of(p, w):
        return (p[w] >> _CL_BITS) & ((1 << _RB_BITS) - 1)

    pack_specs = []
    for k in range(group):
        im = (lambda k: lambda w, *ps: (cl_of(ps[k], w), 0))(k)
        e_spec = pl.BlockSpec((c_tri, 8), im, memory_space=pltpu.VMEM)
        nv_spec = pl.BlockSpec((c_tri, 12), im, memory_space=pltpu.VMEM)
        pack_specs += [e_spec, e_spec, e_spec, nv_spec]
    aabb_specs = [
        pl.BlockSpec(
            (1, 1, 8),
            (lambda k: lambda w, *ps: (cl_of(ps[k], w), 0, 0))(k),
            memory_space=pltpu.SMEM,
        )
        for k in range(group)
    ]
    ray_spec = pl.BlockSpec(
        (3, r_blk), lambda w, *ps: (0, rb_of(ps[0], w)),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, r_blk), lambda w, *ps: (0, rb_of(ps[0], w)),
        memory_space=pltpu.VMEM,
    )
    in_specs = pack_specs + aabb_specs + [ray_spec, ray_spec]
    in_specs += [row_spec] * n_extra_ray_ins
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=group,
        grid=(w_cap,),
        in_specs=in_specs,
        out_specs=[row_spec] * n_outs,
    )


def _grouped_header(prefs, aabbs, group, o_ref, d_ref, bound_row, w):
    """Shared grouped-kernel prologue: decode every member's (cluster,
    valid), slab-test its AABB, and union the ``needed`` predicate
    against the per-lane bound (best-t or maxd). ``w`` is the grid step,
    read at kernel top level (interpret mode cannot evaluate program_id
    nested inside a pl.when branch)."""
    o_rows = _ray_rows(o_ref)
    inv_rows = _inv_rows(_ray_rows(d_ref))
    cls, vals, needed = [], [], None
    for k in range(group):
        if k == 0:
            cl_k, _, _, _ = _decode(prefs[0][w])
            v_k = jnp.int32(1)
        else:
            cl_k, v_k = _decode_follower(prefs[k][w])
        hit_k, enter_k = _slab_rows_inv(
            [aabbs[k][0, 0, j] for j in range(6)], o_rows, inv_rows
        )
        need_k = (v_k == 1) & hit_k & (enter_k < bound_row + SLAB_EPS)
        needed = need_k if needed is None else needed | need_k
        cls.append(cl_k)
        vals.append(v_k)
    return cls, vals, needed


def _make_grouped_nearest_kernel_plucker(group: int, c_tri: int):
    def kernel(*refs):
        prefs = refs[:group]
        packs = refs[group:group + 4 * group]      # (e0, e1, e2, nv) per k
        aabbs = refs[group + 4 * group:group + 5 * group]
        o_ref, d_ref, t_out, idx_out = refs[group + 5 * group:]
        w = pl.program_id(0)
        _, _, active, seg = _decode(prefs[0][w])

        @pl.when(seg == 1)
        def _():
            t_out[:] = jnp.full_like(t_out, BIG)
            idx_out[:] = jnp.full_like(idx_out, -1)

        @pl.when(active == 1)
        def _():
            cls, vals, needed = _grouped_header(
                prefs, aabbs, group, o_ref, d_ref, t_out[:], w
            )

            @pl.when(jnp.any(needed))
            def _():
                for k in range(group):
                    e0, e1, e2, nv = packs[4 * k:4 * k + 4]
                    hit, t = _plucker_block(e0, e1, e2, nv, o_ref, d_ref)
                    hit = hit & (vals[k] == 1)
                    key = jnp.where(hit, t, BIG)
                    tile_min = jnp.min(key, axis=0, keepdims=True)
                    gidx = (
                        jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
                        + cls[k] * c_tri
                    )
                    cand = jnp.where((key == tile_min) & hit, gidx, IMAX)
                    tile_idx = jnp.min(cand, axis=0, keepdims=True)
                    better = (tile_idx != IMAX) & (
                        (tile_min < t_out[:])
                        | ((tile_min == t_out[:]) & (tile_idx < idx_out[:]))
                    )
                    t_out[:] = jnp.where(better, tile_min, t_out[:])
                    idx_out[:] = jnp.where(better, tile_idx, idx_out[:])

    return kernel


def _make_grouped_any_hit_kernel_plucker(group: int, c_tri: int):
    def kernel(*refs):
        prefs = refs[:group]
        packs = refs[group:group + 4 * group]
        aabbs = refs[group + 4 * group:group + 5 * group]
        o_ref, d_ref, maxd_ref, occ_out = refs[group + 5 * group:]
        w = pl.program_id(0)
        _, _, active, seg = _decode(prefs[0][w])

        @pl.when(seg == 1)
        def _():
            occ_out[:] = jnp.zeros_like(occ_out)

        @pl.when(active == 1)
        def _():
            cls, vals, needed = _grouped_header(
                prefs, aabbs, group, o_ref, d_ref, maxd_ref[:], w
            )
            needed = needed & (occ_out[:] < 0.5)

            @pl.when(jnp.any(needed))
            def _():
                for k in range(group):
                    e0, e1, e2, nv = packs[4 * k:4 * k + 4]
                    hit, t = _plucker_block(e0, e1, e2, nv, o_ref, d_ref)
                    hit = hit & (vals[k] == 1)
                    occluder = nv[:, 7:8] > 0.5
                    blocking = hit & occluder & (t < maxd_ref[:] - 1e-4)
                    any_block = jnp.max(
                        jnp.where(blocking, 1.0, 0.0), axis=0, keepdims=True
                    )
                    occ_out[:] = jnp.maximum(occ_out[:], any_block)

    return kernel


def _sparse_plucker() -> bool:
    """Trace-time gate: the sparse sweeps follow the dense kernels'
    MT_IMPL knob (one lever for the whole pallas backend)."""
    return _ip.MT_IMPL == "plucker"


def _plucker_args(tps, group):
    """Operand list for the plucker grouped kernels: (e0, e1, e2, nv)
    repeated per group member (same arrays — the BlockSpec index maps
    differ per member)."""
    epacks, nv = _plucker_packs(tps)
    return [a for _ in range(group) for a in (*epacks, nv)]


# ---------------------------------------------------------------------------
# Exact XLA fallback sweeps (fast to compile at any scene size; used when
# the candidate list overflows its caps). Rays are chunked with an outer
# scan: even a never-taken lax.cond branch is allocated statically, so the
# [rays, tile] intermediates must stay bounded regardless of wavefront
# size (a flat sweep at 1.5M rays × 512-tri tiles plans 3 GB buffers).

_XLA_CHUNK = 32768
_XLA_TILE = 512


def _chunked(o3, extra, fn):
    n = o3.shape[1]
    chunk = min(n, _XLA_CHUNK)
    o3p = _pad_repeat_last(o3, chunk)
    extra_p = [_pad_repeat_last(e, chunk) for e in extra]
    k = o3p.shape[1] // chunk
    xs = tuple(
        jnp.moveaxis(x.reshape(x.shape[:-1] + (k, chunk)), -2, 0)
        for x in (o3p, *extra_p)
    )
    out = lax.map(fn, xs)
    if isinstance(out, tuple):
        return tuple(o.reshape(-1)[:n] for o in out)
    return out.reshape(-1)[:n]


def _xla_nearest_t_idx(o3, d3, tripack):
    T = tripack.shape[0]
    starts = jnp.arange(T // _XLA_TILE, dtype=jnp.int32) * _XLA_TILE

    def one_chunk(args):
        oc, dc = args
        o = oc.T[:, None, :]
        d = dc.T[:, None, :]
        nc = oc.shape[1]

        def body(carry, start):
            best_t, best_idx = carry
            blk = lax.dynamic_slice_in_dim(tripack, start, _XLA_TILE, axis=0)
            hit, t = intersect_moller(
                o, d, blk[None, :, 0:3], blk[None, :, 3:6], blk[None, :, 6:9]
            )
            hit = hit & (blk[None, :, 9] > 0.5)
            key = jnp.where(hit, t, BIG)
            tidx = jnp.arange(_XLA_TILE, dtype=jnp.int32)[None, :] + start
            kidx = jnp.where(hit, tidx, IMAX)
            tile_min = jnp.min(key, axis=1)
            tile_idx = jnp.min(
                jnp.where(key == tile_min[:, None], kidx, IMAX), axis=1
            )
            better = (tile_idx != IMAX) & (
                (tile_min < best_t)
                | ((tile_min == best_t) & (tile_idx < best_idx))
            )
            return (
                jnp.where(better, tile_min, best_t),
                jnp.where(better, tile_idx, best_idx),
            ), None

        init = (
            jnp.full((nc,), BIG, oc.dtype), jnp.full((nc,), -1, jnp.int32)
        )
        return lax.scan(body, init, starts)[0]

    return _chunked(o3, [d3], one_chunk)


def _xla_any_hit(o3, d3, maxd, tripack):
    T = tripack.shape[0]
    starts = jnp.arange(T // _XLA_TILE, dtype=jnp.int32) * _XLA_TILE

    def one_chunk(args):
        oc, dc, mc = args
        o = oc.T[:, None, :]
        d = dc.T[:, None, :]
        md = mc[0]

        def body(occ, start):
            blk = lax.dynamic_slice_in_dim(tripack, start, _XLA_TILE, axis=0)
            hit, t = intersect_moller(
                o, d, blk[None, :, 0:3], blk[None, :, 3:6], blk[None, :, 6:9]
            )
            blocking = (
                hit & (blk[None, :, 10] > 0.5) & (t < md[:, None] - 1e-4)
            )
            return occ | jnp.any(blocking, axis=1), None

        init = jnp.zeros((oc.shape[1],), bool)
        return lax.scan(body, init, starts)[0]

    return _chunked(o3, [d3, maxd[None, :]], one_chunk)


# ---------------------------------------------------------------------------
# Entry points
#
# Two-pass protocol (the lane-compaction win): pass 1 sweeps only the
# first PASS1_K front-to-back candidate clusters of every block — on the
# measured 100k-box-field wavefronts most shadow rays occlude and most
# camera rays hit within 1-2 clusters, so the expensive tail belongs to
# a minority of lanes. Lanes that are provably final (best-so-far beats
# the entry bound of the first candidate pass 1 dropped) keep their
# result; the survivors are COMPACTED into a wavefront a quarter the
# size and re-swept with full candidate lists. Results are identical to
# the single-pass sweep: survivor detection is conservative and pass 2
# re-tests everything its lanes could need.

PASS1_K = 4        # pass-1 candidate clusters per block
TWO_PASS_NEAREST_AUTO = False  # measured negative on the v5e (BENCHLOG_r2
#                                large_twopass_nearest4: 4.35 vs 4.49M)
TWO_PASS_ANY_AUTO = False  # measured negative on the v5e (BENCHLOG_r2:
#                            any-hit two-pass OFF 4.75M / grouped 5.65M
#                            vs ON 4.49M / grouped 5.27M rays/s — the
#                            compaction launches cost more than the tail
#                            they trim at these wavefront sizes)
# Short-grid cascade: the sparse grid is STATIC (w_cap steps) while the
# real item total is data-dependent (~5-8k of 65536 on the measured
# 100k-box-field wavefronts), so most steps are inactive tail churn.
# Compile one kernel variant per divisor (+ the full grid) and lax.cond
# into the shortest grid the real total fits. Each divisor is one more
# Mosaic compile per (kernel, chunk shape) — keep the list short.
GRID_DIVS = (8, 2)
GRID_CASCADE_MIN = 4096  # don't compile extra variants for tiny grids
M_DIV = 2          # pass-2 wavefront cap = ceil(n / M_DIV)
TWO_PASS_MIN = 32768  # below this ray count the two launches cannot pay




def _grid_cascade(launch, ncand, nrb, w_cap):
    """Run the shortest compiled grid variant of ``launch`` that covers
    the real item total (see GRID_DIVS). Variants only pay when the full
    grid is long (GRID_CASCADE_MIN); below that, one launch."""
    if w_cap < GRID_CASCADE_MIN:
        return launch(w_cap)(None)
    caps = []
    for div in sorted(GRID_DIVS, reverse=True):
        c = max(nrb, w_cap // div)
        if c < w_cap and (not caps or c > caps[-1]):
            caps.append(c)
    if not caps:
        return launch(w_cap)(None)
    total = jnp.sum(ncand)
    expr = launch(w_cap)
    for c in reversed(caps):  # wrap largest-cap first → test smallest first
        expr = (
            lambda _, c=c, nxt=expr: lax.cond(
                total <= c, launch(c), nxt, None
            )
        )
    return expr(None)



def _nearest_chunk(o3, d3, tripack, statics):
    """One-chunk sparse nearest. statics = (c_tri, r_blk, maxc,
    w_per_rb, group, trunc_k). Returns (t [n] — BIG on miss, idx [n] —
    -1, next_entry [n] — per-lane conservative bound of the first
    candidate the truncated list dropped; BIG when the list was
    complete)."""
    c_tri, r_blk, maxc, w_per_rb, group, trunc_k = statics
    sg = lax.stop_gradient
    o3s, d3s, tps = sg(o3), sg(d3), sg(tripack)
    n = o3.shape[1]
    nrb = n // r_blk
    n_clusters = tps.shape[0] // c_tri
    _check_limits(nrb, n_clusters)
    aabb8 = cluster_aabbs(tps, c_tri)
    subs = (cluster_sub_aabbs(tps, c_tri),) if _n_sub(c_tri) > 1 else ()
    tmax_rb = jnp.full((nrb,), BIG, o3.dtype)
    # plucker rides the grouped machinery at any group >= 1; the two-pass
    # (trunc_k) protocol stays on the classic ungrouped kernel
    plucker = _sparse_plucker()
    use_group = (group > 1 or plucker) and not trunc_k
    if use_group:
        w_cap = _cap_interp(min(
            nrb * max(1, w_per_rb // group), W_SMEM_ENTRIES // group
        ))
        packs, ncand, overflow = grouped_worklist(
            aabb8, o3s, d3s, tmax_rb, r_blk=r_blk, maxc=maxc, w_cap=w_cap,
            group=group,
        )
        next_entry = jnp.full((nrb,), BIG, o3.dtype)
        drops = None
        cascade_counts = -(-ncand // group)
    else:
        w_cap = _w_cap(nrb, trunc_k if trunc_k else w_per_rb)
        packed, ncand, overflow, next_entry, drops = candidate_worklist(
            aabb8, o3s, d3s, tmax_rb, r_blk=r_blk, maxc=maxc, w_cap=w_cap,
            trunc_k=trunc_k or None,
        )
        cascade_counts = ncand

    def launch(cap):
        # the grid iterates cap STATIC steps even when most items are
        # inactive padding; a short-grid variant runs whenever the real
        # item total fits, so tail churn scales with actual work
        def go(_):
            if use_group:
                if plucker:
                    kernel = _make_grouped_nearest_kernel_plucker(
                        group, c_tri
                    )
                    gspec = _grouped_grid_spec_plucker(
                        cap, c_tri, r_blk, group, n_outs=2,
                    )
                    tri_args = _plucker_args(tps, group)
                else:
                    kernel = _make_grouped_nearest_kernel(group, c_tri)
                    gspec = _grouped_grid_spec(
                        cap, c_tri, r_blk, group, n_outs=2,
                    )
                    tri_args = [tps] * group
                t_out, idx_out = pl.pallas_call(
                    kernel,
                    grid_spec=gspec,
                    out_shape=[
                        jax.ShapeDtypeStruct((1, n), o3.dtype),
                        jax.ShapeDtypeStruct((1, n), jnp.int32),
                    ],
                    cost_estimate=pl.CostEstimate(
                        flops=90 * cap * group * c_tri * r_blk,
                        bytes_accessed=(
                            n * 6 + cap * group * c_tri * 12
                        ) * 4,
                        transcendentals=0,
                    ),
                    interpret=_interpret(),
                )(*[p[:cap] for p in packs],
                  *tri_args, *([aabb8[:, None, :]] * group),
                  o3s, d3s)
            else:
                t_out, idx_out = pl.pallas_call(
                    _sparse_nearest_kernel,
                    grid_spec=_sparse_grid_spec(cap, c_tri, r_blk, n_outs=2),
                    out_shape=[
                        jax.ShapeDtypeStruct((1, n), o3.dtype),
                        jax.ShapeDtypeStruct((1, n), jnp.int32),
                    ],
                    cost_estimate=pl.CostEstimate(
                        flops=90 * cap * c_tri * r_blk,
                        bytes_accessed=(n * 6 + cap * c_tri * 12) * 4,
                        transcendentals=0,
                    ),
                    interpret=_interpret(),
                )(packed[:cap], tps, aabb8[:, None, :], *subs, o3s, d3s)
            visited = _visited_mask(ncand, r_blk, n)
            return (
                jnp.where(visited, t_out[0], BIG),
                jnp.where(visited, idx_out[0], -1),
            )
        return go

    def sparse_branch(_):
        return _grid_cascade(launch, cascade_counts, nrb, w_cap)

    def fallback_branch(_):
        # exact full sweep: every lane is final regardless of trunc_k
        return _xla_nearest_t_idx(o3s, d3s, tps)

    t, idx = lax.cond(overflow, fallback_branch, sparse_branch, None)
    if trunc_k and drops is not None:
        # per-lane refinement: exact lane entries to the first LANE_M
        # dropped clusters, block bound beyond — far sharper than the
        # block-level next_entry on bounce wavefronts
        ne_lane = _lane_unseen_bound(o3s, d3s, aabb8, drops, r_blk)
    else:
        ne_lane = jnp.repeat(next_entry, r_blk, total_repeat_length=n)
    return t, idx, jnp.where(overflow, BIG, ne_lane)


def _any_hit_chunk(o3, d3, maxd, tripack, statics):
    """One-chunk sparse shadow occlusion (fully detached — binary).
    Returns (occ bool [n], next_entry [n] per-lane)."""
    c_tri, r_blk, maxc, w_per_rb, group, trunc_k = statics
    n = o3.shape[1]
    nrb = n // r_blk
    n_clusters = tripack.shape[0] // c_tri
    _check_limits(nrb, n_clusters)
    aabb8 = cluster_aabbs(tripack, c_tri)
    subs = (cluster_sub_aabbs(tripack, c_tri),) if _n_sub(c_tri) > 1 else ()
    tmax_rb = jnp.max(maxd.reshape(nrb, r_blk), axis=1)
    plucker = _sparse_plucker()
    use_group = (group > 1 or plucker) and not trunc_k
    if use_group:
        w_cap = _cap_interp(min(
            nrb * max(1, w_per_rb // group), W_SMEM_ENTRIES // group
        ))
        packs, ncand, overflow = grouped_worklist(
            aabb8, o3, d3, tmax_rb, r_blk=r_blk, maxc=maxc, w_cap=w_cap,
            group=group, maxd_lanes=maxd,
        )
        next_entry = jnp.full((nrb,), BIG, o3.dtype)
        drops = None
        cascade_counts = -(-ncand // group)
    else:
        w_cap = _w_cap(nrb, trunc_k if trunc_k else w_per_rb)
        packed, ncand, overflow, next_entry, drops = candidate_worklist(
            aabb8, o3, d3, tmax_rb, r_blk=r_blk, maxc=maxc, w_cap=w_cap,
            trunc_k=trunc_k or None,
        )
        cascade_counts = ncand
    maxd_row = maxd[None, :]

    def launch(cap):
        def go(_):
            if use_group:
                if plucker:
                    kernel = _make_grouped_any_hit_kernel_plucker(
                        group, c_tri
                    )
                    gspec = _grouped_grid_spec_plucker(
                        cap, c_tri, r_blk, group, n_outs=1,
                        n_extra_ray_ins=1,
                    )
                    tri_args = _plucker_args(tripack, group)
                else:
                    kernel = _make_grouped_any_hit_kernel(group, c_tri)
                    gspec = _grouped_grid_spec(
                        cap, c_tri, r_blk, group, n_outs=1,
                        n_extra_ray_ins=1,
                    )
                    tri_args = [tripack] * group
                occ = pl.pallas_call(
                    kernel,
                    grid_spec=gspec,
                    out_shape=[jax.ShapeDtypeStruct((1, n), o3.dtype)],
                    cost_estimate=pl.CostEstimate(
                        flops=90 * cap * group * c_tri * r_blk,
                        bytes_accessed=(
                            n * 7 + cap * group * c_tri * 12
                        ) * 4,
                        transcendentals=0,
                    ),
                    interpret=_interpret(),
                )(*[p[:cap] for p in packs],
                  *tri_args, *([aabb8[:, None, :]] * group),
                  o3, d3, maxd_row)[0]
            else:
                occ = pl.pallas_call(
                    _sparse_any_hit_kernel,
                    grid_spec=_sparse_grid_spec(
                        cap, c_tri, r_blk, n_outs=1, n_extra_ray_ins=1,
                    ),
                    out_shape=[jax.ShapeDtypeStruct((1, n), o3.dtype)],
                    cost_estimate=pl.CostEstimate(
                        flops=90 * cap * c_tri * r_blk,
                        bytes_accessed=(n * 7 + cap * c_tri * 12) * 4,
                        transcendentals=0,
                    ),
                    interpret=_interpret(),
                )(packed[:cap], tripack, aabb8[:, None, :], *subs, o3, d3,
                  maxd_row)[0]
            visited = _visited_mask(ncand, r_blk, n)
            return jnp.where(visited, occ[0] > 0.5, False)
        return go

    def sparse_branch(_):
        return _grid_cascade(launch, cascade_counts, nrb, w_cap)

    def fallback_branch(_):
        return _xla_any_hit(o3, d3, maxd, tripack)

    occ = lax.cond(overflow, fallback_branch, sparse_branch, None)
    if trunc_k and drops is not None:
        ne_lane = _lane_unseen_bound(o3, d3, aabb8, drops, r_blk)
    else:
        ne_lane = jnp.repeat(next_entry, r_blk, total_repeat_length=n)
    return occ, jnp.where(overflow, BIG, ne_lane)


def _pack_for_sparse(scene, c_tri):
    # pad to a multiple of BOTH the cluster size and the dense kernel's
    # 512-triangle block (other paths may consume the same pack shape);
    # c_tri must divide 512 so 512 covers both — except c_tri > 512,
    # which is its own multiple
    assert c_tri <= 512 and 512 % c_tri == 0, f"c_tri={c_tri}"
    tripack = pack_triangles(
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.tri_valid, scene.tri_occluder,
    )
    return _pad_dim(tripack, 512, axis=0)


def _pad_park(arrays, r_blk: int, mult: int):
    """Pad the minor (ray) axis to a multiple of ``mult``: repeat-last
    up to the next ``r_blk`` boundary (keeps the boundary block's
    frustum tight), then PARKED rays (off-scene origin, away-pointing
    direction) for the whole blocks beyond — parked blocks' candidate
    lists are EMPTY, so they cost a skipped grid step (sparse) or an
    immediate walk exit (walker). Repeating the last real ray across
    every padded lane instead replicates its entire candidate workload
    (measured -7%% end-to-end on the 100k config when the launch chunk
    stopped dividing the wavefront — BENCHLOG_r5 r5_park_padding).
    ``arrays`` layout: [origins3, dirs3, *extra-rows]; extras pad with
    zeros (never consulted: parked lanes have no candidates)."""
    from pathtracerpython_tpu.ops.sort import PARK_DIR, PARK_ORIGIN

    n = arrays[0].shape[-1]
    total = -(-n // mult) * mult
    up_rb = min(-(-n // r_blk) * r_blk, total)
    out = []
    for i, x in enumerate(arrays):
        x = _pad_repeat_last(x, r_blk) if up_rb > n else x
        pad = total - x.shape[-1]
        if pad:
            if i == 0:
                fill = jnp.broadcast_to(
                    jnp.asarray(PARK_ORIGIN, x.dtype)[:, None], (3, pad)
                )
            elif i == 1:
                fill = jnp.broadcast_to(
                    jnp.asarray(PARK_DIR, x.dtype)[:, None], (3, pad)
                )
            else:
                fill = jnp.zeros(x.shape[:-1] + (pad,), x.dtype)
            x = jnp.concatenate([x, fill], axis=-1)
        out.append(x)
    return out


def _map_ray_chunks(fn, arrays, r_blk: int, chunk_rb: int):
    """Pad the minor (ray) axis and run ``fn`` per bounded-size chunk.

    Each sparse launch must keep its scalar-prefetch work list under the
    SMEM budget (see CHUNK_RB above), so wavefronts wider than
    ``chunk_rb * r_blk`` are split with ``lax.map`` — the kernel compiles
    once for the chunk shape and each chunk takes its own
    overflow-vs-sparse branch. Forward-only (callers own autodiff)."""
    n = arrays[0].shape[-1]
    chunk = chunk_rb * r_blk
    if n <= chunk:
        padded = [_pad_repeat_last(x, r_blk) for x in arrays]
        return fn(*padded)
    padded = _pad_park(arrays, r_blk, chunk)
    k = padded[0].shape[-1] // chunk

    def split(x):
        xs = x.reshape(x.shape[:-1] + (k, chunk))
        return jnp.moveaxis(xs, -2, 0)  # [k, ..., chunk]

    out = lax.map(lambda xs: fn(*xs), tuple(split(x) for x in padded))
    if isinstance(out, tuple):
        return tuple(o.reshape(-1) for o in out)
    return out.reshape(-1)


def _pass2_size(n_pad: int, r_blk: int, m_div: int) -> int:
    m = max(r_blk, -(-n_pad // m_div))
    return -(-m // r_blk) * r_blk


def _compact_select(unfinished, m):
    """Stable compaction: slot s of the result holds the lane index of
    the s-th unfinished lane. Returns (sel i32[m], count); slots past the
    count keep 0 — callers must PARK those slots' rays (so pass-2 cost
    scales with the real survivor count, not the cap) and mask the
    scatter-back to slots < count."""
    n = unfinished.shape[0]
    pos = jnp.cumsum(unfinished.astype(jnp.int32)) - 1
    cnt = jnp.sum(unfinished.astype(jnp.int32))
    slots = jnp.where(unfinished & (pos < m), pos, m)
    sel = jnp.zeros(m, jnp.int32).at[slots].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    return sel, cnt


def _gather_parked(o3_p, d3_p, sel, cnt):
    """Gather survivor rays; slots past the count become PARKED rays
    (pointing away from everything -> zero candidates, near-zero cost)."""
    from pathtracerpython_tpu.ops.sort import PARK_DIR, PARK_ORIGIN

    valid = (jnp.arange(sel.shape[0]) < cnt)[None, :]
    park_o = jnp.asarray(PARK_ORIGIN, o3_p.dtype)[:, None]
    park_d = jnp.asarray(PARK_DIR, d3_p.dtype)[:, None]
    o2 = jnp.where(valid, jnp.take(o3_p, sel, axis=1), park_o)
    d2 = jnp.where(valid, jnp.take(d3_p, sel, axis=1), park_d)
    return o2, d2, valid[0]


def _scatter_back(dst, sel, valid_slot, src_vals, n_sentinel):
    idx = jnp.where(valid_slot, sel, n_sentinel)
    return dst.at[idx].set(src_vals, mode="drop")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _sparse_nearest_entry(o3, d3, tripack, statics, chunk_rb, two_k, m_div):
    """Chunk-mapped (and optionally two-pass) sparse nearest with ONE
    backward re-solve over the whole wavefront: per-chunk vjps would sum
    scatter-adds in a different order than the dense kernel's single
    vjp, breaking the bit-identical gradient contract."""
    sg = lax.stop_gradient
    o3, d3 = sg(o3), sg(d3)
    r_blk = statics[1]

    def run(o, d, trunc_k):
        return _map_ray_chunks(
            lambda oc, dc: _nearest_chunk(
                oc, dc, tripack, statics + (trunc_k,)
            ),
            [o, d], r_blk, chunk_rb,
        )

    if not two_k:
        t, idx, _ = run(o3, d3, 0)
        return t, idx

    t1, i1, ne = run(o3, d3, two_k)
    # conservative finality: any unseen cluster's per-lane entry >= ne,
    # so a lane is final unless ne could still beat its best (same
    # SLAB_EPS slack as the kernel's entry-vs-best test)
    unfinished = ne < t1 + SLAB_EPS
    n_pad = t1.shape[0]
    pad_mult = chunk_rb * r_blk if o3.shape[1] > chunk_rb * r_blk else r_blk
    o3_p = _pad_repeat_last(o3, pad_mult)
    d3_p = _pad_repeat_last(d3, pad_mult)
    assert o3_p.shape[1] == n_pad, (o3_p.shape, n_pad)
    m = _pass2_size(n_pad, r_blk, m_div)
    sel, cnt = _compact_select(unfinished, m)

    def small(_):
        o2, d2, valid = _gather_parked(o3_p, d3_p, sel, cnt)
        t2, i2, _ = run(o2, d2, 0)
        return (
            _scatter_back(t1, sel, valid, t2[:m], n_pad),
            _scatter_back(i1, sel, valid, i2[:m], n_pad),
        )

    def big(_):
        t2, i2, _ = run(o3, d3, 0)
        return t2, i2

    return lax.cond(cnt <= m, small, big, None)


def _entry_fwd(o3, d3, tripack, statics, chunk_rb, two_k, m_div):
    t, idx = _sparse_nearest_entry(
        o3, d3, tripack, statics, chunk_rb, two_k, m_div
    )
    n = o3.shape[1]
    return (t, idx), (o3, d3, tripack, idx[:n])


def _entry_bwd(statics, chunk_rb, two_k, m_div, res, cots):
    o3, d3, tripack, idx = res
    n = o3.shape[1]
    return _nearest_bwd((o3, d3, tripack, idx), (cots[0][:n], None))


_sparse_nearest_entry.defvjp(_entry_fwd, _entry_bwd)


def _resolve_two_pass(two_pass, n, default_on):
    if two_pass is None:  # auto
        return PASS1_K if (default_on and n >= TWO_PASS_MIN) else 0
    return int(two_pass)


def sparse_nearest_t_idx_cm(
    o3, d3_unit, scene, *,
    c_tri: int | None = None, r_blk: int | None = None,
    maxc: int = MAXC,
    w_per_rb: int | None = None, chunk_rb: int | None = None,
    two_pass: int | None = None, m_div: int = M_DIV,
    group: int | None = None,
):
    """Component-major sparse nearest hit. o3/d3_unit f32[3, N] (N
    unpadded, d3_unit normalized). Returns (t [N] — 0 on miss,
    idx [N] — -1 on miss), equal to the dense kernel's result.

    ``two_pass``: pass-1 candidate clusters per block (None = auto:
    PASS1_K for wavefronts >= TWO_PASS_MIN rays; 0 disables).
    ``group``: candidate clusters per grid step (None = module GROUP).
    None for c_tri/r_blk/w_per_rb/chunk_rb/group = the module knobs,
    read at trace time (so benches can sweep them)."""
    c_tri = C_TRI if c_tri is None else c_tri
    r_blk = R_BLK if r_blk is None else r_blk
    w_per_rb = W_PER_RB if w_per_rb is None else w_per_rb
    chunk_rb = CHUNK_RB if chunk_rb is None else chunk_rb
    w_per_rb, chunk_rb = _scaled_budget(c_tri, w_per_rb, chunk_rb)
    n = o3.shape[1]
    tripack = _pack_for_sparse(scene, c_tri)
    statics = (c_tri, r_blk, maxc, w_per_rb, GROUP if group is None
               else group)
    # auto keeps two-pass OFF for nearest pending re-measurement: with the
    # BLOCK-level finality bound it degenerated (bounce origins sit inside
    # many overlapping entry-0 cluster AABBs -> every lane unfinished;
    # measured 2084 vs 1883 ms on the 100k box field). The per-lane
    # refinement (_lane_unseen_bound, LANE_M exact lane entries to the
    # dropped clusters) is built exactly for this case — bench it with
    # scripts/bench_large.py --two-pass-nearest K before flipping auto.
    t, idx = _sparse_nearest_entry(
        o3, d3_unit, tripack, statics, chunk_rb,
        _resolve_two_pass(two_pass, n, default_on=TWO_PASS_NEAREST_AUTO),
        m_div,
    )
    t, idx = t[:n], idx[:n]
    return jnp.where(idx >= 0, t, 0.0), idx


def sparse_any_hit_cm(
    o3, d3_unit, max_dist, scene, *,
    c_tri: int | None = None, r_blk: int | None = None,
    maxc: int = MAXC,
    w_per_rb: int | None = None, chunk_rb: int | None = None,
    two_pass: int | None = None, m_div: int = M_DIV,
    group: int | None = None,
):
    """Component-major sparse shadow occlusion; detached from autodiff."""
    c_tri = C_TRI if c_tri is None else c_tri
    r_blk = R_BLK if r_blk is None else r_blk
    w_per_rb = W_PER_RB if w_per_rb is None else w_per_rb
    chunk_rb = CHUNK_RB if chunk_rb is None else chunk_rb
    w_per_rb, chunk_rb = _scaled_budget(c_tri, w_per_rb, chunk_rb)
    n = o3.shape[1]
    sg = lax.stop_gradient
    tripack = sg(_pack_for_sparse(scene, c_tri))
    o3, d3_unit = sg(o3), sg(d3_unit)
    max_dist = sg(max_dist)
    statics = (c_tri, r_blk, maxc, w_per_rb, GROUP if group is None
               else group)
    two_k = _resolve_two_pass(two_pass, n, default_on=TWO_PASS_ANY_AUTO)

    def run(o, d, md, trunc_k):
        return _map_ray_chunks(
            lambda oc, dc, mc: _any_hit_chunk(
                oc, dc, mc[0], tripack, statics + (trunc_k,)
            ),
            [o, d, md[None, :]], r_blk, chunk_rb,
        )

    if not two_k:
        return run(o3, d3_unit, max_dist, 0)[0][:n]

    occ1, ne = run(o3, d3_unit, max_dist, two_k)
    n_pad = occ1.shape[0]
    pad_mult = chunk_rb * r_blk if n > chunk_rb * r_blk else r_blk
    o3_p = _pad_repeat_last(o3, pad_mult)
    d3_p = _pad_repeat_last(d3_unit, pad_mult)
    md_p = _pad_repeat_last(max_dist[None, :], pad_mult)[0]
    # unoccluded lanes whose block saw its whole candidate list
    # (ne == BIG) are final; the rest must re-check in pass 2
    unfinished = (~occ1) & (ne < md_p + SLAB_EPS)
    m = _pass2_size(n_pad, r_blk, m_div)
    sel, cnt = _compact_select(unfinished, m)

    def small(_):
        o2, d2, valid = _gather_parked(o3_p, d3_p, sel, cnt)
        md2 = jnp.where(valid, jnp.take(md_p, sel), 1.0)
        occ2, _ = run(o2, d2, md2, 0)
        return _scatter_back(occ1, sel, valid, occ2[:m], n_pad)

    def big(_):
        return run(o3, d3_unit, max_dist, 0)[0]

    return lax.cond(cnt <= m, small, big, None)[:n]
