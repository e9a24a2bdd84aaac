"""In-kernel candidate-walker sweeps: one grid step per RAY BLOCK, a
``while_loop`` inside the kernel walking that block's front-to-back
candidate clusters with manually pipelined DMA.

Why (round 3): the cluster-sparse kernels (``sparse_pallas``) pay one
GRID step per (ray block, candidate) work item — Mosaic sequencing,
output-block merge, and BlockSpec-driven DMA bookkeeping on every item.
The round-3 queue showed that cost is what pins the 100k-triangle
config at ~5.7 Mrays/s: every granularity that reduces executed
Möller–Trumbore work (c64/c32 clusters, r256/r128 blocks, grouping,
MXU side tests) LOSES end-to-end because it multiplies work items
(BENCHLOG_r3.jsonl). This kernel restructures the sweep so the per-ray
running best lives in VMEM across the WHOLE candidate list:

- grid = (ray blocks,); the candidate lists are ONE flat SMEM
  scalar-prefetch array of packed words ([quantized-entry 19 |
  cluster 12], below) plus per-block offsets and counts — SMEM scales
  with the actual candidate total, not blocks x clusters. NOTE the v5e
  budget: prefetch operands are double-buffered by the pipeline, so
  the effective limit is ~0.5 MiB of operands against the 1.00 MiB
  SMEM (measured: a [114, 1568] i32 table reports 1.53 MiB used).
- the triangle pack stays HBM-resident (``memory_space=ANY``), minor-
  padded to 128 columns (Mosaic manual-DMA slices need a 128-aligned
  minor dim) with each cluster's AABB stashed in row 0, cols 12:18 of
  its own tile; tiles are DMA'd into a ring of ``N_BUF`` VMEM buffers
  so the fetch of cluster i+N_BUF-1 overlaps the Möller–Trumbore of
  cluster i;
- early termination: per-cluster ``entry < best_t`` lane predication
  (as in sparse_pallas) PLUS a whole-walk stop — candidates are sorted
  by the conservative block-level entry bound k_i, and each word
  carries k_i quantized to 19 bits by truncating the f32 mantissa
  (monotone and a LOWER bound: nonnegative-float bit patterns order
  like values), so once the next k exceeds every lane's improvable
  bound the walk stops;
- candidate-total overflow (rare at the tuned caps) falls back to the
  exact XLA sweep for the whole chunk — never drops a candidate.

Result contract: identical to ``sparse_pallas`` / the dense kernels —
same ``_mt_block`` arithmetic on (c_tri, 128-padded) VMEM refs, same
lexicographic (t, index) winner — bit-gated in tests/test_walker.py.

Anchor: the brute-force scan this hierarchy replaces is
``/root/reference/main.py:94-109`` (nearest) and ``:41-55`` (shadows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracerpython_tpu.kernels.intersect_pallas import (
    BIG,
    _interpret,
    _mt_block,
    _nearest_bwd,
    _pad_dim,
)
from pathtracerpython_tpu.kernels.sparse_pallas import (
    IMAX,
    _pad_park,
    SLAB_EPS,
    _candidate_enter_hit,
    _inv_rows,
    _pack_for_sparse,
    _pad_repeat_last,
    _ray_rows,
    _slab_rows_inv,
    _xla_any_hit,
    _xla_nearest_t_idx,
    cluster_aabbs,
)

# Measured-best walker shape. Round 3 (unsorted wavefronts) crowned
# c256/r512 — 318 ms per 524k-ray nearest sweep vs the sparse kernel's
# 275 ms, a documented negative (BENCHLOG_r3 r3_walker_kernel_ab).
# Round 5 re-priced the walker under the sorted+parked NEE regime
# (candidate unions 5-6x shorter) and the landscape flipped twice:
# c128 beat the grid kernels end-to-end (744.5/763.1 ms vs sparse
# 789.0/792.7 — BENCHLOG_r5 r5_walker_c128), and BIG ray blocks then
# paid again (r5_walker_rblk: per-block walks amortize while sorted
# unions grow sublinearly with block width) — r1280 lands the hybrid
# at 677-687 ms (plateau r1280-r1536; r512 ~714-719, r256 797.6,
# r2048 691.9) and walker-both-sweeps at 701.5. Other neighbors: c256
# 811.8, c512 975.4, c64 3175 (overflow-storm family), nbuf 2/8 and
# w 256/512/640 all washes. c128/r1280/nbuf4/w384 is the measured
# optimum; the hybrid (grid nearest + walker NEE any-hit,
# sparse_pallas.AUTO_LARGE="hybrid") is the accel="auto" production
# default.
C_TRI = 128
R_BLK = 1280
N_BUF = 4          # DMA ring depth (hides tile-fetch latency)
CHUNK_RB = 128     # ray blocks per launch
W_PER_RB = 384     # average candidate slots per block in a launch
W_SMEM_MAX = 49152  # flat-list cap per launch: 192 KB, x2 buffering
#                     = 384 KB of the ~0.5 MiB effective budget

_CL_BITS = 12      # cluster field of a packed candidate word
_KEY_SHIFT = 13    # f32 mantissa bits dropped by the entry quantization
_BOX_COL = 12      # tile row 0, cols 12:18 hold the cluster AABB


def _pack_words(enter_sorted, ids_sorted):
    """[quantized-entry 19 | cluster 12] candidate words (i32).

    The entry bound is clamped to >= 0, bit-truncated (a LOWER bound —
    monotone for nonnegative f32), and placed above the cluster id, so
    integer word order still sorts front-to-back."""
    e = jnp.maximum(enter_sorted, 0.0)
    ebits = jax.lax.bitcast_convert_type(e, jnp.uint32) >> _KEY_SHIFT
    return (
        (ebits.astype(jnp.int32) << _CL_BITS)
        | ids_sorted.astype(jnp.int32)
    )


def _unpack_entry(word):
    """Reconstruct the (lower-bound) f32 entry from a candidate word
    (host/test-side helper; in-kernel comparisons stay in the integer
    domain — Mosaic only bitcasts vectors)."""
    ebits = (jnp.asarray(word) >> _CL_BITS).astype(jnp.uint32) << _KEY_SHIFT
    return jax.lax.bitcast_convert_type(ebits, jnp.float32)


def walker_worklist(aabb8, o3p, d3p, tmax_rb, *, r_blk: int, w_cap: int):
    """Flat front-to-back candidate lists.

    Returns (flat words i32[w_cap], offsets i32[nrb], ncand i32[nrb],
    overflow bool). Out-of-list tail slots repeat the last real word so
    the ring prefetch beyond a block's count stays in-bounds and cheap.
    """
    enter, hit = _candidate_enter_hit(aabb8, o3p, d3p, tmax_rb, r_blk)
    c = aabb8.shape[0]
    key = jnp.where(hit, jnp.maximum(enter, 0.0), BIG)
    vals, idxs = lax.top_k(-key, c)           # full front-to-back sort
    ncand = jnp.sum(hit, axis=1, dtype=jnp.int32)
    words = _pack_words(-vals, idxs)          # [nrb, c]
    offsets = jnp.cumsum(ncand) - ncand
    total = jnp.sum(ncand)
    slot = jnp.arange(c, dtype=jnp.int32)[None, :]
    pos = jnp.where(slot < ncand[:, None], offsets[:, None] + slot, w_cap)
    flat = jnp.zeros(w_cap, jnp.int32).at[pos.ravel()].set(
        words.ravel(), mode="drop"
    )
    iw = jnp.arange(w_cap, dtype=jnp.int32)
    last = flat[jnp.maximum(total - 1, 0)]
    flat = jnp.where(iw < total, flat, last)
    return flat, offsets, ncand, total > w_cap


def _make_walker_kernel(c_tri: int, r_blk: int, any_hit: bool):
    """Shared walker body; ``any_hit`` selects occlusion vs nearest."""

    def kernel(*refs):
        if any_hit:
            (cand_ref, off_ref, ncand_ref, tri_hbm, o_ref, d_ref,
             maxd_ref, occ_out, tri_buf, sems) = refs
        else:
            (cand_ref, off_ref, ncand_ref, tri_hbm, o_ref, d_ref,
             t_out, idx_out, tri_buf, sems) = refs
        rb = pl.program_id(0)
        nc = ncand_ref[rb]
        base = off_ref[rb]
        w_cap = cand_ref.shape[0]
        if any_hit:
            occ_out[:] = jnp.zeros_like(occ_out)
        else:
            t_out[:] = jnp.full_like(t_out, BIG)
            idx_out[:] = jnp.full_like(idx_out, -1)

        o_rows = _ray_rows(o_ref)
        inv_rows = _inv_rows(_ray_rows(d_ref))

        def word_at(i):
            return cand_ref[jnp.minimum(base + i, w_cap - 1)]

        def cl_of(i):
            return word_at(i) & ((1 << _CL_BITS) - 1)

        def dma(slot, i):
            return pltpu.make_async_copy(
                tri_hbm.at[pl.ds(cl_of(i) * c_tri, c_tri), :],
                tri_buf.at[slot],
                sems.at[slot],
            )

        @pl.when(nc > 0)
        def _():
            for b in range(N_BUF - 1):
                @pl.when(b < nc)
                def _(b=b):
                    dma(b, b).start()

            def body(state):
                i, _ = state
                slot = lax.rem(i, N_BUF)

                @pl.when(i + N_BUF - 1 < nc)
                def _():
                    dma(lax.rem(i + N_BUF - 1, N_BUF), i + N_BUF - 1).start()

                dma(slot, i).wait()
                cl = cl_of(i)
                # cluster AABB rides in the tile (row 0, cols 12:18) as
                # (1, 1) vectors — VMEM is vector memory, no scalar loads
                box = [
                    tri_buf[slot, 0:1, _BOX_COL + k:_BOX_COL + k + 1]
                    for k in range(6)
                ]
                hit_l, enter = _slab_rows_inv(box, o_rows, inv_rows)
                if any_hit:
                    needed = (
                        hit_l & (enter < maxd_ref[:] + SLAB_EPS)
                        & (occ_out[:] < 0.5)
                    )
                else:
                    needed = hit_l & (enter < t_out[:] + SLAB_EPS)

                @pl.when(jnp.any(needed))
                def _():
                    hit, t = _mt_block(tri_buf.at[slot], o_ref, d_ref)
                    if any_hit:
                        occluder = tri_buf[slot, :, 10:11] > 0.5
                        blocking = (
                            hit & occluder & (t < maxd_ref[:] - 1e-4)
                        )
                        any_block = jnp.max(
                            jnp.where(blocking, 1.0, 0.0),
                            axis=0, keepdims=True,
                        )
                        occ_out[:] = jnp.maximum(occ_out[:], any_block)
                    else:
                        key = jnp.where(hit, t, BIG)
                        tile_min = jnp.min(key, axis=0, keepdims=True)
                        gidx = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, key.shape, 0
                            ) + cl * c_tri
                        )
                        cand = jnp.where(
                            (key == tile_min) & hit, gidx, IMAX
                        )
                        tile_idx = jnp.min(cand, axis=0, keepdims=True)
                        better = (tile_idx != IMAX) & (
                            (tile_min < t_out[:])
                            | ((tile_min == t_out[:])
                               & (tile_idx < idx_out[:]))
                        )
                        t_out[:] = jnp.where(better, tile_min, t_out[:])
                        idx_out[:] = jnp.where(better, tile_idx, idx_out[:])

                # whole-walk stop: the NEXT candidate's block-level entry
                # lower bound vs the worst lane still improvable — in the
                # INTEGER domain (nonnegative-f32 bit patterns order like
                # values; Mosaic only bitcasts vectors, so quantize the
                # lane row and compare quantized). Both sides truncate,
                # so stopping needs strict >, which is conservative. For
                # any-hit the bound is maxd over unoccluded lanes (all
                # occluded -> bound 0 -> stop immediately: done).
                if any_hit:
                    lane_bound = jnp.where(
                        occ_out[:] < 0.5, maxd_ref[:], 0.0
                    )
                else:
                    lane_bound = t_out[:]
                lane_q = (
                    jax.lax.bitcast_convert_type(
                        jnp.maximum(lane_bound, 0.0), jnp.int32
                    ) >> _KEY_SHIFT
                )
                nxt_q = word_at(jnp.minimum(i + 1, nc - 1)) >> _CL_BITS
                go_on = nxt_q <= jnp.max(lane_q)
                return i + 1, go_on

            def cond(state):
                i, go_on = state
                return (i < nc) & go_on

            final_i, _ = lax.while_loop(
                cond, body, (jnp.int32(0), jnp.bool_(True))
            )

            # drain: iteration i-1 prefetched up to index i+N_BUF-2, so
            # indices [final_i, min(final_i+N_BUF-2, nc-1)] have started
            # DMAs nobody waited on — leaving them in flight aborts the
            # kernel (semaphores must return to zero)
            for k in range(N_BUF - 1):
                @pl.when(final_i + k < nc)
                def _(k=k):
                    dma(lax.rem(final_i + k, N_BUF), final_i + k).wait()

    return kernel


def _walker_grid_spec(c_tri, r_blk, nrb, n_extra_ray_ins=0):
    ray_spec = pl.BlockSpec(
        (3, r_blk), lambda rb, *ps: (0, rb), memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, r_blk), lambda rb, *ps: (0, rb), memory_space=pltpu.VMEM,
    )
    tri_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [tri_spec, ray_spec, ray_spec]
    in_specs += [row_spec] * n_extra_ray_ins
    n_outs = 1 if n_extra_ray_ins else 2
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # flat cand words, offsets, counts
        grid=(nrb,),
        in_specs=in_specs,
        out_specs=[row_spec] * n_outs,
        scratch_shapes=[
            pltpu.VMEM((N_BUF, c_tri, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
    )


def _w_cap(nrb: int, w_per_rb: int) -> int:
    cap = min(nrb * w_per_rb, W_SMEM_MAX)
    return min(cap, 256) if _interpret() else cap


def _nearest_chunk(o3, d3, tiles, aabb8, statics):
    c_tri, r_blk, w_per_rb = statics
    sg = lax.stop_gradient
    o3s, d3s = sg(o3), sg(d3)
    n = o3.shape[1]
    nrb = n // r_blk
    tmax_rb = jnp.full((nrb,), BIG, o3.dtype)
    w_cap = _w_cap(nrb, w_per_rb)
    flat, offsets, ncand, overflow = walker_worklist(
        aabb8, o3s, d3s, tmax_rb, r_blk=r_blk, w_cap=w_cap
    )

    def walker(_):
        t_out, idx_out = pl.pallas_call(
            _make_walker_kernel(c_tri, r_blk, any_hit=False),
            grid_spec=_walker_grid_spec(c_tri, r_blk, nrb),
            out_shape=[
                jax.ShapeDtypeStruct((1, n), o3.dtype),
                jax.ShapeDtypeStruct((1, n), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=90 * n * 32 * c_tri,
                bytes_accessed=n * 24 + w_cap * c_tri * 512,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=_interpret(),
        )(flat, offsets, ncand, tiles, o3s, d3s)
        return t_out[0], idx_out[0]

    def fallback(_):
        return _xla_nearest_t_idx(o3s, d3s, tiles)

    return lax.cond(overflow, fallback, walker, None)


def _any_hit_chunk(o3, d3, maxd, tiles, aabb8, statics):
    c_tri, r_blk, w_per_rb = statics
    n = o3.shape[1]
    nrb = n // r_blk
    tmax_rb = jnp.max(maxd.reshape(nrb, r_blk), axis=1)
    w_cap = _w_cap(nrb, w_per_rb)
    flat, offsets, ncand, overflow = walker_worklist(
        aabb8, o3, d3, tmax_rb, r_blk=r_blk, w_cap=w_cap
    )

    def walker(_):
        occ = pl.pallas_call(
            _make_walker_kernel(c_tri, r_blk, any_hit=True),
            grid_spec=_walker_grid_spec(
                c_tri, r_blk, nrb, n_extra_ray_ins=1
            ),
            out_shape=[jax.ShapeDtypeStruct((1, n), o3.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=90 * n * 32 * c_tri,
                bytes_accessed=n * 28 + w_cap * c_tri * 512,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=_interpret(),
        )(flat, offsets, ncand, tiles, o3, d3, maxd[None, :])[0]
        return occ[0] > 0.5

    def fallback(_):
        return _xla_any_hit(o3, d3, maxd, tiles)

    return lax.cond(overflow, fallback, walker, None)


def _pack_walker(scene, c_tri):
    """(tiles f32[T, 128] with per-cluster AABBs in row 0 cols 12:18,
    aabb8 f32[C, 8]) — the walker's HBM-resident geometry."""
    tripack = _pack_for_sparse(scene, c_tri)
    aabb8 = cluster_aabbs(tripack, c_tri)
    wide = _pad_dim(tripack, 128, axis=1)
    c = wide.shape[0] // c_tri
    tiles = wide.reshape(c, c_tri, 128)
    tiles = tiles.at[:, 0, _BOX_COL:_BOX_COL + 6].set(aabb8[:, 0:6])
    return tiles.reshape(-1, 128), aabb8


def _map_chunks(fn, arrays, r_blk: int, chunk_rb: int):
    """Chunk the wavefront so the flat SMEM candidate list fits."""
    n = arrays[0].shape[-1]
    chunk = chunk_rb * r_blk
    if n <= chunk:
        padded = [_pad_repeat_last(x, r_blk) for x in arrays]
        return fn(*padded)
    padded = _pad_park(arrays, r_blk, chunk)
    k = padded[0].shape[-1] // chunk

    def split(x):
        xs = x.reshape(x.shape[:-1] + (k, chunk))
        return jnp.moveaxis(xs, -2, 0)

    out = lax.map(lambda xs: fn(*xs), tuple(split(x) for x in padded))
    if isinstance(out, tuple):
        return tuple(o.reshape(-1)[:n] for o in out)
    return out.reshape(-1)[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _walker_nearest_entry(o3, d3, tiles, statics, chunk_rb):
    sg = lax.stop_gradient
    o3, d3 = sg(o3), sg(d3)
    c_tri, r_blk, w_per_rb = statics
    # AABBs recomputed from the wide tiles' geometry columns (cols 0:12
    # carry the canonical pack; the builder only reads 0:10)
    aabb8 = cluster_aabbs(sg(tiles)[:, :12], c_tri)
    return _map_chunks(
        lambda oc, dc: _nearest_chunk(oc, dc, tiles, aabb8, statics),
        [o3, d3], r_blk, chunk_rb,
    )


def _entry_fwd(o3, d3, tiles, statics, chunk_rb):
    t, idx = _walker_nearest_entry(o3, d3, tiles, statics, chunk_rb)
    n = o3.shape[1]
    return (t, idx), (o3, d3, tiles, idx[:n])


def _entry_bwd(statics, chunk_rb, res, cots):
    o3, d3, tiles, idx = res
    n = o3.shape[1]
    return _nearest_bwd((o3, d3, tiles, idx), (cots[0][:n], None))


_walker_nearest_entry.defvjp(_entry_fwd, _entry_bwd)


def walker_nearest_t_idx_cm(
    o3, d3_unit, scene, *,
    c_tri: int | None = None, r_blk: int | None = None,
    chunk_rb: int | None = None, w_per_rb: int | None = None,
):
    """Walker nearest hit, identical contract to
    ``sparse_pallas.sparse_nearest_t_idx_cm``: (t [N] — 0 on miss,
    idx [N] — -1 on miss)."""
    c_tri = C_TRI if c_tri is None else c_tri
    r_blk = R_BLK if r_blk is None else r_blk
    chunk_rb = CHUNK_RB if chunk_rb is None else chunk_rb
    w_per_rb = W_PER_RB if w_per_rb is None else w_per_rb
    n = o3.shape[1]
    tiles, _ = _pack_walker(scene, c_tri)
    t, idx = _walker_nearest_entry(
        o3, d3_unit, tiles, (c_tri, r_blk, w_per_rb), chunk_rb
    )
    t, idx = t[:n], idx[:n]
    return jnp.where(idx >= 0, t, 0.0), idx


def walker_any_hit_cm(
    o3, d3_unit, max_dist, scene, *,
    c_tri: int | None = None, r_blk: int | None = None,
    chunk_rb: int | None = None, w_per_rb: int | None = None,
):
    """Walker shadow occlusion; detached from autodiff."""
    c_tri = C_TRI if c_tri is None else c_tri
    r_blk = R_BLK if r_blk is None else r_blk
    chunk_rb = CHUNK_RB if chunk_rb is None else chunk_rb
    w_per_rb = W_PER_RB if w_per_rb is None else w_per_rb
    n = o3.shape[1]
    sg = lax.stop_gradient
    o3, d3_unit, max_dist = sg(o3), sg(d3_unit), sg(max_dist)
    tiles, aabb8 = _pack_walker(scene, c_tri)
    tiles, aabb8 = sg(tiles), sg(aabb8)
    occ = _map_chunks(
        lambda oc, dc, mc: _any_hit_chunk(
            oc, dc, mc[0], tiles, aabb8, (c_tri, r_blk, w_per_rb)
        ),
        [o3, d3_unit, max_dist[None, :]], r_blk, chunk_rb,
    )
    # the single-chunk path of _map_chunks returns the r_blk-padded
    # wavefront untrimmed (the multi-chunk path trims)
    return occ[:n]
