"""Fused ray-triangle intersection megakernels (Pallas / Mosaic TPU).

Replaces the XLA tile-scan sweeps of ``ops.geometry`` on the hot path with
hand-tiled kernels:

- layout: rays are passed TRANSPOSED as f32[3, N] (components on sublanes,
  rays on lanes) and triangles as a packed f32[T, 12] buffer
  (v0.xyz | v1.xyz | v2.xyz | valid | occluder | pad), so the inner
  [T_BLK, R_BLK] Möller–Trumbore arithmetic broadcasts [T_BLK, 1] triangle
  columns against [1, R_BLK] ray rows — pure VPU work, no gathers, no
  transposes in-kernel;
- the grid is (ray_blocks, tri_blocks) with the triangle dimension
  innermost; the per-ray running best (t, global index) lives in the VMEM
  output block across triangle steps (init at j == 0), so the whole sweep
  is one kernel launch and the [N, T] hit matrix never exists;
- winner index tie-break: within a tile the smallest global triangle index
  among minimal-t lanes wins (computed via a min over index-where-optimal),
  and across tiles a strict ``<`` keeps the earlier tile — together exactly
  the reference's first-minimum ``min`` semantics (``main.py:115``);
- backward: a ``jax.custom_vjp`` re-derives dt/d(origin, dir, vertices)
  by re-running the cheap Möller–Trumbore solve on each ray's single
  winning triangle under ``jax.vjp`` (gather + 60 flops per ray), instead
  of saving any forward intermediates — the residual is just the winner
  index. Gradient discipline matches the XLA path: ``t`` is differentiable,
  the discrete winner index and the occlusion bit are detached.

Fast-mode (Möller–Trumbore, t > 1e-4) semantics only; reference-semantics
sweeps stay on the XLA path (they exist for parity gating, not speed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracerpython_tpu.ops.geometry import (
    NearestHit,
    intersect_moller,
    safe_normalize,
)

# Lane/sublane-aligned block sizes (f32 min tile is 8×128).
# Measured end-to-end on the v5e: wider ray blocks amortize per-grid-step
# overhead (128 -> 512 lanes: 44.9 -> 47.7 Mrays/s; small scenes gain
# another ~6% at 2048). VMEM bounds the product: [T_BLK, R_BLK] f32
# intermediates x ~12 live must stay well under 16 MB, so tiny-T scenes
# get the widest blocks and big-T scenes stay at 512. See
# docs/PERFORMANCE.md.
R_BLK = 512   # rays per block (lanes) for large triangle blocks
R_BLK_SMALL = 2048  # rays per block when T <= 64 (block product bounded)
T_BLK = 512   # triangles per block (sublanes)


def _r_blk(t_count: int) -> int:
    return R_BLK_SMALL if t_count <= 64 else R_BLK

BIG = 3.0e38  # python float, not a jnp constant — kernels close over it

# Trace-time toggle for per-block AABB culling. Predication around the
# triangle loop inhibits Mosaic's load pipelining, so culling only pays
# when there is more than one triangle block to skip — the wrappers gate
# it on the block count automatically; this switch force-disables it.
ENABLE_CULL = True


def _use_cull(t_count: int) -> bool:
    return ENABLE_CULL and t_count > T_BLK


# In-triangle test implementation for the dense sweeps: "classic"
# (Möller–Trumbore on the VPU, the bit-exactness family every other path
# matches) or "plucker" (edge side tests as K=8 matmuls on the MXU —
# see the Plücker section below; winner can differ on boundary-grazing
# pairs by design). Trace-time knob, read when a sweep is built.
MT_IMPL = "classic"
DET_EPS = 1e-7
T_MIN = 1e-4  # forward near-clip, matches ops.geometry.intersect_moller


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_dim(x, mult, axis, value=0.0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def pack_triangles(v0, v1, v2, valid, occluder) -> jax.Array:
    """f32[T, 12] triangle pack consumed by both kernels."""
    f = lambda m: m.astype(v0.dtype)[:, None]
    return jnp.concatenate(
        [v0, v1, v2, f(valid), f(occluder), jnp.zeros_like(v0[:, :1])],
        axis=1,
    )


def _block_aabbs(tripack: jax.Array, block: int) -> jax.Array:
    """Per-triangle-block AABBs, f32[C, 8] = (min.xyz | max.xyz | 0 | 0).

    Computed on the fly from the packed buffer (cheap [T,12] reduction), so
    culling needs no new scene fields; ``pack_scene(morton_order=True)``
    makes the blocks spatially tight. All-invalid blocks get an inverted
    box (min > max) which the kernel treats as "skip".
    """
    t = tripack.shape[0]
    c = t // block
    tp = tripack.reshape(c, block, 12)
    valid = (tp[:, :, 9:10] > 0.5)[..., None]          # [C, B, 1, 1]
    vs = tp[:, :, 0:9].reshape(c, block, 3, 3)          # [C, B, vert, xyz]
    vmin = jnp.min(jnp.where(valid, vs, BIG), axis=(1, 2))
    vmax = jnp.max(jnp.where(valid, vs, -BIG), axis=(1, 2))
    # [C, 1, 8]: the trailing (1, 8) matches the SMEM block exactly, which
    # is what the TPU lowering requires for non-tile-aligned blocks
    return jnp.concatenate(
        [vmin, vmax, jnp.zeros((c, 2), tripack.dtype)], axis=1
    )[:, None, :]


def _aabb_cull_rows(aabb_ref, o_rows, d_rows, tmin_bound):
    """Slab test with explicit per-component [1, R] rows (used by kernels
    whose ray data lives in scratch, where multi-row sublane slices would
    violate Mosaic's 8-alignment)."""
    enter = None
    exit_ = None
    for k in range(3):
        o_k = o_rows[k]
        d_k = d_rows[k]
        safe_d = jnp.where(
            jnp.abs(d_k) < 1e-12, jnp.where(d_k >= 0, 1e-12, -1e-12), d_k
        )
        inv = 1.0 / safe_d
        lo = (aabb_ref[0, 0, k] - o_k) * inv
        hi = (aabb_ref[0, 0, k + 3] - o_k) * inv
        tn = jnp.minimum(lo, hi)
        tf = jnp.maximum(lo, hi)
        enter = tn if enter is None else jnp.maximum(enter, tn)
        exit_ = tf if exit_ is None else jnp.minimum(exit_, tf)
    hit = (exit_ >= jnp.maximum(enter, 0.0) - 1e-3) & (
        enter <= tmin_bound + 1e-3
    )
    nonempty = aabb_ref[0, 0, 0] <= aabb_ref[0, 0, 3]
    return hit, nonempty


def _aabb_cull(aabb_ref, o_ref, d_ref, tmin_bound):
    """Slab test of the block's AABB against the ray block ([3, R] refs)."""
    return _aabb_cull_rows(
        aabb_ref,
        [o_ref[k:k + 1, :] for k in range(3)],
        [d_ref[k:k + 1, :] for k in range(3)],
        tmin_bound,
    )


def _mt_rows(tri_ref, ox, oy, oz, dx, dy, dz, rows=None):
    """Möller–Trumbore with explicit per-component [1, R] ray rows.

    Returns (hit [T,R] bool, t [T,R]); ``hit`` includes the valid-lane mask
    (column 9 of the pack) but NOT the occluder mask. ``rows=(lo, hi)``
    restricts to a static row range of the triangle ref — sliced per
    COLUMN access ([n, 1] loads), the only slice shape Mosaic accepts
    from a (T, 12) VMEM ref (a row view's 12-wide minor dim violates the
    128-lane tiling).
    """
    lo, hi = rows if rows is not None else (0, tri_ref.shape[0])
    col = lambda c: tri_ref[lo:hi, c:c + 1]      # [n, 1]

    v0x, v0y, v0z = col(0), col(1), col(2)
    e1x, e1y, e1z = col(3) - v0x, col(4) - v0y, col(5) - v0z
    e2x, e2y, e2z = col(6) - v0x, col(7) - v0y, col(8) - v0z

    # pvec = d × e2  → [T, R]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    not_par = jnp.abs(det) > DET_EPS
    inv_det = 1.0 / jnp.where(not_par, det, 1.0)

    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    # qvec = tvec × e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

    valid = col(9) > 0.5
    hit = (
        not_par
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > T_MIN)
        & valid
    )
    return hit, t


def _mt_block(tri_ref, o_ref, d_ref, rows=None):
    """Möller–Trumbore for one [T_BLK x R_BLK] block ([3, R] ray refs)."""
    row = lambda ref, c: ref[c:c + 1, :]
    return _mt_rows(
        tri_ref, row(o_ref, 0), row(o_ref, 1), row(o_ref, 2),
        row(d_ref, 0), row(d_ref, 1), row(d_ref, 2), rows=rows,
    )


def _nearest_init(t_out, idx_out):
    @pl.when(pl.program_id(1) == 0)
    def _():
        t_out[:] = jnp.full_like(t_out, BIG)
        idx_out[:] = jnp.full_like(idx_out, -1)


def _merge_nearest_tile(hit, t, j, t_out, idx_out):
    """Fold one [T_blk, R] tile's (hit, t) into the running best, with
    the first-minimum tie-break (smallest global index among optimal
    lanes). Shared by the classic-MT and Plücker kernels. ``j`` is the
    triangle-block program id, read at kernel top level (interpret mode
    cannot evaluate program_id nested inside a pl.when branch)."""
    key = jnp.where(hit, t, BIG)
    tile_min = jnp.min(key, axis=0, keepdims=True)           # [1, R]

    n_t = hit.shape[0]
    gidx = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0) + j * n_t
    imax = jnp.int32(2**31 - 1)
    cand = jnp.where((key == tile_min) & hit, gidx, imax)
    tile_idx = jnp.min(cand, axis=0, keepdims=True)          # [1, R]

    better = (tile_min < t_out[:]) & (tile_idx != imax)
    t_out[:] = jnp.where(better, tile_min, t_out[:])
    idx_out[:] = jnp.where(better, tile_idx, idx_out[:])


def _nearest_update(tri_ref, o_ref, d_ref, t_out, idx_out, run_pred):
    j = pl.program_id(1)

    @pl.when(run_pred)
    def _():
        hit, t = _mt_block(tri_ref, o_ref, d_ref)
        _merge_nearest_tile(hit, t, j, t_out, idx_out)


def _nearest_kernel_cull(tri_ref, aabb_ref, o_ref, d_ref, t_out, idx_out):
    _nearest_init(t_out, idx_out)  # BEFORE the cull reads t_out as bound
    aabb_hit, nonempty = _aabb_cull(aabb_ref, o_ref, d_ref, t_out[:])
    _nearest_update(
        tri_ref, o_ref, d_ref, t_out, idx_out,
        nonempty & jnp.any(aabb_hit),
    )


def _nearest_kernel_plain(tri_ref, o_ref, d_ref, t_out, idx_out):
    # no AABB operand at all: the SMEM input + its producer ops add real
    # per-launch overhead, so single-block sweeps never see them
    _nearest_init(t_out, idx_out)
    _nearest_update(tri_ref, o_ref, d_ref, t_out, idx_out, jnp.bool_(True))


def _any_hit_init(occ_out):
    @pl.when(pl.program_id(1) == 0)
    def _():
        occ_out[:] = jnp.zeros_like(occ_out)


def _merge_any_tile(hit, t, occluder, maxd_ref, occ_out):
    """Fold one tile's occlusion into the running bits. Shared by the
    classic-MT and Plücker kernels."""
    blocking = hit & occluder & (t < maxd_ref[:] - T_MIN)
    any_block = jnp.max(
        jnp.where(blocking, 1.0, 0.0), axis=0, keepdims=True
    )
    occ_out[:] = jnp.maximum(occ_out[:], any_block)


def _any_hit_update(tri_ref, o_ref, d_ref, maxd_ref, occ_out, run_pred):
    @pl.when(run_pred)
    def _():
        hit, t = _mt_block(tri_ref, o_ref, d_ref)
        occluder = tri_ref[:, 10:11] > 0.5
        _merge_any_tile(hit, t, occluder, maxd_ref, occ_out)


def _any_hit_kernel_cull(tri_ref, aabb_ref, o_ref, d_ref, maxd_ref, occ_out):
    _any_hit_init(occ_out)  # BEFORE the predicate reads occ_out
    aabb_hit, nonempty = _aabb_cull(aabb_ref, o_ref, d_ref, maxd_ref[:])
    _any_hit_update(
        tri_ref, o_ref, d_ref, maxd_ref, occ_out,
        nonempty & jnp.any(aabb_hit & (occ_out[:] < 0.5)),
    )


def _any_hit_kernel_plain(tri_ref, o_ref, d_ref, maxd_ref, occ_out):
    _any_hit_init(occ_out)
    _any_hit_update(
        tri_ref, o_ref, d_ref, maxd_ref, occ_out, jnp.bool_(True)
    )


# ---------------------------------------------------------------------------
# Plücker in-triangle test on the MXU (MT_IMPL = "plucker").
#
# The classic Möller–Trumbore tile is pure VPU work (~54 madds per
# ray-triangle pair, measured 37% of VPU f32 peak). The Plücker
# formulation computes the three edge side tests as K=8 matmuls
# side_e = [E_dir | E_mom][T, 8] @ [o×d | d | 0 0][8, R] on the MXU
# (idle in the classic kernel), leaving a short VPU epilogue: the
# subtract-first plane t — t = n·(v0−o)/(n·d) with n = e1×e2
# UNNORMALIZED, so the parallel rejection |n·d| > DET_EPS matches the
# classic |det| test exactly (det = −d·n) — sign checks, and the same
# min/tie-break merge. Winner selection agrees with classic MT except
# on boundary-grazing pairs (different arithmetic → different ulps), so
# this is NOT part of the bit-exactness family; it is a measured
# go/no-go lever (scripts/mxu_probe.py prices the primitive, the bench
# queue prices it end-to-end) and defaults off.


def _plucker_packs(tripack):
    """Derive the Plücker operands from the standard pack (XLA-side,
    loop-invariant — hoisted out of any render scan): three [T, 8]
    edge packs (dir | moment | pad2) and one [T, 12] plane pack
    (n_unnormalized | v0 | valid | occluder | pad4)."""
    v0, v1, v2 = tripack[:, 0:3], tripack[:, 3:6], tripack[:, 6:9]
    t = tripack.shape[0]
    zeros2 = jnp.zeros((t, 2), tripack.dtype)
    epacks = [
        jnp.concatenate([b - a, jnp.cross(a, b), zeros2], axis=1)
        for a, b in ((v0, v1), (v1, v2), (v2, v0))
    ]
    n = jnp.cross(v1 - v0, v2 - v0)
    nv = jnp.concatenate(
        [n, v0, tripack[:, 9:11], jnp.zeros((t, 4), tripack.dtype)],
        axis=1,
    )
    return epacks, nv


def _plucker_block(e0_ref, e1_ref, e2_ref, nv_ref, o_ref, d_ref):
    """(hit [T, R] incl. valid mask, t [T, R]) for one tile — the
    Plücker analogue of ``_mt_block``."""
    row = lambda ref, k: ref[k:k + 1, :]
    ox, oy, oz = row(o_ref, 0), row(o_ref, 1), row(o_ref, 2)
    dx, dy, dz = row(d_ref, 0), row(d_ref, 1), row(d_ref, 2)
    # ray Plücker rows [8, R]: (o × d | d | 0 | 0)
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    p8 = jnp.concatenate(
        [mx, my, mz, dx, dy, dz, jnp.zeros_like(dx), jnp.zeros_like(dx)],
        axis=0,
    )

    def side(e_ref):
        return jax.lax.dot_general(
            e_ref[:, :], p8,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, R] on the MXU

    s0, s1, s2 = side(e0_ref), side(e1_ref), side(e2_ref)
    inside = ((s0 >= 0.0) & (s1 >= 0.0) & (s2 >= 0.0)) | (
        (s0 <= 0.0) & (s1 <= 0.0) & (s2 <= 0.0)
    )

    col = lambda c: nv_ref[:, c:c + 1]            # [T, 1]
    nx, ny, nz = col(0), col(1), col(2)
    nd = nx * dx + ny * dy + nz * dz              # = −det of classic MT
    not_par = jnp.abs(nd) > DET_EPS
    t = (
        nx * (col(3) - ox) + ny * (col(4) - oy) + nz * (col(5) - oz)
    ) / jnp.where(not_par, nd, 1.0)
    valid = col(6) > 0.5
    return inside & not_par & (t > T_MIN) & valid, t


def _nearest_kernel_plucker_plain(e0_ref, e1_ref, e2_ref, nv_ref,
                                  o_ref, d_ref, t_out, idx_out):
    _nearest_init(t_out, idx_out)
    hit, t = _plucker_block(e0_ref, e1_ref, e2_ref, nv_ref, o_ref, d_ref)
    _merge_nearest_tile(hit, t, pl.program_id(1), t_out, idx_out)


def _nearest_kernel_plucker_cull(e0_ref, e1_ref, e2_ref, nv_ref, aabb_ref,
                                 o_ref, d_ref, t_out, idx_out):
    _nearest_init(t_out, idx_out)
    aabb_hit, nonempty = _aabb_cull(aabb_ref, o_ref, d_ref, t_out[:])
    j = pl.program_id(1)

    @pl.when(nonempty & jnp.any(aabb_hit))
    def _():
        hit, t = _plucker_block(
            e0_ref, e1_ref, e2_ref, nv_ref, o_ref, d_ref
        )
        _merge_nearest_tile(hit, t, j, t_out, idx_out)


def _any_hit_kernel_plucker_plain(e0_ref, e1_ref, e2_ref, nv_ref,
                                  o_ref, d_ref, maxd_ref, occ_out):
    _any_hit_init(occ_out)
    hit, t = _plucker_block(e0_ref, e1_ref, e2_ref, nv_ref, o_ref, d_ref)
    _merge_any_tile(hit, t, nv_ref[:, 7:8] > 0.5, maxd_ref, occ_out)


def _any_hit_kernel_plucker_cull(e0_ref, e1_ref, e2_ref, nv_ref, aabb_ref,
                                 o_ref, d_ref, maxd_ref, occ_out):
    _any_hit_init(occ_out)
    aabb_hit, nonempty = _aabb_cull(aabb_ref, o_ref, d_ref, maxd_ref[:])

    @pl.when(nonempty & jnp.any(aabb_hit & (occ_out[:] < 0.5)))
    def _():
        hit, t = _plucker_block(
            e0_ref, e1_ref, e2_ref, nv_ref, o_ref, d_ref
        )
        _merge_any_tile(hit, t, nv_ref[:, 7:8] > 0.5, maxd_ref, occ_out)


def _plucker_specs(t: int):
    """Block specs for the Plücker operands (grid dim 1 walks triangle
    blocks, like the classic tri_spec)."""
    e_spec = pl.BlockSpec(
        (min(T_BLK, t), 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    nv_spec = pl.BlockSpec(
        (min(T_BLK, t), 12), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    return [e_spec, e_spec, e_spec, nv_spec]


def _sweep_shapes(n, t):
    r_blk = _r_blk(t)
    grid = (pl.cdiv(n, r_blk), pl.cdiv(t, T_BLK))
    tri_spec = pl.BlockSpec(
        (min(T_BLK, t), 12), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    aabb_spec = pl.BlockSpec(
        (1, 1, 8), lambda i, j: (j, 0, 0), memory_space=pltpu.SMEM
    )
    ray_spec = pl.BlockSpec(
        (3, r_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, r_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    return grid, tri_spec, aabb_spec, ray_spec, out_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _nearest_t_idx(o3, d3, tripack):
    """(t [N], idx [N]) best forward hit per ray; idx == -1 on miss.

    o3/d3: f32[3, N] (N a multiple of R_BLK), d3 unit-length.
    """
    n = o3.shape[1]
    t = tripack.shape[0]
    grid, tri_spec, aabb_spec, ray_spec, out_spec = _sweep_shapes(n, t)
    plucker = MT_IMPL == "plucker"
    if plucker:
        epacks, nv = _plucker_packs(tripack)
        tri_args, tri_specs = epacks + [nv], _plucker_specs(t)
    else:
        tri_args, tri_specs = [tripack], [tri_spec]
    if _use_cull(t):
        kernel = (
            _nearest_kernel_plucker_cull if plucker else
            _nearest_kernel_cull
        )
        in_specs = tri_specs + [aabb_spec, ray_spec, ray_spec]
        args = (*tri_args, _block_aabbs(tripack, min(T_BLK, t)), o3, d3)
    else:
        kernel = (
            _nearest_kernel_plucker_plain if plucker else
            _nearest_kernel_plain
        )
        in_specs = tri_specs + [ray_spec, ray_spec]
        args = (*tri_args, o3, d3)
    t_out, idx_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), o3.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * n * t, bytes_accessed=(n * 6 + t * 12) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)
    return t_out[0], idx_out[0]


def _nearest_fwd(o3, d3, tripack):
    t, idx = _nearest_t_idx(o3, d3, tripack)
    return (t, idx), (o3, d3, tripack, idx)


def _nearest_bwd(res, cots):
    """dt flows through a per-ray re-solve of MT on the winning triangle;
    the discrete index gets no gradient (detached visibility)."""
    o3, d3, tripack, idx = res
    dt = cots[0]
    safe_idx = jnp.maximum(idx, 0)
    dt = jnp.where(idx >= 0, dt, 0.0)

    def t_of(o3_, d3_, pack_):
        o = o3_.T
        d = d3_.T
        w = pack_[safe_idx]
        _, t = intersect_moller(o, d, w[:, 0:3], w[:, 3:6], w[:, 6:9])
        return t

    _, vjp = jax.vjp(t_of, o3, d3, tripack)
    return vjp(dt)


_nearest_t_idx.defvjp(_nearest_fwd, _nearest_bwd)


def nearest_t_idx_cm(o3, d3_unit, scene):
    """Component-major kernel entry: o3/d3_unit f32[3, N] (N unpadded).
    Returns (t [N] — 0 on miss, idx [N] — -1 on miss). No transposes: the
    kernel layout IS the caller's layout."""
    n = o3.shape[1]
    tripack = pack_triangles(
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.tri_valid, scene.tri_occluder,
    )
    tripack = _pad_dim(tripack, min(T_BLK, max(tripack.shape[0], 1)), axis=0)
    r_blk = _r_blk(tripack.shape[0])
    o3p = _pad_dim(o3, r_blk, axis=1, value=1e6)
    d3p = _pad_dim(d3_unit, r_blk, axis=1, value=1.0)
    t, idx = _nearest_t_idx(o3p, d3p, tripack)
    t, idx = t[:n], idx[:n]
    return jnp.where(idx >= 0, t, 0.0), idx


def any_hit_pallas_cm(o3, d3_unit, max_dist, scene):
    """Component-major any-hit: o3/d3_unit f32[3, M], max_dist [M]."""
    n = o3.shape[1]
    sg = lax.stop_gradient
    tripack = pack_triangles(
        sg(scene.tri_v0), sg(scene.tri_v1), sg(scene.tri_v2),
        scene.tri_valid, scene.tri_occluder,
    )
    tripack = _pad_dim(tripack, min(T_BLK, max(tripack.shape[0], 1)), axis=0)
    r_blk = _r_blk(tripack.shape[0])
    o3p = _pad_dim(sg(o3), r_blk, axis=1, value=1e6)
    d3p = _pad_dim(sg(d3_unit), r_blk, axis=1, value=1.0)
    maxd = _pad_dim(sg(max_dist)[None, :], r_blk, axis=1)
    return _any_hit_call(tripack, o3p, d3p, maxd)[:n]


def _any_hit_call(tripack, o3, d3, maxd):
    t_count = tripack.shape[0]
    grid, tri_spec, aabb_spec, ray_spec, out_spec = _sweep_shapes(
        o3.shape[1], t_count
    )
    maxd_spec = pl.BlockSpec(
        (1, _r_blk(t_count)), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    plucker = MT_IMPL == "plucker"
    if plucker:
        epacks, nv = _plucker_packs(tripack)
        tri_args, tri_specs = epacks + [nv], _plucker_specs(t_count)
    else:
        tri_args, tri_specs = [tripack], [tri_spec]
    if _use_cull(t_count):
        kernel = (
            _any_hit_kernel_plucker_cull if plucker else
            _any_hit_kernel_cull
        )
        in_specs = tri_specs + [aabb_spec, ray_spec, ray_spec, maxd_spec]
        args = (
            *tri_args, _block_aabbs(tripack, min(T_BLK, t_count)), o3, d3,
            maxd,
        )
    else:
        kernel = (
            _any_hit_kernel_plucker_plain if plucker else
            _any_hit_kernel_plain
        )
        in_specs = tri_specs + [ray_spec, ray_spec, maxd_spec]
        args = (*tri_args, o3, d3, maxd)
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((1, o3.shape[1]), o3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=60 * o3.shape[1] * t_count,
            bytes_accessed=(o3.shape[1] * 7 + t_count * 12) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)
    return occ[0] > 0.5


def nearest_hit_pallas(origin, direction, scene) -> NearestHit:
    """Drop-in fast-mode replacement for ``ops.geometry.nearest_hit``."""
    d_unit = safe_normalize(direction)
    t, idx = nearest_t_idx_cm(origin.T, d_unit.T, scene)
    found = idx >= 0
    safe_idx = jnp.maximum(idx, 0)
    point = origin + d_unit * t[:, None]
    from pathtracerpython_tpu.ops.geometry import resolve_hit_attributes

    normal, material, is_light = resolve_hit_attributes(
        scene, safe_idx, found
    )
    return NearestHit(
        hit=found,
        t=t,
        tri_idx=safe_idx,
        point=point,
        normal=normal,
        material=material,
        is_light=is_light,
    )


def any_hit_pallas(origin, direction, max_dist, scene) -> jax.Array:
    """Drop-in fast-mode replacement for ``ops.geometry.any_hit_within``.

    Occlusion is binary → detached from the autodiff graph (visibility
    gradients are boundary terms, handled elsewhere), hence the
    stop_gradient inside the cm entry.
    """
    d_unit = safe_normalize(direction)
    return any_hit_pallas_cm(origin.T, d_unit.T, max_dist, scene)
