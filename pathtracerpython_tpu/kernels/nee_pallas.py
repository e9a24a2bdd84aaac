"""Fused next-event-estimation megakernel (fast mode).

One kernel per bounce does the whole direct-lighting estimate: pick a
light triangle per sample (area-CDF compare-and-count), sample a point
(sqrt-trick barycentrics), form the shadow ray, sweep occluders with the
tiled Möller–Trumbore test, and accumulate the occlusion-masked clamped
cosine mean — all without materializing the [3, S·N] shadow-ray batch or
its [S, N] distance/cosine intermediates in HBM.

Uniform consumption matches the unfused path exactly (rows 5s+0..2 of the
[S·5, N] draw block), so fused and unfused renders are bit-comparable.

Gradients: occlusion is discrete (detached, as everywhere else); the
smooth chain light_pt(u, light verts) → sdir → cosine carries d/d(point,
normal, light vertices) via a custom VJP that recomputes it in plain JAX
masked by the kernel's occlusion bits — forward pays no autodiff tax,
backward costs S·N elementwise math (no sweeps).
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
    T_BLK,
    T_MIN,
    _aabb_cull_rows,
    _block_aabbs,
    _interpret,
    _mt_rows,
    _pad_dim,
    _r_blk,
    _use_cull,
    pack_triangles,
)


# Fused-path gate: the kernel unrolls the area-CDF pick (1 op/tri) and
# the one-hot vertex select (9 ops/tri) per light triangle per sample —
# linear compile-size growth, so the gate bounds it. 64 keeps grid
# lights (8x8 quads) on the fused path; beyond it the integrator's
# unfused composition takes over (tests/test_large_scene.py).
FUSED_NEE_MAX_LIGHT_TRIS = 64


def _nee_body(
    tripack_ref, lp_ref, point_ref, normal_ref, u_ref, valid_ref,
    mc_out, occ_out, sdir_scr, dist_scr, cos_scr,
    *, s_samples: int, l_tris: int, cull: bool, aabb_ref=None,
):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        # light-sample geometry once per ray block, kept in VMEM scratch
        total = lp_ref[l_tris - 1, 9]
        px = point_ref[0:1, :]
        py = point_ref[1:2, :]
        pz = point_ref[2:3, :]
        nx = normal_ref[0:1, :]
        ny = normal_ref[1:2, :]
        nz = normal_ref[2:3, :]
        for s in range(s_samples):
            u_pick = u_ref[5 * s:5 * s + 1, :]
            u1 = u_ref[5 * s + 1:5 * s + 2, :]
            u2 = u_ref[5 * s + 2:5 * s + 3, :]
            x = u_pick * total
            # area-CDF pick, compare-and-count (pick_light_triangle)
            idx = jnp.zeros_like(x)
            for l in range(l_tris - 1):
                idx = idx + (x >= lp_ref[l, 9]).astype(x.dtype)
            # select the picked triangle's vertices (L small, unrolled)
            v = [jnp.zeros_like(x) for _ in range(9)]
            for l in range(l_tris):
                sel = (idx == float(l)).astype(x.dtype)
                for c in range(9):
                    v[c] = v[c] + sel * lp_ref[l, c]
            # sqrt-trick barycentrics (cm_sample_barycentric_uniform)
            su = jnp.sqrt(u1)
            b0 = 1.0 - su
            b1 = su * (1.0 - u2)
            b2 = su * u2
            lx = b0 * v[0] + b1 * v[3] + b2 * v[6]
            ly = b0 * v[1] + b1 * v[4] + b2 * v[7]
            lz = b0 * v[2] + b1 * v[5] + b2 * v[8]
            vx = lx - px
            vy = ly - py
            vz = lz - pz
            sq = vx * vx + vy * vy + vz * vz
            dist = jnp.sqrt(sq + 1e-24)
            inv = lax.rsqrt(jnp.maximum(sq, 1e-30))
            sx = vx * inv
            sy = vy * inv
            sz = vz * inv
            sdir_scr[3 * s:3 * s + 1, :] = sx
            sdir_scr[3 * s + 1:3 * s + 2, :] = sy
            sdir_scr[3 * s + 2:3 * s + 3, :] = sz
            # padded ray lanes get dist 0: their in-kernel shadow rays
            # would otherwise aim back through the scene and keep the
            # AABB-cull predicate alive for the final ray block
            dist_scr[s:s + 1, :] = dist * valid_ref[0:1, :]
            cos_scr[s:s + 1, :] = jnp.maximum(
                sx * nx + sy * ny + sz * nz, 0.0
            )
            occ_out[s:s + 1, :] = jnp.zeros_like(x)

    # occlusion sweep for this triangle block, every sample. All scratch
    # access is single-row ([1, R]) — multi-row sublane slices must be
    # 8-aligned on Mosaic.
    p_rows = [point_ref[k:k + 1, :] for k in range(3)]
    for s in range(s_samples):
        dist = dist_scr[s:s + 1, :]
        d_rows = [sdir_scr[3 * s + k:3 * s + k + 1, :] for k in range(3)]
        if cull:
            aabb_hit, nonempty = _aabb_cull_rows(
                aabb_ref, p_rows, d_rows, dist
            )
            run = nonempty & jnp.any(aabb_hit & (occ_out[s:s + 1, :] < 0.5))
        else:
            run = jnp.bool_(True)

        @pl.when(run)
        def _(s=s, dist=dist, d_rows=d_rows):
            hit, t = _mt_rows(
                tripack_ref, p_rows[0], p_rows[1], p_rows[2],
                d_rows[0], d_rows[1], d_rows[2],
            )
            occluder = tripack_ref[:, 10:11] > 0.5
            blocking = hit & occluder & (t < dist - T_MIN)
            any_block = jnp.max(
                jnp.where(blocking, 1.0, 0.0), axis=0, keepdims=True
            )
            occ_out[s:s + 1, :] = jnp.maximum(occ_out[s:s + 1, :], any_block)

    @pl.when(j == n_j - 1)
    def _():
        acc = None
        for s in range(s_samples):
            term = jnp.where(
                occ_out[s:s + 1, :] > 0.5, 0.0, cos_scr[s:s + 1, :]
            )
            acc = term if acc is None else acc + term
        mc_out[:] = acc / float(s_samples)


def _light_pack(scene):
    """[L, 12]: v0.xyz | v1.xyz | v2.xyz | cum_area | 0 | 0."""
    cum = jnp.cumsum(scene.light_area)
    return jnp.concatenate(
        [
            scene.light_v0, scene.light_v1, scene.light_v2,
            cum[:, None],
            jnp.zeros((scene.light_v0.shape[0], 2), scene.light_v0.dtype),
        ],
        axis=1,
    )


def _nee_call(point3, normal3, u, valid, tripack, lightpack,
              s_samples: int):
    n_pad = point3.shape[1]
    t_count = tripack.shape[0]
    l_tris = lightpack.shape[0]
    r_blk = _r_blk(t_count)
    grid = (pl.cdiv(n_pad, r_blk), pl.cdiv(t_count, T_BLK))
    cull = _use_cull(t_count)

    tri_spec = pl.BlockSpec(
        (min(T_BLK, t_count), 12), lambda i, j: (j, 0),
        memory_space=pltpu.VMEM,
    )
    lp_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec(
        (3, r_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    u_spec = pl.BlockSpec(
        (5 * s_samples, r_blk), lambda i, j: (0, i),
        memory_space=pltpu.VMEM,
    )
    mc_spec = pl.BlockSpec(
        (1, r_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )
    occ_spec = pl.BlockSpec(
        (s_samples, r_blk), lambda i, j: (0, i), memory_space=pltpu.VMEM
    )

    if cull:
        aabbs = _block_aabbs(tripack, min(T_BLK, t_count))
        aabb_spec = pl.BlockSpec(
            (1, 1, 8), lambda i, j: (j, 0, 0), memory_space=pltpu.SMEM
        )

        def kernel_cull(tri_ref, aabb_ref, lp_ref, p_ref, n_ref, u_ref,
                        v_ref, mc_out, occ_out, sd, di, co):
            _nee_body(
                tri_ref, lp_ref, p_ref, n_ref, u_ref, v_ref, mc_out,
                occ_out, sd, di, co, s_samples=s_samples, l_tris=l_tris,
                cull=True, aabb_ref=aabb_ref,
            )

        in_specs = [tri_spec, aabb_spec, lp_spec, vec_spec, vec_spec,
                    u_spec, mc_spec]
        args = (tripack, aabbs, lightpack, point3, normal3, u, valid)
        kern = kernel_cull
    else:
        def kernel_plain(tri_ref, lp_ref, p_ref, n_ref, u_ref, v_ref,
                         mc_out, occ_out, sd, di, co):
            _nee_body(
                tri_ref, lp_ref, p_ref, n_ref, u_ref, v_ref, mc_out,
                occ_out, sd, di, co, s_samples=s_samples, l_tris=l_tris,
                cull=False,
            )

        in_specs = [tri_spec, lp_spec, vec_spec, vec_spec, u_spec, mc_spec]
        args = (tripack, lightpack, point3, normal3, u, valid)
        kern = kernel_plain

    mc, occ = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[mc_spec, occ_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), point3.dtype),
            jax.ShapeDtypeStruct((s_samples, n_pad), point3.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((3 * s_samples, r_blk), point3.dtype),
            pltpu.VMEM((s_samples, r_blk), point3.dtype),
            pltpu.VMEM((s_samples, r_blk), point3.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * n_pad * t_count * s_samples,
            bytes_accessed=(n_pad * (7 + 6 * s_samples) + t_count * 12) * 4,
            transcendentals=2 * n_pad * s_samples,
        ),
        interpret=_interpret(),
    )(*args)
    return mc, occ


def _smooth_mean_cos(point3, normal3, lv0, lv1, lv2, light_area, u, occ,
                     s_samples: int):
    """The differentiable part of the estimate, recomputed in plain JAX for
    the backward pass: identical formulas to the kernel, occlusion fixed."""
    n = point3.shape[1]
    u = u.reshape(s_samples, 5, n)
    cum = jnp.cumsum(light_area)
    total = cum[-1]
    x = u[:, 0] * total                    # [S, N]
    idx = jnp.zeros(x.shape, jnp.int32)
    for l in range(light_area.shape[0] - 1):
        idx = idx + (x >= cum[l]).astype(jnp.int32)
    lv = jnp.concatenate([lv0, lv1, lv2], axis=1).T[:, idx]  # [9, S, N]
    su = jnp.sqrt(u[:, 1])
    b0, b1, b2 = 1.0 - su, su * (1.0 - u[:, 2]), su * u[:, 2]
    lp = (
        b0[None] * lv[0:3] + b1[None] * lv[3:6] + b2[None] * lv[6:9]
    )                                       # [3, S, N]
    vec = lp - point3[:, None, :]
    sq = jnp.sum(vec * vec, axis=0)
    inv = lax.rsqrt(jnp.maximum(sq, 1e-30))
    sdir = vec * inv[None]
    cos = jnp.maximum(jnp.sum(sdir * normal3[:, None, :], axis=0), 0.0)
    masked = jnp.where(occ > 0.5, 0.0, cos)
    return jnp.sum(masked, axis=0)[None, :] / float(s_samples)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def nee_mean_cos(point3, normal3, lv0, lv1, lv2, light_area, u, tripack,
                 lightpack, s_samples):
    mc, _ = _nee_fwd_impl(
        point3, normal3, lv0, lv1, lv2, light_area, u, tripack, lightpack,
        s_samples,
    )
    return mc


def _nee_fwd_impl(point3, normal3, lv0, lv1, lv2, light_area, u, tripack,
                  lightpack, s_samples):
    n = point3.shape[1]
    r_blk = _r_blk(tripack.shape[0])
    p3 = _pad_dim(point3, r_blk, axis=1, value=1e6)
    n3 = _pad_dim(normal3, r_blk, axis=1, value=1.0)
    up = _pad_dim(u, r_blk, axis=1, value=0.5)
    valid = _pad_dim(
        jnp.ones((1, n), point3.dtype), r_blk, axis=1, value=0.0
    )
    mc, occ = _nee_call(
        lax.stop_gradient(p3), lax.stop_gradient(n3),
        lax.stop_gradient(up), valid, lax.stop_gradient(tripack),
        lax.stop_gradient(lightpack), s_samples,
    )
    return mc[:, :n], occ[:, :n]


def _nee_vjp_fwd(point3, normal3, lv0, lv1, lv2, light_area, u, tripack,
                 lightpack, s_samples):
    mc, occ = _nee_fwd_impl(
        point3, normal3, lv0, lv1, lv2, light_area, u, tripack, lightpack,
        s_samples,
    )
    return mc, (point3, normal3, lv0, lv1, lv2, light_area, u, occ,
                tripack, lightpack)


def _nee_vjp_bwd(s_samples, res, g):
    (point3, normal3, lv0, lv1, lv2, light_area, u, occ,
     tripack, lightpack) = res

    def f(p3, n3, a, b, c):
        return _smooth_mean_cos(
            p3, n3, a, b, c, light_area, u, occ, s_samples
        )

    _, vjp = jax.vjp(f, point3, normal3, lv0, lv1, lv2)
    dp, dn, da, db, dc = vjp(g)
    # occlusion geometry and the discrete draws are detached by design
    return (dp, dn, da, db, dc, jnp.zeros_like(light_area),
            jnp.zeros_like(u), jnp.zeros_like(tripack),
            jnp.zeros_like(lightpack))


nee_mean_cos.defvjp(_nee_vjp_fwd, _nee_vjp_bwd)


def nee_mean_cos_fused(point3, normal3, u, scene, s_samples: int):
    """Entry point for the integrator: fused fast-mode NEE mean-cos [1, N].

    Consumes rows 5s+0..2 of ``u`` [S·5, N] — the identical uniforms the
    unfused path uses, so results are equivalent up to fp reassociation.
    """
    tripack = pack_triangles(
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.tri_valid, scene.tri_occluder,
    )
    tripack = _pad_dim(tripack, min(T_BLK, max(tripack.shape[0], 1)), axis=0)
    lightpack = _light_pack(scene)
    return nee_mean_cos(
        point3, normal3, scene.light_v0, scene.light_v1, scene.light_v2,
        scene.light_area, u, tripack, lightpack, s_samples,
    )
