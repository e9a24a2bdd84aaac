"""Fused whole-bounce megakernel (fast mode, small scenes).

One Pallas launch per bounce does EVERYTHING the wavefront loop needs:
nearest-hit sweep, material resolve, next-event estimation (light pick +
occlusion sweep + cosine mean), shading, and BRDF scatter — reading the
ray state from HBM once and writing the new state once. This replaces,
for VMEM-resident scenes, the per-bounce composition of two kernel
launches (``intersect_pallas`` nearest + ``nee_pallas`` NEE) plus the XLA
glue between them (gathers, normal flips, scatter math, state updates),
whose HBM round-trips dominated the remaining render time on the Cornell
headline benchmark (docs/PERFORMANCE.md: 14 ms kernels vs ~13 ms glue at
512²·4spp·4bounce).

Scope (the integrator gates on ``fused_bounce_supported``):

- fast mode only — the estimator here is the *fixed* one (clamped
  cosines, uniform barycentrics, arrival-side shading normals, no
  emission double count); the reference-parity path stays on the
  composed kernels. The per-phase semantics mirror the reference's
  structure: nearest hit (``/root/reference/main.py:83-122``), NEE
  (``main.py:23-73``), ambient+direct shading (``main.py:142-145``),
  diffuse/specular scatter (``main.py:233-268``) — each with the
  fast-mode fixes documented in render/integrator.py.
- the whole (padded) triangle buffer must fit one VMEM block
  (``FUSED_BOUNCE_MAX_TRIS``) and the light mesh must be small enough to
  unroll (``FUSED_NEE_MAX_LIGHT_TRIS``); large scenes keep the sparse
  hierarchy path, which this kernel deliberately does not replicate.

Gradients: a ``jax.custom_vjp`` recomputes the bounce in plain JAX with
the kernel's DISCRETE results pinned (winner index, per-sample occlusion
bits) — the same recompute-under-forced-discretes scheme as
``nee_pallas.nee_mean_cos``. The smooth chains (hit distance via a
per-winner Möller–Trumbore re-solve, shading, scatter factors) carry
d/d(origin, direction, throughput, radiance, scene params); discrete
visibility and branch choices are detached, exactly like the unfused
path's gradient discipline.

RNG consumption matches the unfused path row-for-row (u_nee rows 5s+0..2,
u_scatter rows 0..2), so fused and unfused renders are equivalent up to
fp reassociation inside the kernel.
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
    _interpret,
    _mt_rows,
    _pad_dim,
    _r_blk,
    pack_triangles,
)
from pathtracerpython_tpu.kernels.nee_pallas import (
    FUSED_NEE_MAX_LIGHT_TRIS,
    _light_pack,
    _smooth_mean_cos,
)

IMAX = 2**31 - 1
TAU = 6.283185307179586  # float(2*pi) — fast mode (not the reference's 6.28)

# The kernel holds the full triangle pack in one VMEM block and sweeps it
# twice per NEE sample plus once for the nearest hit; past one T_BLK the
# composed kernels' grid pipelining wins.
FUSED_BOUNCE_MAX_TRIS = T_BLK


def fused_bounce_supported(scene, cfg) -> bool:
    """Gate shared with render/integrator.py. True when the whole-bounce
    megakernel covers this (scene, config) combination."""
    from pathtracerpython_tpu.kernels.sparse_pallas import resolve_accel

    return (
        cfg.mode == "fast"
        and cfg.backend == "pallas"
        and cfg.geom_axis is None
        and cfg.soft_vis_beta == 0.0
        and cfg.sort_rays != "on"  # sorting parks dead lanes in separate
        #  sweep arrays the fused kernel does not consume (and only pays
        #  on the accelerated paths, which are excluded below anyway)
        # an explicit (or auto-resolved) hierarchy choice wins over fusion
        and resolve_accel(cfg.accel, scene.num_padded_triangles) == "none"
        and scene.num_padded_triangles <= FUSED_BOUNCE_MAX_TRIS
        and scene.light_v0.shape[0] <= FUSED_NEE_MAX_LIGHT_TRIS
    )


def _shade_pack(scene) -> jax.Array:
    """f32[T, 12] per-triangle shading attributes, padded like the
    triangle pack: normal.xyz | rgb.xyz | ka | kd | ks | is_light | 0 | 0.
    Materials are pre-resolved per triangle so the kernel's winner
    one-hot reads every attribute with one [T, R] multiply-accumulate."""
    m = scene.tri_material
    rgb = scene.mat_rgb[m]
    f = scene.tri_normal.dtype
    cols = [
        scene.tri_normal,
        rgb,
        scene.mat_ka[m][:, None],
        scene.mat_kd[m][:, None],
        scene.mat_ks[m][:, None],
        scene.tri_is_light.astype(f)[:, None],
        jnp.zeros((m.shape[0], 2), f),
    ]
    return jnp.concatenate(cols, axis=1)


# In-kernel RNG: compute the threefry draws on [1, R] rows inside the
# kernel (ops/rng.py formulas verbatim -> bit-identical uniforms) instead
# of streaming 5S+3 precomputed rows through HBM per bounce. Flag-gated:
# flip to False if a Mosaic lowering gap (u32 shifts / bitcast) surfaces
# on real hardware — the uniforms-operand variant below stays compiled
# into the fallback path either way, and bench.py degrades gracefully.
RNG_IN_KERNEL = True


_TF_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _threefry_rows(k0, k1, x0, h: int):
    """Threefry-2x32 on a [1, R] u32 counter row, kernel-safe: every
    constant is a python int immediate (Pallas rejects captured jnp
    constants, which rules out ops.rng.threefry2x32's module globals).
    Bit-identical to ops.rng.threefry2x32(k0, k1, cnt, h)."""
    x1 = jnp.zeros_like(x0) + h
    ks = (k0, k1, k0 ^ k1 ^ 0x1BD11BDA)
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]

    def rotl(x, r):
        return (x << r) | (x >> (32 - r))

    for block in range(5):
        rots = _TF_ROT[0:4] if block % 2 == 0 else _TF_ROT[4:8]
        for r in rots:
            x0 = x0 + x1
            x1 = rotl(x1, r) ^ x0
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + (block + 1)
    return x0, x1


def _kernel_uniform_rows(k0, k1, cnt_u32, draws):
    """{draw d: [1, R] f32} replicating ops.rng.uniforms row d exactly
    (same hash per d >> 1, y0/y1 parity pick); hashes are cached so
    sibling draws share one threefry evaluation."""
    cache = {}
    out = {}
    for d in draws:
        h = d >> 1
        if h not in cache:
            cache[h] = _threefry_rows(k0, k1, cnt_u32, h)
        bits = cache[h][d & 1]
        f = (bits >> 9) | 0x3F800000
        out[d] = jax.lax.bitcast_convert_type(f, jnp.float32) - 1.0
    return out


def _bounce_kernel(
    tri_ref, shade_ref, lp_ref, scal_ref,
    o_ref, d_ref, du_ref, rad_ref, aux_ref, unee_ref, uscat_ref,
    o_out, d_out, rad_out, aux_out, idx_out, occ_out,
    *, s_samples: int, l_tris: int, use_background: bool,
):
    get_nee = lambda d: unee_ref[d:d + 1, :]
    get_scat = lambda d: uscat_ref[d:d + 1, :]
    _bounce_core(
        tri_ref, shade_ref, lp_ref, scal_ref, o_ref, d_ref, du_ref,
        rad_ref, aux_ref, get_nee, get_scat,
        o_out, d_out, rad_out, aux_out, idx_out, occ_out,
        s_samples=s_samples, l_tris=l_tris, use_background=use_background,
    )


def _bounce_kernel_rng(
    tri_ref, shade_ref, lp_ref, scal_ref,
    o_ref, d_ref, du_ref, rad_ref, aux_ref, keys_ref, cnt_ref,
    o_out, d_out, rad_out, aux_out, idx_out, occ_out,
    *, s_samples: int, l_tris: int, use_background: bool,
):
    cnt = cnt_ref[0:1, :].astype(jnp.uint32)
    key = lambda k: keys_ref[0, 0, k].astype(jnp.uint32)
    nee_draws = [5 * s + j for s in range(s_samples) for j in range(3)]
    u_nee = _kernel_uniform_rows(key(0), key(1), cnt, nee_draws)
    u_scat = _kernel_uniform_rows(key(2), key(3), cnt, [0, 1, 2])
    _bounce_core(
        tri_ref, shade_ref, lp_ref, scal_ref, o_ref, d_ref, du_ref,
        rad_ref, aux_ref, u_nee.__getitem__, u_scat.__getitem__,
        o_out, d_out, rad_out, aux_out, idx_out, occ_out,
        s_samples=s_samples, l_tris=l_tris, use_background=use_background,
    )


def _bounce_core(
    tri_ref, shade_ref, lp_ref, scal_ref,
    o_ref, d_ref, du_ref, rad_ref, aux_ref, get_nee, get_scat,
    o_out, d_out, rad_out, aux_out, idx_out, occ_out,
    *, s_samples: int, l_tris: int, use_background: bool,
):
    row = lambda ref, k: ref[k:k + 1, :]
    ox, oy, oz = row(o_ref, 0), row(o_ref, 1), row(o_ref, 2)
    dx, dy, dz = row(d_ref, 0), row(d_ref, 1), row(d_ref, 2)
    # unit direction comes in precomputed by XLA's normalize3: its 3-term
    # sum reduction rounds differently from the in-kernel add chain on
    # ~1e-3 of lanes, and bit-matching the unfused path keeps the
    # fused-vs-unfused comparison (and sweep results) exact
    ux, uy, uz = row(du_ref, 0), row(du_ref, 1), row(du_ref, 2)
    tp = row(aux_ref, 0)
    alive = row(aux_ref, 1) > 0.5
    prevspec = row(aux_ref, 2) > 0.5
    valid = row(aux_ref, 3)

    # --- nearest hit (one VMEM-resident triangle tile) ------------------
    hit, t = _mt_rows(tri_ref, ox, oy, oz, ux, uy, uz)
    key = jnp.where(hit, t, BIG)
    best_t = jnp.min(key, axis=0, keepdims=True)                 # [1, R]
    gidx = jax.lax.broadcasted_iota(jnp.int32, key.shape, 0)
    cand = jnp.where((key == best_t) & hit, gidx, IMAX)
    best_idx = jnp.min(cand, axis=0, keepdims=True)              # [1, R]
    found = best_idx != IMAX
    idx_out[:] = jnp.where(found, best_idx, -1)
    t_row = jnp.where(found, best_t, 0.0)
    px, py, pz = ox + ux * t_row, oy + uy * t_row, oz + uz * t_row

    # --- per-winner attribute resolve (one-hot mac over the tile) -------
    safe_idx = jnp.where(found, best_idx, 0)
    onehot = (gidx == safe_idx).astype(t_row.dtype)              # [T, R]

    def attr(c):
        return jnp.sum(
            onehot * shade_ref[:, c:c + 1], axis=0, keepdims=True
        )

    nx_, ny_, nz_ = attr(0), attr(1), attr(2)
    cr, cg, cb = attr(3), attr(4), attr(5)
    ka, kd, ks = attr(6), attr(7), attr(8)
    is_light = jnp.where(found, attr(9) > 0.5, False)

    # arrival-side shading normal (integrator.arrival_side_normal)
    sgn = jnp.sign(-(nx_ * ux + ny_ * uy + nz_ * uz) + 1e-12)
    nsx, nsy, nsz = nx_ * sgn, ny_ * sgn, nz_ * sgn

    # --- NEE: pick, sample, occlude, average (nee_pallas math) ----------
    total = lp_ref[l_tris - 1, 9]
    mean = None
    for s in range(s_samples):
        u_pick = get_nee(5 * s)
        u1 = get_nee(5 * s + 1)
        u2 = get_nee(5 * s + 2)
        x = u_pick * total
        pick = jnp.zeros_like(x)
        for l in range(l_tris - 1):
            pick = pick + (x >= lp_ref[l, 9]).astype(x.dtype)
        v = [jnp.zeros_like(x) for _ in range(9)]
        for l in range(l_tris):
            sel = (pick == float(l)).astype(x.dtype)
            for c in range(9):
                v[c] = v[c] + sel * lp_ref[l, c]
        su = jnp.sqrt(u1)
        b0 = 1.0 - su
        b1 = su * (1.0 - u2)
        b2 = su * u2
        lx = b0 * v[0] + b1 * v[3] + b2 * v[6]
        ly = b0 * v[1] + b1 * v[4] + b2 * v[7]
        lz = b0 * v[2] + b1 * v[5] + b2 * v[8]
        vx, vy, vz = lx - px, ly - py, lz - pz
        sq = vx * vx + vy * vy + vz * vz
        dist = jnp.sqrt(sq + 1e-24) * valid
        sinv = lax.rsqrt(jnp.maximum(sq, 1e-30))
        sx, sy, sz = vx * sinv, vy * sinv, vz * sinv
        cos = jnp.maximum(sx * nsx + sy * nsy + sz * nsz, 0.0)

        hit_o, t_o = _mt_rows(tri_ref, px, py, pz, sx, sy, sz)
        occluder = tri_ref[:, 10:11] > 0.5
        blocking = hit_o & occluder & (t_o < dist - T_MIN)
        occ_s = jnp.max(
            jnp.where(blocking, 1.0, 0.0), axis=0, keepdims=True
        )
        occ_out[s:s + 1, :] = occ_s
        term = jnp.where(occ_s > 0.5, 0.0, cos)
        mean = term if mean is None else mean + term
    mean_cos = mean / float(s_samples)

    # --- shade (integrator.shade, fast mode) -----------------------------
    ambient = scal_ref[0, 0, 0]
    light = (scal_ref[0, 0, 1], scal_ref[0, 0, 2], scal_ref[0, 0, 3])
    bg = (scal_ref[0, 0, 4], scal_ref[0, 0, 5], scal_ref[0, 0, 6])
    rgb = (cr, cg, cb)
    contrib = []
    for c in range(3):
        surface = rgb[c] * ka * ambient + light[c] * rgb[c] * mean_cos
        light_c = jnp.where(prevspec, light[c], 0.0)
        color = jnp.where(is_light, light_c, surface)
        miss = bg[c] if use_background else 0.0
        color = jnp.where(found, color, miss)
        contrib.append(jnp.where(alive, color * tp, 0.0))
    for c in range(3):
        rad_out[c:c + 1, :] = rad_ref[c:c + 1, :] + contrib[c]

    # --- scatter (integrator.scatter, fast mode) -------------------------
    u0 = get_scat(0)
    h1 = get_scat(1)
    h2 = get_scat(2)
    r = jnp.sqrt(h1)
    theta = TAU * h2
    xh = r * jnp.cos(theta)
    yh = r * jnp.sin(theta)
    zh = jnp.sqrt(jnp.maximum(0.0, 1.0 - h1))
    # branchless ONB about the shading normal (sampling.cm_build_onb)
    osign = jnp.where(nsz >= 0.0, 1.0, -1.0)
    a = -1.0 / (osign + nsz)
    b = nsx * nsy * a
    tx, ty, tz = 1.0 + osign * nsx * nsx * a, osign * b, -osign * nsx
    bx, by, bz = b, osign + nsy * nsy * a, -nsy
    ddx = xh * tx + yh * bx + zh * nsx
    ddy = xh * ty + yh * by + zh * nsy
    ddz = xh * tz + yh * bz + zh * nsz
    dinv = lax.rsqrt(jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 1e-30))
    ddx, ddy, ddz = ddx * dinv, ddy * dinv, ddz * dinv
    dn = ux * nsx + uy * nsy + uz * nsz
    spx, spy, spz = ux - 2.0 * dn * nsx, uy - 2.0 * dn * nsy, uz - 2.0 * dn * nsz

    w = kd + ks
    p_diff = jnp.where(w > 0.0, kd / jnp.maximum(w, 1e-12), 1.0)
    choose = u0 < p_diff
    ndx = jnp.where(choose, ddx, spx)
    ndy = jnp.where(choose, ddy, spy)
    ndz = jnp.where(choose, ddz, spz)

    survives = found & ~is_light
    alive2 = alive & survives
    aux_out[0:1, :] = jnp.where(alive2, tp * w, tp)
    aux_out[1:2, :] = jnp.where(alive2, 1.0, 0.0)
    aux_out[2:3, :] = jnp.where(alive & ~choose, 1.0, 0.0)
    aux_out[3:4, :] = valid
    for c, (pc, oc) in enumerate(zip((px, py, pz), (ox, oy, oz))):
        o_out[c:c + 1, :] = jnp.where(alive2, pc, oc)
    for c, (nc, dc) in enumerate(zip((ndx, ndy, ndz), (dx, dy, dz))):
        d_out[c:c + 1, :] = jnp.where(alive2, nc, dc)


def _bounce_call(tripack, shadepack, lightpack, scal, o3, d3, d3u, rad3,
                 aux, u_nee, u_scat, s_samples: int, use_background: bool):
    n_pad = o3.shape[1]
    t_count = tripack.shape[0]
    l_tris = lightpack.shape[0]
    r_blk = _r_blk(t_count)
    grid = (pl.cdiv(n_pad, r_blk),)

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    # (1, 1, 8): the proven SMEM shape — TPU lowering wants the last two
    # block dims equal to the array dims when not tile-aligned
    scal_spec = pl.BlockSpec(
        (1, 1, 8), lambda i: (0, 0, 0), memory_space=pltpu.SMEM
    )
    blk = lambda rows: pl.BlockSpec(
        (rows, r_blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    kern = functools.partial(
        _bounce_kernel, s_samples=s_samples, l_tris=l_tris,
        use_background=use_background,
    )
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            whole, whole, whole, scal_spec,
            blk(3), blk(3), blk(3), blk(3), blk(4),
            blk(5 * s_samples), blk(3),
        ],
        out_specs=[blk(3), blk(3), blk(3), blk(4), blk(1), blk(s_samples)],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), o3.dtype),
            jax.ShapeDtypeStruct((3, n_pad), o3.dtype),
            jax.ShapeDtypeStruct((3, n_pad), o3.dtype),
            jax.ShapeDtypeStruct((4, n_pad), o3.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((s_samples, n_pad), o3.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * n_pad * t_count * (1 + s_samples) + 400 * n_pad,
            bytes_accessed=(n_pad * (16 + 8 * s_samples) + t_count * 24) * 4,
            transcendentals=4 * n_pad * (1 + s_samples),
        ),
        interpret=_interpret(),
    )(tripack, shadepack, lightpack, scal, o3, d3, d3u, rad3, aux, u_nee,
      u_scat)
    return outs


def _bounce_call_rng(tripack, shadepack, lightpack, scal, o3, d3, d3u,
                     rad3, aux, keys4, cnt, s_samples: int,
                     use_background: bool):
    n_pad = o3.shape[1]
    t_count = tripack.shape[0]
    l_tris = lightpack.shape[0]
    r_blk = _r_blk(t_count)
    grid = (pl.cdiv(n_pad, r_blk),)

    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    # (1, 1, 8): the proven SMEM shape — TPU lowering wants the last two
    # block dims equal to the array dims when not tile-aligned
    scal_spec = pl.BlockSpec(
        (1, 1, 8), lambda i: (0, 0, 0), memory_space=pltpu.SMEM
    )
    keys_spec = pl.BlockSpec(
        (1, 1, 4), lambda i: (0, 0, 0), memory_space=pltpu.SMEM
    )
    blk = lambda rows: pl.BlockSpec(
        (rows, r_blk), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    kern = functools.partial(
        _bounce_kernel_rng, s_samples=s_samples, l_tris=l_tris,
        use_background=use_background,
    )
    # threefry: ~8 hashes x 20 rounds x ~4 int ops per lane
    rng_ops = 650 * n_pad
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            whole, whole, whole, scal_spec,
            blk(3), blk(3), blk(3), blk(3), blk(4),
            keys_spec, blk(1),
        ],
        out_specs=[blk(3), blk(3), blk(3), blk(4), blk(1), blk(s_samples)],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), o3.dtype),
            jax.ShapeDtypeStruct((3, n_pad), o3.dtype),
            jax.ShapeDtypeStruct((3, n_pad), o3.dtype),
            jax.ShapeDtypeStruct((4, n_pad), o3.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((s_samples, n_pad), o3.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * n_pad * t_count * (1 + s_samples) + 400 * n_pad
            + rng_ops,
            bytes_accessed=(n_pad * 17 + t_count * 24) * 4,
            transcendentals=4 * n_pad * (1 + s_samples),
        ),
        interpret=_interpret(),
    )(tripack, shadepack, lightpack, scal, o3, d3, d3u, rad3, aux, keys4,
      cnt)


def _smooth_bounce(o3, d3, tp, rad3, alive_f, prevspec_f, u_nee, u_scat,
                   scene, idx, occ, s_samples: int, use_background: bool):
    """Differentiable recompute of the bounce with the kernel's discrete
    results pinned (winner index ``idx``, occlusion bits ``occ``). Must
    mirror the fast-mode semantics of render/integrator.py's
    nearest_hit_cm + shade + scatter composition — the fused-vs-unfused
    gradient test (tests/test_bounce_fused.py) pins the equivalence.

    Returns the smooth outputs (o3', d3', tp', rad3')."""
    from pathtracerpython_tpu.ops.geometry import (
        intersect_moller,
        normalize3,
    )
    from pathtracerpython_tpu.ops.sampling import (
        cm_cosine_hemisphere_fixed,
        cm_reflect,
    )
    from pathtracerpython_tpu.render.integrator import (
        arrival_side_normal,
        resolve_materials,
    )

    d3u = normalize3(d3)
    found = idx >= 0
    safe = jnp.maximum(idx, 0)
    # hit distance by re-solving MT on the winning triangle (smooth in
    # origin/direction/vertices — same scheme as intersect_pallas's vjp)
    _, t = intersect_moller(
        o3.T, d3u.T, scene.tri_v0[safe], scene.tri_v1[safe],
        scene.tri_v2[safe],
    )
    t = jnp.where(found, t, 0.0)
    point3 = o3 + d3u * t[None, :]
    normal3 = scene.tri_normal[safe].T
    mat = resolve_materials(scene, scene.tri_material[safe])
    n_sh = arrival_side_normal(normal3, d3u)

    mean_cos = _smooth_mean_cos(
        point3, n_sh, scene.light_v0, scene.light_v1, scene.light_v2,
        scene.light_area, u_nee, occ, s_samples,
    )[0]

    ambient3 = mat.rgb3 * (mat.ka * scene.ambient)[None, :]
    direct3 = scene.light_color[:, None] * mat.rgb3 * mean_cos[None, :]
    surface3 = ambient3 + direct3
    is_light = scene.tri_is_light[safe] & found
    light3 = jnp.broadcast_to(scene.light_color[:, None], surface3.shape)
    light3 = jnp.where(prevspec_f[None, :] > 0.5, light3, 0.0)
    color3 = jnp.where(is_light[None, :], light3, surface3)
    miss3 = (
        jnp.broadcast_to(scene.background[:, None], surface3.shape)
        if use_background else jnp.zeros_like(surface3)
    )
    color3 = jnp.where(found[None, :], color3, miss3)
    alive = alive_f > 0.5
    rad_new = rad3 + jnp.where(alive[None, :], color3 * tp[None, :], 0.0)

    diffuse3 = cm_cosine_hemisphere_fixed(u_scat[1:3], n_sh)
    spec3 = cm_reflect(d3u, n_sh)
    w = mat.kd + mat.ks
    p_diff = jnp.where(w > 0.0, mat.kd / jnp.maximum(w, 1e-12), 1.0)
    choose = u_scat[0] < p_diff
    ndir3 = jnp.where(choose[None, :], diffuse3, spec3)
    alive2 = alive & found & ~is_light
    tp_new = jnp.where(alive2, tp * w, tp)
    o_new = jnp.where(alive2[None, :], point3, o3)
    d_new = jnp.where(alive2[None, :], ndir3, d3)
    return o_new, d_new, tp_new, rad_new


def _prep(scene, o3, d3, tp, alive_f, prevspec_f, rad3, u_nee, u_scat,
          use_background):
    sg = lax.stop_gradient
    tripack = pack_triangles(
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        scene.tri_valid, scene.tri_occluder,
    )
    pad = min(T_BLK, max(tripack.shape[0], 1))
    tripack = _pad_dim(sg(tripack), pad, axis=0)
    shadepack = _pad_dim(sg(_shade_pack(scene)), pad, axis=0)
    lightpack = sg(_light_pack(scene))
    bg = scene.background if use_background else jnp.zeros(3, o3.dtype)
    scal = sg(jnp.concatenate([
        scene.ambient[None], scene.light_color, bg, jnp.zeros(1, o3.dtype)
    ])[None, None, :])

    from pathtracerpython_tpu.ops.geometry import normalize3

    n = o3.shape[1]
    r_blk = _r_blk(tripack.shape[0])
    p = lambda x, v: _pad_dim(sg(x), r_blk, axis=1, value=v)
    o3p = p(o3, 1e6)
    d3p = p(d3, 1.0)
    d3up = p(normalize3(d3), 1.0)
    rad3p = p(rad3, 0.0)
    aux = jnp.stack([tp, alive_f, prevspec_f, jnp.ones(n, o3.dtype)])
    auxp = p(aux, 0.0)
    # the in-kernel-RNG entry passes keys/counters instead of uniforms
    uneep = p(u_nee, 0.5) if u_nee is not None else None
    uscatp = p(u_scat, 0.5) if u_scat is not None else None
    return tripack, shadepack, lightpack, scal, o3p, d3p, d3up, rad3p, \
        auxp, uneep, uscatp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_bounce(s_samples, use_background, o3, d3, tp, alive_f,
                 prevspec_f, rad3, u_nee, u_scat, scene):
    """One fused bounce step. State flags ride as f32 rows (alive_f,
    prevspec_f ∈ {0, 1}); returns (o3', d3', tp', alive_f', prevspec_f',
    rad3') — identical semantics to the unfused fast-mode bounce."""
    out, _, _ = _fused_impl(
        s_samples, use_background, o3, d3, tp, alive_f, prevspec_f, rad3,
        u_nee, u_scat, scene,
    )
    return out


def _fused_impl(s_samples, use_background, o3, d3, tp, alive_f, prevspec_f,
                rad3, u_nee, u_scat, scene):
    n = o3.shape[1]
    packs = _prep(
        scene, o3, d3, tp, alive_f, prevspec_f, rad3, u_nee, u_scat,
        use_background,
    )
    o_n, d_n, rad_n, aux_n, idx, occ = _bounce_call(
        *packs, s_samples, use_background
    )
    cut = lambda x: x[:, :n]
    out = (
        cut(o_n), cut(d_n), aux_n[0, :n], aux_n[1, :n], aux_n[2, :n],
        cut(rad_n),
    )
    return out, idx[0, :n], occ[:, :n]


def _fused_fwd(s_samples, use_background, o3, d3, tp, alive_f, prevspec_f,
               rad3, u_nee, u_scat, scene):
    out, idx, occ = _fused_impl(
        s_samples, use_background, o3, d3, tp, alive_f, prevspec_f, rad3,
        u_nee, u_scat, scene,
    )
    res = (o3, d3, tp, alive_f, prevspec_f, rad3, u_nee, u_scat, scene,
           idx, occ)
    return out, res


def _fused_bwd(s_samples, use_background, res, cots):
    (o3, d3, tp, alive_f, prevspec_f, rad3, u_nee, u_scat, scene,
     idx, occ) = res
    co, cd, ctp, _ca, _cp, crad = cots

    def f(o3_, d3_, tp_, rad3_, scene_):
        return _smooth_bounce(
            o3_, d3_, tp_, rad3_, alive_f, prevspec_f, u_nee, u_scat,
            scene_, idx, occ, s_samples, use_background,
        )

    _, vjp = jax.vjp(f, o3, d3, tp, rad3, scene)
    do3, dd3, dtp, drad, dscene = vjp((co, cd, ctp, crad))
    return (
        do3, dd3, dtp, jnp.zeros_like(alive_f), jnp.zeros_like(prevspec_f),
        drad, jnp.zeros_like(u_nee), jnp.zeros_like(u_scat), dscene,
    )


fused_bounce.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# In-kernel-RNG entry: the integrator passes the per-bounce threefry keys
# and the path counters instead of 5S+3 precomputed uniform rows — the
# draws never touch HBM and the per-bounce XLA RNG fusion disappears. The
# backward recomputes the identical uniforms in plain JAX (ops.rng) and
# replays the smooth bounce with pinned discretes, exactly like
# fused_bounce above.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_bounce_rng(s_samples, use_background, o3, d3, tp, alive_f,
                     prevspec_f, rad3, keys4, counters, scene):
    """One fused bounce step with in-kernel RNG. ``keys4``: uint32[4]
    (nee k0, nee k1, scatter k0, scatter k1) for this bounce;
    ``counters``: uint32[N] global path ids. Bit-identical uniforms (and
    hence results) to the uniforms-operand ``fused_bounce``."""
    out, _, _ = _fused_rng_impl(
        s_samples, use_background, o3, d3, tp, alive_f, prevspec_f, rad3,
        keys4, counters, scene,
    )
    return out


def _fused_rng_impl(s_samples, use_background, o3, d3, tp, alive_f,
                    prevspec_f, rad3, keys4, counters, scene):
    n = o3.shape[1]
    (tripack, shadepack, lightpack, scal, o3p, d3p, d3up, rad3p, auxp,
     ) = _prep(
        scene, o3, d3, tp, alive_f, prevspec_f, rad3, None, None,
        use_background,
    )[:9]
    r_blk = _r_blk(tripack.shape[0])
    cnt = _pad_dim(
        counters.astype(jnp.int32)[None, :], r_blk, axis=1, value=0,
    )
    o_n, d_n, rad_n, aux_n, idx, occ = _bounce_call_rng(
        tripack, shadepack, lightpack, scal, o3p, d3p, d3up, rad3p, auxp,
        keys4.astype(jnp.int32)[None, None, :], cnt, s_samples,
        use_background,
    )
    cut = lambda x: x[:, :n]
    out = (
        cut(o_n), cut(d_n), aux_n[0, :n], aux_n[1, :n], aux_n[2, :n],
        cut(rad_n),
    )
    return out, idx[0, :n], occ[:, :n]


def _fused_rng_fwd(s_samples, use_background, o3, d3, tp, alive_f,
                   prevspec_f, rad3, keys4, counters, scene):
    out, idx, occ = _fused_rng_impl(
        s_samples, use_background, o3, d3, tp, alive_f, prevspec_f, rad3,
        keys4, counters, scene,
    )
    res = (o3, d3, tp, alive_f, prevspec_f, rad3, keys4, counters, scene,
           idx, occ)
    return out, res


def _fused_rng_bwd(s_samples, use_background, res, cots):
    from pathtracerpython_tpu.ops import rng

    (o3, d3, tp, alive_f, prevspec_f, rad3, keys4, counters, scene,
     idx, occ) = res
    co, cd, ctp, _ca, _cp, crad = cots

    def f(o3_, d3_, tp_, rad3_, scene_, keys4_, counters_):
        u_nee = rng.uniforms(keys4_[0], keys4_[1], counters_,
                             s_samples * 5)
        u_scat = rng.uniforms(keys4_[2], keys4_[3], counters_, 3)
        return _smooth_bounce(
            o3_, d3_, tp_, rad3_, alive_f, prevspec_f, u_nee, u_scat,
            scene_, idx, occ, s_samples, use_background,
        )

    _, vjp = jax.vjp(f, o3, d3, tp, rad3, scene, keys4, counters)
    do3, dd3, dtp, drad, dscene, dkeys, dcnt = vjp((co, cd, ctp, crad))
    return (
        do3, dd3, dtp, jnp.zeros_like(alive_f), jnp.zeros_like(prevspec_f),
        drad, dkeys, dcnt, dscene,
    )


fused_bounce_rng.defvjp(_fused_rng_fwd, _fused_rng_bwd)
