"""Per-bounce occluder-cache statistics on the REAL 100k render wavefronts.

The round-4 occluder cache (kernels/sparse_pallas.sparse_any_hit_cached_cm)
moved the 100k config only ~8-11% on the chip, far short of the 2x the
round-3 statistics (99.6% occluded, 3.34-cluster mean proof depth)
suggested. This script measures WHY, by replaying the production bounce
evolution (integrator.bounce_step, nee_cache=on, wavefront sort on) and
probing each bounce's NEE wavefront directly:

- occluded fraction (the 99.6% was a bounce-1 number; later bounces?)
- pass-1 resolution rate among occluded lanes (cache quality)
- unresolved-lane count vs the pass-2 compaction cap n/m_div for
  m_div in {2,4,8,16} (which branch the production cond takes)
- per-block candidate-union sizes for the full sweep, in the inherited
  shading order vs re-sorted shadow-lane order (the sort_nee lever,
  VERDICT r3 task 4's union-size distribution)

Prints one JSON line per bounce. Run on the chip for the production
config: python scripts/cache_stats.py [--size 512] [--spp 2]
"""

from __future__ import annotations

# Run-from-anywhere bootstrap: the scripts import the package from the
# repo root without requiring a pip install (VERDICT r4 weak #2 class).
import os as _os, sys as _sys
_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--boxes", type=int, default=8333)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--spp", type=int, default=2)
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pathtracerpython_tpu.kernels import sparse_pallas as sp
    from pathtracerpython_tpu.ops import rng
    from pathtracerpython_tpu.ops.camera import make_primary_rays
    from pathtracerpython_tpu.ops.gather import cm_take
    from pathtracerpython_tpu.ops.geometry import nearest_hit_cm, normalize3
    from pathtracerpython_tpu.ops.sampling import (
        cm_point_from_barycentric,
        cm_sample_barycentric_uniform,
    )
    from pathtracerpython_tpu.ops import sampling
    from pathtracerpython_tpu.ops.sort import (
        PARK_DIR,
        PARK_ORIGIN,
        scene_bounds,
        wavefront_sort_order,
    )
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render import integrator as integ
    from pathtracerpython_tpu.scene.arrays import pack_scene
    from pathtracerpython_tpu.scene.synthetic import box_field_scene

    w = h = args.size
    scene = jax.device_put(pack_scene(
        box_field_scene(n_boxes=args.boxes, width=w, height=h),
        tri_order="morton",
    ))
    cfg = RenderConfig(
        mode="fast", n_samples=args.spp, n_bounces=args.bounces,
        backend="pallas" if jax.default_backend() == "tpu" else "xla",
        accel="sparse", sort_rays="on", batch_samples=True,
        nee_cache="on",
    )
    s = cfg.n_light_samples
    c_tri, r_blk, group = sp.C_TRI, sp.R_BLK, sp.GROUP
    w_per_rb, chunk_rb = sp._scaled_budget(c_tri, sp.W_PER_RB, sp.CHUNK_RB)
    statics = (c_tri, r_blk, sp.MAXC, w_per_rb, group)
    tripack = sp._pack_for_sparse(scene, c_tri)
    aabb8 = sp.cluster_aabbs(tripack, c_tri)
    lo3, hi3 = scene_bounds(scene)

    # production lane layout: spp as extra lanes (batch_samples)
    o3, d3 = make_primary_rays(scene.eye, scene.ortho, w, h)
    o3, d3 = o3.T, d3.T
    n_pix = w * h
    pid = jnp.arange(n_pix, dtype=jnp.uint32)
    counters = jnp.concatenate(
        [pid * args.spp + k for k in range(args.spp)]
    )
    rep3 = lambda x: jnp.concatenate([x] * args.spp, axis=1)
    k0, k1 = rng.key_from_seed(jax.random.PRNGKey(0))
    state = integ.init_rays(rep3(o3), rep3(d3), counters)
    n = state.origin3.shape[1]
    # The probe chunks flattened lanes directly (no production-style
    # padding), so the lane count must tile exactly into ray blocks
    # (ADVICE r4: --size 16 --spp 1 used to die in a reshape deep below).
    if n % r_blk:
        sys.exit(
            f"error: size*size*spp = {n} lanes is not a multiple of the "
            f"ray block R_BLK={r_blk}; pick --size/--spp so that "
            f"size^2*spp % {r_blk} == 0 (e.g. --size 32 --spp 1)"
        )

    def run_idx(o, d, md, gu):
        """(occ, blocking cluster) — the cached entry's two kernel forms:
        gu=None full sweep (truth), gu=... pass-1 guess sweep only."""
        extra = [md[None, :]] + ([gu[None, :]] if gu is not None else [])
        return sp._map_ray_chunks(
            lambda oc, dc, mc, *rest: sp._any_hit_idx_chunk(
                oc, dc, mc[0], rest[0][0] if rest else None, tripack,
                statics,
            ),
            [o, d] + extra, r_blk, chunk_rb,
        )

    def union_sizes(o, d, md, refine=False):
        nrb = o.shape[1] // r_blk
        tmax_rb = jnp.max(md.reshape(nrb, r_blk), axis=1)
        w_cap = sp._cap_interp(min(
            nrb * max(1, w_per_rb // group), sp.W_SMEM_ENTRIES // group
        ))
        old_k = sp.REFINE_K
        sp.REFINE_K = 4096 if refine else 0  # trace-time module knob
        try:
            _, ncand, _ = sp.grouped_worklist(
                aabb8, o, d, tmax_rb, r_blk=r_blk, maxc=sp.MAXC,
                w_cap=w_cap, group=group, maxd_lanes=md,
            )
        finally:
            sp.REFINE_K = old_k
        return ncand

    @functools.partial(jax.jit, static_argnums=1)
    def probe(st, b):
        # replicate bounce_step's sorted sweep wavefront
        order = wavefront_sort_order(
            st.origin3, st.direction3, st.alive, lo3, hi3
        )
        st = integ._permute_state(st, order)
        park_o = jnp.asarray(PARK_ORIGIN, jnp.float32)[:, None]
        park_d = jnp.asarray(PARK_DIR, jnp.float32)[:, None]
        sweep_o3 = jnp.where(st.alive[None, :], st.origin3, park_o)
        sweep_d3 = jnp.where(st.alive[None, :], st.direction3, park_d)
        hit = nearest_hit_cm(
            sweep_o3, sweep_d3, scene, mode="fast", backend=cfg.backend,
            accel="sparse",
        )
        nk0, nk1 = rng.fold(k0, k1, b * 4 + integ._P_NEE)
        u = rng.uniforms(nk0, nk1, st.counters, s * 5).reshape(s, 5, -1)
        tri = sampling.pick_light_triangle(u[:, 0], scene.light_area)
        bary = cm_sample_barycentric_uniform(
            jnp.moveaxis(u[:, 1:3], 1, 0)
        )
        lv = cm_take(
            jnp.concatenate(
                [scene.light_v0.T, scene.light_v1.T, scene.light_v2.T]
            ),
            tri,
        )
        light_pt3 = cm_point_from_barycentric(bary, lv[0:3], lv[3:6], lv[6:9])
        point3 = hit.point3
        vec3 = light_pt3 - point3[:, None, :]
        dist = jnp.sqrt(jnp.sum(vec3 * vec3, axis=0) + 1e-24)
        flat_o3 = jnp.broadcast_to(point3[:, None, :], vec3.shape).reshape(
            3, s * n
        )
        flat_d3 = normalize3(vec3).reshape(3, s * n)
        flat_dist = dist.reshape(s * n)
        guess = jnp.broadcast_to(st.nee_cache[None, :], (s, n)).reshape(
            s * n
        )

        occ_t, _ = run_idx(flat_o3, flat_d3, flat_dist, None)
        occ_1, _ = run_idx(flat_o3, flat_d3, flat_dist, guess)
        occ_t, occ_1 = occ_t[: s * n], occ_1[: s * n]
        live = jnp.repeat(st.alive & hit.hit, s)  # lanes whose NEE matters
        ncand_inh = union_sizes(flat_o3, flat_d3, flat_dist)
        sorder = wavefront_sort_order(
            flat_o3, flat_d3, jnp.ones(s * n, bool), lo3, hi3
        )
        ncand_srt = union_sizes(
            jnp.take(flat_o3, sorder, axis=1),
            jnp.take(flat_d3, sorder, axis=1),
            flat_dist[sorder],
        )
        # sorted + exact-refined (the round-5 REFINE_K lever): how much
        # of the sorted interval union is slop no lane can hit?
        ncand_ref = union_sizes(
            jnp.take(flat_o3, sorder, axis=1),
            jnp.take(flat_d3, sorder, axis=1),
            flat_dist[sorder],
            refine=True,
        )
        return dict(
            live_frac=jnp.mean(live),
            occ_frac=jnp.mean(occ_t),
            occ_frac_live=jnp.sum(occ_t & live) / jnp.sum(live),
            p1_rate=jnp.sum(occ_1) / jnp.sum(occ_t),
            warm_frac=jnp.mean(guess >= 0),
            unresolved_frac=jnp.mean(~occ_1),
            unresolved_live_frac=jnp.mean(~occ_1 & live),
            ncand_inh_mean=jnp.mean(ncand_inh.astype(jnp.float32)),
            ncand_inh_p90=jnp.percentile(
                ncand_inh.astype(jnp.float32), 90
            ),
            ncand_inh_max=jnp.max(ncand_inh),
            ncand_srt_mean=jnp.mean(ncand_srt.astype(jnp.float32)),
            ncand_srt_p90=jnp.percentile(
                ncand_srt.astype(jnp.float32), 90
            ),
            ncand_srt_max=jnp.max(ncand_srt),
            ncand_ref_mean=jnp.mean(ncand_ref.astype(jnp.float32)),
            ncand_ref_p90=jnp.percentile(
                ncand_ref.astype(jnp.float32), 90
            ),
            ncand_ref_max=jnp.max(ncand_ref),
        )

    @functools.partial(jax.jit, static_argnums=1)
    def evolve(st, b):
        return integ.bounce_step(
            st, jnp.uint32(b), scene, cfg, k0, k1, (lo3, hi3)
        )

    n_pad = -(-s * n // r_blk) * r_blk
    for b in range(args.bounces):
        stats = {k: float(v) for k, v in probe(state, b).items()}
        stats.update(
            bounce=b,
            n_lanes=s * n,
            caps={
                str(md): round(n_pad / md / (s * n), 4)
                for md in (2, 4, 8, 16)
            },
        )
        print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                          for k, v in stats.items()}), flush=True)
        if b + 1 < args.bounces:
            state = evolve(state, b)


if __name__ == "__main__":
    main()
