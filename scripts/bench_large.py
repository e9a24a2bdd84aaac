"""Large-scene benchmark: the 100k-triangle box field (BASELINE config 5
shape) at 512x512 / 2 spp / 3 bounces — the VERDICT round-1 "done when"
config for the acceleration hierarchy.

Prints one JSON line per configuration (accel x sort), with rays/s and
the speedup over the dense brute-force sweep. Same measurement discipline
as bench.py (pre-committed inputs, per-rep RNG variation, fetch-overhead
subtraction) EXCEPT reps are separate executions, not a scan inside one
jit: the axon worker kills single executions past ~40-110 s, which round
2 misdiagnosed as kernel faults (docs/PERFORMANCE.md, round-3 section).

Usage: python scripts/bench_large.py [--boxes 8333] [--size 512]
       [--spp 2] [--bounces 3] [--reps 3] [--configs accel:sort,...]
"""

from __future__ import annotations

# Run-from-anywhere bootstrap: the scripts import the package from the
# repo root without requiring a pip install (VERDICT r4 weak #2 class).
import os as _os, sys as _sys
_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax


def fetch_overhead_s() -> float:
    xs = jax.device_put(jnp.arange(6, dtype=jnp.int32))
    jax.block_until_ready(xs)
    f = jax.jit(lambda e: jnp.sum(e.astype(jnp.float32)))
    float(f(xs[0]))
    best = float("inf")
    for i in range(1, 6):
        t0 = time.perf_counter()
        float(f(xs[i]))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--boxes", type=int, default=8333)  # ~100k triangles
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--spp", type=int, default=2)
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument(
        "--configs", default="none:off,sparse:off,sparse:on",
        help="comma list of accel:sort pairs to run",
    )
    p.add_argument(
        "--order", default="morton", choices=["morton", "median"],
        help="triangle buffer spatial ordering (cluster tightness)",
    )
    p.add_argument(
        "--group", type=int, default=None,
        help="candidate clusters per sparse grid step (sparse_pallas.GROUP)",
    )
    p.add_argument(
        "--c-tri", type=int, default=None,
        help="cluster granularity (sparse_pallas.C_TRI); grouping "
        "amortizes per-item overhead, so smaller clusters than the "
        "single-item optimum (128) may win under --group > 1",
    )
    p.add_argument(
        "--r-blk", type=int, default=None,
        help="rays per block (sparse_pallas.R_BLK); smaller blocks mean "
        "tighter per-block candidate unions but more grid steps",
    )
    p.add_argument(
        "--w-per-rb", type=int, default=None,
        help="average work-list slots per ray block (sparse_pallas."
        "W_PER_RB, pre-budget-scaling); the sorted+parked NEE path uses "
        "its own tighter budget — see --w-sorted",
    )
    p.add_argument(
        "--w-sorted", type=int, default=None,
        help="work-list budget for the coherence-sorted NEE shadow "
        "lanes (sparse_pallas.W_PER_RB_SORTED)",
    )
    p.add_argument(
        "--chunk-sorted", type=int, default=None,
        help="blocks per launch for the coherence-sorted NEE shadow "
        "lanes (sparse_pallas.CHUNK_RB_SORTED)",
    )
    p.add_argument(
        "--chunk-rb", type=int, default=None,
        help="ray blocks per sparse launch (sparse_pallas.CHUNK_RB, "
        "pre-budget-scaling)",
    )
    p.add_argument(
        "--two-pass", type=int, default=None,
        help="force two_pass trunc_k (default: module auto)",
    )
    p.add_argument(
        "--two-pass-nearest", type=int, default=None,
        help="enable nearest two-pass with this trunc_k (per-lane bound)",
    )
    p.add_argument(
        "--sort-nee", default="auto", choices=["auto", "on", "off"],
        help="shadow-lane-specific ordering before the sparse any-hit "
        "(r4 lever; RenderConfig.sort_nee — auto = on, chip-measured "
        "+36%% with relevance parking)",
    )
    p.add_argument(
        "--nee-cache", default="auto", choices=["auto", "on", "off"],
        help="occluder-cluster caching on the NEE any-hit (r4 lever; "
        "RenderConfig.nee_cache — auto = off, chip-measured dominated "
        "by the sorted uncached sweep)",
    )
    p.add_argument(
        "--nee-hint", default="auto", choices=["auto", "on", "off"],
        help="occlusion-hint block segregation on the sorted NEE sweep "
        "(RenderConfig.nee_hint — predicted-occluded lanes sort into "
        "their own blocks so they can early-exit)",
    )
    p.add_argument(
        "--k-guess", type=int, default=None,
        help="voted guess clusters per block in the cache's pass 1 "
        "(sparse_pallas.K_GUESS)",
    )
    p.add_argument(
        "--cache-m-div", type=int, default=None,
        help="cache pass-2 compaction cap divisor (sparse_pallas."
        "CACHE_M_DIV)",
    )
    p.add_argument(
        "--mt-impl", default="classic", choices=["classic", "plucker"],
        help="in-triangle test for BOTH the dense and (since r3) the "
        "sparse grouped sweeps: classic MT on the VPU or Plücker edge "
        "side tests as K=8 matmuls on the MXU",
    )
    p.add_argument(
        "--refine-k", type=int, default=None,
        help="exact-refinement depth on the candidate lists "
        "(sparse_pallas.REFINE_K): re-test the first K front-to-back "
        "members per block with the per-lane slab test and drop members "
        "no lane hits (fewer kernel visits at XLA-side filter cost)",
    )
    p.add_argument(
        "--walker-c-tri", type=int, default=None,
        help="walker tile granularity (walker_pallas.C_TRI; default 128 "
        "= the r5 measured-best shape under the sorted NEE regime — "
        "r3's pre-sorting optimum was 256)",
    )
    p.add_argument(
        "--walker-nbuf", type=int, default=None,
        help="walker DMA ring depth (walker_pallas.N_BUF)",
    )
    p.add_argument(
        "--walker-chunk-rb", type=int, default=None,
        help="walker ray blocks per launch (walker_pallas.CHUNK_RB)",
    )
    p.add_argument(
        "--walker-r-blk", type=int, default=None,
        help="walker rays per block (walker_pallas.R_BLK): bigger blocks "
        "= fewer per-block walks with wider unions",
    )
    p.add_argument(
        "--walker-w-per-rb", type=int, default=None,
        help="walker flat-list candidate slots per ray block "
        "(walker_pallas.W_PER_RB)",
    )
    p.add_argument(
        "--grid-divs", default=None,
        help="comma list of short-grid cascade divisors "
        "(sparse_pallas.GRID_DIVS, e.g. '16,8,4,2'); each divisor is one "
        "more Mosaic compile per (kernel, chunk shape)",
    )
    p.add_argument(
        "--platform", default=None,
        help="jax platform override (e.g. cpu — the axon sitecustomize "
        "pins the tunneled TPU, which hangs when the tunnel is down)",
    )
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pathtracerpython_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()  # queue reruns skip recompiles; the
    #                             compile_s column then reports the
    #                             cached (deserialize) time

    from pathtracerpython_tpu.kernels import intersect_pallas as ip
    from pathtracerpython_tpu.kernels import sparse_pallas as sp

    def _wk():
        from pathtracerpython_tpu.kernels import walker_pallas as wk

        return wk

    ip.MT_IMPL = args.mt_impl

    if args.refine_k is not None:
        sp.REFINE_K = args.refine_k
    if args.grid_divs is not None:
        sp.GRID_DIVS = tuple(
            int(x) for x in args.grid_divs.split(",") if x
        )
    if (args.walker_c_tri is not None or args.walker_nbuf is not None
            or args.walker_w_per_rb is not None
            or args.walker_r_blk is not None
            or args.walker_chunk_rb is not None):
        from pathtracerpython_tpu.kernels import walker_pallas as wk

        if args.walker_c_tri is not None:
            wk.C_TRI = args.walker_c_tri
        if args.walker_nbuf is not None:
            wk.N_BUF = args.walker_nbuf
        if args.walker_r_blk is not None:
            wk.R_BLK = args.walker_r_blk
        if args.walker_chunk_rb is not None:
            wk.CHUNK_RB = args.walker_chunk_rb
        if args.walker_w_per_rb is not None:
            wk.W_PER_RB = args.walker_w_per_rb
    if args.group is not None:
        sp.GROUP = args.group
    if args.c_tri is not None:
        sp.C_TRI = args.c_tri
    if args.r_blk is not None:
        sp.R_BLK = args.r_blk
    if args.w_per_rb is not None:
        sp.W_PER_RB = args.w_per_rb
    if args.w_sorted is not None:
        sp.W_PER_RB_SORTED = args.w_sorted
    if args.chunk_sorted is not None:
        sp.CHUNK_RB_SORTED = args.chunk_sorted
    if args.chunk_rb is not None:
        sp.CHUNK_RB = args.chunk_rb
    if args.two_pass_nearest is not None:
        sp.TWO_PASS_NEAREST_AUTO = True
        sp.PASS1_K = args.two_pass_nearest
    if args.k_guess is not None:
        sp.K_GUESS = args.k_guess
    if args.cache_m_div is not None:
        sp.CACHE_M_DIV = args.cache_m_div
    if args.two_pass is not None:
        sp.PASS1_K = args.two_pass
        # any-hit auto now defaults OFF (TWO_PASS_ANY_AUTO, a measured
        # negative); --two-pass K>0 forces it back ON for A/B reruns
        sp.TWO_PASS_ANY_AUTO = args.two_pass > 0
        if args.two_pass == 0:
            sp.TWO_PASS_MIN = 2**62  # auto never engages

    from pathtracerpython_tpu.ops.camera import make_primary_rays
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render_rays
    from pathtracerpython_tpu.scene.arrays import pack_scene
    from pathtracerpython_tpu.scene.synthetic import box_field_scene

    print(f"platform: {jax.default_backend()}", file=sys.stderr)
    on_tpu = jax.default_backend() == "tpu"
    w = h = args.size
    scene = pack_scene(
        box_field_scene(n_boxes=args.boxes, width=w, height=h),
        tri_order=args.order,
    )
    scene = jax.device_put(scene)
    print(f"triangles: {scene.meta.n_triangles} "
          f"(padded {scene.tri_v0.shape[0]})", file=sys.stderr)

    origins, dirs = make_primary_rays(scene.eye, scene.ortho, w, h)
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    run_ids = jax.device_put(
        jnp.arange(max(args.reps, 2) + 1, dtype=jnp.uint32) * 1000
    )
    jax.block_until_ready((origins, dirs, pixel_ids, run_ids))
    overhead = fetch_overhead_s()
    total_rays = w * h * args.spp * args.bounces * 4  # 1 + 3 NEE
    reps = args.reps

    base = None
    for pair in args.configs.split(","):
        accel, sort = pair.split(":")
        cfg = RenderConfig(
            mode="fast", n_samples=args.spp, n_bounces=args.bounces,
            backend="pallas" if on_tpu else "xla",
            accel=accel, sort_rays=sort, batch_samples=True,
            nee_cache=args.nee_cache, sort_nee=args.sort_nee,
            nee_hint=args.nee_hint,
        )

        # ONE render per XLA execution: the axon-tunneled worker kills any
        # single execution past ~40-110 s ("TPU worker process crashed"),
        # which is what round 2 misdiagnosed as kernel faults
        # (docs/PERFORMANCE.md round-3 section). Amortization comes from
        # ``reps`` separate timed calls with per-call fetch-overhead
        # subtraction instead of a reps-long scan inside one jit.
        @jax.jit
        def run(sc, o, d, pids, rid):
            key = jax.random.fold_in(jax.random.PRNGKey(0), rid)
            return jnp.sum(render_rays(o, d, pids, sc, cfg, key))

        t0 = time.perf_counter()
        warm = float(run(scene, origins, dirs, pixel_ids, run_ids[0]))
        compile_s = time.perf_counter() - t0
        assert warm == warm, f"NaN render sum ({pair})"

        best = float("inf")
        for i in range(1, 1 + max(reps, 2)):
            t0 = time.perf_counter()
            float(run(scene, origins, dirs, pixel_ids, run_ids[i]))
            best = min(best, time.perf_counter() - t0)
        per_render = max(best - overhead, 1e-9)
        rays_per_s = total_rays / per_render
        if base is None:
            base = rays_per_s if accel == "none" else None
        print(json.dumps({
            "config": pair,
            "platform": jax.default_backend(),
            "rays_per_s": round(rays_per_s, 1),
            "ms_per_render": round(per_render * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "speedup_vs_dense": (
                round(rays_per_s / base, 2) if base else None
            ),
            "vs_50M_target": round(rays_per_s / 50e6, 3),
            # effective module knobs (ADVICE r2: numbers must be
            # self-describing across default flips)
            "group": sp.GROUP,
            "c_tri": sp.C_TRI,
            "r_blk": sp.R_BLK,
            "two_pass_any": sp.TWO_PASS_ANY_AUTO and sp.PASS1_K or 0,
            "two_pass_nearest": sp.TWO_PASS_NEAREST_AUTO and sp.PASS1_K or 0,
            "mt_impl": ip.MT_IMPL,
            "order": args.order,
            "nee_cache": args.nee_cache,
            "sort_nee": args.sort_nee,
            "nee_hint": args.nee_hint,
            "k_guess": sp.K_GUESS,
            "cache_m_div": sp.CACHE_M_DIV,
            "refine_k": sp.REFINE_K,
            # walker rows: the sp.* knobs above do not apply — log the
            # walker module's own effective shape
            **({
                "walker_c_tri": _wk().C_TRI,
                "walker_r_blk": _wk().R_BLK,
                "walker_n_buf": _wk().N_BUF,
                "walker_w_per_rb": _wk().W_PER_RB,
                "walker_chunk_rb": _wk().CHUNK_RB,
            } if accel in ("walker", "auto", "hybrid") else {}),
            # the hybrid/auto nearest sweep runs its own scoped shape —
            # the sp.R_BLK/W_PER_RB fields above describe only the
            # forced-sparse both-sweeps path
            **({
                "nearest_r_blk": sp.R_BLK_HYBRID_NEAREST,
                "nearest_w_per_rb": sp.W_PER_RB_HYBRID_NEAREST,
                "nearest_chunk_rb": sp.CHUNK_RB_HYBRID_NEAREST,
            } if accel in ("auto", "hybrid") else {}),
        }), flush=True)


if __name__ == "__main__":
    main()
