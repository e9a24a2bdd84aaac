"""Standalone minimal repro for the round-2 chip-only sparse-kernel
faults (BENCHLOG_r2: ranked nearest rounds and any c_tri != 128 cluster
granularity hard-crash the v5e worker; r_blk=256 crashed in round 1).

Calls the sparse sweep DIRECTLY on synthetic data — no integrator, no
render loop — so a crash pins the fault to the kernel launch itself.
One config per process (a TPU worker crash kills the process); the
matrix driver is scripts/repro_matrix.py.

Usage:
  python scripts/repro_kernel.py --c-tri 64 --r-blk 512 --group 2 \
      [--kernel nearest|anyhit|both] [--n 65536] [--boxes 800] [--sort]
"""

from __future__ import annotations

# Run-from-anywhere bootstrap: the scripts import the package from the
# repo root without requiring a pip install (VERDICT r4 weak #2 class).
import os as _os, sys as _sys
_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--c-tri", type=int, default=128)
    p.add_argument("--r-blk", type=int, default=512)
    p.add_argument("--group", type=int, default=2)
    p.add_argument("--w-per-rb", type=int, default=512)
    p.add_argument("--n", type=int, default=65536, help="ray count")
    p.add_argument("--boxes", type=int, default=800,
                   help="box-field size (~12 tris each)")
    p.add_argument("--kernel", default="both",
                   choices=["nearest", "anyhit", "both"])
    p.add_argument("--sort", action="store_true",
                   help="sort rays by morton key first (coherent blocks, "
                   "like the integrator does)")
    p.add_argument("--rays", default="camera", choices=["camera", "random"],
                   help="camera = coherent primary-style rays; random = "
                   "bounce-style incoherent rays")
    args = p.parse_args()

    from pathtracerpython_tpu.kernels import sparse_pallas as sp
    from pathtracerpython_tpu.scene.arrays import pack_scene
    from pathtracerpython_tpu.scene.synthetic import box_field_scene

    print(f"platform: {jax.default_backend()} "
          f"c_tri={args.c_tri} r_blk={args.r_blk} group={args.group} "
          f"n={args.n} kernel={args.kernel} rays={args.rays}",
          file=sys.stderr, flush=True)

    scene = pack_scene(box_field_scene(n_boxes=args.boxes),
                       tri_order="morton")
    scene = jax.device_put(scene)
    n_tris = int(scene.tri_v0.shape[0])

    key = jax.random.PRNGKey(0)
    if args.rays == "camera":
        # fan of rays from a point outside the field toward it
        k1, k2 = jax.random.split(key)
        o3 = jnp.tile(
            jnp.array([[0.0], [0.0], [10.0]], jnp.float32), (1, args.n)
        )
        lo = jnp.array([[-8.0], [-1.0], [-16.0]], jnp.float32)
        hi = jnp.array([[8.0], [1.0], [-0.5]], jnp.float32)
        tgt = lo + jax.random.uniform(
            k1, (3, args.n), jnp.float32
        ) * (hi - lo)
        d3 = tgt - o3
    else:
        k1, k2 = jax.random.split(key)
        o3 = jax.random.uniform(k1, (3, args.n), jnp.float32, -10.0, 10.0)
        d3 = jax.random.normal(k2, (3, args.n), jnp.float32)
    d3 = d3 / jnp.linalg.norm(d3, axis=0, keepdims=True)
    if args.sort:
        from pathtracerpython_tpu.ops.sort import (
            permute_minor,
            scene_bounds,
            wavefront_sort_order,
        )

        lo3, hi3 = scene_bounds(scene)
        order = wavefront_sort_order(
            o3, d3, jnp.ones(args.n, bool), lo3, hi3
        )
        o3, d3 = permute_minor(o3, order), permute_minor(d3, order)
    o3, d3 = jax.device_put((o3, d3))
    jax.block_until_ready((o3, d3))

    kw = dict(
        c_tri=args.c_tri, r_blk=args.r_blk, w_per_rb=args.w_per_rb,
        group=args.group,
    )
    if args.kernel in ("nearest", "both"):
        t0 = time.perf_counter()
        fn = jax.jit(lambda o, d: sp.sparse_nearest_t_idx_cm(
            o, d, scene, **kw
        ))
        t, idx = fn(o3, d3)
        jax.block_until_ready((t, idx))
        hits = int(jnp.sum(idx >= 0))
        print(f"nearest OK: hits={hits}/{args.n} "
              f"({time.perf_counter() - t0:.1f}s compile+run)", flush=True)
    if args.kernel in ("anyhit", "both"):
        t0 = time.perf_counter()
        maxd = jnp.full((args.n,), 40.0, jnp.float32)
        fn = jax.jit(lambda o, d, m: sp.sparse_any_hit_cm(
            o, d, m, scene, **kw
        ))
        occ = fn(o3, d3, maxd)
        jax.block_until_ready(occ)
        print(f"anyhit OK: occ={int(jnp.sum(occ))}/{args.n} "
              f"({time.perf_counter() - t0:.1f}s compile+run)", flush=True)
    print(f"REPRO_OK tris={n_tris}", flush=True)


if __name__ == "__main__":
    main()
