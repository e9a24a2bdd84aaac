"""Static-grid floor cost of the cluster-sparse sweeps.

An all-parked wavefront (every lane keyed to the park direction, zero
candidate clusters anywhere) makes the sparse nearest sweep execute
nothing but its static work-item grid — ``w_per_rb x chunk_rb`` steps of
inactive-item churn per launch. The measured time is therefore the hard
floor any real wavefront pays on top of its Möller–Trumbore work.

Interpretation (decides the next optimization): if the floor at the
tuned wpr=512 is a significant share of the measured ~87 ms nearest /
~109 ms NEE sweeps (docs/PERFORMANCE.md "Large scenes"), the grid tail
is the per-item-overhead bound and a dynamic worklist cap (size the grid
from the real item count per launch) is the lever; if it is small, the
overhead lives in the active items themselves and finer clusters /
grouping are the lever.

Prints one JSON line per configuration. TPU-intended (the axon
measurement pattern of bench.py: device_put inputs, lax.scan REPS inside
one jit, single-scalar fetch, measured fetch overhead subtracted).
"""

# Run-from-anywhere bootstrap: the scripts import the package from the
# repo root without requiring a pip install (VERDICT r4 weak #2 class).
import os as _os, sys as _sys
_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

REPS = 8


def fetch_overhead() -> float:
    xs = jax.device_put(jnp.arange(6, dtype=jnp.int32))
    f = jax.jit(lambda e: jnp.sum(e.astype(jnp.float32)))
    float(f(xs[0]))
    best = 1e9
    for i in range(1, 6):
        t0 = time.perf_counter()
        float(f(xs[i]))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=524288)
    p.add_argument("--boxes", type=int, default=8333)
    p.add_argument(
        "--platform", default=None,
        help="jax platform override (e.g. cpu — the axon sitecustomize "
        "pins the tunneled TPU, which hangs when the tunnel is down)",
    )
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pathtracerpython_tpu.kernels import sparse_pallas as sp
    from pathtracerpython_tpu.ops.sort import PARK_DIR, PARK_ORIGIN
    from pathtracerpython_tpu.scene.arrays import pack_scene
    from pathtracerpython_tpu.scene.synthetic import box_field_scene

    n = args.rays
    scene = jax.device_put(pack_scene(
        box_field_scene(n_boxes=args.boxes, width=512, height=512),
        morton_order=True,
    ))
    o3 = jnp.broadcast_to(
        jnp.asarray(PARK_ORIGIN, jnp.float32)[:, None], (3, n))
    d3 = jnp.broadcast_to(
        jnp.asarray(PARK_DIR, jnp.float32)[:, None], (3, n))
    o3, d3 = jax.device_put((o3, d3))
    ovh = fetch_overhead()

    for wpr in (512, 128, 32):
        def near(i, o, dd, w=wpr):
            t, idx = sp.sparse_nearest_t_idx_cm(
                o + i * 1e-7, dd, scene, w_per_rb=w, two_pass=0)
            return jnp.sum(t) + jnp.sum(idx.astype(jnp.float32))

        g = jax.jit(lambda i, *a: lax.scan(
            lambda acc, k: (acc + near(k, *a), None),
            0.0, i + jnp.arange(REPS, dtype=jnp.float32))[0])
        t0 = time.perf_counter()
        float(g(jnp.float32(0.0), o3, d3))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for i in (1, 2):
            t0 = time.perf_counter()
            float(g(jnp.float32(i), o3, d3))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "metric": "parked_nearest_grid_floor",
            "w_per_rb": wpr,
            "n_rays": n,
            "platform": jax.default_backend(),
            "ms_per_sweep": round((best - ovh) / REPS * 1e3, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
