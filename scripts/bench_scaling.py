"""Scaling-efficiency harness (BASELINE north star: ≥90% from 1 to N).

Measures sharded-render throughput across mesh sizes on whatever devices
exist. On this environment only one real chip is visible, so run on the
virtual CPU mesh to validate the harness and the sharding code path; on a
real slice the same script reports true scaling efficiency.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    import os

    if "xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", ""
    ):
        # the caller asked for virtual host devices: force the CPU platform
        # (this environment pins jax_platforms via sitecustomize, so the
        # JAX_PLATFORMS env var alone cannot)
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")

    from pathtracerpython_tpu.parallel import make_mesh, render_sharded
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.scene import load_scene

    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", file=sys.stderr)

    scene = load_scene("/root/reference/objs/cornellroom.sdl", pad_to=32)
    cfg = RenderConfig(
        mode="fast", n_samples=2, n_bounces=2,
        backend="pallas" if jax.default_backend() == "tpu" else "xla",
    )

    results = {}
    sizes = [d for d in (1, 2, 4, 8, n_dev) if d <= n_dev]
    for dp in sorted(set(sizes)):
        mesh = make_mesh(dp=dp, geom=1)

        def run(seed):
            out = render_sharded(scene, cfg, mesh, seed=seed)
            return float(jnp.sum(out))

        run(0)  # compile
        t0 = time.perf_counter()
        for s in (1, 2, 3):
            run(s)
        dt = (time.perf_counter() - t0) / 3
        results[dp] = dt
        base = results[sizes[0]]
        eff = base / (dt * dp / sizes[0])
        print(f"dp={dp}: {dt*1e3:8.1f} ms/render  "
              f"scaling efficiency vs dp={sizes[0]}: {eff*100:5.1f}%")

    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == "__main__":
    main()
