"""Headline benchmark: rays/s/chip on the Cornell box at 4 bounces.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north-star target of
50M rays/s/chip (the reference publishes no numbers of its own — its pure
Python pool is ~10²–10³ rays/s, see BASELINE.md).

Counted rays = closest-hit path segments + NEE shadow rays, i.e.
W·H·spp·bounces·(1 + n_light_samples) — every ray that runs an
intersection sweep against the full scene.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    try:
        jax.devices()
    except RuntimeError:
        # requested platform (e.g. the axon TPU tunnel) unavailable in this
        # shell — fall back to CPU so the bench still runs
        jax.config.update("jax_platforms", "cpu")

    from pathtracerpython_tpu.ops.camera import make_primary_rays
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render_rays
    from pathtracerpython_tpu.scene import load_scene

    on_tpu = jax.default_backend() not in ("cpu",)
    width = height = 512 if on_tpu else 64
    spp = 4 if on_tpu else 1
    bounces = 4
    nee = 3  # reference default n_light_samples (main.py:23)

    scene = load_scene("/root/reference/objs/cornellroom.sdl")
    cfg = RenderConfig(mode="fast", n_samples=spp, n_bounces=bounces,
                       n_light_samples=nee)

    origins, dirs = make_primary_rays(scene.eye, scene.ortho, width, height)
    pixel_ids = jnp.arange(width * height, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    fn = jax.jit(
        lambda sc, o, d, p, k: render_rays(o, d, p, sc, cfg, k)
    )
    out = fn(scene, origins, dirs, pixel_ids, key)
    jax.block_until_ready(out)  # compile + warm up

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(scene, origins, dirs, pixel_ids, key)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    total_rays = width * height * spp * bounces * (1 + nee)
    rays_per_s = total_rays / best
    target = 50e6
    print(json.dumps({
        "metric": "rays_per_s_per_chip_cornell_4bounce",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()
