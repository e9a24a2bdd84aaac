"""Capture a device trace of the Cornell headline render (fused vs
composed) for kernel-level attribution — run on the real chip when the
tunnel is up, open the trace dir in Perfetto/TensorBoard.

Usage: python scripts/profile_fused.py [--out /tmp/fused_trace]
       [--fused auto|off] [--size 512] [--spp 4] [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/fused_trace")
    p.add_argument("--fused", default="auto", choices=["auto", "off"])
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--spp", type=int, default=4)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pathtracerpython_tpu.ops.camera import make_primary_rays
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render_rays
    from pathtracerpython_tpu.scene import load_scene
    from pathtracerpython_tpu.utils.profiling import trace_context

    print(f"platform: {jax.default_backend()}", file=sys.stderr)
    scene = jax.device_put(
        load_scene("/root/reference/objs/cornellroom.sdl", pad_to=32)
    )
    cfg = RenderConfig(
        mode="fast", n_samples=args.spp, n_bounces=4, backend="pallas",
        fused_bounce=args.fused, batch_samples=True,
    )
    w = h = args.size
    o, d = make_primary_rays(scene.eye, scene.ortho, w, h)
    pids = jnp.arange(w * h, dtype=jnp.int32)

    run = jax.jit(lambda k: jnp.sum(
        render_rays(o, d, pids, scene, cfg, k)
    ))
    float(run(jax.random.PRNGKey(0)))  # compile + warm
    with trace_context(args.out):
        for i in range(3):
            v = float(run(jax.random.PRNGKey(i + 1)))
    print(f"trace written to {args.out} (sum={v:.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
