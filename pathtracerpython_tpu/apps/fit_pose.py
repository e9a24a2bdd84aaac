"""Inverse rendering demo: recover scene geometry poses from a target image
via vertex-position gradients (BASELINE.json config 4).

Two modes:

- ``light`` (default): recover the area light's lateral (x, z) position.
  The light's vertices enter the estimator smoothly (NEE sample points →
  shadow direction → cosine), so interior autodiff gradients are exact and
  the fit converges to ~1e-4 offset error. Only the lateral components are
  optimized: the reference estimator has no inverse-square distance
  falloff (``main.py:65-73``), which leaves the vertical position
  ill-conditioned (cosine-only signal) — free y drifts instead of
  converging.

- ``--object <name>`` (e.g. ``cube``): translate a scene object. For
  axis-aligned opaque geometry the interior derivative is degenerate —
  in-plane translation doesn't move any face's plane, so the true
  gradient lives entirely in silhouette/occlusion boundary terms. This
  mode therefore runs the SOFT estimator (``RenderConfig.soft_vis_beta``,
  diff/boundary.py): silhouettes blend over the surface behind them and
  shadows use smooth edge coverage, giving FD-validated boundary
  gradients (tests/test_boundary.py), and the fit recovers the cube's
  pose.

Run: python -m pathtracerpython_tpu.apps.fit_pose [--steps N]
     python -m pathtracerpython_tpu.apps.fit_pose --object cube
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def find_object_index(scene_path: str, name_fragment: str) -> int:
    """Index of the first SDL object whose OBJ path contains the fragment."""
    from pathtracerpython_tpu.scene.sdl import load_sdl

    desc = load_sdl(scene_path)
    for i, obj in enumerate(desc.objects):
        if name_fragment in os.path.basename(obj.mesh.path):
            return i
    raise ValueError(
        f"no object matching {name_fragment!r} in {scene_path}"
    )


def translate_object(scene, obj_index: int, offset):
    """Shift every triangle of material row ``obj_index`` by ``offset``."""
    import jax.numpy as jnp

    mask = (scene.tri_material == obj_index) & scene.tri_valid
    shift = jnp.where(mask[:, None], 1.0, 0.0) * offset[None, :]
    return dataclasses.replace(
        scene,
        tri_v0=scene.tri_v0 + shift,
        tri_v1=scene.tri_v1 + shift,
        tri_v2=scene.tri_v2 + shift,
    )


def translate_light(scene, offset):
    """Shift the area light; ``diff.apply_params`` keeps the NEE sampling
    buffers and the light's rows in the main triangle buffer in sync (one
    code path owns that invariant)."""
    from pathtracerpython_tpu.diff import apply_params

    return apply_params(scene, {
        "light_v0": scene.light_v0 + offset,
        "light_v1": scene.light_v1 + offset,
        "light_v2": scene.light_v2 + offset,
    })


def run(
    scene_path: str = "/root/reference/objs/cornellroom.sdl",
    object_name: str | None = None,  # None = light mode
    init_offset=(0.4, 0.0, 0.3),
    steps: int = 120,
    lr: float = 0.05,
    out_dir: str = "/tmp/fit_pose",
    seed: int = 0,
    spp: int = 1,
    bounces: int = 1,
    soft_beta: float = 0.05,
    log=print,
) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pathtracerpython_tpu.ops.camera import make_primary_rays
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.image import radiance_to_image, save_png
    from pathtracerpython_tpu.render.integrator import render, render_rays
    from pathtracerpython_tpu.scene import load_scene

    os.makedirs(out_dir, exist_ok=True)
    scene = load_scene(scene_path)
    # object mode needs boundary gradients -> soft estimator; light mode
    # keeps the hard estimator (the light enters the NEE math smoothly)
    cfg = RenderConfig(
        mode="fast", n_samples=spp, n_bounces=bounces,
        soft_vis_beta=soft_beta if object_name is not None else 0.0,
    )

    if object_name is None:
        move = translate_light
        what = "light"
    else:
        obj_index = find_object_index(scene_path, object_name)
        move = lambda sc, off: translate_object(sc, obj_index, off)
        what = f"object {object_name} (#{obj_index})"

    target = render(scene, cfg, seed=seed)
    w, h = scene.meta.width, scene.meta.height
    save_png(
        radiance_to_image(target, w, h), os.path.join(out_dir, "target.png")
    )

    origins, dirs = make_primary_rays(scene.eye, scene.ortho, w, h)
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    # fixed RNG: the loss is a deterministic, piecewise-smooth function of
    # the offset, so plain gradient descent applies
    key = jax.random.PRNGKey(seed)

    lateral_only = object_name is None

    def to_offset(params):
        if lateral_only:
            return jnp.asarray(
                [params[0], 0.0, params[1]], jnp.float32
            )
        return params

    def loss_fn(params):
        radiance = render_rays(
            origins, dirs, pixel_ids, move(scene, to_offset(params)), cfg,
            key,
        )
        return 0.5 * jnp.mean((radiance - target) ** 2)

    init = jnp.asarray(init_offset, jnp.float32)
    params = init[jnp.asarray([0, 2])] if lateral_only else init
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    offset = to_offset(params)

    save_png(
        radiance_to_image(render(move(scene, offset), cfg, seed=seed), w, h),
        os.path.join(out_dir, "fitted.png"),
    )

    result = {
        "mode": what,
        "loss_first": losses[0],
        "loss_last": losses[-1],
        "init_offset_norm": float(np.linalg.norm(np.asarray(init_offset))),
        "final_offset_norm": float(jnp.linalg.norm(offset)),
        "final_offset": [float(x) for x in offset],
        "out_dir": out_dir,
    }
    log(json.dumps(result))
    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump({**result, "losses": losses}, f)
    return result


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="/root/reference/objs/cornellroom.sdl")
    p.add_argument("--object", default=None,
                   help="translate this object instead of the light "
                        "(runs the soft estimator for boundary gradients)")
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--soft-beta", type=float, default=0.05,
                   help="soft-visibility edge width (object mode)")
    p.add_argument("--out", default="/tmp/fit_pose")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu — the axon "
                        "sitecustomize pins the tunneled TPU, which hangs "
                        "when the tunnel is down)")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    run(
        scene_path=args.scene, object_name=args.object, steps=args.steps,
        lr=args.lr, out_dir=args.out, soft_beta=args.soft_beta,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
