"""The promised 128^2 soft pose fit on a >4096-triangle scene, timed
(VERDICT r3 task 6 / round-2 item-4 "done when").

Scene: the Cornell box rendered at 128x128 plus 4,800 distant clutter
triangles (same recipe as tests/test_soft_sparse.py — far outside every
camera/light path, so radiance is unchanged but the triangle count
crosses ``diff.boundary.SOFT_ACCEL_MIN_TRIS`` and every soft sweep routes
through the cluster-accelerated O(N·K·c) path). The small cube's planar
pose (x, z, yaw) is perturbed and recovered by ``apps.fit_pose.run`` —
the production fit with its beta anneal and coarse-to-fine pyramid — and
an FD spot-gate validates the soft gradient on this exact scene.

Run (the real thing, on the chip):  python scripts/soft_fit_128.py
Prints one JSON line with wall-clock, pose errors, and the FD gate;
docs/PERFORMANCE.md records the measured chip numbers.
"""

from __future__ import annotations

# Run-from-anywhere bootstrap: the scripts import the package from the
# repo root without requiring a pip install (VERDICT r4 weak #2 class).
import os as _os, sys as _sys
_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)

import argparse
import dataclasses
import json
import time

CORNELL = "/root/reference/objs/cornellroom.sdl"


def build_scene(width: int, height: int, n_far_tris: int = 4800):
    """Cornell at ``width x height`` + distant clutter (>4096 triangles
    total). Clutter is appended as the LAST SDL object so the cube object
    indices match the plain Cornell file."""
    import numpy as np

    from pathtracerpython_tpu.scene.arrays import pack_scene
    from pathtracerpython_tpu.scene.obj import mesh_from_arrays
    from pathtracerpython_tpu.scene.sdl import SdlObject, load_sdl

    rng = np.random.default_rng(0)
    k = n_far_tris
    base = rng.uniform([-50, -50, -320], [50, 50, -280], (k, 3))
    verts = np.concatenate(
        [base, base + rng.normal(0, 0.3, (k, 3)),
         base + rng.normal(0, 0.3, (k, 3))], axis=0
    ).astype(np.float32)
    faces = np.stack(
        [np.arange(k), np.arange(k) + k, np.arange(k) + 2 * k], axis=1
    )
    clutter = SdlObject(
        mesh=mesh_from_arrays(verts.tolist(), faces.tolist()),
        rgb=(0.5, 0.5, 0.5), ka=0.3, kd=0.7, ks=0.0, kt=0.0, n=1.0,
    )
    desc = load_sdl(CORNELL)
    desc = dataclasses.replace(
        desc, width=width, height=height,
        objects=list(desc.objects) + [clutter],
    )
    return pack_scene(desc, tri_order="morton")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--beta", type=float, default=0.03)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from pathtracerpython_tpu.apps.fit_pose import find_object_index, run
    from pathtracerpython_tpu.diff import boundary as bd
    from pathtracerpython_tpu.diff.transforms import transform_object
    from pathtracerpython_tpu.ops.camera import make_primary_rays
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render_rays
    from pathtracerpython_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    scene = build_scene(args.size, args.size)
    n_tris = int(scene.tri_v0.shape[0])
    assert n_tris >= bd.SOFT_ACCEL_MIN_TRIS, n_tris
    scene = jax.device_put(scene)

    # FD spot-gate on this exact scene: soft cube-translation gradient at
    # a modest displacement, the protocol of tests/test_pose.py (clear of
    # the floor-contact stacked-boundary band)
    cfg_g = RenderConfig(mode="fast", n_samples=1, n_bounces=1,
                         soft_vis_beta=2.0 * args.beta)
    w = h = args.size
    o, d = make_primary_rays(scene.eye, scene.ortho, w, h)
    pids = jnp.arange(w * h, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    target = render_rays(o, d, pids, scene, cfg_g, key)

    cube_idx = find_object_index(CORNELL, "cube")

    def loss_dx(dx):
        moved = transform_object(
            scene, cube_idx, jnp.asarray([1.0, 0.0, 0.0]) * dx, 0.0
        )
        rad = render_rays(o, d, pids, moved, cfg_g, key)
        return 0.5 * jnp.mean((rad - target) ** 2)

    t0 = time.perf_counter()
    # jitted: eager autodiff through the soft sweeps materializes every
    # residual as a live buffer (measured 76 GB at 128^2 — OOM); under
    # jit XLA fuses/remats them away
    ad = float(jax.jit(jax.grad(loss_dx))(0.15))
    fd_gate_grad_s = time.perf_counter() - t0
    # eps large enough to average the discrete-flip noise floor at 128^2
    # (measured: eps=5e-4 puts FD at 3x the true slope; 2e-3 validates
    # to 1-4% at both probe offsets)
    eps = 2e-3
    lf = jax.jit(loss_dx)
    fd = (float(lf(0.15 + eps)) - float(lf(0.15 - eps))) / (2 * eps)
    fd_rel = abs(ad - fd) / max(abs(fd), 1e-12)

    t_fit0 = time.perf_counter()
    result = run(
        scene_path=CORNELL, object_name="cube", steps=args.steps,
        lr=0.03, out_dir="/tmp/soft_fit_128", soft_beta=args.beta,
        scene_arrays=scene, log=lambda *_: None,
    )
    fit_s = time.perf_counter() - t_fit0

    import numpy as np

    err = np.abs(np.asarray(result["final_offset"], np.float64))
    ang_err = abs(float(np.atleast_1d(result["final_angle"])[0]))
    out = {
        "what": "soft_fit_128",
        "platform": jax.default_backend(),
        "size": args.size,
        "n_triangles": n_tris,
        "steps": args.steps,
        "betas": result["betas"],
        "levels": result["levels"],
        "fit_wall_s": round(fit_s, 2),
        "loss_first": result["loss_first"],
        "loss_last": result["loss_last"],
        "final_offset": result["final_offset"],
        "final_angle": result["final_angle"],
        "pose_err_max": round(float(max(err.max(), ang_err)), 5),
        "fd_gate": {"ad": ad, "fd": fd, "rel": round(fd_rel, 4),
                    "grad_wall_s": round(fd_gate_grad_s, 2)},
        "converged": bool(err.max() < 0.05 and ang_err < 0.05),
        "fd_ok": bool(fd_rel < 8e-2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
