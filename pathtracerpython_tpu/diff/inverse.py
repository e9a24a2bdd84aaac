"""Inverse rendering: differentiate the wavefront integrator w.r.t. scene
parameters and fit them to target images.

Parameters are expressed as a dict of SceneArrays field overrides (a plain
pytree, so it drops straight into ``jax.grad`` and optax). Supported:

- material fields (``mat_rgb``, ``mat_ka``, ``mat_kd``, ``mat_ks``,
  ``mat_n``) — "free" gradients through the shading math;
- emission (``light_color``, ``ambient``);
- vertex buffers (``tri_v0/1/2``, ``light_v0/1/2``) — interior gradients
  through hit distance, shading point, and (via ``recompute_derived``)
  normals and areas. With the hard estimator, visibility discontinuities
  follow the detached-sampling discipline (discrete choices — hit
  selection, BRDF branch, light-triangle pick — carry no gradients);
  setting ``RenderConfig.soft_vis_beta > 0`` switches to the
  boundary-aware soft estimator (diff/boundary.py) whose silhouette and
  shadow terms ARE differentiable in occluder vertex positions
  (SURVEY.md §7 step 4, completed in round 2);
- camera (``eye``, ``ortho``) — via in-loss primary-ray generation
  (``camera_pixel_loss``).

Gradient flow notes (what makes the integrator differentiable):
- nearest-hit sweeps select a winner by ``argmin`` (non-differentiable
  index) but recompute ``point = origin + t·d`` from the *winning* ``t``,
  which does carry d(t)/d(vertices) through the Möller–Trumbore solve;
- RNG is counter-based and fixed given (seed, pixel, sample, bounce), so a
  loss is a deterministic function of parameters — central finite
  differences with the same seed are a valid oracle (the BASELINE gate).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from pathtracerpython_tpu.ops.camera import make_primary_rays
from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.render.integrator import render_rays
from pathtracerpython_tpu.scene.arrays import SceneArrays, recompute_derived

# Fields that may appear in a params dict.
MATERIAL_FIELDS = ("mat_rgb", "mat_ka", "mat_kd", "mat_ks", "mat_kt", "mat_n")
EMISSION_FIELDS = ("light_color", "ambient")
VERTEX_FIELDS = (
    "tri_v0", "tri_v1", "tri_v2", "light_v0", "light_v1", "light_v2",
)
# Camera parameters (reference camera model: ``utils.py:55-69``). The
# training step generates primary rays INSIDE the loss from the
# parameterized scene (``camera_pixel_loss``), so ``eye`` / ``ortho``
# overrides move the camera and carry gradients through ray origins and
# directions into the hit solve. ``pixel_loss`` (caller-supplied rays)
# cannot see camera overrides and rejects them.
CAMERA_FIELDS = ("eye", "ortho")
PARAM_FIELDS = MATERIAL_FIELDS + EMISSION_FIELDS + VERTEX_FIELDS + CAMERA_FIELDS

_LIGHT_TO_TRI = {"light_v0": "tri_v0", "light_v1": "tri_v1",
                 "light_v2": "tri_v2"}


def apply_params(scene: SceneArrays, params: dict) -> SceneArrays:
    """Overlay a params dict onto the scene; rederive normals/areas when
    vertices moved so their gradients flow too.

    The light's geometry exists twice (NEE sampling buffers and its rows
    in the main triangle buffer — hit/occlusion/emission); overriding
    ``light_v*`` updates BOTH via ``scene.light_tri_rows`` so the sampled
    light and the visible light cannot drift apart."""
    unknown = set(params) - set(PARAM_FIELDS)
    if unknown:
        raise ValueError(f"unknown scene parameters: {sorted(unknown)}")
    scene = dataclasses.replace(scene, **params)
    sync = {}
    for lf, tf in _LIGHT_TO_TRI.items():
        if lf in params:
            tri = sync.get(tf, getattr(scene, tf))
            sync[tf] = tri.at[scene.light_tri_rows].set(params[lf])
    if sync:
        scene = dataclasses.replace(scene, **sync)
    if any(f in params for f in VERTEX_FIELDS):
        scene = recompute_derived(scene)
    return scene


def make_render_fn(
    cfg: RenderConfig,
    mesh=None,
    dp_axis="dp",
    geom_axis: str | None = None,
) -> Callable:
    """A renderer ``(origins, dirs, pixel_ids, scene, key) -> radiance``:
    single-device, or sharded over ``mesh`` when one is given."""
    if mesh is None:
        return lambda o, d, p, sc, key: render_rays(o, d, p, sc, cfg, key)

    from pathtracerpython_tpu.parallel.shard import render_rays_sharded

    return lambda o, d, p, sc, key: render_rays_sharded(
        o, d, p, sc, cfg, key, mesh, dp_axis=dp_axis, geom_axis=geom_axis
    )


def pixel_loss(
    params: dict,
    base_scene: SceneArrays,
    target: jax.Array,
    render_fn: Callable,
    origins: jax.Array,
    directions: jax.Array,
    pixel_ids: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """0.5 · mean squared pixel error of the parameterized render vs target
    for a caller-supplied ray batch. Camera overrides are rejected here —
    fixed rays could not react to them (use ``camera_pixel_loss``)."""
    cam = [f for f in CAMERA_FIELDS if f in params]
    if cam:
        raise ValueError(
            f"camera parameters {cam} need in-loss ray generation; "
            "use camera_pixel_loss / make_train_step"
        )
    scene = apply_params(base_scene, params)
    radiance = render_fn(origins, directions, pixel_ids, scene, key)
    return 0.5 * jnp.mean((radiance - target) ** 2)


def camera_pixel_loss(
    params: dict,
    base_scene: SceneArrays,
    target: jax.Array,
    render_fn: Callable,
    pixel_ids: jax.Array,
    key: jax.Array,
) -> jax.Array:
    """Like ``pixel_loss`` but for the scene's own camera view, with
    primary rays generated inside the loss — so ``eye`` and ``ortho``
    are first-class differentiable parameters (gradients flow through
    ray origins/directions into the Möller–Trumbore hit solve and the
    shading geometry)."""
    scene = apply_params(base_scene, params)
    w, h = base_scene.meta.width, base_scene.meta.height
    origins, directions = make_primary_rays(scene.eye, scene.ortho, w, h)
    radiance = render_fn(origins, directions, pixel_ids, scene, key)
    return 0.5 * jnp.mean((radiance - target) ** 2)


def make_train_step(
    optimizer: optax.GradientTransformation,
    base_scene: SceneArrays,
    cfg: RenderConfig,
    target: jax.Array,
    mesh=None,
    dp_axis="dp",
    geom_axis: str | None = None,
):
    """Build a jitted full training step for the scene's camera view:

        params, opt_state, key -> (params, opt_state, loss)

    value_and_grad through the (possibly shard_map'ed) renderer; on a mesh,
    parameter gradients are all-reduced by the shard_map transpose (psum
    over the ray axes) — no hand-written collectives. Primary rays are
    generated inside the loss (``camera_pixel_loss``), so camera params
    (``eye``, ``ortho``) optimize like any other field.
    """
    w, h = base_scene.meta.width, base_scene.meta.height
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    render_fn = make_render_fn(cfg, mesh, dp_axis, geom_axis)

    @jax.jit
    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(camera_pixel_loss)(
            params, base_scene, target, render_fn, pixel_ids, key,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def fit(
    params: dict,
    optimizer: optax.GradientTransformation,
    base_scene: SceneArrays,
    cfg: RenderConfig,
    target: jax.Array,
    steps: int,
    seed: int = 0,
    mesh=None,
    dp_axis="dp",
    geom_axis: str | None = None,
    callback=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
):
    """Run ``steps`` optimizer iterations; returns (params, losses list).

    With ``checkpoint_dir``, the FULL training state — params, optimizer
    state, and the RNG key position — is checkpointed every
    ``checkpoint_every`` steps and restored on restart, so an interrupted
    fit resumed at step k produces bit-identical params to an
    uninterrupted run (tests/test_diff.py gates this). ``losses`` covers
    only the steps executed in this invocation.
    """
    step_fn = make_train_step(
        optimizer, base_scene, cfg, target, mesh, dp_axis, geom_axis
    )
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(seed)
    start = 0

    mgr = None
    if checkpoint_dir is not None:
        from pathtracerpython_tpu.utils import CheckpointManager

        mgr = CheckpointManager(checkpoint_dir)
        latest = mgr.latest_step()
        if latest is not None:
            template = {"params": params, "opt_state": opt_state, "key": key}
            state = mgr.restore(latest, template)
            params, opt_state, key = (
                state["params"], state["opt_state"], state["key"],
            )
            start = latest

    losses = []
    for i in range(start, steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, sub)
        # keep the device scalar: float() here would sync every step and
        # stall dispatch of the next one
        losses.append(loss)
        if (mgr is not None and checkpoint_every > 0
                and (i + 1) % checkpoint_every == 0):
            jax.block_until_ready((params, opt_state))
            mgr.save(
                i + 1,
                {"params": params, "opt_state": opt_state, "key": key},
            )
        if callback is not None:
            callback(i, params, float(loss))
    return params, [float(l) for l in losses]
