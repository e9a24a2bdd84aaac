"""Inverse rendering: differentiate the wavefront integrator w.r.t. scene
parameters and fit them to target images.

Parameters are expressed as a dict of SceneArrays field overrides (a plain
pytree, so it drops straight into ``jax.grad`` and optax). Supported:

- material fields (``mat_rgb``, ``mat_ka``, ``mat_kd``, ``mat_ks``,
  ``mat_n``) — "free" gradients through the shading math;
- emission (``light_color``, ``ambient``);
- vertex buffers (``tri_v0/1/2``, ``light_v0/1/2``) — interior gradients
  through hit distance, shading point, and (via ``recompute_derived``)
  normals and areas. Visibility discontinuities are handled by the
  detached-sampling discipline of the integrator (discrete choices — hit
  selection, BRDF branch, light-triangle pick — do not carry gradients);
  boundary/edge terms are future work (SURVEY.md §7 step 4).

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
# Note: camera pose ("eye") is deliberately NOT a parameter — the training
# step precomputes primary rays from the base scene, so an eye override
# could not move the camera and would silently produce wrong gradients.
# Camera-pose optimization needs in-loss ray generation (future work).
PARAM_FIELDS = MATERIAL_FIELDS + EMISSION_FIELDS + VERTEX_FIELDS

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
    """0.5 · mean squared pixel error of the parameterized render vs target."""
    scene = apply_params(base_scene, params)
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
    over the ray axes) — no hand-written collectives.
    """
    w, h = base_scene.meta.width, base_scene.meta.height
    origins, dirs = make_primary_rays(base_scene.eye, base_scene.ortho, w, h)
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    render_fn = make_render_fn(cfg, mesh, dp_axis, geom_axis)

    @jax.jit
    def train_step(params, opt_state, key):
        loss, grads = jax.value_and_grad(pixel_loss)(
            params, base_scene, target, render_fn,
            origins, dirs, pixel_ids, key,
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
):
    """Run ``steps`` optimizer iterations; returns (params, losses list)."""
    step_fn = make_train_step(
        optimizer, base_scene, cfg, target, mesh, dp_axis, geom_axis
    )
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(seed)
    losses = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, sub)
        # keep the device scalar: float() here would sync every step and
        # stall dispatch of the next one
        losses.append(loss)
        if callback is not None:
            callback(i, params, float(loss))
    return params, [float(l) for l in losses]
