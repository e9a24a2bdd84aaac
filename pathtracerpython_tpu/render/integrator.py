"""The wavefront path-tracing integrator.

Replaces the reference's driver loop (``main.py:165-293``) — two
``multiprocessing.Pool`` fan-outs per bounce plus a sequential Python scatter
phase — with a single jitted program over a flat ray SoA:

    for each sample:                      (lax.scan over sample index)
        state = primary rays              (ops.camera)
        for each bounce:                  (lax.scan over bounce index)
            hit   = nearest_hit(state)    (ops.geometry sweep / Pallas)
            color = shade(hit)            (ambient + NEE; light on hit)
            state = scatter(hit, state)   (diffuse/specular branch, masked)

Dead rays are masked lanes (``alive``), not ``None`` entries; the per-ray
scalar throughput ``accumulated_k`` (``main.py:190,251,263``) and the
radiance accumulator ride in the state. RNG is counter-based threefry keyed
by (pixel, sample, bounce, purpose) so renders are reproducible and
shard-invariant.

Estimator semantics per mode are documented in ``RenderConfig``; the
``reference`` path mirrors ``main.py:142-145`` (ambient + NEE), ``:214-215``
(light hits pay ``scene.light_color``), and ``:233-268`` (branch by
``uniform(0, kd+ks)``, cosine sample in the canonical frame rotated about the
fixed y-axis, specular reflection of the raw stored direction with a
Phong-toward-eye weight).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from pathtracerpython_tpu.ops import sampling
from pathtracerpython_tpu.ops.camera import make_primary_rays
from pathtracerpython_tpu.ops.geometry import (
    NearestHit,
    any_hit_within,
    nearest_hit,
    safe_normalize,
)
from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.scene.arrays import SceneArrays


class RayState(NamedTuple):
    """Per-ray wavefront state (flat SoA over N rays)."""

    origin: jax.Array      # f32[N, 3]
    direction: jax.Array   # f32[N, 3] raw dir (primaries unnormalized,
    #                        like the reference's make_rays — the specular
    #                        branch consumes it raw, main.py:254-256)
    throughput: jax.Array  # f32[N] — the reference's accumulated_k
    alive: jax.Array       # bool[N]
    radiance: jax.Array    # f32[N, 3] accumulated pixel color
    key: jax.Array         # uint32[N, 2] per-ray threefry key
    prev_specular: jax.Array  # bool[N] — last bounce was specular (fast mode
    #                           emission rule; unused in reference mode)


def _vm_fold(keys, data):
    """fold_in a scalar into a batch of keys."""
    return jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, data)


def _uniforms(keys, shape):
    """Per-ray uniforms: keys [N,2] -> u [N, *shape]."""
    return jax.vmap(lambda k: jax.random.uniform(k, shape))(keys)


class Materials(NamedTuple):
    """Per-ray material properties, resolved ONCE per bounce (a single
    packed one-hot matmul, ops/gather.py) instead of 15 per-ray gathers
    spread across shade/NEE/scatter — gathers dominate TPU bounce cost."""

    rgb: jax.Array  # f[N, 3]
    ka: jax.Array   # f[N]
    kd: jax.Array   # f[N]
    ks: jax.Array   # f[N]
    n: jax.Array    # f[N]


def resolve_materials(scene: SceneArrays, material) -> Materials:
    from pathtracerpython_tpu.ops.gather import ONEHOT_ROWS, take_columns_packed

    if scene.mat_rgb.shape[0] > ONEHOT_ROWS:
        return Materials(
            rgb=scene.mat_rgb[material],
            ka=scene.mat_ka[material],
            kd=scene.mat_kd[material],
            ks=scene.mat_ks[material],
            n=scene.mat_n[material],
        )

    rgb, ka, kd, ks, n = take_columns_packed(
        [
            scene.mat_rgb,
            scene.mat_ka[:, None],
            scene.mat_kd[:, None],
            scene.mat_ks[:, None],
            scene.mat_n[:, None],
        ],
        material,
    )
    return Materials(
        rgb=rgb, ka=ka[..., 0], kd=kd[..., 0], ks=ks[..., 0], n=n[..., 0]
    )


def _power_numpy_semantics(base, exponent):
    """x ** p with numpy float semantics: negative base with an integral
    exponent keeps the sign parity; negative base with a fractional exponent
    is NaN. The reference raises a possibly-negative Phong cosine to a float
    power (``main.py:263-264``); XLA's generic pow would NaN where numpy
    doesn't, so spell it out.
    """
    r = jnp.round(exponent)
    is_int = r == exponent
    odd = jnp.mod(r, 2.0) == 1.0
    mag = jnp.power(jnp.abs(base), exponent)
    neg_case = jnp.where(is_int, jnp.where(odd, -mag, mag), jnp.nan)
    return jnp.where(base >= 0.0, mag, neg_case)


def shade_nee(
    point, normal, mat: Materials, keys, scene: SceneArrays,
    cfg: RenderConfig,
):
    """Direct lighting via next-event estimation at [N] shading points.

    Reference contract (``main.py:23-73``): ``n_light_samples`` light points
    (triangle ∝ area, point via normalized-uniform barycentrics), occlusion
    against object triangles only, contribution = mean over samples of the
    **unclamped** dot(shadow_dir, normal), times light_color × obj_rgb.

    Fast mode: uniform barycentrics, clamped cosine; same estimator shape.
    """
    n = point.shape[0]
    s = cfg.n_light_samples
    u = _uniforms(keys, (s, 5))  # [N, S, 5]

    tri = sampling.pick_light_triangle(u[..., 0], scene.light_area)  # [N,S]
    if cfg.mode == "reference":
        bary = sampling.sample_barycentric_reference(u[..., 1:4])
    else:
        bary = sampling.sample_barycentric_uniform(u[..., 1:3])
    from pathtracerpython_tpu.ops.gather import take_columns_packed

    lv0, lv1, lv2 = take_columns_packed(
        [scene.light_v0, scene.light_v1, scene.light_v2], tri
    )
    light_pt = sampling.point_from_barycentric(bary, lv0, lv1, lv2)
    # [N, S, 3]

    vec = light_pt - point[:, None, :]
    # sqrt(x + tiny), not linalg.norm: lanes shading ON the light (terminated
    # next bounce, masked by is_light) can have |vec| ≈ 0, where norm's
    # gradient is NaN — and NaN · masked-zero cotangent is still NaN.
    dist = jnp.sqrt(jnp.sum(vec * vec, axis=-1) + 1e-24)  # [N, S]
    sdir = safe_normalize(vec)

    occluded = any_hit_within(
        jnp.broadcast_to(point[:, None, :], vec.shape).reshape(n * s, 3),
        sdir.reshape(n * s, 3),
        dist.reshape(n * s),
        scene,
        mode=cfg.mode,
        tile=cfg.tile,
        backend=cfg.backend,
        geom_axis=cfg.geom_axis,
        geom_axis_size=cfg.geom_axis_size,
    ).reshape(n, s)

    cos = jnp.sum(sdir * normal[:, None, :], axis=-1)  # [N, S] unclamped
    if cfg.mode != "reference":
        cos = jnp.maximum(cos, 0.0)
    mean_cos = jnp.mean(jnp.where(occluded, 0.0, cos), axis=-1)  # [N]

    if cfg.mode == "reference":
        # Reference bug (main.py:42-71): ``obj_color`` reads the occlusion
        # scan's leaked loop variable, so the direct term is tinted by the
        # object that blocked the LAST light sample — or, when that sample
        # was unoccluded, by the LAST object in the SDL — never by the
        # object actually being shaded (only ambient uses the true rgb).
        from pathtracerpython_tpu.ops.gather import take_rows
        from pathtracerpython_tpu.ops.geometry import first_occluder_index

        occ_idx, occ_mat = first_occluder_index(
            point, sdir[:, -1, :], dist[:, -1], scene,
            mode=cfg.mode, tile=cfg.tile,
            geom_axis=cfg.geom_axis, geom_axis_size=cfg.geom_axis_size,
        )
        quirk_mat = jnp.where(
            occ_idx >= 0, occ_mat, scene.meta.n_objects - 1
        )
        direct_rgb = take_rows(scene.mat_rgb, quirk_mat)
    else:
        direct_rgb = mat.rgb

    return scene.light_color[None, :] * direct_rgb * mean_cos[:, None]


def shade(hit: NearestHit, mat: Materials, keys, scene: SceneArrays,
          cfg: RenderConfig, prev_specular):
    """Per-bounce color: light hits pay the light color, surface hits pay
    ambient + NEE (``compute_color``, ``main.py:142-145``). Misses pay 0.

    Fast mode kills the reference's emission double-count (quirk §2.4-6):
    a light hit only pays when the path arrived from the camera or a
    specular bounce (NEE already accounts for diffuse paths).
    """
    ambient = mat.rgb * (mat.ka * scene.ambient)[..., None]
    direct = shade_nee(hit.point, hit.normal, mat, keys, scene, cfg)
    surface = ambient + direct

    light = jnp.broadcast_to(scene.light_color[None, :], surface.shape)
    if cfg.mode != "reference":
        light = jnp.where(prev_specular[:, None], light, 0.0)
    color = jnp.where(hit.is_light[:, None], light, surface)
    return jnp.where(hit.hit[:, None], color, 0.0)


def scatter(
    state: RayState, hit: NearestHit, mat: Materials, keys,
    scene: SceneArrays, cfg: RenderConfig
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """BRDF sampling: returns (new_dir, throughput_factor, survives,
    chose_specular) for every lane (masked by the caller).

    Reference contract (``main.py:233-268``): branch by
    ``uniform(0, kd+ks) <= kd``; diffuse = canonical cosine sample rotated
    about the fixed y-axis by arccos(normal_y), factor ``kd·dot(dir, n)``;
    specular = reflect the RAW previous direction (no negation), rotate the
    same way, factor ``ks·dot(eye_vec, dir)^n`` with eye_vec toward the eye.

    Fast mode: cosine-importance-sampled diffuse about the true shading
    normal and mirror reflection of the incident direction; the branch is
    chosen w.p. kd/(kd+ks) and the factor is (kd+ks) either way (probability-
    weighted, unbiased for the kd+ks ≤ 1 energy split).
    """
    u = _uniforms(keys, (3,))  # [N, 3]
    kd, ks, n_phong = mat.kd, mat.ks, mat.n
    normal = hit.normal

    if cfg.mode == "reference":
        diffuse_local = sampling.cosine_hemisphere_reference(u[:, 1:3])
        diffuse_dir = sampling.rotate_frame_reference(diffuse_local, normal)
        spec = safe_normalize(
            2.0 * jnp.sum(normal * state.direction, -1, keepdims=True) * normal
            - state.direction
        )
        spec_dir = sampling.rotate_frame_reference(spec, normal)
        eye_vec = safe_normalize(scene.eye[None, :] - hit.point)

        choose_diffuse = u[:, 0] * (kd + ks) <= kd
        new_dir = jnp.where(choose_diffuse[:, None], diffuse_dir, spec_dir)
        diffuse_k = kd * jnp.sum(diffuse_dir * normal, -1)
        spec_k = ks * _power_numpy_semantics(
            jnp.sum(eye_vec * spec_dir, -1), n_phong
        )
        factor = jnp.where(choose_diffuse, diffuse_k, spec_k)
    else:
        d_in = safe_normalize(state.direction)
        # shade on the side the ray arrived from
        n_sh = normal * jnp.sign(
            -jnp.sum(normal * d_in, -1, keepdims=True) + 1e-12
        )
        diffuse_dir = sampling.cosine_hemisphere_fixed(u[:, 1:3], n_sh)
        spec_dir = sampling.reflect(d_in, n_sh)

        w = kd + ks
        p_diffuse = jnp.where(w > 0.0, kd / jnp.maximum(w, 1e-12), 1.0)
        choose_diffuse = u[:, 0] < p_diffuse
        new_dir = jnp.where(choose_diffuse[:, None], diffuse_dir, spec_dir)
        factor = w

    survives = hit.hit & ~hit.is_light
    return new_dir, factor, survives, ~choose_diffuse


def bounce_step(
    state: RayState, bounce_idx, scene: SceneArrays, cfg: RenderConfig
) -> RayState:
    """One wavefront bounce: intersect → shade → scatter, fully masked."""
    hit = nearest_hit(
        state.origin, state.direction, scene, mode=cfg.mode, tile=cfg.tile,
        backend=cfg.backend, geom_axis=cfg.geom_axis,
        geom_axis_size=cfg.geom_axis_size,
    )

    kb = _vm_fold(state.key, bounce_idx)
    k_nee = _vm_fold(kb, 0)
    k_scatter = _vm_fold(kb, 1)

    mat = resolve_materials(scene, hit.material)
    color = shade(hit, mat, k_nee, scene, cfg, state.prev_specular)
    contrib = jnp.where(
        state.alive[:, None], color * state.throughput[:, None], 0.0
    )
    radiance = state.radiance + contrib

    new_dir, factor, survives, chose_spec = scatter(
        state, hit, mat, k_scatter, scene, cfg
    )
    alive = state.alive & survives
    throughput = jnp.where(alive, state.throughput * factor, state.throughput)
    origin = jnp.where(alive[:, None], hit.point, state.origin)
    direction = jnp.where(alive[:, None], new_dir, state.direction)

    return RayState(
        origin=origin,
        direction=direction,
        throughput=throughput,
        alive=alive,
        radiance=radiance,
        key=state.key,
        prev_specular=state.alive & chose_spec,
    )


def init_rays(
    origins, directions, pixel_ids, sample_idx, base_key
) -> RayState:
    """Fresh primary-ray state for one sample pass.

    Keys are fold_in(fold_in(base, pixel_id), sample) — pixel_ids are GLOBAL
    pixel indices, so a sharded render draws the identical stream.
    ``sample_idx`` may be a scalar (one sample pass) or a per-lane array
    (sample-batched mode) — the key stream is identical either way.
    """
    n = origins.shape[0]
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(base_key, pixel_ids)
    if jnp.ndim(sample_idx) == 0:
        keys = _vm_fold(keys, sample_idx)
    else:
        keys = jax.vmap(jax.random.fold_in)(keys, sample_idx)
    return RayState(
        origin=origins,
        direction=directions,
        throughput=jnp.ones(n, origins.dtype),
        alive=jnp.ones(n, dtype=bool),
        radiance=jnp.zeros((n, 3), origins.dtype),
        key=keys,
        prev_specular=jnp.ones(n, dtype=bool),  # camera counts as specular
    )


def render_rays(
    origins, directions, pixel_ids, scene: SceneArrays, cfg: RenderConfig,
    base_key,
) -> jax.Array:
    """Trace the given primary rays; return radiance [N, 3] (mean over
    ``cfg.n_samples`` sample passes). This is the shard-local entry point —
    ``parallel.shard`` calls it on a slice of pixels with global ids.

    Two execution plans with IDENTICAL results (RNG keys depend only on
    (pixel, sample)):
    - sequential (default): lax.scan over samples — minimal memory;
    - ``cfg.batch_samples``: all samples ride the wavefront as extra lanes
      — n_samples× fewer kernel launches, n_samples× the live state.
    """
    n = origins.shape[0]

    def bounce_sweep(state):
        def body(st, b):
            return bounce_step(st, b, scene, cfg), None

        if cfg.remat_bounces:
            body = jax.checkpoint(body)
        return lax.scan(body, state, jnp.arange(cfg.n_bounces))[0]

    if cfg.batch_samples and cfg.n_samples > 1:
        s = cfg.n_samples
        rep = lambda x: jnp.concatenate([x] * s, axis=0)
        sample_idx = jnp.repeat(
            jnp.arange(s, dtype=jnp.int32), n
        )
        state = init_rays(
            rep(origins), rep(directions), rep(pixel_ids), sample_idx,
            base_key,
        )
        state = bounce_sweep(state)
        return jnp.mean(
            state.radiance.reshape(s, n, 3), axis=0
        )

    def one_sample(carry, sample_idx):
        state = init_rays(origins, directions, pixel_ids, sample_idx, base_key)
        state = bounce_sweep(state)
        return carry + state.radiance, None

    total = lax.scan(
        one_sample,
        jnp.zeros((n, 3), origins.dtype),
        jnp.arange(cfg.n_samples),
    )[0]
    return total / cfg.n_samples


def render(scene: SceneArrays, cfg: RenderConfig, seed: int = 0) -> jax.Array:
    """Render the scene's camera view; returns radiance [W*H, 3] in the
    reference's pixel order (x-outer / y-inner)."""
    base_key = jax.random.PRNGKey(seed)
    w, h = scene.meta.width, scene.meta.height
    origins, dirs = make_primary_rays(scene.eye, scene.ortho, w, h)
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    return render_rays(origins, dirs, pixel_ids, scene, cfg, base_key)


def render_image(scene: SceneArrays, cfg: RenderConfig, seed: int = 0):
    """Render and convert to a uint8 image with reference normalization."""
    from pathtracerpython_tpu.render.image import radiance_to_image

    radiance = render(scene, cfg, seed=seed)
    return radiance_to_image(radiance, scene.meta.width, scene.meta.height)
