"""Gradient correctness: autodiff through the integrator vs central finite
differences (the BASELINE gate: "pixel-grad allclose vs finite diff").

RNG is counter-based and fixed given the seed, so the loss is a
deterministic function of parameters and FD with a shared seed is a valid
oracle. Tests run in fast mode (the differentiable path); visibility
discontinuities are avoided by construction (see the synthetic scene).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pathtracerpython_tpu.diff import (
    apply_params,
    fit,
    make_render_fn,
    make_train_step,
    pixel_loss,
)
from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.scene.arrays import pack_scene
from pathtracerpython_tpu.scene.obj import mesh_from_arrays
from pathtracerpython_tpu.scene.sdl import SceneDescription, SdlObject

import optax


def make_flat_scene():
    """One big diffuse floor triangle + one light triangle above it.

    No occluders and no silhouette edges near the test rays, so the
    radiance is a smooth function of every parameter we perturb.
    """
    floor = mesh_from_arrays(
        [[-5.0, -1.0, 1.0], [5.0, -1.0, 1.0], [0.0, -1.0, -9.0]],
        [[0, 1, 2]],
    )
    light = mesh_from_arrays(
        [[-0.5, 1.5, -2.5], [0.5, 1.5, -2.5], [0.0, 1.5, -1.5]],
        [[0, 1, 2]],
    )
    desc = SceneDescription(
        eye=(0.0, 0.0, 3.0),
        width=16,
        height=16,
        ortho=(-1.0, -1.0, 1.0, 1.0),
        ambient=0.4,
        light_mesh=light,
        light_color=(1.0, 0.9, 0.8),
        objects=[
            SdlObject(mesh=floor, rgb=(0.6, 0.4, 0.2), ka=0.3, kd=0.7,
                      ks=0.0, kt=0.0, n=2.0)
        ],
    )
    return pack_scene(desc)


@pytest.fixture(scope="module")
def flat_scene():
    return make_flat_scene()


def center_rays(n=4):
    """A small grid of rays through the window region (x, y≈-0.5) that all
    hit the floor triangle's interior."""
    xs = jnp.linspace(-0.2, 0.2, n)
    ys = jnp.linspace(-0.6, -0.4, n)
    x, y = jnp.meshgrid(xs, ys, indexing="ij")
    pts = jnp.stack([x.ravel(), y.ravel(), jnp.zeros(n * n)], axis=-1)
    eye = jnp.asarray([0.0, 0.0, 3.0], jnp.float32)
    origins = jnp.broadcast_to(eye, pts.shape)
    return origins.astype(jnp.float32), (pts - eye).astype(jnp.float32)


def loss_and_grad(params, scene, cfg, rays, seed=0):
    origins, dirs = rays
    pids = jnp.arange(origins.shape[0], dtype=jnp.int32)
    key = jax.random.PRNGKey(seed)
    target = jnp.zeros((origins.shape[0], 3), jnp.float32)
    render_fn = make_render_fn(cfg)

    def f(p):
        return pixel_loss(p, scene, target, render_fn, origins, dirs, pids, key)

    return jax.value_and_grad(f)(params), f


def central_fd(f, params, field, index, eps):
    p_hi = dict(params)
    p_lo = dict(params)
    arr = params[field]
    p_hi[field] = arr.at[index].add(eps)
    p_lo[field] = arr.at[index].add(-eps)
    return (f(p_hi) - f(p_lo)) / (2.0 * eps)


@pytest.mark.parametrize(
    "field,index,eps",
    [
        ("mat_rgb", (0, 0), 1e-2),
        ("mat_rgb", (0, 2), 1e-2),
        ("mat_ka", (0,), 1e-2),
        ("mat_kd", (0,), 1e-2),
        ("light_color", (1,), 1e-2),
        ("ambient", (), 1e-2),
    ],
)
def test_material_and_emission_grads_match_fd(flat_scene, field, index, eps):
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=2,
                       n_light_samples=2)
    params = {field: getattr(flat_scene, field)}
    (loss, grads), f = loss_and_grad(params, flat_scene, cfg, center_rays())
    assert jnp.isfinite(loss)
    ad = np.asarray(grads[field])[index]
    fd = float(central_fd(f, params, field, index, eps))
    assert np.isfinite(ad)
    np.testing.assert_allclose(ad, fd, rtol=2e-2, atol=2e-5)


@pytest.mark.parametrize(
    "field,index",
    [
        ("tri_v0", (0, 1)),   # floor vertex height
        ("tri_v0", (0, 0)),   # floor vertex x
        ("light_v0", (0, 1)),  # light vertex height (NEE geometry)
    ],
)
def test_vertex_grads_match_fd(flat_scene, field, index):
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=1,
                       n_light_samples=2)
    params = {field: getattr(flat_scene, field)}
    (loss, grads), f = loss_and_grad(params, flat_scene, cfg, center_rays())
    ad = np.asarray(grads[field])[index]
    fd = float(central_fd(f, params, field, index, 2e-3))
    assert np.isfinite(ad)
    np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=5e-5)


def test_light_vertex_grad_couples_tri_buffer(flat_scene):
    """Moving a light vertex must also move its copy in the main triangle
    buffer for hit tests — apply_params on light_v0 alone is a *sampling*
    change; this documents that contract (both buffers exist)."""
    moved = apply_params(flat_scene, {"light_v0": flat_scene.light_v0 + 0.1})
    assert np.allclose(
        np.asarray(moved.light_v0), np.asarray(flat_scene.light_v0) + 0.1
    )


def test_inverse_fit_recovers_albedo(flat_scene):
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=2,
                       n_light_samples=2)
    from pathtracerpython_tpu.render.integrator import render

    target = render(flat_scene, cfg, seed=7)
    true_rgb = np.asarray(flat_scene.mat_rgb)

    params = {"mat_rgb": flat_scene.mat_rgb * 0.5}
    params, losses = fit(
        params, optax.adam(0.05), flat_scene, cfg, target, steps=30, seed=7
    )
    assert losses[-1] < losses[0] * 0.05, losses
    got = np.asarray(params["mat_rgb"])[0]
    np.testing.assert_allclose(got, true_rgb[0], atol=0.05)


def test_sharded_train_step_matches_single(flat_scene):
    """One optimizer step on an 8-device mesh == one single-device step
    (grads psum through the shard_map transpose)."""
    from pathtracerpython_tpu.parallel import make_mesh
    from pathtracerpython_tpu.render.integrator import render

    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=2)
    target = render(flat_scene, cfg, seed=1)
    opt = optax.sgd(0.1)
    params = {"mat_rgb": flat_scene.mat_rgb * 0.8}
    key = jax.random.PRNGKey(5)

    single = make_train_step(opt, flat_scene, cfg, target)
    p1, _, l1 = single(params, opt.init(params), key)

    mesh = make_mesh(dp=4, geom=2)
    sharded = make_train_step(
        opt, flat_scene, cfg, target, mesh=mesh, geom_axis="geom"
    )
    p2, _, l2 = sharded(params, opt.init(params), key)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1["mat_rgb"]), np.asarray(p2["mat_rgb"]), rtol=1e-5,
        atol=1e-7,
    )


def test_remat_bounces_gradients_match(flat_scene):
    """jax.checkpoint over bounces must not change values or gradients."""
    import dataclasses

    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=3,
                       n_light_samples=2)
    cfg_r = dataclasses.replace(cfg, remat_bounces=True)
    params = {"mat_rgb": flat_scene.mat_rgb}
    (l1, g1), _ = loss_and_grad(params, flat_scene, cfg, center_rays())
    (l2, g2), _ = loss_and_grad(params, flat_scene, cfg_r, center_rays())
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g1["mat_rgb"]), np.asarray(g2["mat_rgb"]), rtol=1e-5,
        atol=1e-8,
    )


def test_light_vertex_override_syncs_tri_buffer(flat_scene):
    """apply_params on light_v* must move the light's rows in the main
    triangle buffer too (hit/occlusion/emission see the same geometry the
    NEE sampler draws from)."""
    import numpy as np

    moved = apply_params(flat_scene, {"light_v0": flat_scene.light_v0 + 0.2})
    rows = np.asarray(flat_scene.light_tri_rows)
    np.testing.assert_allclose(
        np.asarray(moved.tri_v0)[rows],
        np.asarray(flat_scene.light_v0) + 0.2,
        rtol=1e-6,
    )


def camera_loss_fn(scene, cfg, seed=3):
    """Loss of the scene's own camera view vs a fixed target, as a
    function of a params dict — the in-loss ray-generation path."""
    from pathtracerpython_tpu.diff import camera_pixel_loss
    from pathtracerpython_tpu.render.integrator import render

    target = render(scene, cfg, seed=seed)
    pids = jnp.arange(
        scene.meta.width * scene.meta.height, dtype=jnp.int32
    )
    key = jax.random.PRNGKey(seed)
    render_fn = make_render_fn(cfg)

    def f(p):
        return camera_pixel_loss(p, scene, target, render_fn, pids, key)

    return f


@pytest.mark.parametrize("index", [0, 1, 2])
def test_camera_eye_grad_matches_fd(flat_scene, index):
    """d(loss)/d(eye) via autodiff == central finite differences: the
    in-loss primary-ray generation makes camera pose a real parameter
    (VERDICT round-1 item 4; reference camera model utils.py:55-69)."""
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=1,
                       n_light_samples=2)
    f = camera_loss_fn(flat_scene, cfg)
    # perturbed start so the loss is nonzero and grads are informative
    params = {"eye": flat_scene.eye + jnp.asarray([0.03, -0.02, 0.05])}
    ad = np.asarray(jax.grad(f)(params)["eye"])[index]
    fd = float(central_fd(f, params, "eye", (index,), 2e-3))
    assert np.isfinite(ad)
    np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=5e-5)


def test_camera_ortho_grad_matches_fd(flat_scene):
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=1,
                       n_light_samples=2)
    f = camera_loss_fn(flat_scene, cfg)
    params = {"ortho": flat_scene.ortho + jnp.asarray([0.02, 0.0, -0.03, 0.01])}
    ad = np.asarray(jax.grad(f)(params)["ortho"])[2]
    fd = float(central_fd(f, params, "ortho", (2,), 2e-3))
    np.testing.assert_allclose(ad, fd, rtol=5e-2, atol=5e-5)


def test_camera_fit_recovers_eye(flat_scene):
    """Gradient descent on the eye position recovers the true camera.

    Target and loss share ONE RNG key, so the loss is a deterministic
    function with its global minimum (zero) exactly at the true eye —
    ``fit()``'s per-step key splitting would add an MC-noise floor that
    only more spp could remove (the demo app uses spp=2 for that)."""
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=1,
                       n_light_samples=2)
    f = camera_loss_fn(flat_scene, cfg)
    offset = jnp.asarray([0.08, -0.06, 0.1])
    params = {"eye": flat_scene.eye + offset}
    opt = optax.adam(0.02)
    state = opt.init(params)
    step = jax.jit(
        lambda p, st: (lambda lg: (lg[0], *opt.update(lg[1], st, p)))(
            jax.value_and_grad(f)(p)
        )
    )
    for _ in range(100):
        loss, updates, state = step(params, state)
        params = optax.apply_updates(params, updates)
    err0 = float(jnp.abs(offset).max())
    err = float(jnp.abs(params["eye"] - flat_scene.eye).max())
    # gate on EYE error, not loss: the scalar loss is dominated by
    # pixel-coverage terms that change discretely as silhouettes cross
    # pixel centers, so it plateaus while the smooth interior gradient
    # still drives the eye toward the truth (observed: 0.10 -> 0.02 in
    # 100 steps while the loss sits on a discrete plateau)
    assert np.isfinite(float(loss))
    assert err < err0 * 0.35, (err0, err)


def test_pixel_loss_rejects_camera_params(flat_scene):
    cfg = RenderConfig(mode="fast")
    origins, dirs = center_rays()
    pids = jnp.arange(origins.shape[0], dtype=jnp.int32)
    with pytest.raises(ValueError, match="camera"):
        pixel_loss(
            {"eye": flat_scene.eye}, flat_scene,
            jnp.zeros((origins.shape[0], 3)), make_render_fn(cfg),
            origins, dirs, pids, jax.random.PRNGKey(0),
        )


def test_fit_resume_bitmatch(flat_scene, tmp_path):
    """Interrupt-and-resume at step k == uninterrupted run, bit for bit
    (params + optimizer state + RNG position are all checkpointed)."""
    from pathtracerpython_tpu.render.integrator import render

    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=1,
                       n_light_samples=2)
    target = render(flat_scene, cfg, seed=9)
    opt = optax.adam(0.05)
    init = {"mat_rgb": flat_scene.mat_rgb * 0.5}

    p_full, _ = fit(dict(init), opt, flat_scene, cfg, target, steps=6, seed=9)

    ck = str(tmp_path / "ck")
    # "interrupted" run: only executes steps 1..4 (checkpoint at 2 and 4)
    fit(dict(init), opt, flat_scene, cfg, target, steps=4, seed=9,
        checkpoint_dir=ck, checkpoint_every=2)
    # resume: restores step-4 state, runs 5..6
    p_res, losses_res = fit(
        dict(init), opt, flat_scene, cfg, target, steps=6, seed=9,
        checkpoint_dir=ck, checkpoint_every=2,
    )
    assert len(losses_res) == 2  # only the resumed steps ran
    np.testing.assert_array_equal(
        np.asarray(p_full["mat_rgb"]), np.asarray(p_res["mat_rgb"])
    )


def test_light_rows_survive_morton(cornell_sdl):
    import numpy as np

    from pathtracerpython_tpu.scene.arrays import pack_scene
    from pathtracerpython_tpu.scene.sdl import load_sdl

    sc = pack_scene(load_sdl(cornell_sdl), morton_order=True)
    rows = np.asarray(sc.light_tri_rows)
    np.testing.assert_allclose(
        np.asarray(sc.tri_v0)[rows], np.asarray(sc.light_v0), rtol=1e-6
    )
    assert np.asarray(sc.tri_is_light)[rows].all()
