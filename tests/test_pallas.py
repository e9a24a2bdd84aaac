"""Pallas megakernel parity vs the XLA sweeps (interpret mode on CPU; the
same kernels compile for real on TPU — backend selection is automatic).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from pathtracerpython_tpu.ops.camera import make_primary_rays
from pathtracerpython_tpu.ops.geometry import (
    any_hit_within,
    nearest_hit,
    safe_normalize,
)
from pathtracerpython_tpu.kernels import any_hit_pallas, nearest_hit_pallas
from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.render.integrator import render


def primary_rays(scene):
    return make_primary_rays(
        scene.eye, scene.ortho, scene.meta.width, scene.meta.height
    )


def test_nearest_hit_matches_xla(cornell_scene):
    o, d = primary_rays(cornell_scene)
    ref = nearest_hit(o, d, cornell_scene, mode="fast")
    out = nearest_hit_pallas(o, d, cornell_scene)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_array_equal(
        np.asarray(out.tri_idx)[h], np.asarray(ref.tri_idx)[h]
    )
    np.testing.assert_allclose(
        np.asarray(out.t)[h], np.asarray(ref.t)[h], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.point)[h], np.asarray(ref.point)[h], rtol=1e-5,
        atol=1e-6,
    )


def test_nearest_hit_unaligned_ray_count(cornell_scene):
    o, d = primary_rays(cornell_scene)
    o, d = o[:77], d[:77]  # not a multiple of R_BLK
    ref = nearest_hit(o, d, cornell_scene, mode="fast")
    out = nearest_hit_pallas(o, d, cornell_scene)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(
        np.asarray(out.t)[h], np.asarray(ref.t)[h], rtol=1e-6, atol=1e-6
    )


def test_any_hit_matches_xla(cornell_scene):
    key = jax.random.PRNGKey(0)
    n = 256
    k1, k2, k3 = jax.random.split(key, 3)
    origin = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    direction = safe_normalize(
        jax.random.normal(k2, (n, 3), dtype=jnp.float32)
    )
    max_dist = jax.random.uniform(k3, (n,), minval=0.5, maxval=4.0)
    ref = any_hit_within(origin, direction, max_dist, cornell_scene)
    out = any_hit_pallas(origin, direction, max_dist, cornell_scene)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_full_render_pallas_backend(cornell_scene):
    cfg_x = RenderConfig(mode="fast", n_samples=1, n_bounces=2)
    cfg_p = RenderConfig(mode="fast", n_samples=1, n_bounces=2,
                         backend="pallas")
    rx = np.asarray(render(cornell_scene, cfg_x, seed=2))
    rp = np.asarray(render(cornell_scene, cfg_p, seed=2))
    # Backends reassociate float ops, so rays exactly grazing a triangle
    # edge may classify differently — a measure-zero set. Demand near-exact
    # agreement everywhere else and bounded error on the flips.
    close = np.isclose(rp, rx, rtol=1e-5, atol=1e-5)
    assert close.mean() > 0.995, f"only {close.mean():.4f} close"
    assert np.abs(rp - rx).max() < 0.05


def test_nearest_hit_gradients_match_xla(cornell_scene):
    """d(sum of hit distances)/d(origin, vertices): the pallas custom VJP
    must agree with autodiff through the XLA sweep."""
    o, d = primary_rays(cornell_scene)
    o, d = o[:128], d[:128]

    def loss_xla(origin, v0):
        import dataclasses

        sc = dataclasses.replace(cornell_scene, tri_v0=v0)
        hit = nearest_hit(origin, d, sc, mode="fast")
        return jnp.sum(jnp.where(hit.hit, hit.t, 0.0))

    def loss_pal(origin, v0):
        import dataclasses

        sc = dataclasses.replace(cornell_scene, tri_v0=v0)
        hit = nearest_hit_pallas(origin, d, sc)
        return jnp.sum(jnp.where(hit.hit, hit.t, 0.0))

    gx = jax.grad(loss_xla, argnums=(0, 1))(o, cornell_scene.tri_v0)
    gp = jax.grad(loss_pal, argnums=(0, 1))(o, cornell_scene.tri_v0)
    np.testing.assert_allclose(
        np.asarray(gp[0]), np.asarray(gx[0]), rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gx[1]), rtol=1e-4, atol=5e-5
    )


def test_fused_nee_render_matches_xla(cornell_scene):
    """The fused NEE megakernel path == the unfused composition."""
    import dataclasses

    cfg_x = RenderConfig(mode="fast", n_samples=2, n_bounces=2,
                         backend="xla")
    cfg_p = dataclasses.replace(cfg_x, backend="pallas")
    rx = np.asarray(render(cornell_scene, cfg_x, seed=4))
    rp = np.asarray(render(cornell_scene, cfg_p, seed=4))
    close = np.isclose(rp, rx, rtol=1e-5, atol=1e-5)
    assert close.mean() > 0.995, close.mean()
    assert np.abs(rp - rx).max() < 0.05


def test_fused_nee_gradients_match_xla(cornell_scene):
    """Gradients through the fused NEE custom VJP (light position, albedo,
    shading point via vertices) == autodiff through the unfused path."""
    import dataclasses

    from pathtracerpython_tpu.diff import make_render_fn, pixel_loss
    from pathtracerpython_tpu.ops.camera import make_primary_rays

    o, d = make_primary_rays(
        cornell_scene.eye, cornell_scene.ortho, 40, 40
    )
    pids = jnp.arange(1600, dtype=jnp.int32)
    params = {
        "mat_rgb": cornell_scene.mat_rgb,
        "light_v0": cornell_scene.light_v0,
        "tri_v0": cornell_scene.tri_v0,
    }
    cfg_x = RenderConfig(mode="fast", n_samples=1, n_bounces=2,
                         backend="xla")
    # subject under test = the composed kernels' custom VJPs (fused NEE +
    # intersect)
    cfg_p = dataclasses.replace(cfg_x, backend="pallas")

    def grads(cfg):
        return jax.grad(pixel_loss)(
            params, cornell_scene, jnp.zeros((1600, 3)),
            make_render_fn(cfg), o, d, pids, jax.random.PRNGKey(2),
        )

    gx = grads(cfg_x)
    gp = grads(cfg_p)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gx[k]), rtol=1e-3, atol=2e-5,
            err_msg=k,
        )
