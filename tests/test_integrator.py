"""Integrator smoke + physical-plausibility tests on the Cornell box."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracerpython_tpu.render import RenderConfig, render
from pathtracerpython_tpu.render.image import radiance_to_canvas, radiance_to_image


@pytest.fixture(scope="module", params=["reference", "fast"])
def radiance_1b(request, cornell_scene):
    cfg = RenderConfig(mode=request.param, n_samples=2, n_bounces=1)
    out = jax.jit(render, static_argnums=1)(cornell_scene, cfg)
    return request.param, np.asarray(out)


def test_render_shapes_finite(radiance_1b):
    _, rad = radiance_1b
    assert rad.shape == (1600, 3)
    assert np.isfinite(rad).all()
    assert (rad >= 0).any()
    assert rad.max() > 0


def test_render_plausibility(radiance_1b):
    """Left wall is red, right wall green, light visible at ceiling center.

    In reference mode the wall tint is weak: the reference's direct-light
    color comes from a leaked loop variable (the last-scanned occluder /
    last SDL object, ``main.py:42-71``), so only the ambient term carries
    the true wall color. Fast mode shades with the correct material.
    """
    mode, rad = radiance_1b
    canvas = np.asarray(radiance_to_canvas(jnp.asarray(rad), 40, 40))
    left = canvas[15:25, 0:5]    # mid rows, left columns
    right = canvas[15:25, 35:40]
    factor = 2.0 if mode == "fast" else 1.1
    assert left[..., 0].mean() > left[..., 1].mean() * factor, "left not red"
    assert right[..., 1].mean() > right[..., 0].mean() * factor, \
        "right not green"
    # the light quad projects into the upper-center region; rays that hit it
    # pay light_color = (1,1,1), so the region max must be near-white
    top_center = canvas[0:10, 12:28]
    assert top_center.max(axis=(0, 1)).min() > 0.9, "light quad not visible"


def test_render_deterministic(cornell_scene):
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=2)
    a = np.asarray(render(cornell_scene, cfg, seed=0))
    b = np.asarray(render(cornell_scene, cfg, seed=0))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render(cornell_scene, cfg, seed=1))
    assert np.abs(a - c).max() > 0, "different seeds must differ"


def test_more_bounces_add_light(cornell_scene):
    # fast mode clamps cosines, so contributions are nonnegative and extra
    # bounces strictly add radiance; reference mode can go either way
    # (unclamped dots, SURVEY.md §2.4-5), so only require a change there.
    cfg1 = RenderConfig(mode="fast", n_samples=1, n_bounces=1)
    cfg3 = RenderConfig(mode="fast", n_samples=1, n_bounces=3)
    r1 = np.asarray(render(cornell_scene, cfg1))
    r3 = np.asarray(render(cornell_scene, cfg3))
    assert r3.sum() > r1.sum(), "extra bounces must add radiance (fast)"

    ref1 = np.asarray(render(cornell_scene,
                             RenderConfig(mode="reference", n_bounces=1)))
    ref3 = np.asarray(render(cornell_scene,
                             RenderConfig(mode="reference", n_bounces=3)))
    assert np.abs(ref3 - ref1).max() > 0, "bounces must change the image"


def test_image_output(cornell_scene):
    cfg = RenderConfig(mode="reference", n_samples=1, n_bounces=1)
    rad = render(cornell_scene, cfg)
    img = radiance_to_image(rad, 40, 40)
    assert img.shape == (40, 40, 3) and img.dtype == np.uint8
    assert img.max() == 255  # min-max normalization hits the full range
    assert img.min() == 0


def test_batch_samples_matches_sequential(cornell_scene):
    """Sample-batched execution must be bit-equivalent to the sample scan
    (same RNG stream per (pixel, sample))."""
    import dataclasses

    cfg = RenderConfig(mode="fast", n_samples=3, n_bounces=2)
    cfg_b = dataclasses.replace(cfg, batch_samples=True)
    a = np.asarray(render(cornell_scene, cfg, seed=6))
    b = np.asarray(render(cornell_scene, cfg_b, seed=6))
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)


def test_constant_canvas_minmax_no_nan():
    """All-equal radiance (e.g. an all-background render) must produce a
    valid zero image, not NaNs, on the default minmax path."""
    import jax.numpy as jnp

    from pathtracerpython_tpu.render.image import radiance_to_image

    img = radiance_to_image(jnp.full((16, 3), 0.25), 4, 4)
    assert img.dtype == np.uint8
    assert (img == 0).all()
