"""Numerical-hygiene job: render and differentiate under jax_debug_nans.

The JAX analogue of a sanitizer pass (SURVEY.md §5 "race detection /
sanitizers"): with ``jax_debug_nans`` any NaN produced inside a jitted
computation raises immediately with the offending primitive, so silently
poisoned radiance or gradients fail the suite here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracerpython_tpu.render import RenderConfig, render


@pytest.mark.parametrize("mode", ["fast", "reference"])
def test_render_produces_no_nans(cornell_scene, mode):
    with jax.debug_nans(True):
        out = render(
            cornell_scene,
            RenderConfig(mode=mode, n_samples=1, n_bounces=3),
            seed=11,
        )
        jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_produce_no_nans(cornell_scene):
    from pathtracerpython_tpu.diff import make_render_fn, pixel_loss

    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=2)
    scene = cornell_scene
    from pathtracerpython_tpu.ops.camera import make_primary_rays

    o, d = make_primary_rays(scene.eye, scene.ortho, 40, 40)
    pids = jnp.arange(1600, dtype=jnp.int32)
    params = {
        "mat_rgb": scene.mat_rgb,
        "light_color": scene.light_color,
        "tri_v0": scene.tri_v0,
    }
    with jax.debug_nans(True):
        grads = jax.grad(pixel_loss)(
            params, scene, jnp.zeros((1600, 3)), make_render_fn(cfg),
            o, d, pids, jax.random.PRNGKey(0),
        )
        jax.block_until_ready(grads)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k


def test_multihost_helpers_single_process():
    from pathtracerpython_tpu.parallel import multihost

    assert multihost.initialize() is False  # no coordinator configured
    assert multihost.is_primary()
    x = jnp.arange(8.0)
    np.testing.assert_array_equal(multihost.fetch_to_host(x), np.arange(8.0))
    multihost.sync()  # no-op, must not raise
