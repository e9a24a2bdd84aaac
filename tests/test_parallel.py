"""Distributed-path tests on the virtual 8-device CPU mesh (conftest.py).

The invariant under test: sharding is an implementation detail. Because RNG
keys derive from GLOBAL pixel ids, a render sharded any which way must be
bit-identical (up to float addition order, which we avoid by keeping
per-pixel work local) to the single-device render.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pathtracerpython_tpu.parallel import make_mesh, render_sharded
from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.render.integrator import render


@pytest.fixture(scope="module")
def baseline(cornell_scene):
    cfg = RenderConfig(mode="fast", n_samples=2, n_bounces=2)
    return np.asarray(render(cornell_scene, cfg, seed=3)), cfg


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_sharded_matches_single_device(cornell_scene, baseline):
    ref, cfg = baseline
    mesh = make_mesh(dp=8, geom=1)
    out = render_sharded(cornell_scene, cfg, mesh, seed=3)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_dp_geom_ring_matches_single_device(cornell_scene, baseline):
    ref, cfg = baseline
    mesh = make_mesh(dp=4, geom=2)
    out = render_sharded(cornell_scene, cfg, mesh, seed=3, geom_axis="geom")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_geom_ring_four_way(cornell_scene, baseline):
    ref, cfg = baseline
    mesh = make_mesh(dp=2, geom=4)
    out = render_sharded(cornell_scene, cfg, mesh, seed=3, geom_axis="geom")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_reference_mode_sharded(cornell_scene):
    cfg = RenderConfig(mode="reference", n_samples=1, n_bounces=2)
    ref = np.asarray(render(cornell_scene, cfg, seed=0))
    mesh = make_mesh(dp=4, geom=2)
    out = render_sharded(cornell_scene, cfg, mesh, seed=0, geom_axis="geom")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-6)


def test_ring_nearest_hit_global_indices(cornell_scene):
    """The ring must return GLOBAL triangle indices identical to the
    replicated sweep's, not shard-local ones."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pathtracerpython_tpu.ops.camera import make_primary_rays
    from pathtracerpython_tpu.ops.geometry import nearest_hit
    from pathtracerpython_tpu.parallel.shard import scene_partition_specs

    scene = cornell_scene
    o, d = make_primary_rays(
        scene.eye, scene.ortho, scene.meta.width, scene.meta.height
    )
    ref = nearest_hit(o, d, scene)

    mesh = make_mesh(dp=1, geom=8)
    specs = scene_partition_specs(scene, "geom")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("geom"), P("geom"), specs),
        out_specs=P("geom"),
        check_vma=False,
    )
    def go(o, d, sc):
        return nearest_hit(o, d, sc, geom_axis="geom", geom_axis_size=8)

    out = go(o, d, scene)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    np.testing.assert_array_equal(
        np.asarray(out.tri_idx)[np.asarray(ref.hit)],
        np.asarray(ref.tri_idx)[np.asarray(ref.hit)],
    )
    np.testing.assert_allclose(
        np.asarray(out.t), np.asarray(ref.t), rtol=1e-6, atol=1e-6
    )
