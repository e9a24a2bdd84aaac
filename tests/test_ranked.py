"""Ranked-round traversal (kernels/ranked_pallas.py) vs the dense sweeps.

Same exactness contract as the cluster-sparse path: bit-identical hits,
distances, and occlusion for every configuration — rounds, kmax
overflow, and residue fallback are implementation detail, never
estimator-visible.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracerpython_tpu.kernels import ranked_pallas as rk
from pathtracerpython_tpu.kernels.intersect_pallas import (
    any_hit_pallas_cm,
    nearest_t_idx_cm,
)
from pathtracerpython_tpu.ops.camera import make_primary_rays
from pathtracerpython_tpu.ops.geometry import normalize3
from pathtracerpython_tpu.scene.arrays import pack_scene
from pathtracerpython_tpu.scene.synthetic import box_field_scene


@pytest.fixture(scope="module")
def field_scene():
    return pack_scene(
        box_field_scene(n_boxes=80, width=24, height=24), morton_order=True
    )


def _primary(scene):
    o, d = make_primary_rays(
        scene.eye, scene.ortho, scene.meta.width, scene.meta.height
    )
    return o.T, normalize3(d.T)


def _random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform([-8, -1, -16], [8, 1.5, 3], (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o.T), normalize3(jnp.asarray(d.T))


def assert_matches(scene, o3, d3, **kw):
    t_d, i_d = nearest_t_idx_cm(o3, d3, scene)
    t_r, i_r = rk.ranked_nearest_t_idx_cm(o3, d3, scene, **kw)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_r))
    np.testing.assert_array_equal(np.asarray(t_d), np.asarray(t_r))


def test_nearest_primary_bitmatch(field_scene):
    o3, d3 = _primary(field_scene)
    assert_matches(field_scene, o3, d3)


def test_nearest_incoherent_bitmatch(field_scene):
    o3, d3 = _random_rays(700, seed=11)
    assert_matches(field_scene, o3, d3)


def test_nearest_kmax_overflow_residue(field_scene):
    """kmax=2 starves nearly every ray's candidate list -> the residue
    fallback must resolve them exactly."""
    o3, d3 = _random_rays(700, seed=13)
    assert_matches(field_scene, o3, d3, kmax=2, rounds=2)


def test_nearest_zero_rounds_pure_residue(field_scene):
    o3, d3 = _random_rays(300, seed=15)
    assert_matches(field_scene, o3, d3, rounds=0)


def test_any_hit_bitmatch(field_scene):
    o3, d3 = _random_rays(700, seed=17)
    maxd = jnp.full((o3.shape[1],), 6.0, jnp.float32)
    occ_d = any_hit_pallas_cm(o3, d3, maxd, field_scene)
    occ_r = rk.ranked_any_hit_cm(o3, d3, maxd, field_scene)
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_r))
    assert np.asarray(occ_d).any()


def test_any_hit_starved_kmax(field_scene):
    o3, d3 = _random_rays(700, seed=19)
    maxd = jnp.full((o3.shape[1],), 6.0, jnp.float32)
    occ_d = any_hit_pallas_cm(o3, d3, maxd, field_scene)
    occ_r = rk.ranked_any_hit_cm(o3, d3, maxd, field_scene, kmax=2,
                                 rounds=1)
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_r))


def test_candidate_build_matches_bruteforce(field_scene):
    """Per-ray candidate lists: counts and front-to-back entry ordering
    agree with a direct slab test."""
    from pathtracerpython_tpu.kernels.sparse_pallas import (
        _candidate_enter_hit,
        _pack_for_sparse,
        cluster_aabbs,
    )

    o3, d3 = _random_rays(256, seed=21)
    tp = _pack_for_sparse(field_scene, 128)
    aabb8 = cluster_aabbs(tp, 128)
    n = o3.shape[1]
    tmax = jnp.full((n,), rk.BIG, jnp.float32)
    cand, entry, count, over = rk.per_ray_candidates(o3, d3, tmax, aabb8)
    ent_ref, hit_ref = _candidate_enter_hit(aabb8, o3, d3, tmax, 1)
    np.testing.assert_array_equal(
        np.asarray(count),
        np.minimum(np.asarray(hit_ref.sum(axis=1)), rk.KMAX),
    )
    e = np.asarray(entry)
    c = np.asarray(count)
    for i in range(0, n, 37):
        k = int(c[i])
        assert (np.diff(e[i, :k]) >= 0).all()  # front-to-back


def test_render_ranked_matches_dense(field_scene):
    import dataclasses

    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render

    cfg_r = RenderConfig(mode="fast", backend="pallas", n_samples=1,
                         n_bounces=2, accel="ranked")
    cfg_d = dataclasses.replace(cfg_r, accel="none")
    a = np.asarray(render(field_scene, cfg_r, seed=3))
    b = np.asarray(render(field_scene, cfg_d, seed=3))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_ranked_traces_past_one_chunk_nonaligned(field_scene):
    """70000 rays: the r_blk-padded wavefront (70144) exceeds one
    CHUNK_RB*R_BLK sparse chunk (65536) and is not a multiple of it, so
    the residue fallback's whole-wavefront branch receives a sparse
    result padded LONGER than the wavefront and must slice it back.
    Regression: this crashed at trace time with an incompatible-shapes
    broadcast (both lax.cond branches are always traced)."""
    import jax

    n = 70000
    spec = jax.ShapeDtypeStruct((3, n), jnp.float32)
    t, idx = jax.eval_shape(
        lambda o, d: rk.ranked_nearest_t_idx_cm(o, d, field_scene),
        spec, spec,
    )
    assert t.shape == idx.shape == (n,)
    occ = jax.eval_shape(
        lambda o, d, m: rk.ranked_any_hit_cm(o, d, m, field_scene),
        spec, spec, jax.ShapeDtypeStruct((n,), jnp.float32),
    )
    assert occ.shape == (n,)


def test_render_ranked_nee_matches_dense(field_scene):
    """Mixed dispatch: sparse nearest + ranked NEE occlusion (the
    combination the CPU round studies predict — occlusion finality
    terminates; the nearest hit stays on the sparse sweeps)."""
    import dataclasses

    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render

    cfg_m = RenderConfig(mode="fast", backend="pallas", n_samples=1,
                         n_bounces=2, accel="ranked-nee")
    cfg_d = dataclasses.replace(cfg_m, accel="none", sort_rays="off")
    a = np.asarray(render(field_scene, cfg_m, seed=3))
    b = np.asarray(render(field_scene, cfg_d, seed=3))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_ranked_gradients_flow(field_scene):
    """jax.grad through the ranked path: the custom VJP re-solves the
    winner triangle, so vertex gradients must match the dense pallas
    path's."""
    import dataclasses

    import jax

    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render

    cfg_r = RenderConfig(mode="fast", backend="pallas", n_samples=1,
                         n_bounces=1, accel="ranked")
    cfg_d = dataclasses.replace(cfg_r, accel="none")

    def loss(v0, cfg):
        import dataclasses as dc

        return jnp.sum(render(
            dc.replace(field_scene, tri_v0=v0), cfg, seed=2
        ))

    g_r = np.asarray(jax.grad(loss)(field_scene.tri_v0, cfg_r))
    g_d = np.asarray(jax.grad(loss)(field_scene.tri_v0, cfg_d))
    assert np.abs(g_r).max() > 0
    np.testing.assert_allclose(g_r, g_d, rtol=1e-4, atol=1e-6)
