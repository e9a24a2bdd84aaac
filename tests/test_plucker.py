"""MXU Plücker in-triangle test (intersect_pallas.MT_IMPL = "plucker")
vs the classic Möller–Trumbore sweeps.

The Plücker formulation is NOT in the bit-exactness family: its side
tests round differently on boundary-grazing pairs, so agreement is
gated the way backend comparisons are — identical winners except a
tiny grazing class (verified via f64 barycentric margins), identical
occlusion up to the same class, and population-level radiance at the
render level. The knob defaults off; scripts/mxu_probe.py and the TPU
bench queue decide whether it ever flips.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracerpython_tpu.kernels import intersect_pallas as ip
from pathtracerpython_tpu.ops.camera import make_primary_rays
from pathtracerpython_tpu.ops.geometry import normalize3
from pathtracerpython_tpu.scene.arrays import pack_scene
from pathtracerpython_tpu.scene.synthetic import box_field_scene

from tests.test_sparse import _bary_margin_f64


@pytest.fixture(scope="module")
def field_scene():
    # > T_BLK triangles so the culled (multi-block) kernel variant runs
    return pack_scene(
        box_field_scene(n_boxes=80, width=24, height=24), morton_order=True
    )


@pytest.fixture()
def plucker(monkeypatch):
    monkeypatch.setattr(ip, "MT_IMPL", "plucker")


def _rays(scene, n=None, seed=0):
    if n is None:
        o, d = make_primary_rays(
            scene.eye, scene.ortho, scene.meta.width, scene.meta.height
        )
        return o.T, normalize3(d.T)
    rng = np.random.default_rng(seed)
    o = rng.uniform([-8, -1, -16], [8, 1.5, 3], (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o.T), normalize3(jnp.asarray(d.T))


def _assert_nearest_agrees(scene, o3, d3, max_frac=2e-3):
    t_c, i_c = map(np.asarray, ip.nearest_t_idx_cm(o3, d3, scene))
    old = ip.MT_IMPL
    try:
        ip.MT_IMPL = "plucker"
        t_p, i_p = map(np.asarray, ip.nearest_t_idx_cm(o3, d3, scene))
    finally:
        ip.MT_IMPL = old
    agree = i_c == i_p
    # same winner -> same t up to the two formulations' rounding
    np.testing.assert_allclose(
        t_p[agree], t_c[agree], rtol=2e-4, atol=2e-4
    )
    bad = np.nonzero(~agree)[0]
    assert len(bad) <= max(8, max_frac * len(i_c)), len(bad)
    o_np, d_np = np.asarray(o3), np.asarray(d3)
    for r in bad:
        margins = [
            abs(_bary_margin_f64(scene, o_np[:, r], d_np[:, r], i))
            for i in (i_c[r], i_p[r]) if i >= 0
        ]
        assert margins and min(margins) < 1e-4, (
            r, i_c[r], i_p[r], margins
        )


def test_nearest_cornell_primary(cornell_scene):
    o3, d3 = _rays(cornell_scene)
    _assert_nearest_agrees(cornell_scene, o3, d3)


def test_nearest_field_primary_multiblock(field_scene):
    o3, d3 = _rays(field_scene)
    _assert_nearest_agrees(field_scene, o3, d3)


def test_nearest_field_incoherent(field_scene):
    o3, d3 = _rays(field_scene, n=700, seed=11)
    _assert_nearest_agrees(field_scene, o3, d3)


def test_any_hit_agrees(field_scene):
    o3, d3 = _rays(field_scene, n=1024, seed=5)
    maxd = jnp.full((o3.shape[1],), 50.0)
    occ_c = np.asarray(ip.any_hit_pallas_cm(o3, d3, maxd, field_scene))
    old = ip.MT_IMPL
    try:
        ip.MT_IMPL = "plucker"
        occ_p = np.asarray(ip.any_hit_pallas_cm(o3, d3, maxd, field_scene))
    finally:
        ip.MT_IMPL = old
    # occlusion flips only on the grazing class — bound the population
    assert (occ_c != occ_p).mean() < 2e-3


def test_render_plucker_population(cornell_scene, plucker):
    """Full fast-mode render with the Plücker sweeps: per-pixel radiance
    within MC-noise of the classic path (identical estimator, identical
    RNG; only grazing winners differ)."""
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render

    cfg = RenderConfig(mode="fast", backend="pallas", n_samples=2,
                       n_bounces=2)
    a = np.asarray(render(cornell_scene, cfg, seed=3))
    ip_old = ip.MT_IMPL
    ip.MT_IMPL = "classic"
    try:
        b = np.asarray(render(cornell_scene, cfg, seed=3))
    finally:
        ip.MT_IMPL = ip_old
    assert np.mean(np.abs(a - b)) < 1e-3
    assert np.quantile(np.abs(a - b), 0.999) < 0.05


def test_plucker_gradients_flow(cornell_scene, plucker):
    """The custom VJP re-solves classic MT on the winner, so vertex
    gradients flow (and match the classic forward's) under plucker."""
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render

    cfg = RenderConfig(mode="fast", backend="pallas", n_samples=1,
                       n_bounces=1)

    def loss(v0):
        sc = dataclasses.replace(cornell_scene, tri_v0=v0)
        return jnp.sum(render(sc, cfg, seed=0))

    g = jax.grad(loss)(cornell_scene.tri_v0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0.0


def test_sparse_plucker_matches_dense_plucker(field_scene, plucker):
    """The sparse grouped Plücker sweeps (sparse_pallas follows the
    MT_IMPL knob through the grouped machinery) vs the dense plucker
    kernel: same formulation, so the work-list/early-termination
    machinery must not change a single bit."""
    from pathtracerpython_tpu.kernels import sparse_pallas as sp

    o3, d3 = _rays(field_scene, n=1500, seed=7)
    t_d, i_d = map(np.asarray, ip.nearest_t_idx_cm(o3, d3, field_scene))
    for g in (1, 2, 3):
        t_s, i_s = map(np.asarray, sp.sparse_nearest_t_idx_cm(
            o3, d3, field_scene, group=g
        ))
        np.testing.assert_array_equal(i_d, i_s)
        np.testing.assert_array_equal(t_d, t_s)


def test_sparse_plucker_any_hit(field_scene, plucker):
    from pathtracerpython_tpu.kernels import sparse_pallas as sp

    o3, d3 = _rays(field_scene, n=1024, seed=5)
    maxd = jnp.full((o3.shape[1],), 6.0, jnp.float32)
    occ_d = np.asarray(ip.any_hit_pallas_cm(o3, d3, maxd, field_scene))
    occ_s = np.asarray(sp.sparse_any_hit_cm(o3, d3, maxd, field_scene))
    np.testing.assert_array_equal(occ_d, occ_s)
    assert occ_d.any()
