"""In-kernel candidate-walker sweeps (kernels/walker_pallas.py) vs the
dense kernels — bit-exactness gates for the round-3 experiment.

The walker is a MEASURED NEGATIVE as a production default on the v5e
(docs/PERFORMANCE.md round-3 roofline section: 318 ms vs the sparse
kernel's 275 ms per 524k-ray nearest sweep at its best shape, 20x worse
at small tiles — the in-kernel DMA loop pays ~5-20 µs per candidate
visit that Mosaic's grid pipeline does for ~1 µs). It stays in-tree as
the direct test of the 'per-block cursor' hypothesis, bit-gated so it
keeps working if revisited.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from pathtracerpython_tpu.kernels import intersect_pallas as ip
from pathtracerpython_tpu.kernels import walker_pallas as wk
from pathtracerpython_tpu.ops.geometry import normalize3
from pathtracerpython_tpu.scene.arrays import pack_scene
from pathtracerpython_tpu.scene.synthetic import box_field_scene


@pytest.fixture(scope="module")
def field_scene():
    return pack_scene(
        box_field_scene(n_boxes=80, width=24, height=24), morton_order=True
    )


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform([-8, -1, -16], [8, 1.5, 3], (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o.T), normalize3(jnp.asarray(d.T))


def test_walker_nearest_bitmatch(field_scene):
    o3, d3 = _rays(1024, seed=0)
    t_d, i_d = map(np.asarray, ip.nearest_t_idx_cm(o3, d3, field_scene))
    t_w, i_w = map(np.asarray, wk.walker_nearest_t_idx_cm(
        o3, d3, field_scene
    ))
    np.testing.assert_array_equal(i_d, i_w)
    np.testing.assert_array_equal(t_d, t_w)


def test_walker_any_hit_bitmatch(field_scene):
    o3, d3 = _rays(1024, seed=3)
    maxd = jnp.full((1024,), 6.0, jnp.float32)
    occ_d = np.asarray(ip.any_hit_pallas_cm(o3, d3, maxd, field_scene))
    occ_w = np.asarray(wk.walker_any_hit_cm(o3, d3, maxd, field_scene))
    np.testing.assert_array_equal(occ_d, occ_w)
    assert occ_d.any()


def test_walker_gradients_flow(field_scene):
    import dataclasses

    o3, d3 = _rays(512, seed=5)

    def loss(v0):
        sc = dataclasses.replace(field_scene, tri_v0=v0)
        t, idx = wk.walker_nearest_t_idx_cm(o3, d3, sc)
        return jnp.sum(jnp.where(idx >= 0, t, 0.0))

    g = jax.grad(loss)(field_scene.tri_v0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0.0


def test_walker_overflow_falls_back(field_scene):
    """A starved flat list must fall back to the exact XLA sweep."""
    o3, d3 = _rays(600, seed=7)
    t_d, i_d = map(np.asarray, ip.nearest_t_idx_cm(o3, d3, field_scene))
    t_w, i_w = map(np.asarray, wk.walker_nearest_t_idx_cm(
        o3, d3, field_scene, w_per_rb=2
    ))
    np.testing.assert_array_equal(i_d, i_w)


def test_word_packing_roundtrip():
    e = jnp.asarray([0.0, 1e-3, 0.5, 7.25, 3.0e38], jnp.float32)
    ids = jnp.asarray([0, 5, 4095, 17, 100], jnp.int32)
    w = wk._pack_words(e, ids)
    assert (np.asarray(w & 0xFFF) == np.asarray(ids)).all()
    back = np.asarray(wk._unpack_entry(w))
    e_np = np.asarray(e)
    assert (back <= e_np + 1e-30).all()          # lower bound
    assert (back >= e_np * (1.0 - 2e-3)).all()   # tight to ~2^-10


def test_walker_render_parity_through_public_api(field_scene):
    """accel="walker" reachable from RenderConfig (VERDICT r4 task 6):
    the full render through the public API must match the dense sweep to
    the grazing-pair tolerance, with the sorted+parked NEE machinery
    engaged (use_sparse gates sorting for walker too) AND with it off."""
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render

    base = RenderConfig(
        mode="fast", n_samples=1, n_bounces=2, backend="pallas",
        accel="none",
    )
    r0 = np.asarray(render(field_scene, base, seed=5))
    for accel, extra in (
        ("walker", {}),                           # sorted+parked (auto)
        ("walker", {"sort_nee": "off", "sort_rays": "off"}),  # unsorted
        ("hybrid", {}),                           # grid nearest + walker NEE
    ):
        cfg = RenderConfig(
            mode="fast", n_samples=1, n_bounces=2, backend="pallas",
            accel=accel, **extra,
        )
        r = np.asarray(render(field_scene, cfg, seed=5))
        np.testing.assert_allclose(r, r0, atol=1e-6)


def test_auto_resolves_to_hybrid_for_large_scenes():
    """Round-5 default flip: accel="auto" selects the HYBRID (grid
    nearest + walker NEE any-hit) at and above SPARSE_MIN_TRIS padded
    triangles — each sweep on its chip-measured better hierarchy
    (BENCHLOG_r5 r5_hybrid: 719.7 ms vs walker-both 744.5 vs
    sparse-both 789.0 on the 100k config) — and dense below."""
    from pathtracerpython_tpu.kernels.sparse_pallas import (
        SPARSE_MIN_TRIS,
        resolve_accel,
        use_sparse,
    )

    assert resolve_accel("auto", SPARSE_MIN_TRIS) == "hybrid"
    assert resolve_accel("auto", SPARSE_MIN_TRIS - 1) == "none"
    assert resolve_accel("sparse", 32) == "sparse"
    assert resolve_accel("walker", 32) == "walker"
    # the coherence machinery (sorting, parking) engages for all three
    assert use_sparse("auto", SPARSE_MIN_TRIS)
    assert use_sparse("walker", SPARSE_MIN_TRIS)
    assert use_sparse("hybrid", SPARSE_MIN_TRIS)
    assert not use_sparse("auto", 32)
