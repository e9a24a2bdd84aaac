"""Occluder-cluster-cached NEE any-hit (VERDICT r3 task 1) — exactness
gates.

``sparse_any_hit_cached_cm`` must return EXACTLY ``sparse_any_hit_cm``'s
occlusion verdicts for ANY cache contents: pass-1 occlusions are real
triangle hits (a subset of the full sweep's tests), and every unresolved
lane re-sweeps its full candidate list in pass 2. These gates feed it a
cold cache, the correct cache, a garbage cache, and an out-of-range
cache; the render-level gate checks the integrator's cache threading
leaves radiance bit-identical.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pathtracerpython_tpu.kernels import sparse_pallas as sp
from pathtracerpython_tpu.ops.geometry import normalize3
from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.render.integrator import render
from pathtracerpython_tpu.scene.arrays import pack_scene
from pathtracerpython_tpu.scene.synthetic import box_field_scene


@pytest.fixture(scope="module")
def field_scene():
    return pack_scene(
        box_field_scene(n_boxes=80, width=24, height=24), morton_order=True
    )


def _shadow_rays(scene, n, seed=0):
    """Random shadow-like rays toward the light region (mostly occluded
    in the box field — the statistics the cache is built for)."""
    rng = np.random.default_rng(seed)
    o = rng.uniform([-8, -0.5, -14], [8, 0.5, 2], (n, 3)).astype(np.float32)
    target = rng.uniform([-2, 6, -8], [2, 8, -2], (n, 3)).astype(np.float32)
    v = target - o
    dist = np.linalg.norm(v, axis=1).astype(np.float32)
    d = v / dist[:, None]
    return (jnp.asarray(o.T), jnp.asarray(d.T),
            jnp.asarray(dist * 0.95))


def _caches(scene, o3, d3, maxd, n):
    """(name, guess) cases: cold, correct, garbage, out-of-range."""
    occ_ref = sp.sparse_any_hit_cm(o3, d3, maxd, scene)
    # the correct cache: run the cached entry cold once and use its
    # reported blockers as the next call's guesses
    _, cl_true = sp.sparse_any_hit_cached_cm(
        o3, d3, maxd, scene, jnp.full((n,), -1, jnp.int32)
    )
    rng = np.random.default_rng(7)
    n_clusters = sp._pack_for_sparse(scene, sp.C_TRI).shape[0] // sp.C_TRI
    return occ_ref, [
        ("cold", jnp.full((n,), -1, jnp.int32)),
        ("correct", cl_true),
        ("garbage", jnp.asarray(
            rng.integers(0, n_clusters, n), jnp.int32)),
        ("out_of_range", jnp.asarray(
            rng.integers(-3, 3 * n_clusters, n), jnp.int32)),
    ]


def test_cached_any_hit_exact_for_any_cache(field_scene):
    n = 1536
    o3, d3, maxd = _shadow_rays(field_scene, n)
    occ_ref, cases = _caches(field_scene, o3, d3, maxd, n)
    occ_ref = np.asarray(occ_ref)
    for name, guess in cases:
        occ, cl = sp.sparse_any_hit_cached_cm(
            o3, d3, maxd, field_scene, guess
        )
        np.testing.assert_array_equal(
            np.asarray(occ), occ_ref, err_msg=f"cache={name}"
        )
        cl = np.asarray(cl)
        # every reported blocker names a real cluster, only on occluded
        # lanes (-1 on unoccluded ones)
        assert ((cl >= 0) <= occ_ref).all(), name
        assert (cl[~occ_ref] == -1).all(), name


def test_reported_blockers_actually_block(field_scene):
    """Each lane's reported cluster must CONTAIN a blocking triangle for
    that lane — verified against a brute-force per-cluster test."""
    n = 512
    o3, d3, maxd = _shadow_rays(field_scene, n, seed=3)
    occ, cl = sp.sparse_any_hit_cached_cm(
        o3, d3, maxd, field_scene, jnp.full((n,), -1, jnp.int32)
    )
    occ, cl = np.asarray(occ), np.asarray(cl)
    tripack = np.asarray(sp._pack_for_sparse(field_scene, sp.C_TRI))
    from pathtracerpython_tpu.ops.geometry import intersect_moller

    o = np.asarray(o3).T
    d = np.asarray(d3).T
    md = np.asarray(maxd)
    idxs = np.nonzero(cl >= 0)[0][:64]
    for i in idxs:
        rows = tripack[cl[i] * sp.C_TRI:(cl[i] + 1) * sp.C_TRI]
        hit, t = intersect_moller(
            jnp.asarray(o[i])[None, :], jnp.asarray(d[i])[None, :],
            jnp.asarray(rows[:, 0:3]), jnp.asarray(rows[:, 3:6]),
            jnp.asarray(rows[:, 6:9]),
        )
        blocking = (
            np.asarray(hit) & (rows[:, 10] > 0.5)
            & (np.asarray(t) < md[i] - 1e-4)
        )
        assert blocking.any(), (i, cl[i])


def _occluded_rays(scene, n, seed=0):
    """Rays aimed straight through occluder triangles (centroid at
    t=0.5 < maxd), picked in morton (buffer) order so ray blocks stay
    cluster-coherent — the statistics the production path's wavefront
    sorting provides."""
    rng = np.random.default_rng(seed)
    occ_rows = np.nonzero(
        np.asarray(scene.tri_occluder & scene.tri_valid)
    )[0]
    rows = np.sort(rng.choice(occ_rows, n, replace=True))
    c = (
        np.asarray(scene.tri_v0)[rows]
        + np.asarray(scene.tri_v1)[rows]
        + np.asarray(scene.tri_v2)[rows]
    ) / 3.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = c.astype(np.float32) - 0.5 * d
    return (jnp.asarray(o.T), jnp.asarray(d.T),
            jnp.full((n,), 1.0, jnp.float32))


def test_cached_hit_rate_is_high_on_repeat(field_scene):
    """The statistical premise: re-querying the same rays with the cache
    they produced must resolve (almost) everything in pass 1 — i.e. the
    pass-2 survivor count collapses to ~the unoccluded population."""
    n = 1536
    o3, d3, maxd = _occluded_rays(field_scene, n, seed=5)
    cold = jnp.full((n,), -1, jnp.int32)
    occ, cl = sp.sparse_any_hit_cached_cm(o3, d3, maxd, field_scene, cold)
    # pass-1-only probe: run the guess sweep alone via the chunk helper
    tripack = sp._pack_for_sparse(field_scene, sp.C_TRI)
    statics = (sp.C_TRI, sp.R_BLK, sp.MAXC, sp.W_PER_RB, sp.GROUP)
    o3p = sp._pad_repeat_last(o3, sp.R_BLK)
    d3p = sp._pad_repeat_last(d3, sp.R_BLK)
    mdp = sp._pad_repeat_last(maxd[None, :], sp.R_BLK)[0]
    clp = sp._pad_repeat_last(cl[None, :], sp.R_BLK)[0]
    occ1, _ = sp._any_hit_idx_chunk(o3p, d3p, mdp, clp, tripack, statics)
    occ1 = np.asarray(occ1)[:n]
    occ = np.asarray(occ)
    assert occ.mean() > 0.95  # the scenario is fully occluded by design
    hit_rate = occ1[occ].mean()  # pass-1 resolution among occluded lanes
    assert hit_rate > 0.95, hit_rate


def test_render_with_cache_is_bit_identical(field_scene):
    """Integrator-level gate: nee_cache on vs off — same radiance bits
    (occlusion verdicts are exact, so the estimator cannot move)."""
    cfg_off = RenderConfig(
        mode="fast", n_samples=1, n_bounces=2, backend="pallas",
        accel="sparse", nee_cache="off",
    )
    cfg_on = dataclasses.replace(cfg_off, nee_cache="on")
    a = np.asarray(render(field_scene, cfg_off, seed=2))
    b = np.asarray(render(field_scene, cfg_on, seed=2))
    np.testing.assert_array_equal(a, b)
    # shadow-lane re-sorting (sort_nee) is a pure permutation — also bits
    c = np.asarray(render(
        field_scene, dataclasses.replace(cfg_on, sort_nee="on"), seed=2
    ))
    np.testing.assert_array_equal(a, c)
