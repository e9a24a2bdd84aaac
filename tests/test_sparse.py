"""Cluster-sparse sweep (kernels/sparse_pallas.py) vs the dense kernels.

The sparse hierarchy must be an exact, bit-identical replacement for the
dense megakernel sweeps — same Möller–Trumbore math, same lexicographic
(t, index) winner (= the reference's first-minimum tie-break,
``/root/reference/main.py:115``). These tests run the pallas interpret
path on CPU; the same code compiles to Mosaic on TPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from pathtracerpython_tpu.kernels.intersect_pallas import (
    any_hit_pallas_cm,
    nearest_t_idx_cm,
)
from pathtracerpython_tpu.kernels import sparse_pallas as sp
from pathtracerpython_tpu.ops.camera import make_primary_rays
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


def _primary(scene):
    o, d = make_primary_rays(
        scene.eye, scene.ortho, scene.meta.width, scene.meta.height
    )
    return o.T, normalize3(d.T)


def _random_rays(n, seed=0):
    """Incoherent rays inside the box-field volume — the hard case for
    block-level culling (loose unions, scattered candidates)."""
    rng = np.random.default_rng(seed)
    o = rng.uniform([-8, -1, -16], [8, 1.5, 3], (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o.T), normalize3(jnp.asarray(d.T))


def assert_nearest_matches(scene, o3, d3, **kw):
    t_d, i_d = nearest_t_idx_cm(o3, d3, scene)
    t_s, i_s = sp.sparse_nearest_t_idx_cm(o3, d3, scene, **kw)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_s))
    np.testing.assert_array_equal(np.asarray(t_d), np.asarray(t_s))


def test_nearest_primary_bitmatch(field_scene):
    o3, d3 = _primary(field_scene)
    assert_nearest_matches(field_scene, o3, d3)


def test_nearest_incoherent_bitmatch(field_scene):
    o3, d3 = _random_rays(700)
    assert_nearest_matches(field_scene, o3, d3)


def test_any_hit_bitmatch(field_scene):
    o3, d3 = _random_rays(700, seed=3)
    maxd = jnp.full((o3.shape[1],), 6.0, jnp.float32)
    occ_d = any_hit_pallas_cm(o3, d3, maxd, field_scene)
    occ_s = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene)
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_s))
    assert np.asarray(occ_d).any()  # non-trivial scene


def test_overflow_falls_back_dense(field_scene):
    """A starved work list must trigger the dense fallback, not drop
    candidates."""
    o3, d3 = _random_rays(600, seed=5)
    assert_nearest_matches(field_scene, o3, d3, maxc=4, w_per_rb=2)


def test_zero_candidate_blocks(field_scene):
    """Rays pointing away from all geometry: never-visited output blocks
    must still report clean misses."""
    n = 600
    o3 = jnp.broadcast_to(
        jnp.asarray([0.0, 50.0, 0.0], jnp.float32)[:, None], (3, n)
    )
    d3 = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32)[:, None], (3, n)
    )
    t, idx = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene)
    assert (np.asarray(idx) == -1).all()
    assert (np.asarray(t) == 0.0).all()
    maxd = jnp.full((n,), 100.0, jnp.float32)
    occ = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene)
    assert not np.asarray(occ).any()


def _bary_margin_f64(scene, o, d, tri_idx):
    """min(u, v, 1-u-v) of ray (o, d) against triangle ``tri_idx``,
    computed in float64 — how far inside the triangle the hit is."""
    v0 = np.asarray(scene.tri_v0, np.float64)[tri_idx]
    v1 = np.asarray(scene.tri_v1, np.float64)[tri_idx]
    v2 = np.asarray(scene.tri_v2, np.float64)[tri_idx]
    o = o.astype(np.float64)
    d = d.astype(np.float64)
    e1, e2 = v1 - v0, v2 - v0
    pv = np.cross(d, e2)
    det = np.dot(e1, pv)
    if abs(det) < 1e-300:
        return 0.0
    tv = o - v0
    u = np.dot(tv, pv) / det
    qv = np.cross(tv, e1)
    v = np.dot(d, qv) / det
    return min(u, v, 1.0 - u - v)


def test_shared_edge_tie_break(field_scene):
    """Rays through shared triangle edges/vertices produce equal-t ties.

    Exact-equal lanes must resolve ties identically (smallest global
    index — the dense / reference first-minimum rule). Lanes where the
    kernels DISAGREE are tolerated only if each one is provably
    boundary-grazing: the winning triangle's barycentric margin
    min(u, v, 1-u-v) is within fp noise of an edge, where the compiled
    fma contraction of differently-shaped kernels legitimately flips
    ``u >= 0``-class predicates by one ulp (same measure-zero class
    test_pallas.py tolerates between the pallas and XLA backends)."""
    # aim rays exactly at box-corner vertices: guaranteed multi-triangle
    # equal-t intersections and u/v == 0 boundary hits
    v = np.asarray(field_scene.tri_v0)[:512]
    o = np.asarray([0.0, 0.0, 3.0], np.float32)
    d3 = normalize3(jnp.asarray((v - o).T.astype(np.float32)))
    o3 = jnp.broadcast_to(jnp.asarray(o)[:, None], d3.shape)

    t_d, i_d = map(np.asarray, nearest_t_idx_cm(o3, d3, field_scene))
    t_s, i_s = map(np.asarray, sp.sparse_nearest_t_idx_cm(
        o3, d3, field_scene
    ))
    o_np, d_np = np.asarray(o3), np.asarray(d3)

    # disagreements: each must be an edge-grazing hit (f64 margin ~ 0) —
    # equal-t-different-index lanes included, because a boundary flip
    # changes the tie SET itself (one kernel sees the corner-sharing
    # triangle, the other rejects it by one ulp)
    bad = np.nonzero(i_d != i_s)[0]
    assert len(bad) < 0.1 * len(i_d), f"{len(bad)} mismatches"
    for r in bad:
        margins = [
            abs(_bary_margin_f64(field_scene, o_np[:, r], d_np[:, r], i))
            for i in (i_d[r], i_s[r]) if i >= 0
        ]
        assert margins and min(margins) < 1e-5, (
            r, i_d[r], i_s[r], margins
        )


def test_duplicate_triangle_tie_break(field_scene):
    """The tie-break RULE, tested without boundary ambiguity: duplicate
    an interior triangle at a higher buffer index, aim rays at its
    CENTER (hits land strictly inside both copies, bit-identical t), and
    require the winner to be the LOWER index in both kernels — the
    reference's first-minimum rule (``/root/reference/main.py:115``)."""
    src = 37
    dst = field_scene.tri_v0.shape[0] - 5  # same buffer, far cluster
    rep = {}
    for f in ("tri_v0", "tri_v1", "tri_v2", "tri_normal"):
        buf = np.asarray(getattr(field_scene, f)).copy()
        buf[dst] = buf[src]
        rep[f] = jnp.asarray(buf)
    for f, fill in (("tri_valid", True), ("tri_occluder", True)):
        buf = np.asarray(getattr(field_scene, f)).copy()
        buf[dst] = fill
        rep[f] = jnp.asarray(buf)
    scene = dataclasses.replace(field_scene, **rep)

    center = (
        np.asarray(scene.tri_v0)[src]
        + np.asarray(scene.tri_v1)[src]
        + np.asarray(scene.tri_v2)[src]
    ) / 3.0
    n = 512
    rng = np.random.default_rng(11)
    o = (center + np.asarray([0.0, 0.0, 2.5])
         + rng.normal(scale=1e-3, size=(n, 3))).astype(np.float32)
    d3 = normalize3(jnp.asarray((center[None] - o).T.astype(np.float32)))
    o3 = jnp.asarray(o.T)

    t_d, i_d = map(np.asarray, nearest_t_idx_cm(o3, d3, scene))
    t_s, i_s = map(np.asarray, sp.sparse_nearest_t_idx_cm(o3, d3, scene))
    hits = (i_d >= 0) & np.isin(i_d, [src, dst])
    assert hits.sum() > n // 4  # the aimed triangle is hit often enough
    # both kernels: the duplicate never wins over the original
    assert not np.isin(i_d[hits], [dst]).any()
    assert not np.isin(i_s[hits], [dst]).any()
    np.testing.assert_array_equal(i_d[hits], i_s[hits])


def test_gradients_bitmatch(field_scene):
    o3, d3 = _primary(field_scene)

    def loss_dense(v0):
        s = dataclasses.replace(field_scene, tri_v0=v0)
        return jnp.sum(nearest_t_idx_cm(o3, d3, s)[0])

    def loss_sparse(v0):
        s = dataclasses.replace(field_scene, tri_v0=v0)
        return jnp.sum(sp.sparse_nearest_t_idx_cm(o3, d3, s)[0])

    gd = jax.grad(loss_dense)(field_scene.tri_v0)
    gs = jax.grad(loss_sparse)(field_scene.tri_v0)
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(gs))


def test_render_accel_equivalence(field_scene):
    """Full integrator render: accel='sparse' vs accel='none'.

    The intersection sweeps bit-match (tests above); the only remaining
    difference is that sparse mode routes NEE through the sparse any-hit
    instead of the fused NEE megakernel, whose cosine mean differs from
    the unfused path by 1 ULP on some pixels — so the image gate is
    1-ULP-tolerance, not bitwise.
    """
    base = dict(
        mode="fast", backend="pallas", n_samples=1, n_bounces=2,
        batch_samples=True,
    )
    r_none = np.asarray(
        render(field_scene, RenderConfig(accel="none", **base), seed=7)
    )
    r_sparse = np.asarray(
        render(field_scene, RenderConfig(accel="sparse", **base), seed=7)
    )
    np.testing.assert_allclose(r_none, r_sparse, atol=2e-7, rtol=0)


def test_render_sorted_bitmatch(field_scene):
    """Wavefront sorting is a pure lane permutation: sorted and unsorted
    sparse renders must be BIT-identical (both sample layouts)."""
    for batch in (True, False):
        base = dict(
            mode="fast", backend="pallas", accel="sparse", n_samples=2,
            n_bounces=3, batch_samples=batch,
        )
        r_off = render(
            field_scene, RenderConfig(sort_rays="off", **base), seed=11
        )
        r_on = render(
            field_scene, RenderConfig(sort_rays="on", **base), seed=11
        )
        np.testing.assert_array_equal(np.asarray(r_off), np.asarray(r_on))


def test_sort_order_is_permutation():
    from pathtracerpython_tpu.ops.sort import wavefront_sort_order

    rng = np.random.default_rng(0)
    n = 1000
    o3 = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    d3 = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    alive = jnp.asarray(rng.uniform(size=n) < 0.7)
    lo = jnp.asarray([-3.0, -3.0, -3.0], jnp.float32)
    hi = jnp.asarray([3.0, 3.0, 3.0], jnp.float32)
    order = np.asarray(wavefront_sort_order(o3, d3, alive, lo, hi))
    assert sorted(order.tolist()) == list(range(n))
    # dead lanes sort after every live lane
    alive_np = np.asarray(alive)
    n_live = int(alive_np.sum())
    assert alive_np[order[:n_live]].all()
    assert not alive_np[order[n_live:]].any()


def test_chunked_wavefront_bitmatch(field_scene):
    """Wavefronts wider than chunk_rb * r_blk split into multiple sparse
    launches (the SMEM work-list budget, sparse_pallas.CHUNK_RB); results
    and gradients must bit-match the dense sweep regardless of how many
    chunks the wavefront spans."""
    o3, d3 = _random_rays(700, seed=8)
    kw = dict(r_blk=256, chunk_rb=1)  # 700 rays -> 3 chunks
    assert_nearest_matches(field_scene, o3, d3, **kw)
    maxd = jnp.full((o3.shape[1],), 8.0, jnp.float32)
    occ_d = any_hit_pallas_cm(o3, d3, maxd, field_scene)
    occ_s = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene, **kw)
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_s))

    def loss_sparse(v0):
        s = dataclasses.replace(field_scene, tri_v0=v0)
        return jnp.sum(sp.sparse_nearest_t_idx_cm(o3, d3, s, **kw)[0])

    def loss_dense(v0):
        s = dataclasses.replace(field_scene, tri_v0=v0)
        return jnp.sum(nearest_t_idx_cm(o3, d3, s)[0])

    gs = jax.grad(loss_sparse)(field_scene.tri_v0)
    gd = jax.grad(loss_dense)(field_scene.tri_v0)
    np.testing.assert_array_equal(np.asarray(gd), np.asarray(gs))


def test_two_pass_bitmatch(field_scene):
    """Two-pass (truncated pass 1 + compacted full pass 2) must equal
    the single-pass sweep exactly, for nearest AND any-hit, including
    gradients — survivor detection is conservative and pass 2 re-tests
    everything its lanes could need."""
    o3, d3 = _random_rays(700, seed=21)
    t_1, i_1 = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene, two_pass=0)
    t_2, i_2 = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene, two_pass=4)
    np.testing.assert_array_equal(np.asarray(i_1), np.asarray(i_2))
    np.testing.assert_array_equal(np.asarray(t_1), np.asarray(t_2))

    maxd = jnp.full((o3.shape[1],), 8.0, jnp.float32)
    o_1 = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene, two_pass=0)
    o_2 = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene, two_pass=4)
    np.testing.assert_array_equal(np.asarray(o_1), np.asarray(o_2))

    def loss(v0, k):
        s = dataclasses.replace(field_scene, tri_v0=v0)
        return jnp.sum(sp.sparse_nearest_t_idx_cm(o3, d3, s, two_pass=k)[0])

    g1 = jax.grad(loss)(field_scene.tri_v0, 0)
    g2 = jax.grad(loss)(field_scene.tri_v0, 4)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_two_pass_overflow_cap(field_scene):
    """When survivors exceed the pass-2 cap, the big branch re-sweeps
    the whole wavefront — results still exact."""
    o3, d3 = _random_rays(700, seed=22)
    # m_div so large the cap is one ray block -> cnt > m -> big branch
    t_1, i_1 = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene, two_pass=0)
    t_2, i_2 = sp.sparse_nearest_t_idx_cm(
        o3, d3, field_scene, two_pass=1, m_div=10**6
    )
    np.testing.assert_array_equal(np.asarray(i_1), np.asarray(i_2))
    np.testing.assert_array_equal(np.asarray(t_1), np.asarray(t_2))


def test_two_pass_chunked(field_scene):
    """Two-pass composes with launch chunking (wavefront > chunk)."""
    o3, d3 = _random_rays(700, seed=23)
    kw = dict(r_blk=256, chunk_rb=1)
    t_1, i_1 = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene,
                                          two_pass=0, **kw)
    t_2, i_2 = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene,
                                          two_pass=2, **kw)
    np.testing.assert_array_equal(np.asarray(i_1), np.asarray(i_2))
    maxd = jnp.full((o3.shape[1],), 8.0, jnp.float32)
    o_1 = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene, two_pass=0, **kw)
    o_2 = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene, two_pass=2, **kw)
    np.testing.assert_array_equal(np.asarray(o_1), np.asarray(o_2))


def test_grid_cascade_branches(field_scene, monkeypatch):
    """Both short-grid and full-grid cascade variants must produce the
    dense result; GRID_DIVS / GRID_CASCADE_MIN are forced so each
    lax.cond branch runs deterministically regardless of scene data."""
    o3, d3 = _random_rays(700, seed=31)
    t_ref, i_ref = nearest_t_idx_cm(o3, d3, field_scene)
    maxd = jnp.full((o3.shape[1],), 8.0, jnp.float32)
    occ_ref = any_hit_pallas_cm(o3, d3, maxd, field_scene)

    monkeypatch.setattr(sp, "GRID_CASCADE_MIN", 1)
    for divs in ((10**6,), (1,)):
        # (1e6,) -> cap = nrb (totals always exceed it: FULL grid)
        # (1,)   -> cap = w_cap (cascade statically disabled)
        monkeypatch.setattr(sp, "GRID_DIVS", divs)
        t_s, i_s = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene,
                                              two_pass=0)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_s))
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_s))
        occ_s = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene, two_pass=0)
        np.testing.assert_array_equal(np.asarray(occ_ref), np.asarray(occ_s))

    # multi-level with a huge per-block budget -> totals fit: SHORT grids
    monkeypatch.setattr(sp, "GRID_DIVS", (8, 2))
    t_s, i_s = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene,
                                          two_pass=0, w_per_rb=512)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_s))
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_s))


def test_median_order_bitmatch():
    """tri_order='median' (BVH-leaf clustering) must agree with the
    dense sweep on the same buffer, sparse vs dense, incl. any-hit."""
    scene = pack_scene(
        box_field_scene(n_boxes=80, width=24, height=24), tri_order="median"
    )
    o3, d3 = _random_rays(700, seed=41)
    assert_nearest_matches(scene, o3, d3)
    maxd = jnp.full((o3.shape[1],), 8.0, jnp.float32)
    occ_d = any_hit_pallas_cm(o3, d3, maxd, scene)
    occ_s = sp.sparse_any_hit_cm(o3, d3, maxd, scene)
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_s))


@pytest.mark.parametrize("group", [2, 4])
def test_grouped_items_bitmatch(field_scene, group):
    """G-cluster work items must reproduce the single-item sweep exactly
    (same candidates, same lexicographic merge), for both sweeps, on
    coherent and incoherent wavefronts."""
    for seed in (0, 3):
        o3, d3 = _random_rays(700, seed=seed)
        assert_nearest_matches(field_scene, o3, d3, two_pass=0, group=group)
        maxd = jnp.full((o3.shape[1],), 6.0, jnp.float32)
        occ_d = any_hit_pallas_cm(o3, d3, maxd, field_scene)
        occ_s = sp.sparse_any_hit_cm(
            o3, d3, maxd, field_scene, two_pass=0, group=group
        )
        np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_s))
    o3, d3 = _primary(field_scene)
    assert_nearest_matches(field_scene, o3, d3, two_pass=0, group=group)


def test_grouped_with_two_pass_any_hit(field_scene):
    """Two-pass compaction composes with grouping: the truncated pass 1
    stays single-item, pass 2 regroups; result unchanged."""
    o3, d3 = _random_rays(700, seed=9)
    maxd = jnp.full((o3.shape[1],), 6.0, jnp.float32)
    occ_d = any_hit_pallas_cm(o3, d3, maxd, field_scene)
    occ_s = sp.sparse_any_hit_cm(
        o3, d3, maxd, field_scene, two_pass=2, group=2
    )
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_s))


def test_grouped_starved_worklist_falls_back(field_scene):
    """Group-unit overflow must take the exact dense fallback."""
    o3, d3 = _random_rays(700, seed=5)
    t_d, i_d = nearest_t_idx_cm(o3, d3, field_scene)
    t_s, i_s = sp.sparse_nearest_t_idx_cm(
        o3, d3, field_scene, two_pass=0, group=2, w_per_rb=2
    )
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_s))
    np.testing.assert_array_equal(np.asarray(t_d), np.asarray(t_s))


def test_two_pass_lane_bound_variants(field_scene, monkeypatch):
    """Two-pass results are identical under the per-lane refined bound
    (LANE_M > 0) and the block-level bound (LANE_M = 0); the refined
    bound must finalize at least as many lanes (it is pointwise >= the
    block bound, so fewer survivors reach pass 2)."""
    o3, d3 = _random_rays(700, seed=17)
    t_ref, i_ref = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene,
                                              two_pass=0)
    for lane_m in (0, 8):
        monkeypatch.setattr(sp, "LANE_M", lane_m)
        t_2, i_2 = sp.sparse_nearest_t_idx_cm(o3, d3, field_scene,
                                              two_pass=4)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_2))
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_2))
        maxd = jnp.full((o3.shape[1],), 6.0, jnp.float32)
        o_0 = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene, two_pass=0)
        o_2 = sp.sparse_any_hit_cm(o3, d3, maxd, field_scene, two_pass=4)
        np.testing.assert_array_equal(np.asarray(o_0), np.asarray(o_2))


def test_lane_bound_is_conservative(field_scene):
    """Property: for every lane, the per-lane unseen bound is a true
    lower bound on the exact slab entry of every cluster its block's
    truncated list dropped (misses count as BIG). This is the invariant
    that makes two-pass finality exact."""
    o3, d3 = _random_rays(1024, seed=23)
    r_blk, K = 512, 4
    o3p = sp._pad_repeat_last(o3, r_blk)
    d3p = sp._pad_repeat_last(d3, r_blk)
    tp = sp._pack_for_sparse(field_scene, 128)
    aabb8 = sp.cluster_aabbs(tp, 128)
    n = o3p.shape[1]
    nrb = n // r_blk
    tmax = jnp.full((nrb,), sp.BIG, jnp.float32)
    packed, ncand, ovf, ne, drops = sp.candidate_worklist(
        aabb8, o3p, d3p, tmax, r_blk=r_blk, maxc=sp.MAXC, w_cap=65536,
        trunc_k=K,
    )
    assert drops is not None
    bound = np.asarray(sp._lane_unseen_bound(o3p, d3p, aabb8, drops, r_blk))

    # exact per-lane entries to every cluster (reference: slab per lane)
    enter_l, hit_l = sp._candidate_enter_hit(
        aabb8, o3p, d3p, jnp.full((n,), sp.BIG), 1
    )
    lane_entry = np.asarray(
        jnp.where(hit_l, jnp.maximum(enter_l, 0.0), sp.BIG)
    )  # [n, C]

    # which clusters were IN each block's pass-1 list
    enter_b, hit_b = sp._candidate_enter_hit(aabb8, o3p, d3p, tmax, r_blk)
    key = np.asarray(
        jnp.where(hit_b, jnp.maximum(enter_b, 0.0), sp.BIG)
    )
    order = np.argsort(key, axis=1, kind="stable")
    in_pass1 = np.zeros_like(key, dtype=bool)
    for b in range(nrb):
        cand = order[b][key[b][order[b]] < sp.BIG][:K]
        in_pass1[b, cand] = True

    C = aabb8.shape[0]
    viol = 0
    for b in range(nrb):
        lanes = slice(b * r_blk, (b + 1) * r_blk)
        unseen = ~in_pass1[b]
        min_unseen = lane_entry[lanes][:, unseen].min(axis=1)
        viol += int((min_unseen < bound[lanes] - 1e-3).sum())
    assert viol == 0, viol


def test_scaled_budget_units():
    """Smaller clusters get proportionally more slots per block at the
    same SMEM bytes per launch (the c64 fallback-storm fix, r3)."""
    assert sp._scaled_budget(128, 512, 128) == (512, 128)
    assert sp._scaled_budget(64, 512, 128) == (1024, 64)
    assert sp._scaled_budget(32, 512, 128) == (2048, 32)
    assert sp._scaled_budget(256, 512, 128) == (512, 128)


@pytest.mark.parametrize("c_tri", [32, 64, 256])
def test_cluster_granularity_bitmatch(field_scene, c_tri):
    """Non-default cluster sizes (now budget-scaled) stay bit-identical
    to the dense sweep."""
    o3, d3 = _random_rays(700, seed=9)
    assert_nearest_matches(field_scene, o3, d3, c_tri=c_tri)
