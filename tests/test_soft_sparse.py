"""Cluster-accelerated soft sweeps (diff/boundary.py, round 3) vs the
dense O(N·T) sweeps.

Contract: identical candidate-conservative math on gathered triangles —
same winners; t/margin may differ by ~1 ulp (different XLA fusion shapes,
the same class the pallas-vs-XLA backend comparison tolerates). The
shadow-coverage sum additionally truncates sub-``sigmoid(-6)`` terms
(module docstring), gated numerically here.

This is the VERDICT r2 item-4 'make soft mode scale' machinery. The
promised 128² soft pose fit on a >4096-triangle scene is DELIVERED by
scripts/soft_fit_128.py (chip-measured, BENCHLOG_r4 r4_soft_fit_128:
Cornell + 4.8k clutter triangles, pose recovered to 4.8e-3 offset /
3.1e-4 rad in 120 steps / ~220 s wall on the v5e, FD spot-gate rel
1.2e-2); this module holds the CI-sized exactness/gradient gates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from pathtracerpython_tpu.diff import boundary as bd
from pathtracerpython_tpu.scene.arrays import pack_scene, recompute_derived
from pathtracerpython_tpu.scene.synthetic import box_field_scene


@pytest.fixture(scope="module")
def big_scene():
    # ~7.2k triangles — past SOFT_ACCEL_MIN_TRIS, so the public soft
    # entry points route through the sparse sweeps
    return pack_scene(box_field_scene(n_boxes=600), tri_order="morton")


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform([-8, -1, -16], [8, 1.5, 3], (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


BETA = 0.03


def test_routing(big_scene):
    assert big_scene.tri_v0.shape[0] >= bd.SOFT_ACCEL_MIN_TRIS


def test_soft_visibility_matches_dense(big_scene):
    o, d = _rays(700, seed=0)
    maxd = jnp.full((700,), 10.0, jnp.float32)
    dense = 1.0 - jnp.minimum(
        bd._soft_visibility_cov(o, d, maxd, big_scene, BETA), 1.0
    )
    sparse = bd.soft_visibility_sparse(o, d, maxd, big_scene, BETA)
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), atol=5e-3
    )


def test_soft_visibility_grad_matches_dense(big_scene):
    o, d = _rays(300, seed=2)
    maxd = jnp.full((300,), 10.0, jnp.float32)

    def loss(fn, dx):
        shift = jnp.asarray([dx, 0.0, 0.0])
        sc = recompute_derived(dataclasses.replace(
            big_scene,
            tri_v0=big_scene.tri_v0 + shift,
            tri_v1=big_scene.tri_v1 + shift,
            tri_v2=big_scene.tri_v2 + shift,
        ))
        return jnp.mean(fn(o, d, maxd, sc, BETA))

    def vis_dense(o_, d_, m_, sc, b):
        return 1.0 - jnp.minimum(
            bd._soft_visibility_cov(o_, d_, m_, sc, b), 1.0
        )

    g_s = float(jax.grad(lambda dx: loss(bd.soft_visibility_sparse, dx))(0.0))
    g_d = float(jax.grad(lambda dx: loss(vis_dense, dx))(0.0))
    assert abs(g_d) > 1e-6
    np.testing.assert_allclose(g_s, g_d, rtol=5e-2, atol=1e-5)


def test_soft_hits_match_dense_winners(big_scene):
    o, d = _rays(700, seed=1)
    dn = bd.soft_hits_sweep_dense(o, d, big_scene, BETA)
    sp = bd.soft_hits_sweep_sparse(o, d, big_scene, BETA)
    for name in ("f_idx", "h1_idx", "h2_idx"):
        a = np.asarray(getattr(dn, name))
        b = np.asarray(getattr(sp, name))
        # winners identical up to 1-ulp t reorderings (equal-t grazing
        # class) — bound the population
        assert (a != b).mean() < 5e-3, (name, (a != b).sum())
    for tname, iname in (("f_t", "f_idx"), ("h1_t", "h1_idx"),
                         ("h2_t", "h2_idx")):
        same = (np.asarray(getattr(dn, iname))
                == np.asarray(getattr(sp, iname)))
        a = np.asarray(getattr(dn, tname))[same]
        b = np.asarray(getattr(sp, tname))[same]
        finite = a < 1e30
        np.testing.assert_allclose(b[finite], a[finite], rtol=2e-6,
                                   atol=2e-6)
    same = np.asarray(dn.f_idx) == np.asarray(sp.f_idx)
    np.testing.assert_allclose(
        np.asarray(sp.f_margin)[same], np.asarray(dn.f_margin)[same],
        rtol=1e-4, atol=2e-6,
    )


def occluder_scene_with_clutter(n_far_tris: int = 4800):
    """The isolated-boundary occluder scene of tests/test_boundary.py
    plus DISTANT clutter (random triangles at z ~ -200, far outside
    every camera/light path): same radiance and gradients as the small
    scene, but past SOFT_ACCEL_MIN_TRIS so the public soft entry points
    take the cluster-accelerated sweeps.

    (The 600-box field is NOT a valid FD scene for the blend: its boxes
    are thinner than the coverage band, so stacked silhouettes violate
    the one-boundary model — a soft-estimator scope limit documented in
    diff/boundary.py, independent of the acceleration.)
    """
    from pathtracerpython_tpu.scene.obj import mesh_from_arrays
    from pathtracerpython_tpu.scene.sdl import SceneDescription, SdlObject
    from tests.test_boundary import make_occluder_scene  # noqa: F401

    rng = np.random.default_rng(0)
    k = n_far_tris
    base = rng.uniform([-50, -50, -220], [50, 50, -180], (k, 3))
    verts = np.concatenate(
        [base, base + rng.normal(0, 0.3, (k, 3)),
         base + rng.normal(0, 0.3, (k, 3))], axis=0
    ).astype(np.float32)
    faces = np.stack(
        [np.arange(k), np.arange(k) + k, np.arange(k) + 2 * k], axis=1
    )
    clutter = mesh_from_arrays(verts.tolist(), faces.tolist())

    floor = mesh_from_arrays(
        [[-4.0, -1.0, 2.0], [4.0, -1.0, 2.0], [4.0, -1.0, -8.0],
         [-4.0, -1.0, -8.0]],
        [[0, 1, 2], [0, 2, 3]],
    )
    blocker = mesh_from_arrays(
        [[-0.4, 0.0, -2.4], [0.4, 0.0, -2.4], [0.4, 0.0, -1.6],
         [-0.4, 0.0, -1.6]],
        [[0, 1, 2], [0, 2, 3]],
    )
    light = mesh_from_arrays(
        [[-0.7, 1.5, -2.7], [0.7, 1.5, -2.7], [0.7, 1.5, -1.3],
         [-0.7, 1.5, -1.3]],
        [[0, 1, 2], [0, 2, 3]],
    )
    mat = dict(ka=0.3, kd=0.7, ks=0.0, kt=0.0, n=1.0)
    desc = SceneDescription(
        eye=(0.0, 0.8, 3.0), width=12, height=12,
        ortho=(-1.0, -1.0, 1.0, 1.0), ambient=0.3,
        light_mesh=light, light_color=(1.0, 1.0, 1.0),
        objects=[
            SdlObject(mesh=floor, rgb=(0.7, 0.7, 0.7), **mat),
            SdlObject(mesh=blocker, rgb=(0.8, 0.2, 0.2), **mat),
            SdlObject(mesh=clutter, rgb=(0.5, 0.5, 0.5), **mat),
        ],
    )
    return pack_scene(desc, tri_order="morton")


def test_soft_render_fd_gate_accelerated():
    """End-to-end FD gate of the ACCELERATED soft path: the occluder
    scene + distant clutter routes both soft sweeps through the cluster
    machinery; the blocker-translation gradient must still FD-validate
    (same gate as tests/test_boundary.py, now on the sparse path)."""
    from pathtracerpython_tpu.ops.camera import make_primary_rays
    from pathtracerpython_tpu.render.config import RenderConfig
    from pathtracerpython_tpu.render.integrator import render_rays

    scene = occluder_scene_with_clutter()
    assert scene.tri_v0.shape[0] >= bd.SOFT_ACCEL_MIN_TRIS
    cfg = RenderConfig(mode="fast", n_bounces=1, n_light_samples=2,
                       soft_vis_beta=BETA)
    w, h = scene.meta.width, scene.meta.height
    o, d = make_primary_rays(scene.eye, scene.ortho, w, h)
    pids = jnp.arange(w * h, dtype=jnp.int32)

    def f(dx):
        mask = (scene.tri_material == 1) & scene.tri_valid
        shift = jnp.where(mask[:, None], 1.0, 0.0) * jnp.asarray(
            [dx, 0.0, 0.0]
        )[None, :]
        sc = recompute_derived(dataclasses.replace(
            scene,
            tri_v0=scene.tri_v0 + shift,
            tri_v1=scene.tri_v1 + shift,
            tri_v2=scene.tri_v2 + shift,
        ))
        return jnp.mean(render_rays(o, d, pids, sc, cfg, 3))

    ad = float(jax.grad(f)(0.0))
    eps = 2e-3
    fd = (float(f(eps)) - float(f(-eps))) / (2 * eps)
    assert abs(ad) > 1e-5, ad
    np.testing.assert_allclose(ad, fd, rtol=8e-2, atol=2e-5)
