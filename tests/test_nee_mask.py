"""NEE relevance masking (round 4): render-level bit-identity.

``shade_nee`` parks shadow lanes whose occlusion result never reaches the
radiance (dead lanes, misses, light hits — masked by ``shade`` /
``bounce_step``). The gates below render with the production masking and
with masking force-disabled (``shade`` sees ``alive=None``) and assert the
images are bit-identical, across the sparse accel, the cache, and the
shadow-lane sort — i.e. the masking is a pure cost optimization.

Why it matters (scripts/cache_stats.py on the chip, 100k config): 68% of
bounce-3 shadow lanes are irrelevant stale-point rays; unoccluded lanes
can never early-terminate, so those lanes force full candidate-union
scans and blow the cached path's pass-2 compaction cap (62% unresolved
vs 16% unresolved-and-relevant).
"""

import dataclasses
from unittest import mock

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pathtracerpython_tpu.render import integrator as integ
from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.render.integrator import render
from pathtracerpython_tpu.scene.arrays import pack_scene
from pathtracerpython_tpu.scene.synthetic import box_field_scene


@pytest.fixture(scope="module")
def field_scene():
    # >4096 padded triangles so accel="auto" resolves to sparse; small
    # image so dead/miss lanes exist by bounce 2 (rays escape the field)
    return pack_scene(
        box_field_scene(n_boxes=80, width=16, height=16), morton_order=True
    )


def _render_unmasked(scene, cfg):
    """Render with the relevance masking force-disabled: bounce_step's
    shade call drops the ``alive`` argument, so ``relevant`` stays None
    all the way down (the pre-round-4 sweep shape)."""
    real_shade = integ.shade

    def shade_no_alive(hit, mat, u, scene_, cfg_, prev_specular,
                       shading_normal3=None, nee_cache=None, alive=None,
                       occ_hint=None):
        return real_shade(
            hit, mat, u, scene_, cfg_, prev_specular, shading_normal3,
            nee_cache, None, occ_hint,
        )

    with mock.patch.object(integ, "shade", shade_no_alive):
        return np.asarray(render(scene, cfg))


@pytest.mark.parametrize(
    "accel,nee_cache,sort_nee",
    [
        ("sparse", "off", "off"),
        ("sparse", "on", "off"),
        ("sparse", "off", "on"),
        ("sparse", "on", "on"),
        ("none", "off", "off"),  # dense pallas path: mask still parks
    ],
)
def test_masked_render_bit_identical(field_scene, accel, nee_cache,
                                     sort_nee):
    cfg = RenderConfig(
        mode="fast", n_samples=2, n_bounces=3, backend="pallas",
        accel=accel, nee_cache=nee_cache, sort_nee=sort_nee,
        batch_samples=True,
    )
    img_masked = np.asarray(render(field_scene, cfg))
    img_unmasked = _render_unmasked(field_scene, cfg)
    assert img_masked.dtype == img_unmasked.dtype
    np.testing.assert_array_equal(img_masked, img_unmasked)


def test_masked_render_bit_identical_xla_backend(field_scene):
    cfg = RenderConfig(
        mode="fast", n_samples=1, n_bounces=3, backend="xla",
        accel="sparse",
    )
    np.testing.assert_array_equal(
        np.asarray(render(field_scene, cfg)),
        _render_unmasked(field_scene, cfg),
    )


def test_irrelevant_lanes_never_hit_pass2(field_scene):
    """With all lanes marked irrelevant, the cached entry's pass-2
    compaction sees zero unfinished lanes (the cond's small branch at
    any m_div) — and relevant lanes' verdicts still match the uncached
    sweep when half the wavefront is parked."""
    from pathtracerpython_tpu.kernels import sparse_pallas as sp

    rng = np.random.default_rng(3)
    n = 1024
    o = rng.uniform([-8, -0.5, -14], [8, 0.5, 2], (n, 3)).astype(np.float32)
    t = rng.uniform([-2, 6, -8], [2, 8, -2], (n, 3)).astype(np.float32)
    v = t - o
    dist = np.linalg.norm(v, axis=1).astype(np.float32)
    o3 = jnp.asarray(o.T)
    d3 = jnp.asarray((v / dist[:, None]).T)
    maxd = jnp.asarray(dist * 0.95)
    rel = jnp.asarray(np.arange(n) % 2 == 0)

    occ_ref = sp.sparse_any_hit_cm(o3, d3, maxd, scene=field_scene)
    occ, _ = sp.sparse_any_hit_cached_cm(
        o3, d3, maxd, field_scene, jnp.full((n,), -1, jnp.int32),
        relevant=rel, m_div=4,
    )
    np.testing.assert_array_equal(
        np.asarray(occ)[np.asarray(rel)], np.asarray(occ_ref)[np.asarray(rel)]
    )


def test_occ_hint_bit_identical(field_scene):
    """The occlusion-hint block segregation (RenderConfig.nee_hint) is a
    pure ordering change: renders with it on and off are bit-identical."""
    base = dict(
        mode="fast", n_samples=2, n_bounces=3, backend="pallas",
        accel="sparse", sort_nee="on", batch_samples=True,
    )
    img_on = np.asarray(render(field_scene, RenderConfig(
        nee_hint="on", **base)))
    img_off = np.asarray(render(field_scene, RenderConfig(
        nee_hint="off", **base)))
    np.testing.assert_array_equal(img_on, img_off)
