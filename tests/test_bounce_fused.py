"""Fused whole-bounce megakernel vs the composed kernel path.

The fused kernel (kernels/bounce_pallas.py) must be a pure fusion: same
estimator, same RNG consumption, same gradient discipline as the unfused
fast-mode bounce (intersect kernel + NEE kernel + XLA glue). These tests
pin that equivalence in interpret mode; the same kernel compiles for real
on TPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.render.integrator import render


def _pair(**kw):
    base = dict(
        mode="fast", backend="pallas", n_samples=2, n_bounces=3,
        n_light_samples=3,
    )
    base.update(kw)
    return (
        RenderConfig(fused_bounce="on", **base),
        RenderConfig(fused_bounce="off", **base),
    )


def test_fused_matches_unfused_low_bounce(cornell_scene):
    """1-2 bounces: fp-reassociation noise only (no chaotic divergence)."""
    on, off = _pair(n_bounces=2)
    a = np.asarray(render(cornell_scene, on, seed=3))
    b = np.asarray(render(cornell_scene, off, seed=3))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_matches_unfused_deep_bounce(cornell_scene):
    """3+ bounces: a 1-ulp difference in a scattered direction can put a
    later segment on the other side of a triangle edge, so isolated lanes
    may diverge by O(pixel) — the same measure-zero grazing class the
    pallas-vs-XLA and sparse-vs-dense comparisons tolerate. Gate on the
    population: essentially all values tight, stragglers rare and bounded,
    zero mean bias."""
    on, off = _pair()
    a = np.asarray(render(cornell_scene, on, seed=3))
    b = np.asarray(render(cornell_scene, off, seed=3))
    d = np.abs(a - b)
    assert (d > 1e-5).mean() < 0.005, (d > 1e-5).mean()
    assert d.max() < 5e-3, d.max()
    assert abs((a - b).mean()) < 1e-6


def test_fused_matches_unfused_background(cornell_scene):
    on, off = _pair(use_background=True, n_bounces=2)
    a = np.asarray(render(cornell_scene, on, seed=1))
    b = np.asarray(render(cornell_scene, off, seed=1))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_matches_unfused_one_light_sample(cornell_scene):
    # s_samples=1 exercises the kernel's degenerate sample-loop bounds
    # (occ output block collapses to one row)
    on, off = _pair(n_bounces=2, n_light_samples=1)
    a = np.asarray(render(cornell_scene, on, seed=2))
    b = np.asarray(render(cornell_scene, off, seed=2))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_matches_unfused_batch_samples(cornell_scene):
    # 2 bounces: past that, isolated lanes may diverge chaotically (see
    # the deep-bounce test); this one pins the batched-lane plumbing
    on, off = _pair(batch_samples=True, n_bounces=2)
    a = np.asarray(render(cornell_scene, on, seed=7))
    b = np.asarray(render(cornell_scene, off, seed=7))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_gate_excludes_unsupported_configs(cornell_scene):
    from pathtracerpython_tpu.kernels.bounce_pallas import (
        fused_bounce_supported,
    )

    ok = RenderConfig(mode="fast", backend="pallas")
    assert fused_bounce_supported(cornell_scene, ok)
    for bad in (
        RenderConfig(mode="reference"),
        RenderConfig(mode="fast", backend="xla"),
        RenderConfig(mode="fast", backend="pallas", accel="sparse"),
        RenderConfig(mode="fast", backend="pallas", soft_vis_beta=0.05),
        RenderConfig(mode="fast", backend="pallas", geom_axis="g",
                     geom_axis_size=2),
        RenderConfig(mode="fast", backend="pallas", sort_rays="on"),
    ):
        assert not fused_bounce_supported(cornell_scene, bad)
    with pytest.raises(AssertionError):
        render(
            cornell_scene,
            RenderConfig(mode="fast", backend="pallas", sort_rays="on",
                         fused_bounce="on"),
        )
    with pytest.raises(AssertionError):
        render(
            cornell_scene,
            RenderConfig(mode="fast", backend="xla", fused_bounce="on"),
        )


@pytest.mark.parametrize("field", ["mat_rgb", "light_v0", "tri_v0"])
def test_fused_gradients_match_unfused(cornell_scene, field):
    """The fused custom VJP (recompute with pinned discretes) must agree
    with the unfused path's gradients for every smooth parameter class:
    materials (shading chain), light vertices (NEE chain), and scene
    vertices (hit-distance re-solve chain)."""
    on, off = _pair(n_samples=1, n_bounces=2)

    def loss(val, cfg):
        sc = dataclasses.replace(cornell_scene, **{field: val})
        return jnp.sum(render(sc, cfg, seed=5))

    v0 = getattr(cornell_scene, field)
    g_on = np.asarray(jax.grad(loss)(v0, on))
    g_off = np.asarray(jax.grad(loss)(v0, off))
    scale = max(np.abs(g_off).max(), 1e-6)
    np.testing.assert_allclose(g_on, g_off, rtol=5e-4, atol=5e-4 * scale)


def test_rng_in_kernel_bitmatch(cornell_scene, monkeypatch):
    """The in-kernel threefry draws replicate ops.rng.uniforms exactly
    (integer math, no fp reassociation), so the two fused variants must
    be BIT-identical — render and gradients."""
    from pathtracerpython_tpu.kernels import bounce_pallas as bp

    on, _ = _pair(n_bounces=3)
    monkeypatch.setattr(bp, "RNG_IN_KERNEL", True)
    a = np.asarray(render(cornell_scene, on, seed=3))
    monkeypatch.setattr(bp, "RNG_IN_KERNEL", False)
    b = np.asarray(render(cornell_scene, on, seed=3))
    np.testing.assert_array_equal(a, b)

    def loss(rgb, sc=cornell_scene):
        return jnp.sum(render(
            dataclasses.replace(sc, mat_rgb=rgb), _pair(n_bounces=2)[0],
            seed=5,
        ))

    monkeypatch.setattr(bp, "RNG_IN_KERNEL", True)
    g_a = np.asarray(jax.grad(loss)(cornell_scene.mat_rgb))
    monkeypatch.setattr(bp, "RNG_IN_KERNEL", False)
    g_b = np.asarray(jax.grad(loss)(cornell_scene.mat_rgb))
    np.testing.assert_allclose(g_a, g_b, rtol=1e-6, atol=1e-8)
