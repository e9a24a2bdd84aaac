"""End-to-end radiance parity: our reference-mode renderer vs radiance
captured from the ACTUAL reference program (scripts/generate_reference_golden
runs /root/reference/main.py serially and records the per-pixel float sums).

RNG streams differ (CPython Mersenne vs counter-based threefry), so
converged renders are compared statistically: the Monte-Carlo mean of both
estimators is the same quantity, so with S samples the per-pixel difference
shrinks as 1/sqrt(S). Deterministic structure (which pixels see the light,
the ambient floor) must match exactly.
"""

import os

import numpy as np
import pytest

from pathtracerpython_tpu.render import RenderConfig, render

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load_golden(r, b, seed=9):
    path = os.path.join(GOLDEN_DIR, f"reference_r{r}_b{b}_seed{seed}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden not generated: {path}")
    return np.load(path)["radiance"]  # [1600, 3] float64, x-outer order


def test_light_pixels_and_ambient_floor_match_exactly(cornell_scene):
    """Deterministic structure of the b=1 estimator."""
    golden = _load_golden(1, 1)
    ours = np.asarray(
        render(cornell_scene, RenderConfig(mode="reference", n_samples=1,
                                           n_bounces=1), seed=0)
    )
    # pixels whose primary ray hits the light pay exactly light_color
    gold_light = np.all(golden == 1.0, axis=1)
    ours_light = np.all(ours == 1.0, axis=1)
    np.testing.assert_array_equal(ours_light, gold_light)
    # both have the same hit-vs-background structure (zero radiance lanes)
    np.testing.assert_array_equal(
        np.all(ours == 0.0, axis=1), np.all(golden == 0.0, axis=1)
    )


def test_converged_radiance_allclose_b1(cornell_scene):
    """BASELINE gate: allclose on converged radiance (single bounce)."""
    golden = _load_golden(64, 1)
    ours = np.asarray(
        render(cornell_scene, RenderConfig(mode="reference", n_samples=64,
                                           n_bounces=1), seed=9)
    )
    # MC noise at 64 spp over 3 NEE samples: per-pixel sigma ~ 0.3/sqrt(192)
    diff = np.abs(ours - golden)
    assert diff.mean() < 0.01, diff.mean()
    assert np.quantile(diff, 0.99) < 0.08, np.quantile(diff, 0.99)
    corr = np.corrcoef(ours.ravel(), golden.ravel())[0, 1]
    assert corr > 0.998, corr


def test_converged_radiance_allclose_b2(cornell_scene):
    """BASELINE config 1 shape: multi-bounce comparison, noise-calibrated.

    At 16 spp the bounce-2 scatter makes per-pixel MC noise the dominant
    difference between ANY two independent estimates (measured: our own
    seed-to-seed mean |diff| is 0.0392 with corr 0.9901 — statistically
    identical to ours-vs-reference). The gate is therefore: the difference
    to the reference must not exceed our own self-noise by more than 20%.
    """
    golden = _load_golden(16, 2)
    cfg = RenderConfig(mode="reference", n_samples=16, n_bounces=2)
    ours = np.asarray(render(cornell_scene, cfg, seed=9))
    ours2 = np.asarray(render(cornell_scene, cfg, seed=123))

    self_noise = np.abs(ours - ours2).mean()
    diff = np.abs(ours - golden)
    assert diff.mean() < self_noise * 1.2, (diff.mean(), self_noise)
    corr = np.corrcoef(ours.ravel(), golden.ravel())[0, 1]
    self_corr = np.corrcoef(ours.ravel(), ours2.ravel())[0, 1]
    assert corr > self_corr - 0.005, (corr, self_corr)
