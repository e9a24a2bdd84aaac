"""Bounce-stage pipeline parallelism (parallel/pipeline.py): the GPipe
schedule over a ``pp`` mesh axis must be BIT-IDENTICAL to the
single-device per-sample scan — same bounce_step calls, same RNG
counters, with the ray state ring-hopping between stages via ppermute.
SURVEY.md §2.2's PP row ("pipeline bounce stages across cores")."""

import numpy as np
import pytest

from pathtracerpython_tpu.parallel import make_mesh
from pathtracerpython_tpu.parallel.pipeline import render_pipelined
from pathtracerpython_tpu.render import RenderConfig, render


@pytest.mark.parametrize("pp,bounces", [(4, 4), (2, 4), (4, 8)])
def test_pipelined_bitmatches_single_device(cornell_scene, pp, bounces):
    cfg = RenderConfig(mode="fast", n_samples=2, n_bounces=bounces)
    single = np.asarray(render(cornell_scene, cfg, seed=3))
    mesh = make_mesh(pp=pp, dp=1)
    piped = np.asarray(
        render_pipelined(cornell_scene, cfg, mesh, seed=3, pp_axis="pp")
    )
    np.testing.assert_array_equal(piped, single)


def test_pipelined_microbatch_count_invariance(cornell_scene):
    """The schedule (hence bubbles) changes with M; the radiance must
    not — every microbatch runs the same bounce chain regardless."""
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=2)
    mesh = make_mesh(pp=2, dp=1)
    a = np.asarray(
        render_pipelined(cornell_scene, cfg, mesh, microbatches=4)
    )
    b = np.asarray(
        render_pipelined(cornell_scene, cfg, mesh, microbatches=16)
    )
    np.testing.assert_array_equal(a, b)


def test_pipelined_rejects_uneven_stage_split(cornell_scene):
    cfg = RenderConfig(mode="fast", n_samples=1, n_bounces=3)
    mesh = make_mesh(pp=2, dp=1)
    with pytest.raises(AssertionError, match="stages"):
        render_pipelined(cornell_scene, cfg, mesh)
