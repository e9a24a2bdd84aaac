"""The driver's entry points must work on the CPU mesh: a jittable forward
step and a full multi-chip training-step dry run."""

import importlib.util
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def graft():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("__graft_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    arr = np.asarray(out)
    assert arr.shape[-1] == 3
    assert np.isfinite(arr).all()
    assert arr.max() > 0


@pytest.mark.parametrize("n", [8, 4])
def test_dryrun_multichip(graft, n):
    graft.dryrun_multichip(n)
