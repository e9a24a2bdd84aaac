"""Device-mesh construction helpers.

One place decides how physical devices become logical mesh axes:

- ``dp``   — data parallel over rays/pixels/samples (the primary axis; the
  reference's per-ray pool fan-out, ``main.py:197-204``, maps here),
- ``geom`` — optional geometry axis for triangle/BVH buffers that exceed one
  chip's HBM, consumed by the ppermute ring in ``parallel.ring``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    dp: int | None = None, geom: int = 1, pp: int = 1, devices=None,
) -> Mesh:
    """Build a ("dp", "geom") mesh — or ("pp", "dp", "geom") when
    ``pp > 1`` — over ``devices`` (default: all).

    ``dp=None`` uses every remaining device after the geom/pp split. ICI
    adjacency: ``jax.make_mesh`` lays axes out so the trailing (geom) axis
    is the fastest-varying — neighbours on the geom ring are physically
    adjacent chips, which is what the ppermute ring wants; the pp axis
    (bounce-stage pipeline, ``parallel/pipeline.py``) is the
    slowest-varying, so its once-per-step state hop crosses the larger
    stride while the per-sweep geom ring stays on adjacent chips.
    """
    all_devices = devices is None
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        assert n % (geom * pp) == 0, (n, geom, pp)
        dp = n // (geom * pp)
    assert dp * geom * pp <= n, (dp, geom, pp, n)
    if pp > 1:
        shape, names = (pp, dp, geom), ("pp", "dp", "geom")
    else:
        shape, names = (dp, geom), ("dp", "geom")
    if all_devices and dp * geom * pp == n:
        # topology-aware assignment: jax.make_mesh orders devices so ring
        # neighbours on the trailing (geom) axis are physically adjacent
        return jax.make_mesh(shape, names)
    devs = np.asarray(devices[: dp * geom * pp]).reshape(shape)
    return Mesh(devs, axis_names=names)
