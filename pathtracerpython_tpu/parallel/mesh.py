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


def make_mesh(dp: int | None = None, geom: int = 1, devices=None) -> Mesh:
    """Build a ("dp", "geom") mesh over ``devices`` (default: all).

    ``dp=None`` uses every remaining device after the geom split. ICI
    adjacency: ``jax.make_mesh`` lays axes out so the trailing (geom) axis
    is the fastest-varying — neighbours on the geom ring are physically
    adjacent chips, which is what the ppermute ring wants.
    """
    all_devices = devices is None
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        assert n % geom == 0, (n, geom)
        dp = n // geom
    assert dp * geom <= n, (dp, geom, n)
    if all_devices and dp * geom == n:
        # topology-aware assignment: jax.make_mesh orders devices so ring
        # neighbours on the trailing (geom) axis are physically adjacent
        return jax.make_mesh((dp, geom), ("dp", "geom"))
    devs = np.asarray(devices[: dp * geom]).reshape(dp, geom)
    return Mesh(devs, axis_names=("dp", "geom"))
