"""Jittable batched geometry / camera / sampling primitives.

These replace the reference's per-ray Python hot loops (``utils.py:21-147``,
``main.py:83-122``) with masked SoA sweeps over triangle tiles that XLA can
fuse, and that the Pallas kernels in ``pathtracerpython_tpu.kernels`` mirror.
"""

from pathtracerpython_tpu.ops.geometry import (  # noqa: F401
    NearestHit,
    any_hit_within,
    intersect_moller,
    intersect_reference,
    nearest_hit,
)
from pathtracerpython_tpu.ops.camera import make_primary_rays, make_screen_points  # noqa: F401
from pathtracerpython_tpu.ops import sampling  # noqa: F401
