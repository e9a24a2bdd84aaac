"""Wavefront integrator: flat ray SoA, per-bounce intersect→shade→scatter."""

from pathtracerpython_tpu.render.config import RenderConfig  # noqa: F401
from pathtracerpython_tpu.render.integrator import (  # noqa: F401
    RayState,
    render,
    render_image,
    render_rays,
)
from pathtracerpython_tpu.render.image import radiance_to_image  # noqa: F401
