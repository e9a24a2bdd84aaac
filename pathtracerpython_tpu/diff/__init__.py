"""Differentiable rendering and inverse-rendering optimization.

The reference is forward-only (pure Python, no autodiff anywhere); this
layer is new capability mandated by the north star: reverse-mode pixel
gradients w.r.t. albedo, emission, and vertex positions, and optimizer
loops that fit scene parameters to target images.
"""

from pathtracerpython_tpu.diff.inverse import (
    CAMERA_FIELDS,
    PARAM_FIELDS,
    VERTEX_FIELDS,
    apply_params,
    camera_pixel_loss,
    fit,
    make_render_fn,
    make_train_step,
    pixel_loss,
)

__all__ = [
    "CAMERA_FIELDS",
    "PARAM_FIELDS",
    "VERTEX_FIELDS",
    "apply_params",
    "camera_pixel_loss",
    "fit",
    "make_render_fn",
    "make_train_step",
    "pixel_loss",
]
