"""Differentiable rendering and inverse-rendering optimization.

The reference is forward-only (pure Python, no autodiff anywhere); this
layer is new capability mandated by the north star: reverse-mode pixel
gradients w.r.t. albedo, emission, and vertex positions, and optimizer
loops that fit scene parameters to target images.
"""

from pathtracerpython_tpu.diff.inverse import (
    PARAM_FIELDS,
    VERTEX_FIELDS,
    apply_params,
    fit,
    make_render_fn,
    make_train_step,
    pixel_loss,
)

__all__ = [
    "PARAM_FIELDS",
    "VERTEX_FIELDS",
    "apply_params",
    "fit",
    "make_render_fn",
    "make_train_step",
    "pixel_loss",
]
