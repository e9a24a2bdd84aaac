"""Primary-ray generation (pinhole through an ortho window on z=0).

Contract (reference ``utils.py:55-69``):
- screen points lie on the z=0 plane at (x, y, 0) with x drawn from
  ``linspace(x0, x1, width)`` (inclusive of both ends) as the OUTER loop and
  y from ``linspace(y0, y1, height)`` as the INNER loop, so the flat pixel
  index is ``ix * height + iy``;
- ray = (eye, screen_pt - eye) with the direction deliberately NOT
  normalized (``utils.py:59`` comments the normalization out — bounce math
  consumes the raw direction, see the specular branch ``main.py:254-256``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_screen_points(ortho: jax.Array, width: int, height: int) -> jax.Array:
    """Screen sample points, [width*height, 3], x-outer / y-inner order."""
    x0, y0, x1, y1 = ortho[0], ortho[1], ortho[2], ortho[3]
    xs = jnp.linspace(x0, x1, width)
    ys = jnp.linspace(y0, y1, height)
    x = jnp.repeat(xs, height)
    y = jnp.tile(ys, width)
    return jnp.stack([x, y, jnp.zeros_like(x)], axis=-1)


def make_primary_rays(
    eye: jax.Array, ortho: jax.Array, width: int, height: int
) -> tuple[jax.Array, jax.Array]:
    """Primary rays: (origins [W*H, 3], unnormalized directions [W*H, 3])."""
    pts = make_screen_points(ortho, width, height)
    origins = jnp.broadcast_to(eye, pts.shape)
    return origins, pts - eye
