"""Wavefront ray ordering for the cluster-sparse sweeps.

Block-level culling (kernels/sparse_pallas.py) is only as good as the
coherence of each 512-ray block: the candidate list is the UNION of the
clusters any ray in the block can touch. Primary rays arrive coherent
(adjacent pixels), but bounce rays scatter over the hemisphere and NEE
shadow rays start from scattered hit points — so the integrator re-sorts
the wavefront each bounce by a (direction octant, origin morton) key,
putting rays with similar frustums in the same block.

This is a pure permutation of independent lanes: every per-lane quantity
(RNG counters included) travels with its ray, so a sorted render is
bit-identical to an unsorted one — verified in tests/test_sparse.py.

The reference has no analogue (its pool fans out per ray in pixel order,
``/root/reference/main.py:197-204``); this is the TPU replacement for a
GPU tracer's per-warp ray reordering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Dead lanes are "parked" on a ray far above every scene pointing away
# from it: their blocks produce zero candidate clusters, so sorting them
# together makes dead lanes free instead of sweeping stale rays.
PARK_ORIGIN = (0.0, 1.0e6, 0.0)
PARK_DIR = (0.0, 1.0, 0.0)

_ORIGIN_BITS = 5  # per axis
_DIR_BITS = 4     # per axis
# key layout (30 bits): [octant 3][origin morton 15][direction morton 12].
# Direction bits matter: the sparse candidate builder's interval slab test
# loses an axis entirely when a block's direction interval straddles zero,
# so blocks must be direction-coherent, not just origin-coherent. The
# direction morton also disambiguates shared-origin waves (primary rays
# all start at the eye — an origin-only key would leave them unsorted in
# image-column order, whose frustums span the whole scene).


def _spread3(x: jax.Array) -> jax.Array:
    """Interleave zeros between the low 10 bits of each uint32 lane."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton3(q3: jax.Array) -> jax.Array:
    """Z-order key of quantized coordinates q3 u32[3, N] (each < 2^10)."""
    return (
        (_spread3(q3[0]) << 2) | (_spread3(q3[1]) << 1) | _spread3(q3[2])
    )


def scene_bounds(scene) -> tuple[jax.Array, jax.Array]:
    """(lo3, hi3) of the valid triangle set, stop-gradient'ed (sorting is
    control flow, not math)."""
    sg = jax.lax.stop_gradient
    valid = scene.tri_valid[:, None]
    vs = jnp.concatenate(
        [sg(scene.tri_v0), sg(scene.tri_v1), sg(scene.tri_v2)], axis=0
    )
    vmask = jnp.concatenate([valid] * 3, axis=0)
    lo = jnp.min(jnp.where(vmask, vs, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(vmask, vs, -jnp.inf), axis=0)
    return lo, hi


def wavefront_sort_order(o3, d3, alive, lo3, hi3, occ_hint=None) -> jax.Array:
    """Permutation i32[N] sorting rays by (direction octant, origin
    morton, direction morton); dead lanes sort to the end (their own
    blocks, culled to zero candidates via parking).

    ``occ_hint`` bool[N] (optional): a predicted-occluded bit placed
    ABOVE the spatial key (bit 30) — predicted-occluded lanes first.
    Any-hit blocks early-exit only when EVERY lane is occluded, so at
    99.7% occlusion a 512-lane block almost always carries 1-2 stray
    unoccluded lanes that force the full union scan; segregating the
    predicted-unoccluded minority into their own blocks lets the
    occluded-pure majority exit after a few clusters. Ordering only —
    results are a pure permutation either way."""
    sg = jax.lax.stop_gradient
    o3, d3 = sg(o3), sg(d3)

    span = jnp.maximum(hi3 - lo3, 1e-12)[:, None]
    oscale = jnp.asarray(float(2**_ORIGIN_BITS) - 1.0, o3.dtype)
    oq = jnp.clip(
        (o3 - lo3[:, None]) / span * oscale, 0.0, oscale
    ).astype(jnp.uint32)

    d3n = d3 * lax.rsqrt(
        jnp.maximum(jnp.sum(d3 * d3, axis=0, keepdims=True), 1e-30)
    )
    dscale = jnp.asarray(float(2**_DIR_BITS) - 1.0, d3.dtype)
    dq = jnp.clip((d3n + 1.0) * 0.5 * dscale, 0.0, dscale).astype(jnp.uint32)

    octant = (
        ((d3[0] < 0).astype(jnp.uint32) << 2)
        | ((d3[1] < 0).astype(jnp.uint32) << 1)
        | (d3[2] < 0).astype(jnp.uint32)
    )
    key = (
        (octant << jnp.uint32(3 * (_ORIGIN_BITS + _DIR_BITS)))
        | (morton3(oq) << jnp.uint32(3 * _DIR_BITS))
        | morton3(dq)
    )
    if occ_hint is not None:
        # bit 30: predicted-occluded lanes (hint=True) get the smaller
        # key; the 30-bit spatial key stays intact within each class
        key = key | jnp.where(
            occ_hint, jnp.uint32(0), jnp.uint32(1) << jnp.uint32(30)
        )
    key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(key).astype(jnp.int32)


def permute_minor(x: jax.Array, order: jax.Array) -> jax.Array:
    """Gather along the lane (minor/last) axis."""
    return jnp.take(x, order, axis=-1)
