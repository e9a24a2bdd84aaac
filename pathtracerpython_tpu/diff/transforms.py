"""Differentiable rigid transforms of scene objects.

The reference has no notion of object poses — geometry enters frozen at
parse time (``/root/reference/scene_reader.py:49-104``) and is never
moved. Inverse rendering (BASELINE configs[3]) optimizes poses, so this
module provides smooth maps pose-parameters → perturbed ``SceneArrays``:

- ``translate_object``: rigid translation of one material's triangles;
- ``rotate_object``: axis-angle rotation about the object's centroid
  (Rodrigues form — smooth in the angle everywhere, including 0);
- ``transform_object``: rotation followed by translation, the pose used
  by ``apps.fit_pose --object``.

All maps go through ``recompute_derived`` so normals/areas carry
gradients (translation alone preserves them, rotation does not).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from pathtracerpython_tpu.scene.arrays import SceneArrays, recompute_derived


def _object_mask(scene: SceneArrays, obj_index: int):
    return (scene.tri_material == obj_index) & scene.tri_valid


def object_centroid(scene: SceneArrays, obj_index: int):
    """Mean of the object's triangle vertices, f32[3] (constant —
    detached by construction since it comes from the unperturbed scene)."""
    m = _object_mask(scene, obj_index).astype(scene.tri_v0.dtype)[:, None]
    total = jnp.sum(m) * 3.0
    s = (
        jnp.sum(scene.tri_v0 * m, axis=0)
        + jnp.sum(scene.tri_v1 * m, axis=0)
        + jnp.sum(scene.tri_v2 * m, axis=0)
    )
    return s / jnp.maximum(total, 1.0)


def _rodrigues(v, axis_unit, angle):
    """Rotate rows of ``v`` [T, 3] by ``angle`` about ``axis_unit`` [3]."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    k = axis_unit[None, :]
    kxv = jnp.cross(jnp.broadcast_to(k, v.shape), v)
    kdv = jnp.sum(v * k, axis=-1, keepdims=True)
    return v * c + kxv * s + k * kdv * (1.0 - c)


def translate_object(
    scene: SceneArrays, obj_index: int, offset,
) -> SceneArrays:
    """Shift every triangle of material row ``obj_index`` by ``offset``
    [3], differentiably. Normals/areas are translation-invariant but are
    recomputed anyway so downstream code sees one consistent path."""
    mask = _object_mask(scene, obj_index)
    shift = jnp.where(mask[:, None], 1.0, 0.0) * offset[None, :]
    moved = dataclasses.replace(
        scene,
        tri_v0=scene.tri_v0 + shift,
        tri_v1=scene.tri_v1 + shift,
        tri_v2=scene.tri_v2 + shift,
    )
    return recompute_derived(moved)


def rotate_object(
    scene: SceneArrays, obj_index: int, angle, axis=(0.0, 1.0, 0.0),
    center=None,
) -> SceneArrays:
    """Rotate one object by ``angle`` (radians) about ``axis`` through
    ``center`` (default: the object's centroid). Differentiable in the
    angle (and the vertices); normals/areas are recomputed."""
    axis_u = jnp.asarray(axis, scene.tri_v0.dtype)
    axis_u = axis_u / jnp.sqrt(jnp.sum(axis_u * axis_u) + 1e-30)
    if center is None:
        center = object_centroid(scene, obj_index)
    c = jnp.asarray(center, scene.tri_v0.dtype)[None, :]
    mask = _object_mask(scene, obj_index)[:, None]

    def rot(v):
        return jnp.where(mask, _rodrigues(v - c, axis_u, angle) + c, v)

    moved = dataclasses.replace(
        scene,
        tri_v0=rot(scene.tri_v0),
        tri_v1=rot(scene.tri_v1),
        tri_v2=rot(scene.tri_v2),
    )
    return recompute_derived(moved)


def transform_object(
    scene: SceneArrays, obj_index: int, offset, angle,
    axis=(0.0, 1.0, 0.0),
) -> SceneArrays:
    """Rotate about the object's (original) centroid, then translate —
    the 4-dof pose of ``apps.fit_pose --object``."""
    rotated = rotate_object(scene, obj_index, angle, axis=axis)
    return translate_object(rotated, obj_index, offset)


def rotate_object_euler(
    scene: SceneArrays, obj_index: int, angles, center=None,
) -> SceneArrays:
    """Full rotation by ``angles = (yaw, pitch, roll)`` — the composed map
    R = Ry(yaw) · Rx(pitch) · Rz(roll) about ``center`` (default: the
    object's centroid). Differentiable in every angle; normals/areas are
    recomputed once after the composition."""
    angles = jnp.asarray(angles, scene.tri_v0.dtype)
    if center is None:
        center = object_centroid(scene, obj_index)
    c = jnp.asarray(center, scene.tri_v0.dtype)[None, :]
    mask = _object_mask(scene, obj_index)[:, None]
    dt = scene.tri_v0.dtype
    ax_y = jnp.asarray([0.0, 1.0, 0.0], dt)
    ax_x = jnp.asarray([1.0, 0.0, 0.0], dt)
    ax_z = jnp.asarray([0.0, 0.0, 1.0], dt)

    def rot(v):
        p = v - c
        p = _rodrigues(p, ax_z, angles[2])   # roll
        p = _rodrigues(p, ax_x, angles[1])   # pitch
        p = _rodrigues(p, ax_y, angles[0])   # yaw
        return jnp.where(mask, p + c, v)

    moved = dataclasses.replace(
        scene,
        tri_v0=rot(scene.tri_v0),
        tri_v1=rot(scene.tri_v1),
        tri_v2=rot(scene.tri_v2),
    )
    return recompute_derived(moved)


def transform_object_full(
    scene: SceneArrays, obj_index: int, offset, angles,
) -> SceneArrays:
    """Full 6-dof rigid pose: yaw/pitch/roll about the (original)
    centroid, then a free 3-d translation — the general rigid-pose
    reading of BASELINE configs[3] (geometry from
    /root/reference/scene_reader.py:49-104). Every axis is FD-gated in
    tests/test_pose.py; unlike the light (whose vertical position is a
    measured flat valley under the reference's no-falloff estimator),
    object silhouettes carry usable signal on all six axes."""
    rotated = rotate_object_euler(scene, obj_index, angles)
    return translate_object(rotated, obj_index, offset)
