"""Sharded rendering: rays over data-parallel mesh axes via ``shard_map``.

The reference fans one ``apply_async`` per ray onto a per-host process pool
(``main.py:197-204``), re-pickling the scene for every task. Here the flat
ray batch is sharded once over the mesh's ray axes, the scene rides along
either replicated (small) or triangle-sharded (``geom`` ring), and the
entire multi-bounce integrator runs as one SPMD program per shard. RNG is
keyed by GLOBAL pixel id (``render.integrator.init_rays``), so the sharded
render is bit-identical to the single-device one regardless of mesh shape.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pathtracerpython_tpu.ops.camera import make_primary_rays
from pathtracerpython_tpu.render.config import RenderConfig
from pathtracerpython_tpu.render.integrator import render_rays
from pathtracerpython_tpu.scene.arrays import SceneArrays, TRI_FIELDS


def scene_partition_specs(scene: SceneArrays, geom_axis: str | None = None):
    """A SceneArrays-shaped pytree of PartitionSpecs: TRI_FIELDS sharded on
    ``geom_axis`` (dim 0), everything else replicated."""
    specs = {
        f: P(geom_axis) if geom_axis else P()
        for f in TRI_FIELDS
    }
    spec_scene = dataclasses.replace(
        scene,
        **{
            f: specs[f] for f in TRI_FIELDS
        },
        **{
            f.name: P()
            for f in dataclasses.fields(scene)
            if f.name not in TRI_FIELDS and f.name != "meta"
        },
    )
    return spec_scene


def _ray_axes(dp_axis, geom_axis):
    axes = (dp_axis,) if isinstance(dp_axis, str) else tuple(dp_axis)
    if geom_axis is not None:
        axes = axes + (geom_axis,)
    return axes


def render_rays_sharded(
    origins,
    directions,
    pixel_ids,
    scene: SceneArrays,
    cfg: RenderConfig,
    base_key,
    mesh: Mesh,
    dp_axis="dp",
    geom_axis: str | None = None,
):
    """Trace primary rays sharded over the mesh; returns radiance [N, 3].

    Rays are sharded over ``dp_axis`` (+ ``geom_axis`` if given — with a
    geometry ring every device works a distinct ray sub-block, so the geom
    axis doubles as extra ray parallelism). Scene TRI_FIELDS shard over
    ``geom_axis``; all other scene leaves replicate.
    """
    from pathtracerpython_tpu.render.integrator import check_counter_space

    axes = _ray_axes(dp_axis, geom_axis)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]

    n = origins.shape[0]
    # this entry receives the FULL (pre-shard) ray arrays, so n is the
    # global count the uint32 path counters must accommodate
    check_counter_space(n, cfg.n_samples)
    pad = (-n) % n_shards
    if pad:
        pad3 = lambda x: jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
        origins, directions = pad3(origins), pad3(directions)
        pixel_ids = pad3(pixel_ids)

    if geom_axis is not None:
        shard_T = scene.tri_v0.shape[0] // mesh.shape[geom_axis]
        assert shard_T * mesh.shape[geom_axis] == scene.tri_v0.shape[0], (
            "padded triangle count must divide the geom axis; "
            "use load_scene(pad_to=...) accordingly"
        )
        cfg = dataclasses.replace(
            cfg, geom_axis=geom_axis, geom_axis_size=mesh.shape[geom_axis]
        )

    ray_spec = P(axes)
    scene_spec = scene_partition_specs(scene, geom_axis)

    if jax.process_count() > 1:
        # a cross-process mesh needs GLOBAL arrays; every input here is
        # host-replicated by construction (same scene file, same camera,
        # same seed on every process), so each process just materializes
        # its addressable shards
        from pathtracerpython_tpu.parallel import multihost

        origins = multihost.to_global(origins, mesh, ray_spec)
        directions = multihost.to_global(directions, mesh, ray_spec)
        pixel_ids = multihost.to_global(pixel_ids, mesh, ray_spec)
        base_key = multihost.to_global(base_key, mesh, P())
        scene = jax.tree_util.tree_map(
            lambda leaf, sp: multihost.to_global(leaf, mesh, sp),
            scene, scene_spec,
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(ray_spec, ray_spec, ray_spec, scene_spec, P()),
        out_specs=ray_spec,
        check_vma=False,
    )
    def go(o, d, pids, sc, key):
        return render_rays(o, d, pids, sc, cfg, key)

    out = go(origins, directions, pixel_ids, scene, base_key)
    return out[:n] if pad else out


def render_sharded(
    scene: SceneArrays,
    cfg: RenderConfig,
    mesh: Mesh,
    seed: int = 0,
    dp_axis="dp",
    geom_axis: str | None = None,
) -> jax.Array:
    """Sharded render of the scene's camera view → radiance [W*H, 3] in the
    reference's pixel order. Drop-in distributed form of ``render.render``."""
    from pathtracerpython_tpu.render.integrator import check_counter_space

    base_key = jax.random.PRNGKey(seed)
    w, h = scene.meta.width, scene.meta.height
    check_counter_space(w * h, cfg.n_samples)  # global ids drive the RNG
    origins, dirs = make_primary_rays(scene.eye, scene.ortho, w, h)
    pixel_ids = jnp.arange(w * h, dtype=jnp.int32)
    return render_rays_sharded(
        origins, dirs, pixel_ids, scene, cfg, base_key, mesh,
        dp_axis=dp_axis, geom_axis=geom_axis,
    )
