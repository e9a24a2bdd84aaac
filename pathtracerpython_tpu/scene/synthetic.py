"""Procedural scene generation (large-mesh benchmarking & tests).

The reference ships only the 32-triangle Cornell box; the BASELINE
multi-host config needs ~100k triangles. This module builds Cornell-like
box-field scenes of arbitrary triangle count as ``SceneDescription``s, so
they flow through the exact same packing/render path as parsed SDL files.
"""

from __future__ import annotations

import numpy as np

from pathtracerpython_tpu.scene.obj import ObjMesh, mesh_from_arrays
from pathtracerpython_tpu.scene.sdl import SceneDescription, SdlObject

_BOX_FACES = np.asarray(
    [
        [0, 1, 2], [0, 2, 3],  # bottom (y-)
        [4, 6, 5], [4, 7, 6],  # top (y+)
        [0, 4, 5], [0, 5, 1],  # z-
        [3, 2, 6], [3, 6, 7],  # z+
        [1, 5, 6], [1, 6, 2],  # x+
        [0, 3, 7], [0, 7, 4],  # x-
    ],
    dtype=np.int32,
)


def box_mesh(center, half, path: str = "box") -> ObjMesh:
    """12-triangle axis-aligned box."""
    c = np.asarray(center, np.float64)
    h = np.asarray(half, np.float64)
    corners = np.asarray(
        [
            [-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1],
            [-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1],
        ],
        np.float64,
    )
    return mesh_from_arrays(c + corners * h, _BOX_FACES, path=path)


def quad_mesh(p0, p1, p2, p3, path: str = "quad") -> ObjMesh:
    return mesh_from_arrays(
        np.asarray([p0, p1, p2, p3], np.float64),
        np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
        path=path,
    )


def box_field_scene(
    n_boxes: int = 64,
    extent: float = 8.0,
    seed: int = 0,
    width: int = 64,
    height: int = 64,
) -> SceneDescription:
    """A floor, a ceiling light, and ``n_boxes`` jittered boxes
    (12 triangles each) — ~``12 * n_boxes + 4`` triangles total.

    One SDL object holds all boxes (one shared material), so triangle
    count scales without blowing up the material table.
    """
    rng = np.random.default_rng(seed)
    e = extent

    centers = rng.uniform([-e, -0.8, -2 * e], [e, 0.8, -0.5], (n_boxes, 3))
    halves = rng.uniform(0.05, 0.25, (n_boxes, 3))

    verts, faces = [], []
    off = 0
    for c, h in zip(centers, halves):
        m = box_mesh(c, h)
        verts.append(m.vertices)
        faces.append(m.faces + off)
        off += m.vertices.shape[0]
    boxes = mesh_from_arrays(
        np.concatenate(verts), np.concatenate(faces), path="boxes"
    )

    floor = quad_mesh(
        [-e, -1.0, 0.5], [e, -1.0, 0.5], [e, -1.0, -2 * e],
        [-e, -1.0, -2 * e], path="floor",
    )
    light = quad_mesh(
        [-0.6, 1.4, -e], [0.6, 1.4, -e], [0.6, 1.4, -e + 1.2],
        [-0.6, 1.4, -e + 1.2], path="light",
    )

    return SceneDescription(
        eye=(0.0, 0.0, 3.0),
        width=width,
        height=height,
        ortho=(-1.0, -1.0, 1.0, 1.0),
        ambient=0.4,
        light_mesh=light,
        light_color=(1.0, 1.0, 1.0),
        objects=[
            SdlObject(mesh=floor, rgb=(0.7, 0.7, 0.7), ka=0.4, kd=0.6,
                      ks=0.0, kt=0.0, n=1.0),
            SdlObject(mesh=boxes, rgb=(0.6, 0.45, 0.3), ka=0.3, kd=0.7,
                      ks=0.0, kt=0.0, n=1.0),
        ],
        path=f"synthetic://box_field(n={n_boxes},seed={seed})",
    )
