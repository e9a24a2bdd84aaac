"""Scene I/O: SDL + OBJ parsing into flat SoA arrays.

Replaces the reference's ``scene_reader.py`` (object dicts of ``V``-tuples)
with numpy SoA buffers ready for device upload.
"""

from pathtracerpython_tpu.scene.obj import ObjMesh, load_obj  # noqa: F401
from pathtracerpython_tpu.scene.sdl import SceneDescription, load_sdl  # noqa: F401
from pathtracerpython_tpu.scene.arrays import (  # noqa: F401
    SceneArrays,
    SceneMeta,
    load_scene,
    pack_scene,
)
