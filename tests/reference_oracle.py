"""Import the reference implementation as a test oracle.

The reference hard-imports ``ipdb`` (utils.py:3-5) and ``pyqtgraph``
(plot.py:2-3) which aren't installed; stub them so the pure-math modules
import. Nothing under /root/reference is modified.
"""

import sys
import types

REFERENCE_DIR = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def import_reference():
    """Return the reference's (utils, scene_reader, main, vector) modules."""
    ipdb = _stub("ipdb", set_trace=lambda *a, **k: None)
    _stub("ipdb.__main__", set_trace=lambda *a, **k: None)
    ipdb.__main__ = sys.modules["ipdb.__main__"]
    pg = _stub(
        "pyqtgraph",
        mkQApp=lambda *a, **k: None,
    )
    _stub("pyqtgraph.opengl")
    pg.opengl = sys.modules["pyqtgraph.opengl"]

    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import utils as ref_utils  # noqa: F401
    import scene_reader as ref_scene_reader  # noqa: F401
    import vector as ref_vector  # noqa: F401
    import main as ref_main  # noqa: F401

    return ref_utils, ref_scene_reader, ref_main, ref_vector
