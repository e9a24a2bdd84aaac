#!/usr/bin/env python3
"""Run the reference renderer end-to-end and dump converged radiance.

Produces tests/golden/reference_r{R}_b{B}_seed{S}.npz holding the raw
per-pixel radiance (before make_image's min-max normalization) for the
40x40 Cornell scene, used by the radiance-allclose parity gate.

The reference is executed unmodified from /root/reference with:
  - ipdb / pyqtgraph stubbed (hard imports, not installed here);
  - multiprocessing replaced by a serial stand-in (one CPU in this box —
    the Pool only adds pickling overhead and breaks seeding);
  - `random` seeded for reproducibility;
  - utils.make_image wrapped to capture its radiance input.

Usage: python scripts/generate_reference_golden.py R B SEED [SCENE_SDL]

An optional 4th argument points at an alternative SDL (e.g. a copy of
cornellroom.sdl with ``size 128 128`` for the BASELINE config-0 shape);
the captured width/height land in the npz and the filename gains a
``_WxH`` suffix when not the native 40x40.
"""

import sys
import os
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = "/root/reference"
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")


class _SerialResult:
    def __init__(self, value):
        self._value = value

    def get(self):
        return self._value


class _SerialPool:
    def __init__(self, *_a, **_k):
        pass

    def apply_async(self, fn, args=()):
        return _SerialResult(fn(*args))

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def main():
    r, b, seed = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    scene_override = sys.argv[4] if len(sys.argv) > 4 else None

    ipdb = _stub("ipdb", set_trace=lambda *a, **k: None)
    ipdb.__main__ = _stub("ipdb.__main__", set_trace=lambda *a, **k: None)
    pg = _stub("pyqtgraph", mkQApp=lambda *a, **k: None)
    pg.opengl = _stub("pyqtgraph.opengl")
    # serial multiprocessing stand-in; ApplyResult type check in main.py
    # (`type(new_color) is ApplyResult`) must match our result class
    _stub("multiprocessing", Pool=_SerialPool, cpu_count=lambda: 1)
    _stub("multiprocessing.pool", ApplyResult=_SerialResult)
    sys.modules["multiprocessing"].pool = sys.modules["multiprocessing.pool"]

    import random

    random.seed(seed)
    np.random.seed(seed)

    sys.path.insert(0, REFERENCE_DIR)
    import main as ref_main  # noqa: E402

    captured = {}
    orig_make_image = ref_main.make_image

    def capture_make_image(x1, y1, x2, y2, width, height, intersections):
        captured["radiance"] = np.array([np.asarray(c, dtype=np.float64)
                                         for c, _ in intersections])
        captured["wh"] = (width, height)
        return orig_make_image(x1, y1, x2, y2, width, height, intersections)

    ref_main.make_image = capture_make_image

    scene_path = scene_override or os.path.join(
        REFERENCE_DIR, "objs", "cornellroom.sdl")
    out_png = f"/tmp/ref_golden_r{r}_b{b}_s{seed}.png"
    sys.argv = ["main.py", scene_path, "--out", out_png,
                "-r", str(r), "-b", str(b)]

    t0 = time.time()
    ref_main.main()
    dt = time.time() - t0

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    w, h = captured["wh"]
    suffix = "" if (w, h) == (40, 40) else f"_{w}x{h}"
    out = os.path.join(
        GOLDEN_DIR, f"reference_r{r}_b{b}_seed{seed}{suffix}.npz")
    np.savez_compressed(
        out,
        radiance=captured["radiance"],
        r=r, b=b, seed=seed, width=w, height=h,
        wall_seconds=dt,
    )
    print(f"wrote {out} ({dt:.1f}s, {captured['radiance'].shape})")


if __name__ == "__main__":
    main()
