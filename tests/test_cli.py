"""CLI + offline viz smoke tests (flag parity with the reference CLI)."""

import os

import numpy as np
import pytest

from pathtracerpython_tpu.cli.main import main, setup


def test_flags_match_reference_surface():
    """The reference's flags (main.py:125-139) all parse."""
    args = setup([
        "scene.sdl", "--out", "x.png", "-r", "4", "-b", "3",
        "--show-img", "--show-scene", "--show-normals", "--show-screen",
        "--show-inter",
    ])
    assert args.scene == "scene.sdl"
    assert args.rays_per_pixel == 4
    assert args.bounces == 3
    assert args.show_img and args.show_scene and args.show_normals
    assert args.show_screen and args.show_inter


def test_render_to_png(cornell_sdl, tmp_path):
    out = str(tmp_path / "o.png")
    rc = main([cornell_sdl, "--out", out, "-r", "1", "-b", "1", "--quiet"])
    assert rc == 0
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (40, 40, 3)
    assert img.max() > 0


def test_debug_view_written(cornell_sdl, tmp_path):
    out = str(tmp_path / "o.png")
    rc = main([
        cornell_sdl, "--out", out, "-r", "1", "-b", "1", "--quiet",
        "--show-scene", "--show-inter",
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "o_scene.png"))


def test_sharded_render_flag(cornell_sdl, tmp_path):
    out = str(tmp_path / "o.png")
    rc = main([
        cornell_sdl, "--out", out, "-r", "1", "-b", "1", "--quiet",
        "--dp", "4", "--geom", "2",
    ])
    assert rc == 0
    assert os.path.exists(out)
