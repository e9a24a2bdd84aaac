"""Command-line interface (drop-in for the reference's ``./main.py`` CLI)."""

from pathtracerpython_tpu.cli.main import main

__all__ = ["main"]
