"""Inverse-rendering applications (BASELINE.json configs 3-4).

Runnable demos built on ``diff.fit``: recover wall albedos from a target
image, and optimize a cube's pose via vertex-position gradients.
"""
