"""Terrain / pointcloud generators (host-side data prep).

Functional re-derivation of the reference's map toolchain (maps.py,
perlinnumpy2d.py): Perlin / fractal noise, flat grids with obstacles,
staircases, fences, and the crater-and-cliff "moon ground" map.  Unlike the
reference (module-level script with global RNG state), everything here is a
pure function of an explicit seed.
"""

from legmov_tpu.terrain.perlin import (
    perlin_noise_2d,
    fractal_noise_2d,
)
from legmov_tpu.terrain.maps import (
    random_scatter,
    flat_grid,
    obstacle_map,
    step_map,
    fence_map,
    clip_to_sphere,
    moon_ground,
)

__all__ = [
    "perlin_noise_2d",
    "fractal_noise_2d",
    "random_scatter",
    "flat_grid",
    "obstacle_map",
    "step_map",
    "fence_map",
    "clip_to_sphere",
    "moon_ground",
]
