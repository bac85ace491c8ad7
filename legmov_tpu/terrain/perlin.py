"""Vectorized 2-D Perlin and fractal noise.

Same algorithm as the reference's vendored generator
(perlinnumpy2d.py:8-96): per-cell random gradient directions, quintic
interpolant ``6t^5 - 15t^4 + 10t^3``, octave stacking with persistence /
lacunarity.  RNG is an explicit ``numpy.random.Generator`` instead of
global state.
"""

from __future__ import annotations

import numpy as np


def _interpolant(t: np.ndarray) -> np.ndarray:
    return t * t * t * (t * (t * 6 - 15) + 10)


def perlin_noise_2d(
    shape: tuple[int, int],
    res: tuple[int, int],
    rng: np.random.Generator,
    tileable: tuple[bool, bool] = (False, False),
) -> np.ndarray:
    """Perlin noise array of ``shape``; ``shape`` must be a multiple of ``res``."""
    if shape[0] % res[0] or shape[1] % res[1]:
        raise ValueError(f"shape {shape} not a multiple of res {res}")
    delta = (res[0] / shape[0], res[1] / shape[1])
    d = (shape[0] // res[0], shape[1] // res[1])
    grid = (
        np.mgrid[0 : res[0] : delta[0], 0 : res[1] : delta[1]].transpose(1, 2, 0)
        % 1
    )
    angles = 2 * np.pi * rng.random((res[0] + 1, res[1] + 1))
    gradients = np.dstack((np.cos(angles), np.sin(angles)))
    if tileable[0]:
        gradients[-1, :] = gradients[0, :]
    if tileable[1]:
        gradients[:, -1] = gradients[:, 0]
    gradients = gradients.repeat(d[0], 0).repeat(d[1], 1)
    g00 = gradients[: -d[0], : -d[1]]
    g10 = gradients[d[0]:, : -d[1]]
    g01 = gradients[: -d[0], d[1]:]
    g11 = gradients[d[0]:, d[1]:]
    n00 = np.sum(np.dstack((grid[:, :, 0], grid[:, :, 1])) * g00, 2)
    n10 = np.sum(np.dstack((grid[:, :, 0] - 1, grid[:, :, 1])) * g10, 2)
    n01 = np.sum(np.dstack((grid[:, :, 0], grid[:, :, 1] - 1)) * g01, 2)
    n11 = np.sum(np.dstack((grid[:, :, 0] - 1, grid[:, :, 1] - 1)) * g11, 2)
    t = _interpolant(grid)
    n0 = n00 * (1 - t[:, :, 0]) + t[:, :, 0] * n10
    n1 = n01 * (1 - t[:, :, 0]) + t[:, :, 0] * n11
    return np.sqrt(2) * ((1 - t[:, :, 1]) * n0 + t[:, :, 1] * n1)


def fractal_noise_2d(
    shape: tuple[int, int],
    res: tuple[int, int],
    rng: np.random.Generator,
    octaves: int = 1,
    persistence: float = 0.5,
    lacunarity: int = 2,
    tileable: tuple[bool, bool] = (False, False),
) -> np.ndarray:
    """Octave-stacked Perlin noise (perlinnumpy2d.py:60-96 semantics)."""
    noise = np.zeros(shape)
    frequency = 1
    amplitude = 1.0
    for _ in range(octaves):
        noise += amplitude * perlin_noise_2d(
            shape,
            (frequency * res[0], frequency * res[1]),
            rng,
            tileable,
        )
        frequency *= lacunarity
        amplitude *= persistence
    return noise
