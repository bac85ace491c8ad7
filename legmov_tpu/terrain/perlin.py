"""Gradient (Perlin) and fractal noise on a 2-D pixel grid.

Capability twin of the noise generator the reference vendors for its moon
terrain (perlinnumpy2d.py, itself from the public pvigier/perlin-numpy
library): random unit gradients on a coarse lattice, quintic-faded
interpolation of the four corner dot products, octave stacking.

This implementation is written corner-wise rather than lerp-wise: each
pixel's value is the sum over its cell's four lattice corners of
``weight(corner) * <gradient(corner), pixel - corner>`` with separable
fade weights — algebraically the same surface, structured around lattice
indexing instead of array-repeat tricks.  RNG is an explicit
``numpy.random.Generator``.
"""

from __future__ import annotations

import numpy as np


def _fade(t: np.ndarray) -> np.ndarray:
    """Quintic smoothstep 6t^5 - 15t^4 + 10t^3 (zero 1st/2nd derivative
    at cell boundaries, the classic improved-Perlin interpolant)."""
    return t * t * t * (t * (6.0 * t - 15.0) + 10.0)


def perlin_noise_2d(
    shape: tuple[int, int],
    res: tuple[int, int],
    rng: np.random.Generator,
    tileable: tuple[bool, bool] = (False, False),
) -> np.ndarray:
    """Perlin noise array of ``shape``; ``shape`` must be a multiple of ``res``.

    ``res`` is the lattice resolution (number of gradient cells per axis);
    ``tileable`` wraps the gradient lattice on the given axis so the
    output tiles seamlessly.  Output is in roughly [-1, 1] (sqrt(2)
    normalization of the unit-gradient dot products).
    """
    if shape[0] % res[0] or shape[1] % res[1]:
        raise ValueError(f"shape {shape} not a multiple of res {res}")
    cell = (shape[0] // res[0], shape[1] // res[1])

    # one random unit gradient per lattice node
    theta = rng.uniform(0.0, 2.0 * np.pi, size=(res[0] + 1, res[1] + 1))
    grad = np.stack([np.cos(theta), np.sin(theta)], axis=-1)
    if tileable[0]:
        grad[-1, :] = grad[0, :]
    if tileable[1]:
        grad[:, -1] = grad[:, 0]

    # native OpenMP per-pixel path (same corner order/arithmetic; the
    # RNG draws above stay in NumPy so terrains are reproducible across
    # backends to FP-contraction tolerance)
    from legmov_tpu import native

    fast = native.perlin2d(shape, grad)
    if fast is not None:
        return fast

    # pixel -> owning lattice cell + fractional position inside it
    ii = np.arange(shape[0])
    jj = np.arange(shape[1])
    i0, j0 = np.meshgrid(ii // cell[0], jj // cell[1], indexing="ij")
    u, v = np.meshgrid(
        (ii % cell[0]) / cell[0], (jj % cell[1]) / cell[1], indexing="ij"
    )

    fu, fv = _fade(u), _fade(v)
    out = np.zeros(shape)
    for di in (0, 1):
        wi = fu if di else 1.0 - fu
        for dj in (0, 1):
            wj = fv if dj else 1.0 - fv
            g = grad[i0 + di, j0 + dj]
            out += wi * wj * (
                g[..., 0] * (u - di) + g[..., 1] * (v - dj)
            )
    return np.sqrt(2.0) * out


def fractal_noise_2d(
    shape: tuple[int, int],
    res: tuple[int, int],
    rng: np.random.Generator,
    octaves: int = 1,
    persistence: float = 0.5,
    lacunarity: int = 2,
    tileable: tuple[bool, bool] = (False, False),
) -> np.ndarray:
    """Sum of ``octaves`` Perlin layers with geometrically increasing
    lattice frequency (x ``lacunarity``) and decreasing amplitude
    (x ``persistence``)."""
    return sum(
        persistence**o
        * perlin_noise_2d(
            shape,
            (res[0] * lacunarity**o, res[1] * lacunarity**o),
            rng,
            tileable,
        )
        for o in range(octaves)
    )
