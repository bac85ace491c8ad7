"""Foothold map generators.

Functional re-derivation of the reference's terrain script (maps.py):
random scatters, flat grids with rectangular holes, staircases, fences and
the crater/cliff/rock/Perlin "moon ground".  All return float32 ``[N, 3]``
pointclouds in millimetres.
"""

from __future__ import annotations

import numpy as np

from legmov_tpu.terrain.perlin import fractal_noise_2d

_f32 = np.float32


def random_scatter(
    x_range: tuple[float, float] = (-700.0, 4000.0),
    y_range: tuple[float, float] = (-700.0, 4000.0),
    density_per_m2: float = 16.0,
    seed: int = 42,
) -> np.ndarray:
    """Uniform random flat scatter (reference maps.py:12-27)."""
    rng = np.random.default_rng(seed)
    area = (x_range[1] - x_range[0]) * (y_range[1] - y_range[0])
    n = int(density_per_m2 * 1e-6 * area)
    x = rng.uniform(*x_range, size=n)
    y = rng.uniform(*y_range, size=n)
    return np.column_stack([x, y, np.zeros(n)]).astype(_f32)


def flat_grid(
    x_range: tuple[float, float] = (-700.0, 7000.0),
    y_range: tuple[float, float] = (-500.0, 501.0),
    pitch: float = 200.0,
    z: float = 0.0,
) -> np.ndarray:
    """Flat rectangular grid of footholds."""
    xs = np.arange(x_range[0], x_range[1], pitch)
    ys = np.arange(y_range[0], y_range[1], pitch)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel(), np.full(X.size, z)], axis=-1)
    return pts.astype(_f32)


def obstacle_map(
    hole: tuple[float, float, float, float] = (700.0, 4800.0, -500.0, 500.0),
    **grid_kw,
) -> np.ndarray:
    """Flat grid with a rectangular hole (reference ``obs_map``, maps.py:33-48).

    ``hole = (x_min, x_max, y_min, y_max)`` is removed (strict inequalities).
    """
    pts = flat_grid(**grid_kw)
    x, y = pts[:, 0], pts[:, 1]
    keep = ~((x > hole[0]) & (x < hole[1]) & (y > hole[2]) & (y < hole[3]))
    return pts[keep]


def step_map(
    tile_half: float = 500.0,
    pitch: float = 50.0,
    step_height: float = 300.0,
) -> np.ndarray:
    """Four-tile spiral staircase (reference maps.py:115-133)."""
    base = flat_grid(
        (-tile_half, tile_half + 1), (-tile_half, tile_half + 1), pitch
    )
    return np.concatenate(
        [
            base,
            base + np.array([2 * tile_half, 0, step_height], _f32),
            base + np.array([2 * tile_half, 2 * tile_half, 2 * step_height], _f32),
            base + np.array([0, 2 * tile_half, 3 * step_height], _f32),
        ]
    ).astype(_f32)


def fence_map(
    x_range: tuple[float, float] = (-500.0, 2001.0),
    y_range: tuple[float, float] = (-400.0, 401.0),
    pitch: float = 50.0,
    fence_x: float = 1000.0,
    fence_z: float = 200.0,
) -> np.ndarray:
    """Flat grid plus a line of elevated points (reference maps.py:136-166)."""
    ground = flat_grid(x_range, y_range, pitch)
    ys = np.arange(y_range[0], y_range[1], pitch)
    fence = np.stack(
        [np.full(ys.size, fence_x), ys, np.full(ys.size, fence_z)], axis=-1
    )
    return np.concatenate([ground, fence]).astype(_f32)


def clip_to_sphere(
    points: np.ndarray, center: np.ndarray, radius: float, down: bool = True
) -> np.ndarray:
    """Deform points inside a sphere onto its lower/upper cap.

    Semantics of reference ``clip2sphere`` (maps.py:173-185): points within
    ``radius`` of ``center`` are pushed down (crater) or up (dome) onto the
    sphere surface.  Returns a modified copy.
    """
    pts = points.copy()
    _clip_to_sphere_inplace(pts, center, radius, down)
    return pts


def _clip_to_sphere_inplace(pts, center, radius, down):
    """In-place clip_to_sphere body — squared-distance forms (no
    norm->square round trips, no [N, 3] temporaries, no output copy):
    the sequential 54-sphere crater loop over a 65M-point grid is the
    moon_ground hot path."""
    dx = pts[:, 0] - center[0]
    dy = pts[:, 1] - center[1]
    dz = pts[:, 2] - center[2]
    xy2 = dx * dx + dy * dy
    inside = xy2 + dz * dz <= radius * radius
    z = dz[inside] if down else -dz[inside]
    delta = np.sqrt(np.maximum(radius**2 - xy2[inside], 0.0)) + z
    sign = 1.0 if down else -1.0
    pts[inside, 2] -= sign * delta


def moon_ground(
    shape: tuple[int, int] = (256, 256),
    x_range: tuple[float, float] = (-2000.0, 2000.0),
    y_range: tuple[float, float] = (-6000.0, 2000.0),
    n_craters: int = 50,
    seed: int = 42,
    saturate_z: float = 1000.0,
) -> np.ndarray:
    """The reference's flagship terrain (maps.py:190-297): a dense grid with
    random sphere craters/domes, a big crater, a cliff, two rocks, then
    coarse (x300) and fine (x30) fractal Perlin noise, z saturated at 1m.
    """
    rng = np.random.default_rng(seed)
    xs = np.linspace(*x_range, shape[0])
    ys = np.linspace(*y_range, shape[1])
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    ground = np.stack(
        [X.ravel(), Y.ravel(), np.zeros(X.size)], axis=-1
    ).astype(np.float64)

    cr = rng.random((n_craters, 4))
    cr[:, 0] = cr[:, 0] * 4000 - 2000
    cr[:, 1] = cr[:, 1] * 4000 - 2000
    cr[:, 2] = cr[:, 2] * 300 - 400  # z in [-400, -100]
    cr[:, 3] = cr[:, 3] * 300 + 200  # radius in [200, 500]
    # full sphere sequence: the random field + the four landmark
    # features, rows of (cx, cy, cz, radius, down)
    spheres = np.concatenate(
        [
            np.concatenate(
                [cr, (cr[:, 2] > 0).astype(np.float64)[:, None]], axis=1
            ),
            np.asarray(
                [
                    [-2000.0, -3000.0, 300.0, 3000.0, 1.0],  # big crater
                    [2000.0, 4000.0, -800.0, 4000.0, 0.0],  # cliff
                    [1500.0, 0.0, -150.0, 1000.0, 0.0],  # big rock
                    [1500.0, -1000.0, -150.0, 700.0, 0.0],  # small rock
                ]
            ),
        ]
    )
    from legmov_tpu import native

    xcol = np.ascontiguousarray(ground[:, 0])
    ycol = np.ascontiguousarray(ground[:, 1])
    zcol = np.ascontiguousarray(ground[:, 2])
    if native.moon_craters(zcol, xcol, ycol, spheres):
        # native OpenMP data-loader path: parallel over points,
        # sequential over spheres (each point's z evolves independently)
        ground[:, 2] = zcol
    else:
        for row in spheres:
            _clip_to_sphere_inplace(ground, row[:3], row[3],
                                    down=row[4] > 0.5)

    coarse = fractal_noise_2d(
        shape, (8, 4), rng, octaves=5, persistence=0.35, lacunarity=2
    )
    ground[:, 2] += coarse.ravel() * 300.0
    ground[ground[:, 2] > saturate_z, 2] = saturate_z
    fine = fractal_noise_2d(
        shape, (32, 16), rng, octaves=3, persistence=0.2, lacunarity=2
    )
    ground[:, 2] += fine.ravel() * 30.0
    return ground.astype(_f32)
