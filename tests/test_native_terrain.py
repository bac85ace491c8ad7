"""Native terrain data-loader parity: the OpenMP crater/Perlin paths
(native/legmov_native.cpp moon_craters/perlin2d) must reproduce the
NumPy implementations to FP-contraction tolerance, and moon_ground must
produce the same surface through either backend (RNG draws stay in
NumPy, so the sphere/gradient inputs are identical)."""

import numpy as np
import pytest

from legmov_tpu import native
from legmov_tpu.terrain import perlin as P
from legmov_tpu.terrain.maps import _clip_to_sphere_inplace

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_perlin2d_matches_numpy():
    rng = np.random.default_rng(5)
    shape, res = (256, 128), (8, 4)
    theta = rng.uniform(0, 2 * np.pi, (res[0] + 1, res[1] + 1))
    grad = np.stack([np.cos(theta), np.sin(theta)], -1)
    got = native.perlin2d(shape, grad)
    cell = (shape[0] // res[0], shape[1] // res[1])
    ii, jj = np.arange(shape[0]), np.arange(shape[1])
    i0, j0 = np.meshgrid(ii // cell[0], jj // cell[1], indexing="ij")
    u, v = np.meshgrid(
        (ii % cell[0]) / cell[0], (jj % cell[1]) / cell[1], indexing="ij"
    )
    fu, fv = P._fade(u), P._fade(v)
    want = np.zeros(shape)
    for di in (0, 1):
        wi = fu if di else 1.0 - fu
        for dj in (0, 1):
            wj = fv if dj else 1.0 - fv
            g = grad[i0 + di, j0 + dj]
            want += wi * wj * (g[..., 0] * (u - di) + g[..., 1] * (v - dj))
    want *= np.sqrt(2.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_moon_craters_matches_numpy_loop():
    xs = np.linspace(-2000, 2000, 173)
    ys = np.linspace(-1500, 2500, 211)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    ground = np.stack(
        [X.ravel(), Y.ravel(), np.zeros(X.size)], axis=-1
    )
    spheres = np.asarray(
        [
            [0.0, 0.0, -100.0, 800.0, 0.0],
            [500.0, 500.0, 100.0, 600.0, 1.0],
            [-700.0, 300.0, -50.0, 400.0, 0.0],
            [200.0, -900.0, -250.0, 350.0, 1.0],
        ]
    )
    want = ground.copy()
    for row in spheres:
        _clip_to_sphere_inplace(want, row[:3], row[3], down=row[4] > 0.5)
    z = np.ascontiguousarray(ground[:, 2])
    assert native.moon_craters(
        z, np.ascontiguousarray(ground[:, 0]),
        np.ascontiguousarray(ground[:, 1]), spheres,
    )
    np.testing.assert_allclose(z, want[:, 2], rtol=0, atol=1e-9)


def test_moon_ground_stable_stats():
    """moon_ground through the native loader keeps the committed
    surface statistics (same RNG draws feed both backends)."""
    from legmov_tpu.terrain import moon_ground

    t = moon_ground(shape=(256, 256))
    assert t.shape == (65536, 3)
    # landmark stats of the seed-42 256^2 moon map
    np.testing.assert_allclose(float(t[:, 2].max()), 1024.29, atol=1.0)
    np.testing.assert_allclose(float(t[:, 2].min()), -2778.93, atol=1.0)
