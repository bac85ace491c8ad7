"""Adaptive distance-field refinement (recursive_kernel equivalent)."""

import numpy as np
import jax.numpy as jnp

from legmov_tpu import get_moonbot_leg, get_m2_leg
from legmov_tpu.models.adaptive_field import adaptive_distance_field
from legmov_tpu.ops.distance import distance_batch
from legmov_tpu.ops.reachability import reachability_batch
from bench import make_grid


def test_exact_reachability_with_fewer_evals():
    leg = get_moonbot_leg()
    pts = np.asarray(make_grid(1 << 18))
    f = adaptive_distance_field(pts, leg, max_depth=6)
    want = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    np.testing.assert_array_equal(f.reachable, want)
    # the boundary is a 2-D surface: exact evals shrink sub-linearly
    assert f.evals < pts.shape[0] // 3


def test_boundary_points_exact_distance():
    leg = get_m2_leg()
    pts = np.asarray(make_grid(1 << 14))
    f = adaptive_distance_field(pts, leg, max_depth=5)
    ok, vec = distance_batch(jnp.asarray(pts), leg)
    vec = np.asarray(vec)
    np.testing.assert_allclose(
        f.distance[f.exact_mask], vec[f.exact_mask], rtol=0, atol=0
    )
    np.testing.assert_array_equal(f.reachable, np.asarray(ok))


def test_exact_all_mode():
    leg = get_moonbot_leg()
    pts = np.asarray(make_grid(1 << 12))
    f = adaptive_distance_field(pts, leg, max_depth=4, exact="all")
    ok, vec = distance_batch(jnp.asarray(pts), leg)
    assert f.exact_mask.all()
    np.testing.assert_allclose(f.distance, np.asarray(vec), rtol=0, atol=0)


def test_empty_input():
    f = adaptive_distance_field(
        np.zeros((0, 3), np.float32), get_moonbot_leg()
    )
    assert f.reachable.shape == (0,)
    assert f.evals == 0
