"""Pallas kernel parity vs the XLA path (interpret mode on CPU).

The real-TPU numbers come from bench.py; here the kernels run through the
Pallas interpreter so CI validates the math, not the lowering.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from legmov_tpu import get_m2_leg, get_moonbot_leg
from legmov_tpu.ops.distance import distance_batch
from legmov_tpu.ops.pallas_kernels import (
    make_distance_kernel,
    make_reachability_kernel,
)
from legmov_tpu.ops.reachability import reachability_batch

LEGS = {"moonbot": get_moonbot_leg, "m2": get_m2_leg}


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(11)
    return jnp.asarray(rng.uniform(-650, 650, (20000, 3)).astype(np.float32))


@pytest.mark.parametrize("name", list(LEGS))
def test_reachability_parity(name, pts):
    leg = LEGS[name]()
    kr = make_reachability_kernel(leg, interpret=True)
    got = np.asarray(kr(pts))
    want = np.asarray(reachability_batch(pts, leg))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name", list(LEGS))
def test_distance_parity(name, pts):
    leg = LEGS[name]()
    kd = make_distance_kernel(leg, interpret=True)
    ok_g, v_g = kd(pts)
    ok_w, v_w = distance_batch(pts, leg)
    np.testing.assert_array_equal(np.asarray(ok_g), np.asarray(ok_w))
    v_g, v_w = np.asarray(v_g), np.asarray(v_w)
    # norms must agree tightly; full vectors may flip between equidistant
    # boundary candidates at fp32 ties (same tolerance as the oracle tests)
    np.testing.assert_allclose(
        np.linalg.norm(v_g, axis=1), np.linalg.norm(v_w, axis=1),
        rtol=5e-4, atol=2e-2,
    )
    comp_ok = np.all(np.abs(v_g - v_w) <= 2e-2 + 2e-4 * np.abs(v_w), axis=-1)
    assert comp_ok.mean() > 0.995


def test_ragged_tail(pts):
    """N not a multiple of the block must pad/slice correctly."""
    leg = get_m2_leg()
    kr = make_reachability_kernel(leg, interpret=True)
    for n in (1, 7, 129, 1000):
        sub = pts[:n]
        got = np.asarray(kr(sub))
        want = np.asarray(reachability_batch(sub, leg))
        np.testing.assert_array_equal(got, want)


def test_soa_entries_match_aos(pts):
    leg = get_m2_leg()
    kr = make_reachability_kernel(leg, interpret=True)
    x, y, z = (jnp.asarray(np.ascontiguousarray(np.asarray(pts)[:, i]))
               for i in range(3))
    np.testing.assert_array_equal(
        np.asarray(kr.soa(x, y, z)), np.asarray(kr(pts))
    )
    kd = make_distance_kernel(leg, interpret=True)
    ok_s, dx, dy, dz = kd.soa(x, y, z)
    ok_a, vec = kd(pts)
    np.testing.assert_array_equal(np.asarray(ok_s), np.asarray(ok_a))
    np.testing.assert_array_equal(
        np.stack([np.asarray(dx), np.asarray(dy), np.asarray(dz)], -1),
        np.asarray(vec),
    )


@pytest.mark.parametrize("name", list(LEGS))
def test_reachability_interval_collapse_bitexact(name, pts):
    """The interval-collapsed circle-validity form (default, r5) must be
    BIT-identical to the full 3-compare form AND the XLA path, including
    on NaN/inf inputs (where ``~inside | near`` is True for NaN t — the
    collapsed form preserves that via ``~(t <= lo2)``)."""
    leg = LEGS[name]()
    p = np.asarray(pts).copy()
    rng = np.random.default_rng(3)
    p[:32] = np.array([np.nan, np.inf, -np.inf, 0.0], np.float32)[
        rng.integers(0, 4, (32, 3))
    ]
    p = jnp.asarray(p)
    k_new = make_reachability_kernel(leg, interpret=True, interval_valid=True)
    k_old = make_reachability_kernel(leg, interpret=True, interval_valid=False)
    got = np.asarray(k_new(p))
    np.testing.assert_array_equal(got, np.asarray(k_old(p)))
    np.testing.assert_array_equal(got, np.asarray(reachability_batch(p, leg)))


@pytest.mark.parametrize("name", list(LEGS))
def test_distance_plain_variant_parity(name, pts):
    """The un-optimized kernel variant (no rsqrt clamp, sequential corner
    loop) must also keep the tolerance contract — both variants stay
    covered since the optimized one is now the default
    (test_distance_parity)."""
    leg = LEGS[name]()
    kd = make_distance_kernel(leg, interpret=True, ablate=frozenset())
    ok_g, v_g = kd(pts)
    ok_w, v_w = distance_batch(pts, leg)
    np.testing.assert_array_equal(np.asarray(ok_g), np.asarray(ok_w))
    v_g, v_w = np.asarray(v_g), np.asarray(v_w)
    np.testing.assert_allclose(
        np.linalg.norm(v_g, axis=1), np.linalg.norm(v_w, axis=1),
        rtol=5e-4, atol=2e-2,
    )
    comp_ok = np.all(np.abs(v_g - v_w) <= 2e-2 + 2e-4 * np.abs(v_w), axis=-1)
    assert comp_ok.mean() > 0.995
