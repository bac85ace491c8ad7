"""Reachability: JAX path vs the strict-fp32 NumPy oracle + analytic checks."""

import numpy as np
import jax.numpy as jnp
import pytest

from legmov_tpu import get_moonbot_leg, get_m2_leg, reachability_batch
from legmov_tpu.oracle import oracle_reachability

f32 = np.float32

LEGS = {"moonbot": get_moonbot_leg, "m2": get_m2_leg}


def _random_points(rng, n):
    """Points spanning the workspace shell and beyond (mm)."""
    return np.stack(
        [
            rng.uniform(-700, 700, n),
            rng.uniform(-700, 700, n),
            rng.uniform(-700, 700, n),
        ],
        axis=-1,
    ).astype(f32)


@pytest.mark.parametrize("name", list(LEGS))
def test_matches_oracle_bitexact(rng, name):
    leg = LEGS[name]()
    pts = _random_points(rng, 2048)
    got = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    want = oracle_reachability(pts, leg)
    mism = np.flatnonzero(got != want)
    assert mism.size == 0, f"{mism.size} mismatches, first at {pts[mism[:5]]}"
    # sanity: the sample actually covers both classes
    assert want.any() and (~want).any()


@pytest.mark.parametrize("name", list(LEGS))
def test_near_workspace_dense(rng, name):
    """Dense band around the leg where most of the boundary structure lives."""
    leg = LEGS[name]()
    pts = np.stack(
        [
            rng.uniform(0, 550, 2048),
            rng.uniform(-350, 350, 2048),
            rng.uniform(-400, 200, 2048),
        ],
        axis=-1,
    ).astype(f32)
    got = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    want = oracle_reachability(pts, leg)
    np.testing.assert_array_equal(got, want)
    assert want.any() and (~want).any()


def test_far_points_unreachable():
    leg = get_moonbot_leg()
    reach_max = float(leg.body + leg.coxa_length + leg.femur_length + leg.tibia_length)
    pts = np.array(
        [
            [reach_max + 10.0, 0, 0],
            [0, reach_max + 10.0, 0],
            [0, 0, -(reach_max + 10.0)],
            [1e4, 1e4, 1e4],
        ],
        f32,
    )
    out = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    assert not out.any()


def test_coxa_yaw_limit():
    """Points behind the +-60deg coxa cone are unreachable."""
    leg = get_moonbot_leg()
    r = 250.0
    ang_ok = np.deg2rad(50.0)
    ang_bad = np.deg2rad(70.0)
    body = float(leg.body)
    pts = np.array(
        [
            [body + r * np.cos(ang_ok), r * np.sin(ang_ok), -120.0],
            [body + r * np.cos(ang_bad), r * np.sin(ang_bad), -120.0],
        ],
        f32,
    )
    out = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    assert bool(out[0])
    assert not bool(out[1])


def test_tibia_absolute_limit_blocks_horizontal():
    """Moonbot tibia must point down (abs in [-175, -5] deg): a straight
    horizontal pose (abs angle 0) is out of the workspace even though all
    joint limits alone would allow it."""
    leg = get_moonbot_leg()
    x = float(leg.body + leg.coxa_length + leg.femur_length + leg.tibia_length) - 0.5
    out = np.asarray(reachability_batch(jnp.asarray([[x, 0.0, 0.0]], dtype=jnp.float32), leg))
    assert not bool(out[0])


def test_nonfinite_points_unreachable_no_crash():
    """NaN/inf coordinates must report unreachable (and never poison
    neighboring lanes), across the XLA and Pallas paths."""
    import jax.numpy as jnp
    from legmov_tpu import distance_batch, forward_kinematics
    from legmov_tpu.ops.pallas_kernels import make_reachability_kernel

    leg = get_moonbot_leg()
    good = np.asarray(
        forward_kinematics(jnp.array([0.0, -0.3, 0.3], jnp.float32), leg)
    )
    pts = np.array(
        [
            [np.nan, 0, 0],
            [np.inf, 0, 0],
            [-np.inf, 0, 0],
            [0, np.nan, np.inf],
            good,
        ],
        np.float32,
    )
    want = [False, False, False, False, True]
    r = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    np.testing.assert_array_equal(r, want)
    ok, vec = distance_batch(jnp.asarray(pts), leg)
    np.testing.assert_array_equal(np.asarray(ok), want)
    kr = make_reachability_kernel(leg, interpret=True)
    np.testing.assert_array_equal(np.asarray(kr(jnp.asarray(pts))), want)


def test_empty_batch():
    import jax.numpy as jnp

    leg = get_moonbot_leg()
    out = np.asarray(
        reachability_batch(jnp.zeros((0, 3), jnp.float32), leg)
    )
    assert out.shape == (0,)


def test_golden_boundary_points_on_x_axis():
    """Reference one_leg.cpp:100-139 methodology: on the x axis, points at
    body + coxa +- (min|max)_femur_to_gripper +- eps must flip reachability
    exactly at the workspace boundary (eps well outside CIRCLE_MARGIN)."""
    import jax.numpy as jnp

    leg = get_moonbot_leg()
    body = float(np.asarray(leg.body))
    coxa = float(np.asarray(leg.coxa_length))
    fem = float(np.asarray(leg.femur_length))
    tib = float(np.asarray(leg.tibia_length))
    min_tib = float(np.asarray(leg.min_angle_tibia))
    # min femur->tip distance (leg_geometry.cu.h:12-25)
    mx = fem + tib * np.cos(min_tib)
    my = tib * np.sin(min_tib)
    min_fg = float(np.hypot(mx, my))
    # at z = 0 the far boundary is NOT full extension (the absolute-tibia
    # limit forbids a horizontal tibia): it is the fromabove+ circle,
    # center tib*(cos,sin)(abs_pos), radius femur (circles.cu.h:98-106)
    abs_pos = float(np.asarray(leg.tibia_absolute_pos))
    fa_cx = tib * np.cos(abs_pos)
    fa_cy = tib * np.sin(abs_pos)
    max_x = float(fa_cx + np.sqrt(fem * fem - fa_cy * fa_cy))
    eps = 0.5  # mm

    pts = np.array(
        [
            [body + coxa + max_x - eps, 0.0, 0.0],  # just inside the far edge
            [body + coxa + max_x + eps, 0.0, 0.0],  # just outside
            [body + coxa + min_fg + eps, 0.0, 0.0],  # just outside inner
            [body + coxa + min_fg - eps, 0.0, 0.0],  # just inside inner
        ],
        np.float32,
    )
    got = np.asarray(reachability_batch(jnp.asarray(pts), leg))
    np.testing.assert_array_equal(got, [True, False, True, False])

    # the distance magnitude at the just-outside points must be ~eps
    from legmov_tpu import distance_batch

    _, vec = distance_batch(jnp.asarray(pts[[1]]), leg)
    assert abs(float(np.linalg.norm(np.asarray(vec))) - eps) < 0.05
