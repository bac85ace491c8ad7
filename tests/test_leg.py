"""Leg parameter construction and forward kinematics."""

import numpy as np
import jax.numpy as jnp

from legmov_tpu import get_moonbot_leg, get_m2_leg, forward_kinematics
from legmov_tpu.oracle import oracle_forward_kinematics

f32 = np.float32


def test_moonbot_leg_values():
    leg = get_moonbot_leg()
    assert float(leg.body) == 181.0
    assert float(leg.coxa_length) == f32(65.5)
    assert float(leg.femur_length) == 129.0
    assert float(leg.tibia_length) == 160.0
    assert float(leg.coxa_pitch) == 0.0
    # tibia_absolute_pos = -5 deg
    np.testing.assert_allclose(float(leg.tibia_absolute_pos),
                               np.deg2rad(-5.0), rtol=1e-6)
    # tibia_absolute_neg = (-180 - (-5))/180*pi = -175 deg
    np.testing.assert_allclose(float(leg.tibia_absolute_neg),
                               np.deg2rad(-175.0), rtol=1e-6)
    np.testing.assert_allclose(float(leg.max_angle_coxa), np.deg2rad(60), rtol=1e-6)
    np.testing.assert_allclose(float(leg.min_angle_tibia), np.deg2rad(-120), rtol=1e-6)


def test_m2_leg_values():
    leg = get_m2_leg()
    np.testing.assert_allclose(float(leg.coxa_pitch), np.deg2rad(-45), rtol=1e-6)
    # absolute limits are shifted by -coxa_pitch
    np.testing.assert_allclose(
        float(leg.tibia_absolute_pos), np.deg2rad(-5.0 + 45.0), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(leg.tibia_absolute_neg), np.deg2rad(-175.0 + 45.0), rtol=1e-6
    )
    assert float(leg.tibia_length) == 135.0


def test_fk_straight_leg():
    leg = get_moonbot_leg()
    tip = forward_kinematics(jnp.zeros((3,), jnp.float32), leg)
    expected = float(leg.body + leg.coxa_length + leg.femur_length + leg.tibia_length)
    np.testing.assert_allclose(np.asarray(tip), [expected, 0.0, 0.0], atol=1e-3)


def test_fk_matches_oracle(rng):
    leg = get_moonbot_leg()
    angles = rng.uniform(-1.5, 1.5, size=(64, 3)).astype(f32)
    got = np.asarray(forward_kinematics(jnp.asarray(angles), leg))
    want = np.stack([oracle_forward_kinematics(a[0], a[1], a[2], leg)
                     for a in angles])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_fk_batch_shape():
    leg = get_moonbot_leg()
    out = forward_kinematics(jnp.zeros((5, 7, 3), jnp.float32), leg)
    assert out.shape == (5, 7, 3)


def test_stats_helpers():
    from legmov_tpu.stats import close, mean_stddev, median

    assert median([3.0, 1.0, 2.0]) == 2.0
    assert median([4.0, 1.0, 2.0, 3.0]) == 2.5
    m, s = mean_stddev([2.0, 4.0])
    assert m == 3.0 and s == 1.0
    assert close(1.0, 1.0 + 1e-6) and not close(1.0, 1.1)
