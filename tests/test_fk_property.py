"""FK round-trip property tests — the reference's core oracle methodology.

Mirrors the strategy of reference one_leg.cpp:141-402 (not its code): every
tip position produced by forward kinematics from a joint triple strictly
inside all limits (including the absolute-tibia orientation limit) must be
reachable; FK targets generated with an epsilon-elongated tibia at full
extension must be unreachable and sit ~epsilon from the boundary.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from legmov_tpu import (
    get_moonbot_leg,
    forward_kinematics,
    reachability_batch,
    distance_batch,
)

f32 = np.float32


def _interior_joint_samples(leg, n_per_axis=12, margin=0.02):
    """Joint triples strictly inside coxa/femur/tibia AND absolute limits."""
    cx = np.linspace(
        float(leg.min_angle_coxa) + margin, float(leg.max_angle_coxa) - margin,
        n_per_axis)
    fm = np.linspace(
        float(leg.min_angle_femur) + margin, float(leg.max_angle_femur) - margin,
        n_per_axis)
    tb = np.linspace(
        float(leg.min_angle_tibia) + margin, float(leg.max_angle_tibia) - margin,
        n_per_axis)
    c, f, t = np.meshgrid(cx, fm, tb, indexing="ij")
    trip = np.stack([c.ravel(), f.ravel(), t.ravel()], axis=-1).astype(f32)
    absang = trip[:, 1] + trip[:, 2]
    keep = (absang > float(leg.tibia_absolute_neg) + margin) & (
        absang < float(leg.tibia_absolute_pos) - margin
    )
    return trip[keep]


def test_fk_interior_is_reachable():
    leg = get_moonbot_leg()
    trip = _interior_joint_samples(leg)
    assert len(trip) > 500
    tips = np.asarray(forward_kinematics(jnp.asarray(trip), leg))
    reach = np.asarray(reachability_batch(jnp.asarray(tips), leg))
    bad = np.flatnonzero(~reach)
    assert bad.size == 0, (
        f"{bad.size}/{len(trip)} interior FK targets unreachable, "
        f"first joints={trip[bad[:3]]} tips={tips[bad[:3]]}"
    )


@pytest.mark.parametrize("delta", [2.0, 10.0])
def test_fk_elongated_extension_unreachable_and_distance(delta):
    """Full extension (tibia joint = 0) with tibia + delta: target is delta
    outside the outer circle -> unreachable, distance norm ~ delta."""
    leg = get_moonbot_leg()
    long_leg = leg.replace(tibia_length=leg.tibia_length + f32(delta))
    margin = 0.05
    cx = np.linspace(float(leg.min_angle_coxa) + margin,
                     float(leg.max_angle_coxa) - margin, 9)
    # femur angle = absolute angle here (tibia joint at 0); stay inside both
    # the absolute-tibia band and the femur joint limits
    lo = max(float(leg.tibia_absolute_neg), float(leg.min_angle_femur)) + margin
    hi = min(float(leg.tibia_absolute_pos), float(leg.max_angle_femur)) - margin
    fm = np.linspace(lo, hi, 9)
    c, f = np.meshgrid(cx, fm, indexing="ij")
    trip = np.stack([c.ravel(), f.ravel(), np.zeros(c.size)], axis=-1).astype(f32)
    tips = np.asarray(forward_kinematics(jnp.asarray(trip), long_leg))

    reach = np.asarray(reachability_batch(jnp.asarray(tips), leg))
    assert not reach.any()

    ok, vec = distance_batch(jnp.asarray(tips), leg)
    assert not np.asarray(ok).any()
    norms = np.linalg.norm(np.asarray(vec), axis=-1)
    np.testing.assert_allclose(norms, delta, atol=0.05 + delta * 0.01)


def test_fk_interior_distance_is_interior():
    """Distance result for interior FK targets: valid flag set, and the
    boundary displacement is nonzero (strict interior)."""
    leg = get_moonbot_leg()
    trip = _interior_joint_samples(leg, n_per_axis=8, margin=0.1)
    tips = np.asarray(forward_kinematics(jnp.asarray(trip), leg))
    ok, vec = distance_batch(jnp.asarray(tips), leg)
    assert np.asarray(ok).all()
    norms = np.linalg.norm(np.asarray(vec), axis=-1)
    assert (norms > 0.1).all()
