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


def test_fk_oriented_property():
    """FK tips of a body-rotated robot must be reachable via the oriented
    evaluator — away from the absolute-tibia band where the reference's
    per-leg pitch-shift model is approximate.

    The reference (one_leg_global.cu:48-60) shifts a leg's absolute-tibia
    limits by ONE pitch angle (the body pitch expressed in the leg's mount
    frame) for every target, while the true tilt of a target's vertical
    plane varies with its coxa yaw theta (error ~ pitch*(1-cos theta) +
    roll*sin theta).  We therefore assert exactness only for world-frame
    tibia angles clear of the limits by that bound; at identity orientation
    the margin collapses and the check is tight.
    """
    import jax.numpy as jnp
    from legmov_tpu.ops import quaternion as quat
    from legmov_tpu.ops.orientation import reachability_oriented

    leg = get_moonbot_leg()
    rng = np.random.default_rng(3)
    n = 4000
    lo = np.array([float(leg.min_angle_coxa), float(leg.min_angle_femur),
                   float(leg.min_angle_tibia)])
    hi = np.array([float(leg.max_angle_coxa), float(leg.max_angle_femur),
                   float(leg.max_angle_tibia)])
    q_j = rng.uniform(lo + 2e-3, hi - 2e-3, (n, 3)).astype(np.float32)
    # keep the tibia's absolute angle away from the +-pi wrap — the
    # world-angle filter below cannot distinguish f+t = 3.3 from -2.98
    keep = np.abs(q_j[:, 1] + q_j[:, 2]) < np.pi - 0.25
    q_j = q_j[keep]
    n = q_j.shape[0]
    tips = np.asarray(forward_kinematics(jnp.asarray(q_j), leg))
    leg0 = leg.replace(tibia_length=jnp.float32(0.0))
    knees = np.asarray(forward_kinematics(jnp.asarray(q_j), leg0))

    for rpy in ((0.0, 0.0, 0.0), (0.1, 0.12, 0.4)):
        margin = 3e-3
        bq = quat.from_rpy(*(np.float32(v) for v in rpy))
        R = np.asarray(quat.rotate(jnp.broadcast_to(bq, (n, 4)),
                                   jnp.asarray(tips)))
        K = np.asarray(quat.rotate(jnp.broadcast_to(bq, (n, 4)),
                                   jnp.asarray(knees)))
        # the coxa vertical plane passes through the coxa JOINT (at
        # (body, 0, 0) rotated by q), not the body origin
        cj = np.asarray(
            quat.rotate(bq, jnp.asarray([float(leg.body), 0.0, 0.0],
                                        dtype=jnp.float32))
        )
        tib = R - K
        kxy = K[:, :2] - cj[:2]
        kd = kxy / np.maximum(
            np.linalg.norm(kxy, axis=1, keepdims=True), 1e-9
        )
        ang = np.arctan2(tib[:, 2], np.sum(tib[:, :2] * kd, axis=1))
        if rpy == (0.0, 0.0, 0.0):
            # identity: the geometric plane angle is exact
            sel = (ang > float(leg.tibia_absolute_neg) + margin) & (
                ang < float(leg.tibia_absolute_pos) - margin
            )
        else:
            # rotated: filter by the MODEL's joint-space semantics — the
            # absolute-tibia limits shifted by the body pitch in the leg
            # frame (one_leg_global.cu:48-60). This validates the whole
            # world-point pipeline (quat un-rotation + workspace rebuild)
            # against the joint-space definition.
            pitch = float(quat.pitch_in_frame(bq, leg.body_angle))
            ft = q_j[:, 1] + q_j[:, 2]
            sel = (ft > float(leg.tibia_absolute_neg) - pitch + margin) & (
                ft < float(leg.tibia_absolute_pos) - pitch - margin
            )
        assert sel.sum() > 500
        reach = np.asarray(
            reachability_oriented(jnp.asarray(R[sel]), leg, bq)
        )
        frac = reach.mean()
        assert frac == 1.0, (
            f"rpy={rpy}: {(~reach).sum()} FK tips unreachable "
            f"(margin {margin})"
        )
