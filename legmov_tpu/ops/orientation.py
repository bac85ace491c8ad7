"""Body-orientation layer: evaluate legs under a rotated body.

Semantics of reference one_leg_global.cu:48-130: given a body orientation
quaternion,

1. the leg's *absolute* tibia limits (which are defined against the world
   horizon — "tibia always points down") shift by the body pitch expressed
   in that leg's azimuth frame (``rotate_leg_data``);
2. the query point is un-rotated into the body frame and yawed by
   ``-body_angle`` so every leg evaluates "as if leg 0";
3. distance displacement vectors are rotated back to the world frame.

Everything is batched: orientations can be an ``[O, 4]`` axis, and per-leg
workspaces are rebuilt per orientation (cheap O(1) work vs the point axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.models.workspace import build_workspace
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.distance import distance_ws
from legmov_tpu.ops.reachability import reachability_ws

_f32 = jnp.float32


def rotate_leg_data(q: jnp.ndarray, leg: LegDimensions) -> LegDimensions:
    """Shift the absolute-tibia limits by the body pitch in the leg frame.

    Semantics of reference one_leg_global.cu:48-60.  Note this is the
    reference's deliberate approximation: ONE pitch shift is applied per
    leg, while the true tilt of a target's vertical plane varies with the
    target's coxa yaw theta (error ~ pitch * (1 - cos theta) +
    roll * sin theta; exact at theta = 0 and for pure-yaw body rotations).
    We reproduce the model faithfully; see
    tests/test_fk_property.py::test_fk_oriented_property for how it is
    validated against joint-space semantics.
    """
    pitch = quat.pitch_in_frame(q, leg.body_angle)
    return leg.replace(
        tibia_absolute_pos=leg.tibia_absolute_pos - pitch,
        tibia_absolute_neg=leg.tibia_absolute_neg - pitch,
    )


def _as_leg0(points: jnp.ndarray, q: jnp.ndarray, body_angle):
    """Un-rotate by the body quaternion, then yaw by -body_angle."""
    p = quat.inv_rotate(q, points)
    c = jnp.cos(-body_angle)
    s = jnp.sin(-body_angle)
    x = p[..., 0] * c - p[..., 1] * s
    y = p[..., 0] * s + p[..., 1] * c
    return jnp.stack([x, y, p[..., 2]], axis=-1), (c, s)


def _undo_leg0(vec: jnp.ndarray, cs, q: jnp.ndarray):
    c, s = cs
    x = vec[..., 0] * c + vec[..., 1] * s
    y = -vec[..., 0] * s + vec[..., 1] * c
    v = jnp.stack([x, y, vec[..., 2]], axis=-1)
    return quat.rotate(q, v)


def reachability_oriented(
    points: jnp.ndarray, leg: LegDimensions, q: jnp.ndarray
) -> jnp.ndarray:
    """Reachability under body orientation ``q`` (one_leg_global.cu:103-130)."""
    oriented = rotate_leg_data(q, leg)
    ws = build_workspace(oriented)
    p0, _ = _as_leg0(points, q, oriented.body_angle)
    return reachability_ws(p0, ws)


def distance_oriented(points: jnp.ndarray, leg: LegDimensions, q: jnp.ndarray):
    """Distance under body orientation ``q`` (one_leg_global.cu:74-101).

    Returns ``(reachable, displacement)`` with the displacement re-expressed
    in the world frame.
    """
    oriented = rotate_leg_data(q, leg)
    ws = build_workspace(oriented)
    p0, cs = _as_leg0(points, q, oriented.body_angle)
    ok, vec = distance_ws(p0, ws)
    return ok, _undo_leg0(vec, cs, q)


def gravity_check(points: jnp.ndarray, leg: LegDimensions, q: jnp.ndarray):
    """Outward-side heuristic (reference ``simpleGravityCheck``,
    one_leg_global.cu:9-23; compiled out by default via settings.h:22
    ``enableGrav = false`` — likewise opt-in here).

    A target is "gravity-valid" for a leg if it lies on the outward side of
    the vertical plane through the (orientation-rotated) coxa joint:
    ``dot(target - coxa, horiz(R(q) coxa)) > 0``.  Returns
    ``(valid, plane_to_point)`` where ``plane_to_point`` is the projection
    displacement the reference substitutes for the distance vector when the
    check fails (one_leg_global.cu:253-264).
    """
    c = jnp.cos(leg.body_angle)
    s = jnp.sin(leg.body_angle)
    coxa = jnp.stack([c * leg.body, s * leg.body, jnp.zeros_like(c)], axis=-1)
    rot = quat.rotate(q, coxa)
    horiz = rot * jnp.asarray([1.0, 1.0, 0.0], _f32)
    rel = points - coxa
    dotp = jnp.sum(rel * horiz, axis=-1)
    valid = dotp > 0
    denom = jnp.sum(horiz * horiz, axis=-1)
    plane_to_point = horiz * (dotp / denom)[..., None]
    return valid, plane_to_point


def distance_oriented_grav(points, leg, q):
    """``distance_oriented`` with the gravity heuristic enabled
    (the ``enableGrav = true`` build of reference distance(),
    one_leg_global.cu:253-264): gravity-invalid points report unreachable
    with the plane-projection displacement."""
    gvalid, gdist = gravity_check(points, leg, q)
    ok, vec = distance_oriented(points, leg, q)
    ok = ok & gvalid
    vec = jnp.where(gvalid[..., None], vec, gdist)
    return ok, vec


@jax.jit
def reachability_oriented_batch(points, leg, q):
    return reachability_oriented(points, leg, q)


@jax.jit
def distance_oriented_batch(points, leg, q):
    return distance_oriented(points, leg, q)
