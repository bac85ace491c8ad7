"""Quaternion algebra (standard Hamilton convention, (w, x, y, z) order).

Functional equivalent of reference unified_math_cuda.cu.h:13-105.  Note the
reference stores quaternions in a permuted float4 layout with a non-standard
axis-angle constructor (unified_math_cuda.cu.h:48-57 puts sin(a/2) in the
scalar slot); we deliberately use the textbook convention
``q = (cos(a/2), sin(a/2) * axis)`` — every consumer in this framework is
written against it and validated geometrically, not against the reference's
internal layout.

All functions broadcast over leading axes; quaternions are ``[..., 4]``
float32, vectors ``[..., 3]``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_f32 = jnp.float32

IDENTITY = np.array([1.0, 0.0, 0.0, 0.0], np.float32)  # np: no backend init at import


def from_axis_angle(axis, angle) -> jnp.ndarray:
    """Unit quaternion rotating by ``angle`` about ``axis`` (normalized)."""
    axis = jnp.asarray(axis, jnp.float32)
    angle = jnp.asarray(angle, jnp.float32)
    half = angle / _f32(2.0)
    s = jnp.sin(half)
    c = jnp.cos(half)
    n = jnp.sqrt(jnp.sum(axis * axis, axis=-1, keepdims=True))
    u = axis / n
    w = (c * jnp.ones_like(u[..., 0]))[..., None]
    xyz = u * (s * jnp.ones_like(u[..., 0]))[..., None]
    return jnp.concatenate([w, xyz], axis=-1)


def multiply(q1, q2) -> jnp.ndarray:
    """Hamilton product ``q1 * q2``."""
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def invert(q) -> jnp.ndarray:
    """Quaternion inverse (conjugate / squared norm)."""
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0], jnp.float32)
    return conj / n2


def rotate(q, v) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by quaternion(s) ``q``."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    # v' = v + 2w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    return v + _f32(2.0) * (w * uv + jnp.cross(u, uv))


def inv_rotate(q, v) -> jnp.ndarray:
    return rotate(invert(q), v)


def from_rpy(roll, pitch, yaw) -> jnp.ndarray:
    """Quaternion for extrinsic x-y-z (roll, pitch, yaw) rotations.

    Same composition order as reference octree_util.cu.h:164-172
    ``RPYtoQuat``: yaw * pitch * roll.
    """
    roll = jnp.asarray(roll, jnp.float32)
    pitch = jnp.asarray(pitch, jnp.float32)
    yaw = jnp.asarray(yaw, jnp.float32)
    qx = jnp.stack(
        [jnp.cos(roll / 2), jnp.sin(roll / 2), jnp.zeros_like(roll),
         jnp.zeros_like(roll)], axis=-1)
    qy = jnp.stack(
        [jnp.cos(pitch / 2), jnp.zeros_like(pitch), jnp.sin(pitch / 2),
         jnp.zeros_like(pitch)], axis=-1)
    qz = jnp.stack(
        [jnp.cos(yaw / 2), jnp.zeros_like(yaw), jnp.zeros_like(yaw),
         jnp.sin(yaw / 2)], axis=-1)
    return multiply(qz, multiply(qy, qx))


def to_rpy(q) -> jnp.ndarray:
    """Roll-pitch-yaw ``[..., 3]`` from quaternion (unified_math:59-83 intent)."""
    w, x, y, z = (q[..., i] for i in range(4))
    sinr = _f32(2.0) * (w * x + y * z)
    cosr = _f32(1.0) - _f32(2.0) * (x * x + y * y)
    roll = jnp.arctan2(sinr, cosr)
    sinp = _f32(2.0) * (w * y - z * x)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1,
        jnp.sign(sinp) * _f32(jnp.pi / 2),
        jnp.arcsin(jnp.clip(sinp, -1.0, 1.0)),
    )
    siny = _f32(2.0) * (w * z + x * y)
    cosy = _f32(1.0) - _f32(2.0) * (y * y + z * z)
    yaw = jnp.arctan2(siny, cosy)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def pitch_in_frame(q, frame_yaw) -> jnp.ndarray:
    """Pitch component of ``q`` expressed in a frame yawed by ``frame_yaw``.

    Used by the orientation layer (semantics of reference
    one_leg_global.cu:48-60 ``rotate_leg_data``): conjugate the body
    orientation into the leg-azimuth frame and extract its pitch.
    """
    axis = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    qz = from_axis_angle(axis, -jnp.asarray(frame_yaw, jnp.float32))
    q_leg = multiply(multiply(qz, q), invert(qz))
    return to_rpy(q_leg)[..., 1]
