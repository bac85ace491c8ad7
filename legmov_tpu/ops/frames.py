"""Frame transforms between world, coxa and the coxa-rotated vertical plane.

Semantics of reference one_leg.cu:9-29 (``place_over_coxa``,
``find_coxa_angle``) and :146-165 (``cancel/restore_coxa_rotation``),
vectorized over arbitrary leading axes.  All inputs/outputs are float32
coordinate arrays ``[..., 3]`` or component tuples.
"""

from __future__ import annotations

import jax.numpy as jnp


def place_over_coxa_xyz(x, y, z, body, coxa_pitch):
    """Component form of :func:`place_over_coxa` (one_leg.cu:9-24)."""
    x = x - body
    s = jnp.sin(-coxa_pitch)
    c = jnp.cos(-coxa_pitch)
    return x * c - z * s, y, x * s + z * c


def place_over_coxa(xyz: jnp.ndarray, body, coxa_pitch) -> jnp.ndarray:
    """World -> coxa frame: shift by -body along x, pitch by -coxa_pitch.

    Matches reference one_leg.cu:9-24 (forward direction).
    """
    x, y, z = place_over_coxa_xyz(
        xyz[..., 0], xyz[..., 1], xyz[..., 2], body, coxa_pitch
    )
    return jnp.stack([x, y, z], axis=-1)


def unplace_over_coxa_xyz(x, y, z, coxa_pitch):
    """Component form of :func:`unplace_over_coxa`."""
    s = jnp.sin(coxa_pitch)
    c = jnp.cos(coxa_pitch)
    return x * c - z * s, y, x * s + z * c


def unplace_over_coxa(xyz: jnp.ndarray, coxa_pitch) -> jnp.ndarray:
    """Rotate a *displacement vector* back from coxa to world orientation.

    Matches ``place_over_coxa<Reverse=true>`` (one_leg.cu:9-24): only the
    pitch rotation is undone; the body shift is not re-applied because the
    quantity being transformed is a displacement, not a position.
    """
    x, y, z = unplace_over_coxa_xyz(
        xyz[..., 0], xyz[..., 1], xyz[..., 2], coxa_pitch
    )
    return jnp.stack([x, y, z], axis=-1)


def coxa_angle_flipped(x, y):
    """Coxa yaw required to point at (x, y), computed on the +x half plane.

    Reference one_leg.cu:288-303: when x is negative (including -0.0) the
    point is mirrored through the origin before the atan2, so the returned
    angle always lies in (-pi/2, pi/2]; the evaluation then proceeds in a
    plane whose radial coordinate may be negative.
    """
    flip = jnp.signbit(x)
    fx = jnp.where(flip, -x, x)
    fy = jnp.where(flip, -y, y)
    return jnp.arctan2(fy, fx)


def rot_z(x, y, angle):
    """Rotate (x, y) by +angle about z, returning (x', y', cos, sin).

    ``cancel_coxa_rotation(p, a)`` in the reference (one_leg.cu:146-156)
    rotates by -a; call this with ``-a`` for that behaviour.  The returned
    cos/sin pair is of the *applied* angle, for later ``unrot_z``.
    """
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return x * c - y * s, x * s + y * c, c, s


def cancel_coxa_rotation(x, y, coxa_angle):
    """Rotate into the coxa-aligned vertical plane (one_leg.cu:146-156)."""
    c = jnp.cos(coxa_angle)
    s = jnp.sin(coxa_angle)
    # rotation by -coxa_angle
    return x * c + y * s, -x * s + y * c, c, s


def restore_coxa_rotation(x, y, c, s):
    """Inverse of :func:`cancel_coxa_rotation` given its cached cos/sin."""
    return x * c - y * s, x * s + y * c
