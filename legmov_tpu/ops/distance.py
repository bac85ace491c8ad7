"""Single-leg distance-to-reachable-volume over point batches.

Semantics of reference ``distance_circles`` (one_leg.cu:321-341) and
``finish_finding_closest`` (one_leg.cu:215-278): for every query point,
produce the 3-D displacement vector from the closest point on the boundary
of the leg's reachable volume to the query (norm = distance to the
workspace edge; zero-crossing = the edge itself), plus the reachability
boolean.

Both the direct coxa heading and its pi-flip (point behind the leg) are
evaluated densely and the better one selected with masks — the reference's
per-thread double evaluation becomes a doubled lane, not a branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.models.workspace import LegWorkspace, build_workspace
from legmov_tpu.ops import frames
from legmov_tpu.ops.plane import plane_clamp

_f32 = jnp.float32
_PI = np.float32(3.14159265358979323846)


def _norm3(x, y, z):
    return jnp.sqrt(x * x + y * y + z * z)


def _finish_finding_closest(x, y, z, ws: LegWorkspace, coxa_angle):
    """Clamp in the (possibly saturated) coxa plane (one_leg.cu:215-278).

    Returns ``(valid, dx, dy, dz)``: validity = in-plane validity AND coxa
    not saturated; (dx, dy, dz) = displacement from the chosen boundary
    point to the query, in the coxa frame.
    """
    half_pi = _PI / _f32(2.0)
    mega = (coxa_angle > ws.max_angle_coxa + half_pi) | (
        coxa_angle < ws.min_angle_coxa - half_pi
    )
    flipped = jnp.where(coxa_angle > 0, coxa_angle - _PI, coxa_angle + _PI)
    clamped = jnp.maximum(jnp.minimum(coxa_angle, ws.max_angle_coxa),
                          ws.min_angle_coxa)
    sat_angle = jnp.where(mega, flipped, clamped)
    coxa_saturated = sat_angle != coxa_angle
    coxa_limit = jnp.where(
        coxa_angle > (ws.max_angle_coxa + ws.min_angle_coxa) / _f32(2.0),
        ws.max_angle_coxa,
        ws.min_angle_coxa,
    )

    xr, yr, c1, s1 = frames.cancel_coxa_rotation(x, y, sat_angle)
    was_valid, dxp, dzp = plane_clamp(xr - ws.coxa_length, z, ws)

    # alternative boundary: the coxa angular-limit plane.  Rotate the saved
    # point into the limit plane; its residual y is the distance to that
    # plane (one_leg.cu:258-274).
    _, ys, c2, s2 = frames.cancel_coxa_rotation(xr, yr, coxa_limit - sat_angle)
    dist_clamped = _norm3(dxp, yr, dzp)
    better_not_clamp = was_valid & jnp.logical_not(mega) & (
        dist_clamped > jnp.abs(ys)
    )
    rx, ry = frames.restore_coxa_rotation(jnp.zeros_like(ys), ys, c2, s2)

    fx = jnp.where(better_not_clamp, rx, dxp)
    fy = jnp.where(better_not_clamp, ry, yr)
    fz = jnp.where(better_not_clamp, _f32(0.0), dzp)
    gx, gy = frames.restore_coxa_rotation(fx, fy, c1, s1)
    return was_valid & jnp.logical_not(coxa_saturated), gx, gy, fz


def distance_ws(points: jnp.ndarray, ws: LegWorkspace):
    """``(reachable [...], displacement [..., 3])`` given a prebuilt workspace."""
    p = frames.place_over_coxa(points, ws.body, ws.coxa_pitch)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    coxangle = jnp.arctan2(y, x)
    coxangle_flip = jnp.where(coxangle > 0, coxangle - _PI, coxangle + _PI)

    res, dx, dy, dz = _finish_finding_closest(x, y, z, ws, coxangle)
    resf, fx, fy, fz = _finish_finding_closest(x, y, z, ws, coxangle_flip)

    use_direct = jnp.where(
        res == resf, _norm3(dx, dy, dz) < _norm3(fx, fy, fz), res
    )
    ox = jnp.where(use_direct, dx, fx)
    oy = jnp.where(use_direct, dy, fy)
    oz = jnp.where(use_direct, dz, fz)
    out = frames.unplace_over_coxa(jnp.stack([ox, oy, oz], axis=-1), ws.coxa_pitch)
    return res | resf, out


def distance(points: jnp.ndarray, leg: LegDimensions):
    """``(reachable [...], displacement [..., 3])`` for one leg."""
    return distance_ws(points, build_workspace(leg))


@jax.jit
def distance_batch(points: jnp.ndarray, leg: LegDimensions):
    """Jitted flat entry point: ``[N, 3] float32 -> ([N] bool, [N, 3])``."""
    return distance(points, leg)
