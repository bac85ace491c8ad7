"""Single-leg reachability over point batches.

Semantics of reference ``reachability_circles`` (one_leg.cu:280-319): world
point -> coxa frame -> coxa yaw-limit test -> rotate into the coxa vertical
plane -> 4 masked circle tests.  One thread per point becomes one VPU lane
per point; the whole pipeline is ~4 sqrt + 1 atan2 + a few dozen FMAs per
point, fully fusable by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.models.workspace import LegWorkspace, build_workspace
from legmov_tpu.ops import frames
from legmov_tpu.ops.plane import plane_validate


def reachability_ws(points: jnp.ndarray, ws: LegWorkspace) -> jnp.ndarray:
    """Reachability booleans for ``points [..., 3]`` given a prebuilt workspace."""
    p = frames.place_over_coxa(points, ws.body, ws.coxa_pitch)
    x, y, z = p[..., 0], p[..., 1], p[..., 2]

    # required coxa yaw, computed on the mirrored half-plane when x < 0
    # (one_leg.cu:288-303)
    angle = frames.coxa_angle_flipped(x, y)
    coxa_invalid = (angle > ws.max_angle_coxa) | (angle < ws.min_angle_coxa)

    # into the coxa-aligned vertical plane; radial coordinate can be negative
    xr, _, _, _ = frames.cancel_coxa_rotation(x, y, angle)
    reach = plane_validate(xr - ws.coxa_length, z, ws)
    return jnp.logical_not(coxa_invalid) & reach


def reachability(points: jnp.ndarray, leg: LegDimensions) -> jnp.ndarray:
    """Reachability booleans for ``points [..., 3]`` for one leg."""
    return reachability_ws(points, build_workspace(leg))


@jax.jit
def reachability_batch(points: jnp.ndarray, leg: LegDimensions) -> jnp.ndarray:
    """Jitted flat entry point: ``[N, 3] float32 -> [N] bool``."""
    return reachability(points, leg)
