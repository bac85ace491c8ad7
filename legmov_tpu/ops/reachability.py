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


def reachability_xyz(x, y, z, ws: LegWorkspace) -> jnp.ndarray:
    """Component-form reachability core (world coordinates in, bool out).

    Fully trig-free per point: the reference's ``atan2`` + ``sincos`` chain
    (one_leg.cu:288-315) collapses to one ``sqrt`` plus cross-product sign
    tests against precomputed limit directions, because rotating a point
    into its own coxa plane just replaces (x, y) by its radius.
    """
    x, y, z = frames.place_over_coxa_xyz(x, y, z, ws.body, ws.coxa_pitch)

    # required coxa yaw, computed on the mirrored half-plane when x < 0
    # (one_leg.cu:288-303): angle = atan2(fy, fx) in (-pi/2, pi/2].  The
    # limit tests angle > max / angle < min become cross-product signs
    # (wrap-free because |angle| <= pi/2 and |limit| < pi/2; limits beyond
    # +-pi/2 can never fire on the mirrored half-plane).
    flip = jnp.signbit(x)
    fx = jnp.where(flip, -x, x)
    fy = jnp.where(flip, -y, y)
    gt_max = ws.coxa_gt_possible & (
        fy * ws.coxa_max_dir[0] - fx * ws.coxa_max_dir[1] > 0
    )
    lt_min = ws.coxa_lt_possible & (
        fy * ws.coxa_min_dir[0] - fx * ws.coxa_min_dir[1] < 0
    )
    coxa_invalid = gt_max | lt_min

    # "rotate into the coxa vertical plane" = radial coordinate +-rho
    rho = jnp.sqrt(x * x + y * y)
    xr = jnp.where(flip, -rho, rho)
    reach = plane_validate(xr - ws.coxa_length, z, ws)
    return jnp.logical_not(coxa_invalid) & reach


def reachability_ws(points: jnp.ndarray, ws: LegWorkspace) -> jnp.ndarray:
    """Reachability booleans for ``points [..., 3]`` given a prebuilt workspace."""
    return reachability_xyz(
        points[..., 0], points[..., 1], points[..., 2], ws
    )


def reachability(points: jnp.ndarray, leg: LegDimensions) -> jnp.ndarray:
    """Reachability booleans for ``points [..., 3]`` for one leg."""
    return reachability_ws(points, build_workspace(leg))


@jax.jit
def reachability_batch(points: jnp.ndarray, leg: LegDimensions) -> jnp.ndarray:
    """Jitted flat entry point: ``[N, 3] float32 -> [N] bool``."""
    return reachability(points, leg)
