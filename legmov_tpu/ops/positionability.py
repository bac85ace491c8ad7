"""Multi-leg body-pose positionability: dense (pose x foothold x leg) solve.

Semantics of the reference's two positionability pipelines:

* thrust pipeline ``multi_rot_estimator::eliminateUnreachable``
  (several_leg.cu:707-741): per (pose, leg), is ANY terrain point reachable?
  then AND across legs (``agregateReachability``, several_leg.cu:681-697);
* octree kernel ``validity_child`` (several_leg_octree.cu:19-151): count
  reachable legs per (pose, orientation), feasible iff
  ``count >= LegNumberForStab``.

The CUDA block-per-pose / thread-per-foothold warp-vote reduction becomes a
dense ``[P, L, F]`` reachability tensor reduced with ``any``; XLA fuses the
single-leg evaluator into the reduction, and the pose axis is the natural
sharding axis for multi-chip scaling (see legmov_tpu.parallel).

Per-foothold evaluation is the reference ``reachable_rotate_leg``
(several_leg.cu:48-67) generalized to arbitrary body orientation via the
orientation layer (one_leg_global.cu:74-130): vect = foothold - body_pos,
evaluated in the quaternion-rotated, azimuth-aligned leg frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.ops.orientation import reachability_oriented
from legmov_tpu.ops.quaternion import IDENTITY


def _pose_leg_any(pos, q, footholds, robot: LegDimensions) -> jnp.ndarray:
    """``[L]`` bool: per leg, any foothold reachable from pose ``(pos, q)``."""
    pts = footholds - pos

    def per_leg(leg):
        return jnp.any(reachability_oriented(pts, leg, q))

    return jax.vmap(per_leg)(robot)


def reachable_legs(
    body_pos: jnp.ndarray,
    body_quat: jnp.ndarray | None,
    footholds: jnp.ndarray,
    robot: LegDimensions,
) -> jnp.ndarray:
    """``[P, L]`` bool: leg l of a robot at pose p can grab some foothold.

    ``body_pos [P, 3]``, ``body_quat [P, 4]`` (or None = identity),
    ``footholds [F, 3]``.
    """
    if body_quat is None:
        body_quat = jnp.broadcast_to(
            jnp.asarray(IDENTITY), (body_pos.shape[0], 4)
        )
    return jax.vmap(_pose_leg_any, in_axes=(0, 0, None, None))(
        body_pos, body_quat, footholds, robot
    )


def reachable_leg_counts(body_pos, body_quat, footholds, robot) -> jnp.ndarray:
    """``[P]`` int32: number of legs with at least one reachable foothold."""
    return jnp.sum(
        reachable_legs(body_pos, body_quat, footholds, robot), axis=-1
    ).astype(jnp.int32)


def positionable(
    body_pos, body_quat, footholds, robot: LegDimensions, k: int | None = None
) -> jnp.ndarray:
    """``[P]`` bool: >= ``k`` legs can grab a foothold (default: all legs).

    Reference: validity condition ``reachabilityCount >= LegNumberForStab``
    (several_leg_octree.cu:115-129, settings.h:46).
    """
    counts = reachable_leg_counts(body_pos, body_quat, footholds, robot)
    if k is None:
        k = int(jax.tree.leaves(robot)[0].shape[0])
    return counts >= jnp.int32(k)


@partial(jax.jit, static_argnames=("k", "chunk"))
def positionable_batch(
    body_pos, body_quat, footholds, robot, k: int | None = None, chunk: int = 0
) -> jnp.ndarray:
    """Jitted positionability, optionally scanning the pose axis in chunks.

    ``chunk > 0`` bounds peak memory to ``chunk * L * F`` booleans — the TPU
    analogue of the reference's <=1024-thread target tiling
    (several_leg.cu:143-156).  Pose count must be divisible by ``chunk``.
    """
    if chunk and body_pos.shape[0] > chunk:
        P = body_pos.shape[0]
        if body_quat is None:
            body_quat = jnp.broadcast_to(jnp.asarray(IDENTITY), (P, 4))
        # pad the pose axis to a chunk multiple (padded poses are computed
        # and discarded) — a ragged tail would trigger a fresh compile for
        # every distinct tail size in a sweep
        pad = (-P) % chunk
        bp = jnp.pad(body_pos, ((0, pad), (0, 0)))
        bq = jnp.pad(body_quat, ((0, pad), (0, 0)), constant_values=1.0)
        n = (P + pad) // chunk
        out = jax.lax.map(
            lambda pq: positionable(pq[0], pq[1], footholds, robot, k),
            (bp.reshape(n, chunk, 3), bq.reshape(n, chunk, 4)),
        ).reshape(-1)
        return out[:P]
    return positionable(body_pos, body_quat, footholds, robot, k)
