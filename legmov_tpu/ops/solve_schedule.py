"""Shared early-exit scheduling for the positionability solvers.

The three early-exit solvers — the adaptive dense-table solver
(ops/pallas_multileg.make_adaptive_grid_solver) and the two CSR
streaming solvers (ops/csr_grid.make_csr_solver / make_csr_dma_solver)
— share the same scheduling skeleton:

* the ``decide`` stopping rule (``"legs"`` = every leg bit exact,
  ``"quorum"`` = stop once the quorum is decided — the octree's per-node
  early-out, reference several_leg_octree.cu:117-131, as a
  scan-scheduling rule);
* ``(quota, pose_fraction)`` rounds with static-shape pose compaction
  between rounds (the thrust pipeline's ``remove_if``,
  several_leg.cu:427-434, as TPU-native top_k gathers);
* an appended full-width safety round that makes results unconditionally
  exact, with ``overflow`` reporting whether it had to do real work.

This module is that skeleton, factored once.  Each solver supplies its
own ``run_round(per_pose, rel, legs, scanned, quota)`` — the only part
that differs (dense cell ordering vs CSR window queues vs in-kernel DMA
grids).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

#: pose-tile height of the fused multi-leg kernels; compaction rounds
#: keep the active pose count a multiple of this
POSE_ROWS = 8


def robot_geometry(robot):
    """Host-side ``(mount_vec [L, 3], reach_l [L])`` for the reach-ball
    relevance test (ball center = the pose's rotated coxa mount point,
    radius = coxa + femur + tibia)."""
    host = jax.tree.map(lambda x: np.asarray(x), robot)
    L = int(np.shape(host.body_angle)[0])
    reach_l = np.asarray(
        host.coxa_length + host.femur_length + host.tibia_length
    )
    mount_vec = np.stack(
        [np.asarray(host.body) * np.cos(np.asarray(host.body_angle)),
         np.asarray(host.body) * np.sin(np.asarray(host.body_angle)),
         np.zeros(L)], -1,
    ).astype(np.float32)
    return mount_vec, reach_l


def make_undecided(decide: str, k_eff):
    """``undecided(legs [A, L], scanned [A, C], rel [A, C, L]) -> [A]``:
    poses whose result can still change under the ``decide`` rule."""
    if decide not in ("legs", "quorum"):
        raise ValueError(f"decide must be 'legs' or 'quorum', got {decide!r}")

    def undecided(legs_, scanned_, rel_):
        rem = jnp.any(rel_ & ~scanned_[:, :, None], axis=1)  # [A, L]
        if decide == "legs":
            return jnp.any(~legs_ & rem, axis=-1)
        found = jnp.sum(legs_, axis=-1)
        possible = jnp.sum(legs_ | rem, axis=-1)
        return (found < k_eff) & (possible >= k_eff)

    return undecided


def wanted(rel_, legs_, scanned_, undecided):
    """``[A, C]`` cells/columns still worth scanning: unscanned, relevant
    to a missing leg, and belonging to a still-undecided pose."""
    active = undecided(legs_, scanned_, rel_)
    return (
        jnp.any(rel_ & ~legs_[:, None, :], -1)
        & ~scanned_
        & active[:, None]
    )


def run_schedule(rounds, per_pose, rel, legs, scanned, undecided,
                 run_round):
    """Drive the compaction-round schedule; returns
    ``(legs, scanned, overflow)``.

    ``rounds`` must already include the full-width safety round as its
    last entry (quota semantics are the caller's — dense solvers use
    "all cells", CSR solvers use 0 = unbounded).  Entries with
    ``frac >= 1.0`` (and the first round) run over every pose; others
    gather the top ``frac * P`` still-undecided poses (padded to a
    POSE_ROWS multiple), run the round on the gathered views of
    ``per_pose``/``rel``/state, and scatter the state back.
    ``overflow`` is whether any pose was still undecided entering a
    post-first full-fraction round (i.e. the scheduled quotas starved
    and that round had to do real work).
    """
    P = legs.shape[0]
    over_quota = jnp.zeros((), bool)
    for r, (quota, frac) in enumerate(rounds):
        if r == 0 or frac >= 1.0:
            if r > 0:
                over_quota = jnp.any(undecided(legs, scanned, rel))
            legs, scanned = run_round(per_pose, rel, legs, scanned, quota)
        else:
            A = max(
                POSE_ROWS,
                ((int(P * frac) + POSE_ROWS - 1) // POSE_ROWS) * POSE_ROWS,
            )
            A = min(A, P)
            undone = undecided(legs, scanned, rel)
            _, idx = jax.lax.top_k(undone.astype(jnp.int32), A)
            sub = tuple(a[idx] for a in per_pose)
            legs2, scanned2 = run_round(
                sub, rel[idx], legs[idx], scanned[idx], quota
            )
            legs = legs.at[idx].set(legs2)
            scanned = scanned.at[idx].set(scanned2)
    return legs, scanned, over_quota
