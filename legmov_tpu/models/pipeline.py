"""Dense body-pose x orientation positionability pipeline.

TPU re-derivation of the reference's thrust stream-compaction pipeline
(``robot_full_struct`` / ``multi_rot_estimator``, several_leg.cu:326-877):
a candidate body-position map and a terrain map go in; for every
(candidate, orientation) the pipeline decides whether the robot can stand
there.  The reference shrinks the candidate set with ``thrust::remove_if``
between stages; on TPU the candidate set stays a dense array and every
stage is a mask — pruning stages cost one fused reduction each and XLA
skips no work, but the arithmetic is so much cheaper than the reachability
stage that masking wins over dynamic compaction (SURVEY.md section 2.10).

Stages (masks, all per body candidate):

1. ``always_collide``  — some foothold inside the body-collision sphere
   (r=60, several_leg.cu:413-440): standing here always collides.
2. ``near_targets``    — some foothold within r=400
   (several_leg.cu:442-502): otherwise nothing is in reach.
3. per orientation q:
   a. reach/collision cylinders in the oriented body frame
      (``eliminateFarAndColliding``, several_leg.cu:504-559) with the
      reach-cylinder geometry derived from the leg dimensions;
   b. per-leg any-foothold reachability, quorum across legs
      (``eliminateUnreachable`` + ``agregateReachability``,
      several_leg.cu:633-741).

Orientation convention: the reference's thrust pipeline rotates the *data*
by q (several_leg.cu:401-411) while its octree/global path un-rotates the
*query* by q (one_leg_global.cu:119); these conventions are mutually
inverse.  We use the latter (body orientation = rotation of the body,
footholds evaluated in the body frame) everywhere, matching the
orientation layer and the hierarchical solver.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.config import PI, PruneConfig
from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.collision import any_in_sphere
from legmov_tpu.ops.positionability import reachable_legs

_f32 = jnp.float32


def sweep_orientations(
    roll: tuple[float, float, int] = (-PI / 8, PI / 8, 3),
    pitch: tuple[float, float, int] = (-PI / 8, PI / 8, 3),
    yaw: tuple[float, float, int] = (0.0, PI / 2, 5),
) -> jnp.ndarray:
    """``[S, 4]`` quaternion sweep like robot_full_struct's triple loop
    (several_leg.cu:814-857): extrinsic roll -> pitch -> yaw composition,
    linear sampling inclusive of both ends."""
    axes = []
    for amin, amax, n in (roll, pitch, yaw):
        axes.append(np.linspace(amin, amax, n))
    r, p, y = np.meshgrid(*axes, indexing="ij")
    q = quat.from_rpy(
        r.ravel().astype(np.float32),
        p.ravel().astype(np.float32),
        y.ravel().astype(np.float32),
    )
    return jnp.asarray(q)


def reach_cylinder_params(leg: LegDimensions):
    """(radius, plus_z, minus_z) of the leg-reach cylinder.

    Derived from the leg dimensions exactly like eliminateFarAndColliding
    (several_leg.cu:506-517).
    """
    s_p = jnp.sin(leg.coxa_pitch)
    c_p = jnp.cos(leg.coxa_pitch)
    radius = leg.body + c_p * leg.coxa_length + leg.femur_length + leg.tibia_length
    plus_z = (
        s_p * leg.coxa_length
        + leg.tibia_length * jnp.sin(leg.tibia_absolute_pos)
        + leg.femur_length
        * jnp.sin(jnp.minimum(_f32(PI / 2), leg.max_angle_femur))
    )
    minus_z = s_p * leg.coxa_length - leg.femur_length - leg.tibia_length
    return radius, plus_z, minus_z


def _oriented_cylinder_masks(
    body_pos, q, footholds, radius_in, plus_in, minus_in, prune: PruneConfig
):
    """(any target in reach cylinder, any target in collision cylinder) for
    each body, with both cylinders axis-aligned in the oriented body frame."""
    rel = quat.inv_rotate(
        q[None, None, :], footholds[None, :, :] - body_pos[:, None, :]
    )  # [B, F, 3]
    horiz = rel[..., 0] * rel[..., 0] + rel[..., 1] * rel[..., 1]
    dz = rel[..., 2]
    in_reach = (
        (horiz < radius_in * radius_in) & (dz < plus_in) & (dz > minus_in)
    )
    r_out = _f32(prune.collide_radius)
    in_coll = (
        (horiz < r_out * r_out)
        & (dz < _f32(prune.body_cyl_plus_z))
        & (dz > _f32(prune.body_cyl_minus_z))
    )
    return jnp.any(in_reach, axis=-1), jnp.any(in_coll, axis=-1)


@dataclasses.dataclass
class PipelineResult:
    """Dense (body candidate x orientation) feasibility."""

    valid: np.ndarray  # [B, S] bool
    alive: np.ndarray  # [B] bool — survived the orientation-free pruning
    quats: np.ndarray  # [S, 4]

    def any_orientation(self) -> np.ndarray:
        return self.valid.any(axis=1)


@partial(jax.jit, static_argnames=("k",))
def _pipeline_one_orientation(
    body_pos, q, footholds, robot, alive, cyl_params, prune_vals, k: int
):
    radius_in, plus_in, minus_in = cyl_params
    collide_r, cyl_plus, cyl_minus = prune_vals
    prune = PruneConfig(
        collide_radius=collide_r,
        body_cyl_plus_z=cyl_plus,
        body_cyl_minus_z=cyl_minus,
    )
    in_reach, in_coll = _oriented_cylinder_masks(
        body_pos, q, footholds, radius_in, plus_in, minus_in, prune
    )
    legs = reachable_legs(body_pos, jnp.broadcast_to(q, (body_pos.shape[0], 4)),
                          footholds, robot)
    quorum = jnp.sum(legs, axis=-1) >= k
    return alive & in_reach & jnp.logical_not(in_coll) & quorum


def full_positionability(
    body_map: np.ndarray,
    footholds: np.ndarray,
    robot: LegDimensions,
    orientations: jnp.ndarray | None = None,
    prune: PruneConfig = PruneConfig(),
    k: int | None = None,
    body_chunk: int = 4096,
) -> PipelineResult:
    """Full dense pipeline over ``[B, 3]`` body candidates.

    Returns per-(candidate, orientation) feasibility.  ``k`` defaults to
    all legs (the reference's min-across-legs AND,
    several_leg.cu:681-697).
    """
    if orientations is None:
        orientations = sweep_orientations()
    if k is None:
        k = int(jax.tree.leaves(robot)[0].shape[0])

    body = jnp.asarray(body_map, jnp.float32)
    fh = jnp.asarray(footholds, jnp.float32)
    leg0 = jax.tree.map(lambda x: x[0], robot)
    cyl_params = reach_cylinder_params(leg0)
    prune_vals = (
        _f32(prune.collide_radius),
        _f32(prune.body_cyl_plus_z),
        _f32(prune.body_cyl_minus_z),
    )

    B = body.shape[0]
    S = orientations.shape[0]
    valid = np.zeros((B, S), bool)
    alive_all = np.zeros(B, bool)
    for s0 in range(0, B, body_chunk):
        e = min(s0 + body_chunk, B)
        bp = body[s0:e]
        # orientation-free pruning (ctor stages, several_leg.cu:413-502)
        collide = any_in_sphere(bp, fh, prune.collide_radius)
        near = any_in_sphere(bp, fh, prune.far_radius)
        alive = jnp.logical_not(collide) & near
        alive_all[s0:e] = np.asarray(alive)
        for si in range(S):
            v = _pipeline_one_orientation(
                bp, orientations[si], fh, robot, alive, cyl_params,
                prune_vals, k,
            )
            valid[s0:e, si] = np.asarray(v)
    return PipelineResult(
        valid=valid, alive=alive_all, quats=np.asarray(orientations)
    )


def multirot_positionable(solve_fn, body, orientations=None):
    """Any-orientation body feasibility at map scale.

    The reference's ``multi_rot_estimator`` (several_leg.cu:787-877)
    re-runs the elimination pipeline once per orientation of the 3x3x5
    sweep; a body sample is kept if ANY orientation stands.  This is
    that loop for the streaming solvers: ``solve_fn(body [P, 3],
    quats [P, 4]) -> quorum [P] bool`` is a bound single-orientation
    solver (e.g. ops/csr_grid.make_csr_dma_solver with its grid args
    closed over via functools.partial-style wrappers — the CSR arrays
    themselves must still be jit ARGUMENTS inside solve_fn).

    Early exit without recompiles: poses already proven feasible are
    moved to the far sentinel before the next orientation, which empties
    their reach-ball relevance — the early-exit solvers then skip them
    at queue-build cost only, so every orientation reuses ONE compiled
    shape.  Returns ``(feasible [P] bool, n_solved_per_round list)``.
    """
    if orientations is None:
        orientations = sweep_orientations()
    ors = np.asarray(orientations, np.float32)
    body_work = np.array(body, np.float32, copy=True)
    P = body_work.shape[0]
    feasible = np.zeros(P, bool)
    per_round = []
    for r in range(ors.shape[0]):
        quats = jnp.asarray(np.tile(ors[r], (P, 1)))
        quorum = np.asarray(solve_fn(jnp.asarray(body_work), quats))
        newly = quorum & ~feasible
        feasible |= newly
        per_round.append(int(newly.sum()))
        if feasible.all():
            break
        body_work[feasible] = 1e9  # decided poses drop out of relevance
    return feasible, per_round


def multirot_positionable_packed(solve_fn, body, orientations=None):
    """:func:`multirot_positionable` with (pose, orientation) work-item
    packing — the r4 verdict's "batch orientations into the sweep".

    The serial driver runs one orientation per solver round and fills
    freed rows with far sentinels, so after the first round (which
    decides the ~60% easy majority) each of the remaining ~44 rounds
    advances every straggler by ONE orientation while most of the batch
    rides along as sentinels.  The streaming solvers already take
    PER-POSE quaternions, so the batch rows are a free resource: this
    driver packs the undecided poses' NEXT FEW orientations into the
    same fixed-shape batch — each round advances every straggler by
    ~``P / n_undecided`` orientations, collapsing the straggler tail
    into a handful of rounds at one compiled shape.

    Equivalence with the serial driver is structural: a pose is
    feasible iff ANY of its orientations reaches quorum, each (pose,
    orientation) item is solved by the same exact solver, and item
    results are independent of batch composition (the solver's
    exactness contract).  ``tests/test_pipeline.py`` asserts equality
    against the brute-force OR.

    Reference anchor: ``multi_rot_estimator`` (several_leg.cu:787-877).
    """
    if orientations is None:
        orientations = sweep_orientations()
    ors = np.asarray(orientations, np.float32)
    body_np = np.asarray(body, np.float32)
    P, S = body_np.shape[0], ors.shape[0]
    feasible = np.zeros(P, bool)
    next_o = np.zeros(P, np.int64)
    active = np.arange(P)
    per_round = []
    while active.size:
        n = active.size
        rem = S - next_o[active]
        g = np.minimum(rem, max(P // n, 1))
        leftover = P - int(g.sum())
        if leftover > 0:
            room = rem - g
            csum = np.cumsum(room)
            g = g + np.clip(leftover - (csum - room), 0, room)
        m = int(g.sum())  # <= P work items this round
        pose_ids = np.repeat(active, g)
        intra = np.arange(m) - np.repeat(np.cumsum(g) - g, g)
        o_idx = np.repeat(next_o[active], g) + intra
        bodies = np.full((P, 3), 1e9, np.float32)
        quats = np.tile(ors[0], (P, 1))
        bodies[:m] = body_np[pose_ids]
        quats[:m] = ors[o_idx]
        quorum = np.asarray(
            solve_fn(jnp.asarray(bodies), jnp.asarray(quats))
        )
        hit_poses = np.unique(pose_ids[quorum[:m]])
        feasible[hit_poses] = True
        per_round.append(int(hit_poses.size))
        next_o[active] += g
        active = active[~feasible[active] & (next_o[active] < S)]
    return feasible, per_round
