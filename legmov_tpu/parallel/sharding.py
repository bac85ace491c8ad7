"""Device-mesh sharding of the movability solvers.

Layout (SURVEY.md section 7.2 step 6, BASELINE.json north star):

* **points / poses axis -> data parallel** over mesh axis ``"poses"``: the
  per-point evaluators are embarrassingly parallel, so point batches and
  body-pose batches shard across chips with no communication at all.
* **foothold axis -> optional second mesh axis** ``"points"``: each chip
  reduces reachability over its local foothold shard, then the global
  "any foothold reachable" is finished with a ``psum`` over ICI — the
  TPU-native replacement for the reference's warp-vote + ``__shared__``
  flag OR-reduction (several_leg.cu:92-129).

Everything goes through ``jax.shard_map`` so the collective placement is
explicit; single-device meshes degenerate to plain jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.ops.distance import distance
from legmov_tpu.ops.positionability import reachable_legs
from legmov_tpu.ops.quaternion import IDENTITY
from legmov_tpu.ops.reachability import reachability


def make_mesh(
    n_devices: int | None = None, points_axis: int = 1, devices=None
) -> Mesh:
    """Build a ``(poses, points)`` mesh over the first ``n_devices`` devices.

    ``points_axis`` chips are dedicated to splitting the foothold axis; the
    rest data-parallelize poses/points.  Defaults to a pure data-parallel
    ``(n, 1)`` mesh.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % points_axis != 0:
        raise ValueError(f"{n} devices not divisible by points_axis={points_axis}")
    arr = np.array(devs).reshape(n // points_axis, points_axis)
    return Mesh(arr, axis_names=("poses", "points"))


def _flat_mesh_size(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))


def sharded_reachability(mesh: Mesh):
    """Jitted ``(points [N,3], leg) -> [N] bool`` sharding N over all chips.

    The point axis is split over *both* mesh axes (it is one flat batch
    axis); no collectives are needed.
    """

    @jax.jit
    def fn(points: jnp.ndarray, leg: LegDimensions) -> jnp.ndarray:
        return jax.shard_map(
            lambda p, l: reachability(p, l),
            mesh=mesh,
            in_specs=(P(("poses", "points")), P()),
            out_specs=P(("poses", "points")),
        )(points, leg)

    return fn


def sharded_distance(mesh: Mesh):
    """Jitted ``(points [N,3], leg) -> ([N] bool, [N,3])`` over all chips."""

    @jax.jit
    def fn(points: jnp.ndarray, leg: LegDimensions):
        return jax.shard_map(
            lambda p, l: distance(p, l),
            mesh=mesh,
            in_specs=(P(("poses", "points")), P()),
            out_specs=(P(("poses", "points")), P(("poses", "points"))),
        )(points, leg)

    return fn


def sharded_positionable(
    mesh: Mesh, k: int | None = None, chunk: int = 0
):
    """Jitted pose-feasibility sweep sharded over the mesh.

    ``(body_pos [P,3], body_quat [P,4], footholds [F,3], robot) -> [P] bool``
    with poses sharded over the ``"poses"`` axis and footholds over the
    ``"points"`` axis.  Each chip computes per-(pose, leg) "any local
    foothold reachable"; the cross-chip OR is a ``psum`` over ``"points"``
    (ICI collective), then legs are counted against the quorum ``k``.

    ``chunk > 0`` scans the local pose shard in chunks of that size,
    bounding the per-device ``[P_local, F_local, L]`` intermediate to
    ``chunk * F_local * L`` — required for large pose batches (the TPU
    twin of the reference's <=1024-target blocking,
    several_leg.cu:143-156).
    """

    def _legs_ok(body_pos, body_quat, footholds, robot):
        if chunk and body_pos.shape[0] > chunk:
            Pl = body_pos.shape[0]
            pad = (-Pl) % chunk
            bp = jnp.pad(body_pos, ((0, pad), (0, 0)))
            bq = jnp.pad(body_quat, ((0, pad), (0, 0)))
            out = jax.lax.map(
                lambda bc: reachable_legs(bc[0], bc[1], footholds, robot),
                (bp.reshape(-1, chunk, 3), bq.reshape(-1, chunk, 4)),
            )
            return out.reshape(Pl + pad, -1)[:Pl]
        return reachable_legs(body_pos, body_quat, footholds, robot)

    def local(body_pos, body_quat, footholds, robot):
        legs_ok = _legs_ok(body_pos, body_quat, footholds, robot)
        # OR across foothold shards: sum of bools > 0
        total = jax.lax.psum(legs_ok.astype(jnp.int32), axis_name="points")
        counts = jnp.sum(total > 0, axis=-1).astype(jnp.int32)
        quorum = jnp.int32(
            k if k is not None else jax.tree.leaves(robot)[0].shape[0]
        )
        return counts >= quorum

    @jax.jit
    def fn(body_pos, body_quat, footholds, robot):
        if body_quat is None:
            body_quat = jnp.broadcast_to(
                jnp.asarray(IDENTITY), (body_pos.shape[0], 4)
            )
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("poses"), P("poses"), P("points"), P()),
            out_specs=P("poses"),
        )(body_pos, body_quat, footholds, robot)

    return fn


def sharded_csr_positionable(
    mesh: Mesh, solver, columns, cell_size: float, dims: tuple, k: int = 0
):
    """Map-scale CSR positionability sharded over the full mesh.

    ``solver`` is a ``legmov_tpu.ops.csr_grid.make_csr_solver`` instance;
    poses shard across every chip, the CSR foothold arrays are replicated
    (12 B/point — tens of MB even at 10M points), and the early-exit
    machinery runs independently per shard (no collectives needed: the
    per-pose quorum is chip-local, matching BASELINE's
    "footholds replicated, poses sharded" layout).  The per-shard pose
    count must be a multiple of POSE_ROWS.
    """

    @jax.jit
    def fn(body_pos, body_quat, xs, ys, zs, starts, origin):
        def local(b, q, xs_, ys_, zs_, st_, og_):
            legs, quorum, _ = solver(
                b, q, xs_, ys_, zs_, st_, og_, columns,
                cell_size=cell_size, k=k, dims=dims,
            )
            return quorum

        # check_vma off: the solver's while-loop carries start replicated
        # and become device-varying (same situation as
        # sharded_grid_positionable)
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(("poses", "points")), P(("poses", "points")),
                      P(), P(), P(), P(), P()),
            out_specs=P(("poses", "points")),
            check_vma=False,
        )(body_pos, body_quat, xs, ys, zs, starts, origin)

    return fn


def _all_axes(mesh: Mesh) -> tuple:
    return tuple(mesh.axis_names)


def stage_for_mesh(mesh: Mesh):
    """``(to_sharded, to_repl)`` input-staging functions for ``mesh``.

    Multi-process meshes (jax.distributed) require explicitly GLOBAL
    arrays as shard_map inputs: every process passes the same host
    values and jax assembles the global array from the per-process
    addressable shards (``jax.make_array_from_callback`` — each process
    materializes exactly its own shard slices).  Single-process meshes
    (including the driver's virtual-device mesh) pass through
    ``jnp.asarray``.  ``to_sharded`` lays the leading axis over every
    mesh axis (the cell/pose data axis); ``to_repl`` replicates.
    """
    import numpy as np

    multi = any(
        d.process_index != jax.process_index()
        for d in mesh.devices.flat
    )
    if not multi:
        return jnp.asarray, jnp.asarray
    from jax.sharding import NamedSharding

    ax = _all_axes(mesh)

    def mk(spec):
        def stage(arr):
            a = np.asarray(arr)
            return jax.make_array_from_callback(
                a.shape, NamedSharding(mesh, spec), lambda idx: a[idx]
            )

        return stage

    return mk(P(ax)), mk(P())


def sharded_cell_eval(mesh: Mesh, ev):
    """Shard a dense hierarchical cell evaluator over the mesh.

    ``ev`` is ``hier_solver._eval_cells`` or one of its fused Pallas twins
    (``make_fast_cell_eval`` / ``make_cell_eval_rot``): positional args
    ``(centers [C,3], parent_valid [C], half, parent_half, footholds,
    quats, robot)`` plus static keywords, returning three ``[C]`` flag
    vectors.  The CELL axis is the data-parallel axis (each level's cell
    batch is embarrassingly parallel, exactly like the pose axis of the
    map solvers); footholds/quats/robot replicate.  ``C`` must divide by
    the mesh size.

    This is the multi-device path for the reference's flagship octree
    workload (several_leg_octree.cu:391-488 ``apply_oct``): the CUDA side
    scales by giving each SM a node slice; here each chip takes a cell
    shard and no collectives are needed at all.
    """
    from functools import partial as _partial

    ax = _all_axes(mesh)

    @_partial(
        jax.jit,
        static_argnames=("k", "margin", "reach", "chunk", "use_rot",
                         "shared"),
    )
    def fn(cc, pv, child_half, half, fh, quats, robot,
           k, margin, reach, chunk, use_rot, shared):
        def local(cc_, pv_, ch_, h_, fh_, quats_, robot_):
            v, e, lf = ev(
                cc_, pv_, ch_, h_, fh_, quats_, robot_,
                k=k, margin=margin, reach=reach, chunk=chunk,
                use_rot=use_rot, shared=shared,
            )
            # flags are tiny ([cells] bools): all_gather them so every
            # device (and in multi-process runs, every HOST) holds the
            # full level flags — the solver's host loop fetches them
            # with np.asarray, which needs fully-addressable arrays
            g = lambda x: jax.lax.all_gather(x, ax, tiled=True)
            return g(v), g(e), g(lf)

        # check_vma off: the evaluators scan foothold chunks with a
        # replicated->varying carry (same situation as
        # sharded_grid_positionable below)
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ax), P(ax), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(cc, pv, child_half, half, fh, quats, robot)

    return fn


def sharded_csr_cell_eval(mesh: Mesh, ev):
    """Shard the CSR-streaming cell evaluator over the mesh.

    ``ev`` comes from ``ops.csr_cell_eval.make_csr_cell_eval`` built with
    ``cells`` = the PER-DEVICE cell count; the wrapped function takes the
    full ``cells * mesh_size`` batch, shards (centers, parent_valid) over
    every mesh axis, and replicates the CSR tables (12 B/foothold — the
    BASELINE "footholds replicated, poses sharded" layout, with cells in
    the pose role).  The scalar overflow flag is psum-reduced so every
    device returns the global OR.
    """
    from functools import partial as _partial

    ax = _all_axes(mesh)

    @_partial(jax.jit, static_argnames=("cell_size", "dims", "dead_elem"))
    def fn(cc, pv, legtab, elong, rmounts, reach_l, r_cell,
           xs2, ys2, zs2, starts, origin, *, cell_size, dims, dead_elem):
        def local(cc_, pv_, legtab_, elong_, rm_, rl_, rc_,
                  xs_, ys_, zs_, st_, og_):
            v, e, lf, over = ev(
                cc_, pv_, legtab_, elong_, rm_, rl_, rc_,
                xs_, ys_, zs_, st_, og_,
                cell_size=cell_size, dims=dims, dead_elem=dead_elem,
            )
            over = jax.lax.psum(over.astype(jnp.int32), ax) > 0
            # all_gather the [cells] flag vectors (see sharded_cell_eval)
            g = lambda x: jax.lax.all_gather(x, ax, tiled=True)
            return g(v), g(e), g(lf), over

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ax), P(ax)) + (P(),) * 10,
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )(cc, pv, legtab, elong, rmounts, reach_l, r_cell,
          xs2, ys2, zs2, starts, origin)

    return fn


def sharded_grid_positionable(mesh: Mesh, k: int = 0):
    """Map-scale positionability sharded over the ``poses`` mesh axis.

    ``(body_pos [P,3], body_quat [P,4], grid: FootholdGrid, robot,
    offsets [K,3]) -> [P] bool`` with the pose batch split across every
    chip and the bucket-grid tables replicated (terrain tables are tens of
    MB — BASELINE.json's "footholds replicated, poses sharded" layout).
    No collectives are needed; per-pose quorum is chip-local.
    """
    from legmov_tpu.ops.grid import grid_reachable_legs

    @jax.jit
    def fn(body_pos, body_quat, grid, robot, offsets):
        def local(b, q, g, rb, off):
            legs, quorum = grid_reachable_legs(b, q, g, rb, k=k, offsets=off)
            return quorum

        # check_vma off: grid_reachable_legs' scan carry starts replicated
        # and becomes device-varying, which the varying-axes checker
        # rejects even though the computation is purely per-shard
        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(("poses", "points")), P(("poses", "points")),
                      P(), P(), P()),
            out_specs=P(("poses", "points")),
            check_vma=False,
        )(body_pos, body_quat, grid, robot, offsets)

    return fn
