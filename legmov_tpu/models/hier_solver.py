"""Hierarchical body-pose positionability solver.

TPU-native replacement for the reference's CUDA octree with dynamic
parallelism (several_leg_octree.cu:241-377 ``branchKernel`` +
``validity_child``, octree_util.cu.h ``CreateChildBox``): instead of
device-side recursion and in-kernel ``cudaMalloc`` of child nodes, the tree
is expanded host-side, breadth-first, one level at a time — every level is
a dense ``[C, 3]`` array of cell centers with one uniform half-extent (all
cells of a level share it because splitting is per-axis regular), and cell
feasibility is evaluated by one jitted, foothold-chunk-scanned kernel.

Cell semantics (validity_child, several_leg_octree.cu:19-151):

* a cell is **valid** if its parent was valid, or some (foothold,
  orientation) pair gives >= ``legs_for_stability`` legs that can reach
  that foothold from the cell center;
* a cell is **on the edge** if for some pair, more than
  ``leg_count - legs_for_stability`` legs have a workspace-boundary
  displacement vector that crosses the cell (the reachable-set boundary
  passes through the cell) — those cells get refined;
* a cell is a **valid leaf** when some pair is valid and not edge;
* orientation sampling only activates for cells smaller than
  ``enable_rot_below`` (settings.h:33); larger cells use the middle sample
  with an edge margin of ``enable_rot_below / 3``;
* footholds further than parent-half + total leg reach from the cell are
  ignored entirely (the elongated-box prefilter,
  several_leg_octree.cu:76-82).

Note: the reference's "middle-first" angle reordering has an off-by
expression (``(ind + ind/2) % n`` at octree_util.cu.h:190 maps [0,1,2] ->
[0,1,0], duplicating the minimum sample); we implement the evident intent
``(ind + n/2) % n`` so index 0 is the middle of each range (the identity
orientation for symmetric ranges).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.config import SolverConfig
from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.orientation import distance_oriented

_f32 = np.float32


def orientation_samples(cfg: SolverConfig) -> np.ndarray:
    """``[S, 4]`` quaternions of the roll/pitch/yaw sample grid.

    Middle-first ordering per axis (flat index 0 = all-middle = identity
    for symmetric ranges), axis decode order roll -> pitch -> yaw like
    ``QuaternionFromAngleIndex`` (octree_util.cu.h:184-198).
    """
    per_axis = []
    for ax in range(3):
        n = cfg.angle_samples[ax]
        amin, amax = cfg.angle_min_max[ax]
        inds = (np.arange(n) + n // 2) % n
        x = inds / max(n - 1, 1)
        per_axis.append((1 - x) * amin + x * amax)
    # flat index decodes roll fastest (octree_util.cu.h:186-189)
    S = cfg.total_angle_samples
    rpy = np.zeros((S, 3))
    for idx in range(S):
        rem = idx
        for ax in range(3):
            n = cfg.angle_samples[ax]
            rpy[idx, ax] = per_axis[ax][rem % n]
            rem //= n
    q = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    return np.asarray(q, _f32)


def _total_reach(robot: LegDimensions) -> float:
    return float(
        np.max(
            np.asarray(robot.body)
            + np.asarray(robot.coxa_length)
            + np.asarray(robot.femur_length)
            + np.asarray(robot.tibia_length)
        )
    )


@partial(
    jax.jit,
    static_argnames=("k", "margin", "reach", "chunk", "use_rot", "shared"),
)
def _eval_cells(
    centers: jnp.ndarray,  # [C, 3]
    parent_valid: jnp.ndarray,  # [C] bool
    half: jnp.ndarray,  # [3] cell half-extent (level constant)
    parent_half: jnp.ndarray,  # [3]
    footholds: jnp.ndarray,  # [F, 3], padded with far sentinels
    quats: jnp.ndarray,  # [S, 4]
    robot: LegDimensions,  # stacked [L]
    k: int,
    margin: float,
    reach: float,
    chunk: int,
    use_rot: bool,
    shared: bool = True,
):
    """Per-cell (valid, edge, valid_leaf) flags for one level.

    ``shared=True`` reproduces the reference octree's validity — >= k legs
    must reach the SAME foothold (several_leg_octree.cu:91-116, a very
    strict criterion that is near-unsatisfiable for k = leg_count).
    ``shared=False`` uses the thrust pipeline's physically-meaningful rule —
    each leg may use its own foothold (any-over-footholds per leg, then
    count legs; several_leg.cu:633-697).
    """
    C = centers.shape[0]
    L = int(jax.tree.leaves(robot)[0].shape[0])
    S = quats.shape[0] if use_rot else 1
    q = quats[:S]

    elong = parent_half + jnp.float32(reach)
    h2 = jnp.sum(half * half)
    big_cell = h2 > jnp.float32(
        100.0 * 100.0
    )  # convexRadius (settings.h:34) — per-cell-size branch of the
    # boundary-crossing test (several_leg_octree.cu:96-105)

    n_chunks = footholds.shape[0] // chunk
    fh = footholds[: n_chunks * chunk].reshape(n_chunks, chunk, 3)

    def per_chunk(carry, fh_c):
        any_valid, any_edge, any_leaf, leg_any = carry
        vect = fh_c[None, :, :] - centers[:, None, :]  # [C, Fc, 3]
        # elongated-box prefilter (asymmetric bounds like isInBox,
        # octree_util.cu.h:153-159)
        pre = jnp.all((vect > -elong) & (vect <= elong), axis=-1)  # [C, Fc]

        def per_quat(qi):
            def per_leg(leg):
                ok, dv = distance_oriented(vect, leg, qi)
                # boundary-crossing test on the displacement vector
                # (several_leg_octree.cu:96-105); the inactive-rotation
                # margin widens the cell box on every axis, matching the
                # reference's ``zerobox.topOffset + margin`` intent
                hm = half + jnp.float32(margin)
                cross_big = jnp.all((dv > -hm) & (dv <= hm), axis=-1)
                dv2 = jnp.sum(dv * dv, axis=-1)
                cross_small = dv2 < h2 + jnp.float32(margin)
                cross = jnp.where(big_cell, cross_big, cross_small)
                return ok & pre, cross & pre

            oks, crosses = jax.vmap(per_leg)(robot)  # [L, C, Fc]
            reach_count = jnp.sum(oks, axis=0)
            cross_count = jnp.sum(crosses, axis=0)
            item_valid = ((reach_count >= k) | parent_valid[:, None]) & pre
            item_edge = (cross_count > (L - k)) & pre
            # per-leg-rule certainty bands: a leg is *certainly* valid in
            # the whole cell if some reachable foothold's boundary vector
            # does NOT cross the cell; *possibly* valid if some foothold
            # is reachable or boundary-crossing
            certain = jnp.any(oks & ~crosses, axis=-1)  # [L, C]
            possible = jnp.any(oks | crosses, axis=-1)  # [L, C]
            return (
                item_valid, item_edge, jnp.any(oks, axis=-1),
                certain, possible,
            )

        iv, ie, la, lc, lp = jax.vmap(per_quat)(q)  # [S,C,Fc] / [S,L,C]
        leaf = iv & jnp.logical_not(ie)
        any_valid |= jnp.any(iv, axis=(0, 2))
        any_edge |= jnp.any(ie, axis=(0, 2))
        any_leaf |= jnp.any(leaf, axis=(0, 2))
        leg_any = (leg_any[0] | la, leg_any[1] | lc, leg_any[2] | lp)
        return (any_valid, any_edge, any_leaf, leg_any), None

    init = (
        jnp.zeros(C, bool),
        jnp.zeros(C, bool),
        jnp.zeros(C, bool),
        (
            jnp.zeros((S, L, C), bool),  # any reachable foothold
            jnp.zeros((S, L, C), bool),  # certainly valid across the cell
            jnp.zeros((S, L, C), bool),  # possibly valid somewhere in it
        ),
    )
    (any_valid, any_edge, any_leaf, leg_any), _ = jax.lax.scan(
        per_chunk, init, fh
    )
    if not shared:
        # each leg may claim its own foothold: count legs with any
        # reachable foothold, per orientation; quorum over that count.
        # The edge criterion is re-derived for THIS rule (not borrowed
        # from the shared-foothold crossing counts): the cell straddles
        # the quorum boundary iff the certainly-valid leg count is below
        # k while the possibly-valid count reaches it.
        la, lc, lp = leg_any
        counts = jnp.sum(la, axis=1)  # [S, C]
        n_min = jnp.sum(lc, axis=1)  # [S, C] certain lower bound
        n_max = jnp.sum(lp, axis=1)  # [S, C] optimistic upper bound
        any_valid = jnp.any(counts >= k, axis=0) | parent_valid
        any_edge = jnp.any((n_min < k) & (n_max >= k), axis=0)
        any_leaf = any_valid & jnp.logical_not(any_edge)
    return any_valid, any_edge, any_leaf


def make_fast_cell_eval(robot: LegDimensions, interpret: bool = False):
    """Identity-orientation `_eval_cells` twin running the fused Pallas
    single-leg distance kernel.

    Usable whenever orientation sampling is inactive (cells >=
    ``enable_rot_below``, the bulk of a full-map solve): with the identity
    quaternion the pitch shift of ``rotate_leg_data`` vanishes, so legs
    that share geometry and differ only by mount azimuth evaluate through
    ONE compiled kernel — the azimuth yaw and the world-frame vector
    restore stay in XLA around the kernel call (one_leg_global.cu:119-127
    semantics).  Falls back transparently: `solve_positionability` only
    selects this path on levels where ``use_rot`` is False.
    """
    from legmov_tpu.ops.pallas_kernels import make_distance_kernel

    L = int(jax.tree.leaves(robot)[0].shape[0])
    legs_host = [
        jax.tree.map(lambda x: np.asarray(x)[i], robot) for i in range(L)
    ]
    kernels: dict[tuple, object] = {}
    per_leg = []
    for leg in legs_host:
        key = tuple(
            float(getattr(leg, f))
            for f in leg._fields
            if f != "body_angle"
        )
        if key not in kernels:
            kernels[key] = make_distance_kernel(
                jax.tree.map(jnp.asarray, leg), interpret=interpret
            )
        az = float(leg.body_angle)
        per_leg.append(
            (kernels[key],
             _f32(np.cos(_f32(-az))), _f32(np.sin(_f32(-az))))
        )

    @partial(
        jax.jit, static_argnames=("k", "margin", "reach", "chunk", "shared")
    )
    def eval_cells(
        centers, parent_valid, half, parent_half, footholds, quats, robot_,
        k: int, margin: float, reach: float, chunk: int,
        use_rot: bool = False, shared: bool = True,
    ):
        del quats, robot_, use_rot  # identity orientation by construction
        C = centers.shape[0]
        elong = parent_half + jnp.float32(reach)
        h2 = jnp.sum(half * half)
        big_cell = h2 > jnp.float32(100.0 * 100.0)
        n_chunks = footholds.shape[0] // chunk
        fh = footholds[: n_chunks * chunk].reshape(n_chunks, chunk, 3)

        def per_chunk(carry, fh_c):
            any_valid, any_edge, any_leaf, leg_acc = carry
            vect = fh_c[None, :, :] - centers[:, None, :]  # [C, Fc, 3]
            pre = jnp.all((vect > -elong) & (vect <= elong), axis=-1)
            vx, vy, vz = vect[..., 0], vect[..., 1], vect[..., 2]

            oks, crosses = [], []
            certains, possibles = [], []
            for kern, ca, sa in per_leg:
                x0 = (vx * ca - vy * sa).reshape(-1)
                y0 = (vx * sa + vy * ca).reshape(-1)
                z0 = vz.reshape(-1)
                ok, dx, dy, dz = kern.soa(x0, y0, z0)
                # vector back to the world frame (yaw by +azimuth)
                wx = dx * ca + dy * sa
                wy = -dx * sa + dy * ca
                ok = ok.reshape(C, -1)
                wx = wx.reshape(C, -1)
                wy = wy.reshape(C, -1)
                wz = dz.reshape(C, -1)
                dv = jnp.stack([wx, wy, wz], axis=-1)
                hm = half + jnp.float32(margin)
                cross_big = jnp.all((dv > -hm) & (dv <= hm), axis=-1)
                dv2 = wx * wx + wy * wy + wz * wz
                cross_small = dv2 < h2 + jnp.float32(margin)
                cross = jnp.where(big_cell, cross_big, cross_small) & pre
                okp = ok & pre
                oks.append(okp)
                crosses.append(cross)
                certains.append(jnp.any(okp & ~cross, axis=-1))
                possibles.append(jnp.any(okp | cross, axis=-1))
            oks = jnp.stack(oks)  # [L, C, Fc]
            crosses = jnp.stack(crosses)
            reach_count = jnp.sum(oks, axis=0)
            cross_count = jnp.sum(crosses, axis=0)
            item_valid = ((reach_count >= k) | parent_valid[:, None]) & pre
            item_edge = (cross_count > (L - k)) & pre
            la, lc, lp = leg_acc
            leg_acc = (
                la | jnp.any(oks, axis=-1)[None],
                lc | jnp.stack(certains)[None],
                lp | jnp.stack(possibles)[None],
            )
            any_valid |= jnp.any(item_valid, axis=1)
            any_edge |= jnp.any(item_edge, axis=1)
            any_leaf |= jnp.any(item_valid & ~item_edge, axis=1)
            return (any_valid, any_edge, any_leaf, leg_acc), None

        init = (
            jnp.zeros(C, bool),
            jnp.zeros(C, bool),
            jnp.zeros(C, bool),
            (
                jnp.zeros((1, L, C), bool),
                jnp.zeros((1, L, C), bool),
                jnp.zeros((1, L, C), bool),
            ),
        )
        (any_valid, any_edge, any_leaf, leg_acc), _ = jax.lax.scan(
            per_chunk, init, fh
        )
        if not shared:
            la, lc, lp = leg_acc
            counts = jnp.sum(la, axis=1)
            n_min = jnp.sum(lc, axis=1)
            n_max = jnp.sum(lp, axis=1)
            any_valid = jnp.any(counts >= k, axis=0) | parent_valid
            any_edge = jnp.any((n_min < k) & (n_max >= k), axis=0)
            any_leaf = any_valid & jnp.logical_not(any_edge)
        return any_valid, any_edge, any_leaf

    return eval_cells


@dataclasses.dataclass
class CellRecord:
    """Terminal cells of the hierarchical solve."""

    centers: np.ndarray  # [M, 3]
    halves: np.ndarray  # [M, 3]
    valid: np.ndarray  # [M] bool
    edge: np.ndarray  # [M] bool  (terminal edge cells at max depth)
    depth: np.ndarray  # [M] int


def _morton_order(centers: np.ndarray, half: np.ndarray) -> np.ndarray:
    """Spatial (Morton) sort permutation of cell centers, quantized by
    the cell pitch.

    Children of scattered refined parents arrive parent-ordered; batches
    sliced from that order have wide bounding boxes, which defeats the
    batch-local foothold subsetting (a batch's candidate subset covers
    its whole bbox).  Z-order curve sorting makes every batch spatially
    tight — measured on the depth-7 moon solve it shrinks the deep-level
    subsets severalfold.  Cell order carries no semantics (CellRecord is
    an unordered set; level recursion only needs the refine mask)."""
    q = np.floor(
        centers / np.maximum(2.0 * half, 1e-6)[None, :]
    ).astype(np.int64)
    q -= q.min(axis=0)
    q &= (1 << 21) - 1

    def spread(x):
        x = (x | (x << 32)) & 0x1F00000000FFFF
        x = (x | (x << 16)) & 0x1F0000FF0000FF
        x = (x | (x << 8)) & 0x100F00F00F00F00F
        x = (x | (x << 4)) & 0x10C30C30C30C30C3
        x = (x | (x << 2)) & 0x1249249249249249
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def _split_children(
    centers: np.ndarray, half: np.ndarray, min_box: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """All children centers of ``centers`` and the child half-extent.

    Per-axis halving only while the half-extent is >= the per-axis minimum
    (CreateChildBox semantics, octree_util.cu.h:105-151).
    """
    split = half >= min_box
    offs = [(-0.5, 0.5) if s else (0.0,) for s in split]
    child_half = np.where(split, half / 2, half).astype(_f32)
    shifts = np.array(
        [(ox, oy, oz) for ox in offs[0] for oy in offs[1] for oz in offs[2]],
        _f32,
    )
    shifts = shifts * half
    children = (centers[:, None, :] + shifts[None, :, :]).reshape(-1, 3)
    return children.astype(_f32), child_half


def solve_positionability(
    footholds: np.ndarray,
    robot: LegDimensions,
    cfg: SolverConfig = SolverConfig(),
    chunk: int = 512,
    cell_batch: int = 1024,
    shared_foothold: bool = True,
    use_pallas: str = "auto",
    profile: bool = False,
    candidates: str = "auto",
    csr_window: int = 0,
    csr_cell_chunk: int = 0,
    mesh=None,
) -> CellRecord:
    """Breadth-first hierarchical positionability solve.

    Returns the terminal cells (leaves + max-depth edge cells) with their
    validity flags; ``centers[valid]`` is the reference's
    ``extractValidAsArray`` output (octree_util.cu:155-180).

    ``shared_foothold=True`` is the reference octree criterion (>= k legs on
    one shared foothold); ``False`` lets every leg claim its own foothold
    (the thrust-pipeline criterion — use this for physically meaningful
    stances).

    Batches of a level are DISPATCHED first and fetched afterwards (one
    packed flags array per batch), so device work, relay uploads, and
    result round-trips overlap instead of serializing per batch — on the
    relay-attached TPU of this environment a blocking per-batch loop
    pays ~3 x 30 ms fetch latency per batch plus serialized subset
    uploads.  ``profile=True`` (or env ``LEGMOV_HIER_PROFILE=1``) prints
    a per-level breakdown (batches, subset bytes, dispatch vs fetch
    wall).

    ``candidates`` selects how orientation-active levels get their
    foothold candidates: ``"dense"`` = per-batch bbox subsets through
    the fused dense kernel (the round-2 path); ``"csr"`` = the
    CSR-streaming evaluator with in-kernel per-quat early exit
    (ops/csr_cell_eval.py — device-resident footholds, per-CELL
    elongated-box candidate queues, decided cells skip their remaining
    orientation samples); ``"auto"`` = csr whenever the Pallas fast
    path is active.  Flags are bit-identical across the choices.

    ``mesh``: a ``jax.sharding.Mesh`` scales each level's cell batch
    data-parallel over every mesh axis (cells are the pose-role axis of
    this workload; footholds/CSR tables replicate, 12 B/point) — the
    multi-device path for the reference's flagship ``apply_oct``
    workload (several_leg_octree.cu:391-488).  No collectives beyond
    the psum'd overflow scalar; flags are bit-identical to
    ``mesh=None`` (tests/test_sharding.py).
    """
    import os as _os
    import time as _time

    profile = profile or bool(_os.environ.get("LEGMOV_HIER_PROFILE"))
    _t_solve0 = _time.perf_counter()
    ndev = int(mesh.size) if mesh is not None else 1
    if not csr_window:
        # per-mode optimum measured on the depth-7 256^2 moon solve
        # (r4, bdata/tpu + RESULTS.md): the quat-major per-leg kernel
        # re-streams each window per orientation, so the smallest
        # window above the DMA fetch floor wins (w1024: 221 -> 198 s);
        # the chunk-major shared kernel streams once and prefers the
        # middle of its step-count/fetch-size tradeoff (w2048: 347 s
        # vs 398 @1024, 468 @4096)
        csr_window = 2048 if shared_foothold else 1024
    if not csr_cell_chunk:
        # per-mode optimum from the r4 depth-7 cell-batch ladder:
        # shared 16384 (324 s vs 332 @8192 / 347 @32768); per-leg
        # 32768 (198.5 s vs 225 @16384)
        csr_cell_chunk = 16384 if shared_foothold else 32768
    k = cfg.legs_for_stability
    reach = _total_reach(robot)
    quats = jnp.asarray(orientation_samples(cfg))
    min_box = np.asarray(cfg.min_box, _f32)

    # identity-orientation levels can run the fused Pallas distance kernel
    # (make_fast_cell_eval); orientation-active levels always use the XLA
    # path (per-quat pitch-shifted workspaces)
    fast_eval = None
    fast_rot_eval = None
    if use_pallas != "off":
        import jax as _jax

        interp = _jax.default_backend() != "tpu"
        if use_pallas == "on" or not interp:
            try:
                fast_eval = make_fast_cell_eval(robot, interpret=interp)
                from legmov_tpu.ops.pallas_multileg_dist import (
                    make_cell_eval_rot,
                )

                fast_rot_eval = make_cell_eval_rot(
                    robot, k=k, interpret=interp
                )
            except Exception as exc:
                if use_pallas == "on":
                    # an explicit request must fail loudly, not silently
                    # compare the XLA path against itself downstream
                    raise
                import warnings

                warnings.warn(
                    f"hier_solver: pallas fast path unavailable "
                    f"({exc!r}); falling back to the XLA cell evaluator",
                    RuntimeWarning,
                    stacklevel=2,
                )
                fast_eval = fast_rot_eval = None
        # use_pallas == "auto" without a TPU: interpret-mode pallas is
        # slower than XLA, stay on the XLA evaluators (by design, no
        # warning)

    # mesh mode: every dense evaluator shards its cell batch over the
    # mesh (footholds/quats/robot replicated); the CSR evaluator is
    # wrapped at factory time below
    eval_dense = _eval_cells
    to_sharded = to_repl = jnp.asarray
    robot_dev = robot
    quats_dev = quats
    if ndev > 1:
        from legmov_tpu.parallel.sharding import (
            sharded_cell_eval,
            stage_for_mesh,
        )

        eval_dense = sharded_cell_eval(mesh, _eval_cells)
        if fast_eval is not None:
            fast_eval = sharded_cell_eval(mesh, fast_eval)
        if fast_rot_eval is not None:
            fast_rot_eval = sharded_cell_eval(mesh, fast_rot_eval)
        # multi-process meshes need explicitly-global shard_map inputs
        # (every process runs this same host loop in SPMD lockstep and
        # contributes its own shard slices); single-process meshes pass
        # through jnp.asarray.  Table COMPUTATIONS stay process-local
        # (identical on every process); only evaluator operands are
        # staged globally.
        to_sharded, to_repl = stage_for_mesh(mesh)
        quats_dev = to_repl(np.asarray(quats))
        robot_dev = jax.tree.map(lambda x: to_repl(np.asarray(x)), robot)

    # pad footholds to a chunk multiple with far-away sentinels that the
    # elongated-box prefilter rejects
    F = footholds.shape[0]
    pad = (-F) % chunk
    fh = np.concatenate(
        [footholds, np.full((pad, 3), 1e9, _f32)]
    ).astype(_f32)
    fh_dev = to_repl(fh)

    # CSR-streaming candidates for orientation-active levels: footholds
    # uploaded ONCE in cell-sorted CSR form; per-cell elongated boxes
    # stream as x-slab windows inside the kernel (no per-batch subsets)
    use_csr = candidates == "csr" or (
        candidates == "auto" and fast_rot_eval is not None
    )
    csr_env = None
    if use_csr and F:
        from legmov_tpu.ops.csr_cell_eval import (
            R_CAP,
            ball_mask_params,
            fetch_width,
            level_tables,
            make_csr_cell_eval,
            pad_csr_soa,
            slab_queue_host_max,
        )
        from legmov_tpu.ops.csr_grid import build_csr_grid

        # ~1 reach per grid cell: 3-4 x-slabs per deep elongated box.
        # LEGMOV_HIER_CS_FRAC scales it for on-chip tuning: fatter
        # slabs pack more real points per fixed-size DMA window (less
        # fetch padding) at the cost of coarser slab role masks.
        cs_cell = reach * float(
            _os.environ.get("LEGMOV_HIER_CS_FRAC", "1.0") or 1.0
        )
        csr = build_csr_grid(footholds.astype(_f32), cs_cell)
        w_fetch = fetch_width(csr_window)
        xs2, ys2, zs2, dead_elem = pad_csr_soa(
            csr.xs, csr.ys, csr.zs, w_fetch
        )
        if ndev > 1:
            xs2, ys2, zs2 = to_repl(xs2), to_repl(ys2), to_repl(zs2)
        csr_env = dict(
            csr=csr, xs2=xs2, ys2=ys2, zs2=zs2, dead_elem=dead_elem,
            w_fetch=w_fetch,
            starts_dev=to_repl(csr.starts), origin_dev=to_repl(csr.origin),
            starts_h=np.asarray(csr.starts), fns={},
            R_CAP=R_CAP, level_tables=level_tables,
            make_eval=make_csr_cell_eval, host_max=slab_queue_host_max,
            ball_params=ball_mask_params,
            interp=jax.default_backend() != "tpu",
        )

    if profile:
        print(
            f"[hier] setup done at +{_time.perf_counter() - _t_solve0:.2f}s "
            f"(factories + foothold upload"
            f"{' + csr grid' if csr_env is not None else ''})",
            flush=True,
        )

    out: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]] = []

    centers = np.asarray([cfg.box_center], _f32)
    half = np.asarray(cfg.box_size, _f32)
    parent_valid = np.zeros(1, bool)

    for depth in range(cfg.max_depth + 1):
        children, child_half = _split_children(centers, half, min_box)
        n_children = children.shape[0] // centers.shape[0]
        child_parent_valid = np.repeat(parent_valid, n_children)
        order = _morton_order(children, child_half)
        children = children[order]
        child_parent_valid = child_parent_valid[order]

        rot_active = bool(half[0] < cfg.enable_rot_below)
        margin = 0.0 if rot_active else cfg.enable_rot_below / 3.0

        # evaluate in power-of-two cell batches (padded) so compilation is
        # bounded to a few shapes while tiny levels don't pay for the full
        # batch size
        C = children.shape[0]
        batch = min(cell_batch, 1 << (max(C - 1, 1)).bit_length())
        if ndev > 1:
            # each batch splits evenly over the mesh (sentinel-padded
            # cells are rejected by every evaluator's prefilter)
            batch = max(ndev, -(-batch // ndev) * ndev)
        valid = np.zeros(C, bool)
        edge = np.zeros(C, bool)
        leaf_ok = np.zeros(C, bool)

        # CSR-streaming path for orientation-active levels (see
        # ``candidates`` in the docstring); per-quat early exit +
        # device-resident candidates make it strictly faster there,
        # with bit-identical flags
        if rot_active and csr_env is not None:
            csr = csr_env["csr"]
            elong_np = (half + np.float32(reach)).astype(_f32)
            r_need = int(np.ceil(elong_np[0] / csr.cell_size)) + 1
        if (rot_active and csr_env is not None
                and r_need <= csr_env["R_CAP"]):
            S = int(np.asarray(quats).shape[0])
            maxch = csr_env["host_max"](
                children, elong_np, csr_env["starts_h"],
                np.asarray(csr.origin), csr.cell_size, csr.dims,
                csr_window,
            )
            # kernel-form default is per RULE, from the r4 on-chip
            # depth-7 ladder: the chunk-major kernel wins shared mode
            # (347 s vs 564 quat-major — one stream per window instead
            # of S), while per-leg keeps the QUAT-major kernel (198.5 s
            # vs 260-271 chunk-major: its per-quat run-state forces an
            # in-kernel fori + dynamic SMEM writes that defeat Mosaic's
            # static-grid pipelining, the same lesson as the r3
            # while-loop ablation).  LEGMOV_CSR_QUAT_MAJOR=1 forces the
            # Mosaic-simpler quat-major form for BOTH rules (escape
            # hatch).
            chunk_major = shared_foothold and not bool(
                int(_os.environ.get("LEGMOV_CSR_QUAT_MAJOR", "0") or 0)
            )
            # LEGMOV_HIER_AUDIT=1: in-kernel work counters per level
            # (chunks evaluated / (chunk, quat) items / leg pipelines —
            # see make_csr_cell_eval audit docs); single-device only
            audit = ndev == 1 and bool(
                int(_os.environ.get("LEGMOV_HIER_AUDIT", "0") or 0)
            )
            # LEGMOV_CSR_CHUNK_MASKS=0 reverts to the r4 per-slab role
            # masks (A/B escape hatch; flags identical either way)
            chunk_masks = bool(int(
                _os.environ.get("LEGMOV_CSR_CHUNK_MASKS", "1") or 1
            ))
            q_base = maxch if chunk_major else S * maxch
            q_steps = max(8, 1 << (max(q_base, 1) - 1).bit_length())
            cells_pad = max(
                8, min(csr_cell_chunk, 1 << (max(C - 1, 1)).bit_length())
            )
            # mesh mode: the batch splits over every device in units of
            # the kernel's 8-row tiles; the factory below is built with
            # the PER-DEVICE cell count
            unit = 8 * ndev
            cells_pad = max(unit, -(-cells_pad // unit) * unit)
            cells_dev = cells_pad // ndev
            if profile:
                print(
                    f"[hier] depth={depth} csr level start at "
                    f"+{_time.perf_counter() - _t_solve0:.2f}s "
                    f"(maxch={maxch})",
                    flush=True,
                )
            key = (S, cells_dev, q_steps, chunk_major, ndev, audit,
                   chunk_masks)
            if key not in csr_env["fns"]:
                ev = csr_env["make_eval"](
                    robot, k=k, n_quats=S, cells=cells_dev,
                    q_steps=q_steps, shared=shared_foothold,
                    window=csr_window, interpret=csr_env["interp"],
                    chunk_major=chunk_major, audit=audit,
                    chunk_masks=chunk_masks,
                )
                if ndev > 1:
                    from legmov_tpu.parallel.sharding import (
                        sharded_csr_cell_eval,
                    )

                    ev = sharded_csr_cell_eval(mesh, ev)
                csr_env["fns"][key] = ev
            ev_csr = csr_env["fns"][key]
            legtab = csr_env["level_tables"](
                quats, jnp.asarray(child_half), jnp.asarray(half),
                robot, float(margin), reach,
            )
            rmounts, reach_l_d, r_cell = csr_env["ball_params"](
                quats, robot, child_half, float(margin)
            )
            elong_d = to_repl(elong_np)
            if ndev > 1:
                legtab = to_repl(legtab)
                rmounts = to_repl(rmounts)
                reach_l_d = to_repl(reach_l_d)
                r_cell = to_repl(np.asarray(r_cell))
            t_disp0 = _time.perf_counter()
            pending_c = []
            for s in range(0, C, cells_pad):
                e = min(s + cells_pad, C)
                n = e - s
                cpad = cells_pad - n
                cc = np.concatenate(
                    [children[s:e], np.full((cpad, 3), 1e9, _f32)]
                )
                pv = np.concatenate(
                    [child_parent_valid[s:e], np.zeros(cpad, bool)]
                )
                res = ev_csr(
                    to_sharded(cc), to_sharded(pv), legtab, elong_d,
                    rmounts, reach_l_d, r_cell,
                    csr_env["xs2"], csr_env["ys2"], csr_env["zs2"],
                    csr_env["starts_dev"], csr_env["origin_dev"],
                    cell_size=csr.cell_size,
                    dims=csr.dims, dead_elem=csr_env["dead_elem"],
                )
                v, ed, lf, over = res[:4]
                pending_c.append(
                    (s, n, jnp.stack([v, ed, lf]), over,
                     res[4] if audit else None)
                )
            t_disp = _time.perf_counter() - t_disp0
            t_fetch0 = _time.perf_counter()
            audit_tot = np.zeros(3, np.int64)
            for s, n, flags, over, cnts in pending_c:
                f = np.asarray(flags)
                if bool(np.asarray(over)):
                    raise RuntimeError(
                        "csr_cell_eval queue truncated (q_steps "
                        f"{q_steps} undersized) — host/device slab "
                        "sizing diverged"
                    )
                valid[s : s + n] = f[0, :n]
                edge[s : s + n] = f[1, :n]
                leaf_ok[s : s + n] = f[2, :n]
                if cnts is not None:
                    audit_tot += np.asarray(cnts)[:n].sum(
                        axis=0, dtype=np.int64
                    )
            if profile:
                t_fetch = _time.perf_counter() - t_fetch0
                print(
                    f"[hier] depth={depth} cells={C} "
                    f"batches={len(pending_c)} batch={cells_pad} "
                    f"rot=True csr q_steps={q_steps} "
                    f"dispatch_s={t_disp:.2f} fetch_s={t_fetch:.2f}",
                    flush=True,
                )
            if audit:
                print(
                    f"[hier-audit] depth={depth} cells={C} "
                    f"chunks_evaluated={int(audit_tot[0])} "
                    f"chunk_quat_evals={int(audit_tot[1])} "
                    f"leg_evals={int(audit_tot[2])} "
                    f"window_elems={csr_env['w_fetch']}",
                    flush=True,
                )
        else:
            pending: list[tuple[int, int, jnp.ndarray]] = []
            sub_bytes = 0
            t_disp0 = _time.perf_counter()
            for s in range(0, C, batch):
                e = min(s + batch, C)
                n = e - s
                cpad = batch - n
                cc = np.concatenate([children[s:e], np.full((cpad, 3), 1e9, _f32)])
                pv = np.concatenate([child_parent_valid[s:e], np.zeros(cpad, bool)])
                # batch-local foothold subset (the octree's elongated-box
                # pruning at batch granularity, several_leg_octree.cu:76-82):
                # only points within the batch bbox expanded by parent_half +
                # reach can pass the per-cell prefilter, and split order keeps
                # batches spatially coherent — at deep levels this shrinks the
                # foothold axis by orders of magnitude.  Sizes are bucketed to
                # powers of two so compilation stays bounded.
                expand = half + np.float32(reach)
                lo = children[s:e].min(axis=0) - expand
                hi = children[s:e].max(axis=0) + expand
                m = np.all((fh >= lo) & (fh <= hi), axis=1)
                sub = fh[m]
                if sub.shape[0] < fh.shape[0] // 2:
                    # bucket to a power of two (bounded compile count), then
                    # round UP to a chunk multiple: the evaluators truncate
                    # the foothold axis to n_chunks * chunk, so a
                    # non-chunk-multiple pad would silently drop real points
                    fsz = max(chunk, 1 << (max(sub.shape[0] - 1, 1)).bit_length())
                    fsz = -(-fsz // chunk) * chunk
                    sub = np.concatenate(
                        [sub, np.full((fsz - sub.shape[0], 3), 1e9, _f32)]
                    )
                    fh_batch = to_repl(sub)
                    sub_bytes += sub.nbytes
                else:
                    fh_batch = fh_dev
                if rot_active:
                    ev = fast_rot_eval if fast_rot_eval is not None \
                        else eval_dense
                else:
                    ev = fast_eval if fast_eval is not None else eval_dense
                v, ed, lf = ev(
                    to_sharded(cc),
                    to_sharded(pv),
                    to_repl(child_half),
                    to_repl(half),
                    fh_batch,
                    quats_dev,
                    robot_dev,
                    k=k,
                    margin=float(margin),
                    reach=reach,
                    chunk=chunk,
                    use_rot=rot_active,
                    shared=shared_foothold,
                )
                # ONE packed device array per batch, fetched after the whole
                # level is dispatched (see docstring)
                pending.append((s, n, jnp.stack([v, ed, lf])))
            t_disp = _time.perf_counter() - t_disp0
            t_fetch0 = _time.perf_counter()
            for s, n, flags in pending:
                f = np.asarray(flags)
                valid[s : s + n] = f[0, :n]
                edge[s : s + n] = f[1, :n]
                leaf_ok[s : s + n] = f[2, :n]
            if profile:
                t_fetch = _time.perf_counter() - t_fetch0
                print(
                    f"[hier] depth={depth} cells={C} batches={len(pending)} "
                    f"batch={batch} rot={rot_active} "
                    f"subset_mb={sub_bytes / 1e6:.1f} "
                    f"dispatch_s={t_disp:.2f} fetch_s={t_fetch:.2f}",
                    flush=True,
                )

        if profile:
            print(
                f"[hier] depth={depth} level done at "
                f"+{_time.perf_counter() - _t_solve0:.2f}s",
                flush=True,
            )
        splittable = bool(np.any(child_half >= min_box))
        refine = edge & ~leaf_ok
        last_level = depth == cfg.max_depth or not splittable
        terminal = ~refine if not last_level else np.ones(C, bool)

        if np.any(terminal):
            n_term = int(terminal.sum())
            out.append(
                (
                    children[terminal],
                    np.broadcast_to(child_half, (n_term, 3)),
                    valid[terminal],
                    refine[terminal] if last_level else np.zeros(n_term, bool),
                    depth,
                )
            )
        if last_level or not np.any(refine):
            break
        centers = children[refine]
        parent_valid = valid[refine]
        half = child_half

    if profile:
        print(
            f"[hier] solve loop done at "
            f"+{_time.perf_counter() - _t_solve0:.2f}s",
            flush=True,
        )
    cs = np.concatenate([o[0] for o in out])
    hs = np.concatenate([o[1] for o in out])
    vs = np.concatenate([o[2] for o in out])
    es = np.concatenate([o[3] for o in out])
    ds = np.concatenate([np.full(o[0].shape[0], o[4]) for o in out])
    return CellRecord(centers=cs, halves=hs, valid=vs, edge=es, depth=ds)
