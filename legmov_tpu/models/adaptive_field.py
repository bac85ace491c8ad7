"""Adaptive multi-resolution reachability / distance fields.

TPU-native equivalent of the reference's ``recursive_kernel`` /
``apply_recurs`` (one_leg_global.cu:168-251, cross_compiled.cu:81-139): an
octree over *query space* that only refines cells the workspace boundary
passes through (``|distance(center)| < |cell half-diagonal|``), then paints
each terminal cell's value onto the query points it contains
(``fillOutKernel``, octree_util.cu:9-26).

The CUDA version recurses on-device with dynamic parallelism; here each
level is a sparse list of boundary-cell children evaluated in one batch,
the per-level cell statuses are scattered into a dense lookup grid, and
points resolve their value by indexing those grids level by level — no
recursion, no pointers, static shapes per level.

For a dense N-point grid the workspace boundary is a 2-D surface, so the
number of exact per-point evaluations shrinks from O(N) to roughly
O(N^(2/3)): reachability booleans stay exact everywhere (a cell is only
classified when the boundary provably does not cross it), while distance
vectors are exact for boundary points and cell-center approximations in
certified cells (``exact="all"`` evaluates them exactly instead).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.ops.distance import distance_batch

_f32 = np.float32


@dataclasses.dataclass
class AdaptiveField:
    """Result of an adaptive evaluation over a point batch."""

    reachable: np.ndarray  # [N] bool, exact
    distance: np.ndarray  # [N, 3] displacement; exact where exact_mask
    exact_mask: np.ndarray  # [N] bool
    depth: np.ndarray  # [N] int8 — resolution level that resolved each point
    evals: int  # total distance evaluations performed


def adaptive_distance_field(
    points: np.ndarray,
    leg: LegDimensions,
    max_depth: int = 6,
    margin: float = 1.0,
    exact: str = "boundary",
    dist_fn=None,
) -> AdaptiveField:
    """Evaluate reachability + distance over ``points`` adaptively.

    ``margin`` (mm) widens the boundary band for certification safety:
    a cell is certified only if ``|d(center)| >= cell_radius + margin``
    (the reference uses the bare ``linorm(distance) < linorm(topOffset)``
    test, one_leg_global.cu:215).  ``exact``: "boundary" evaluates true
    distance only for points in uncertified cells; "all" for every point
    (reachability is exact either way).

    ``dist_fn(pts [M, 3]) -> (ok [M] bool, vec [M, 3])`` overrides the
    evaluator used for every batch (default: the XLA ``distance_batch``)
    — the CLI passes the fused Pallas kernel here so the exact
    evaluations run at kernel speed on-chip.  It must honor the
    distance tolerance contract; reachability exactness then follows
    from the certification test alone.
    """
    if dist_fn is None:
        def dist_fn(p):
            return distance_batch(p, leg)

    pts = np.asarray(points, _f32)
    n = pts.shape[0]
    if n == 0:
        return AdaptiveField(
            np.zeros(0, bool), np.zeros((0, 3), _f32), np.zeros(0, bool),
            np.zeros(0, np.int8), 0,
        )
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    span = np.maximum(hi - lo, 1e-3)
    root_half = span / 2 + 1e-3

    reach = np.zeros(n, bool)
    dist = np.zeros((n, 3), _f32)
    resolved = np.zeros(n, bool)
    depth_out = np.full(n, -1, np.int8)
    evals = 0

    # level 0: a single root cell, always treated as boundary
    cell_idx = np.zeros((1, 3), np.int64)  # sparse boundary cells per level
    for d in range(max_depth + 1):
        half = (root_half / (1 << d)).astype(_f32)
        size = 2 * half
        centers = lo + (cell_idx + 0.5) * size
        ok_c, vec_c = dist_fn(jnp.asarray(centers))
        ok_c = np.asarray(ok_c)
        vec_c = np.asarray(vec_c)
        evals += centers.shape[0]
        norm_c = np.linalg.norm(vec_c, axis=1)
        cell_rad = float(np.linalg.norm(half))
        boundary = norm_c < cell_rad + margin

        # resolve points sitting in certified (non-boundary) cells
        pt_idx = np.floor((pts - lo) / size).astype(np.int64)
        np.clip(pt_idx, 0, (1 << d) - 1, out=pt_idx)
        # map point cells onto this level's sparse cell list
        dims = 1 << d
        flat_cells = (cell_idx[:, 0] * dims + cell_idx[:, 1]) * dims + cell_idx[:, 2]
        order = np.argsort(flat_cells)
        flat_pts = (pt_idx[:, 0] * dims + pt_idx[:, 1]) * dims + pt_idx[:, 2]
        pos = np.searchsorted(flat_cells[order], flat_pts)
        pos = np.clip(pos, 0, flat_cells.size - 1)
        hit = flat_cells[order][pos] == flat_pts
        cell_of_pt = order[pos]  # valid where hit

        certify = hit & ~resolved & ~boundary[cell_of_pt]
        if certify.any():
            c = cell_of_pt[certify]
            reach[certify] = ok_c[c]
            dist[certify] = vec_c[c]
            resolved[certify] = True
            depth_out[certify] = d

        if d == max_depth or not boundary.any():
            break
        # children of boundary cells — but only cells with >= 2 still-
        # unresolved points refine (r5): an empty cell can't change any
        # output, and a 1-point cell is cheaper to finish exactly in
        # the final band than to chase with one center eval per level.
        # Without this the octree refines empty space below the
        # point-grid pitch (measured 453k evals for a 53k-point grid at
        # depth 8; with density-aware pruning the count tracks the
        # occupied boundary surface).  Outputs are unchanged: pruned
        # cells resolve nothing, and their points fall through to the
        # exact evaluation band.
        rest_sorted = np.sort(flat_pts[~resolved])
        cnt = (
            np.searchsorted(rest_sorted, flat_cells, side="right")
            - np.searchsorted(rest_sorted, flat_cells, side="left")
        )
        boundary &= cnt >= 2
        if not boundary.any():
            break
        b = cell_idx[boundary]
        offs = np.array(
            [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            np.int64,
        )
        cell_idx = (b[:, None, :] * 2 + offs[None, :, :]).reshape(-1, 3)

    # points in still-boundary cells: evaluate exactly
    rest = ~resolved
    if rest.any():
        ok_r, vec_r = dist_fn(jnp.asarray(pts[rest]))
        reach[rest] = np.asarray(ok_r)
        dist[rest] = np.asarray(vec_r)
        depth_out[rest] = max_depth
        evals += int(rest.sum())

    exact_mask = rest.copy()
    if exact == "all":
        redo = resolved
        if redo.any():
            ok_r, vec_r = dist_fn(jnp.asarray(pts[redo]))
            reach[redo] = np.asarray(ok_r)
            dist[redo] = np.asarray(vec_r)
            evals += int(redo.sum())
        exact_mask[:] = True
    return AdaptiveField(
        reachable=reach, distance=dist, exact_mask=exact_mask,
        depth=depth_out, evals=evals,
    )
