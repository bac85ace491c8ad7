"""Uniform bucket-grid foothold pruning for map-scale positionability.

TPU-native replacement for the reference's octree-with-dynamic-parallelism
spatial decomposition (several_leg_octree.cu, octree_util.cu) along the
lines mandated by BASELINE.json: footholds are binned once into a uniform
grid whose cell edge >= the robot's total leg reach, so a body pose can
only ever grab footholds from its own cell and the 26 neighbors.  Instead
of pointer-chasing a tree, every cell is a fixed-capacity, contiguous
``[cap, 3]`` row of a dense ``[n_cells, cap, 3]`` table (sentinel-padded),
and the per-pose candidate set is 27 contiguous-row gathers — each row is
one large sequential DMA, which is why plain linear cell indexing performs
like Morton ordering here (the locality win of Morton codes matters for
point-granularity access, not for 10-100 KB row gathers).

For a P-pose sweep over an F-point map this prunes the (P x F) product to
(P x 27 x cap), a ~F / (27 cap) fold reduction — the same ~99% pruning the
reference gets from its octree early-outs (several_leg_octree.cu:76-82),
with zero divergence and static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.ops.orientation import reachability_oriented

_SENTINEL = np.float32(1e9)


class FootholdGrid(NamedTuple):
    """Bucketed foothold table (device arrays + static geometry)."""

    points: jnp.ndarray  # [n_cells, cap, 3], sentinel-padded
    counts: jnp.ndarray  # [n_cells] int32
    origin: jnp.ndarray  # [3] f32
    cell_size: float  # static
    dims: tuple[int, int, int]  # static


def build_grid(footholds: np.ndarray, cell_size: float) -> FootholdGrid:
    """Bin ``[F, 3]`` footholds into a uniform grid (host-side, once).

    ``cell_size`` must be >= the robot's total leg reach for 3x3x3
    neighborhood completeness (see :func:`cell_size_for`).
    """
    fh = np.asarray(footholds, np.float32)
    if fh.shape[0] == 0:
        return FootholdGrid(
            points=jnp.full((1, 1, 3), _SENTINEL),
            counts=jnp.zeros(1, jnp.int32),
            origin=jnp.zeros(3, jnp.float32),
            cell_size=float(cell_size),
            dims=(1, 1, 1),
        )
    from legmov_tpu import native

    origin = fh.min(axis=0)
    idx = np.floor((fh - origin) / cell_size).astype(np.int64)
    dims = tuple(int(d) + 1 for d in idx.max(axis=0))
    # native OpenMP two-pass scatter when built; NumPy sort-scatter fallback
    table, counts = native.bucket_grid(fh, origin, cell_size, dims, _SENTINEL)
    return FootholdGrid(
        points=jnp.asarray(table),
        counts=jnp.asarray(counts),
        origin=jnp.asarray(origin),
        cell_size=float(cell_size),
        dims=dims,
    )


def cell_size_for(robot: LegDimensions) -> float:
    """Smallest safe cell edge: the robot's maximum foothold distance."""
    return float(
        np.max(
            np.asarray(robot.body)
            + np.asarray(robot.coxa_length)
            + np.asarray(robot.femur_length)
            + np.asarray(robot.tibia_length)
        )
    )


def neighbor_offsets(cell_size: float, reach: float) -> np.ndarray:
    """``[K, 3]`` cell offsets whose cells can contain in-reach footholds.

    For ``cell_size == reach`` this is the classic 3x3x3 neighborhood; for
    finer cells (``cell_size = reach / s``) it is the sphere-pruned ball of
    offsets — the pose sits somewhere inside its own cell, so an offset
    cell is kept iff its nearest corner can be within ``reach`` of any
    point of the center cell (1-cell safety margin per axis).  Finer cells
    trade more (smaller) row gathers for a candidate set that hugs the
    reach sphere instead of the enclosing cube — on dense 2.5-D terrain
    maps this cuts gathered candidates by several fold.
    """
    r_cells = int(np.ceil(reach / cell_size))
    offs = []
    for i in range(-r_cells - 1, r_cells + 2):
        for j in range(-r_cells - 1, r_cells + 2):
            for k in range(-r_cells - 1, r_cells + 2):
                d2 = sum(
                    (max(abs(o) - 1, 0) * cell_size) ** 2 for o in (i, j, k)
                )
                if d2 <= reach * reach:
                    offs.append((i, j, k))
    return np.asarray(offs, np.int32)


@partial(jax.jit, static_argnames=("k",))
def grid_reachable_legs(
    body_pos: jnp.ndarray,  # [P, 3]
    body_quat: jnp.ndarray,  # [P, 4]
    grid: FootholdGrid,
    robot: LegDimensions,
    k: int = 0,
    offsets: jnp.ndarray | None = None,  # [K, 3] int32
):
    """``([P, L] legs-with-foothold, [P] quorum)`` using grid pruning.

    Loops the neighbor offsets (default 3x3x3; pass
    :func:`neighbor_offsets` output for finer-cell grids) with a scan;
    each step gathers one contiguous candidate row per pose and ORs
    per-leg reachability into the accumulator — the bucketed equivalent of
    ops/positionability.py ``reachable_legs``.
    """
    P = body_pos.shape[0]
    L = int(jax.tree.leaves(robot)[0].shape[0])
    nx, ny, nz = grid.dims
    cs = jnp.float32(grid.cell_size)
    base = jnp.floor((body_pos - grid.origin) / cs).astype(jnp.int32)

    if offsets is None:
        offsets = jnp.asarray(
            [(i, j, l) for i in (-1, 0, 1) for j in (-1, 0, 1)
             for l in (-1, 0, 1)],
            jnp.int32,
        )  # [27, 3]

    def per_offset(acc, off):
        cell = base + off  # [P, 3]
        in_range = jnp.all(
            (cell >= 0) & (cell < jnp.asarray([nx, ny, nz], jnp.int32)),
            axis=-1,
        )
        cell = jnp.clip(cell, 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
        flat = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]  # [P]
        cand = grid.points[flat]  # [P, cap, 3] contiguous-row gather
        rel = cand - body_pos[:, None, :]

        def per_pose(rel_p, q):
            def per_leg(leg):
                # sentinel rows are ~1e9 away -> never reachable
                return jnp.any(reachability_oriented(rel_p, leg, q))

            return jax.vmap(per_leg)(robot)  # [L]

        got = jax.vmap(per_pose)(rel, body_quat)  # [P, L]
        got = got & in_range[:, None]
        return acc | got, None

    acc0 = jnp.zeros((P, L), bool)
    legs, _ = jax.lax.scan(per_offset, acc0, offsets)
    quorum = jnp.sum(legs, axis=-1) >= jnp.int32(k if k else L)
    return legs, quorum


@partial(jax.jit, static_argnames=("k", "top_k"))
def grid_reachable_legs_topk(
    body_pos: jnp.ndarray,  # [P, 3]
    body_quat: jnp.ndarray,  # [P, 4]
    grid: FootholdGrid,
    robot: LegDimensions,
    offsets: jnp.ndarray,  # [K_off, 3] int32
    top_k: int,
    k: int = 0,
):
    """Like :func:`grid_reachable_legs` but evaluating, per pose, only its
    ``top_k`` most-populated neighbor cells.

    On 2.5-D terrain the offset ball is mostly empty space (cells above /
    below the surface), so a surface pose typically has far fewer nonempty
    neighbor cells than offsets — compacting to the occupied ones before
    the gather cuts the padded candidate set several-fold.  Returns
    ``(legs [P, L], quorum [P], overflow [P])``; ``overflow`` flags poses
    whose nonempty neighbor count exceeded ``top_k`` (their result may
    miss footholds — re-run them through the exhaustive path).
    """
    P = body_pos.shape[0]
    L = int(jax.tree.leaves(robot)[0].shape[0])
    nx, ny, nz = grid.dims
    cs = jnp.float32(grid.cell_size)
    base = jnp.floor((body_pos - grid.origin) / cs).astype(jnp.int32)

    cell = base[:, None, :] + offsets[None, :, :]  # [P, K_off, 3]
    in_range = jnp.all(
        (cell >= 0) & (cell < jnp.asarray([nx, ny, nz], jnp.int32)), axis=-1
    )
    cellc = jnp.clip(cell, 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
    flat = (cellc[..., 0] * ny + cellc[..., 1]) * nz + cellc[..., 2]
    counts = jnp.where(in_range, grid.counts[flat], 0)  # [P, K_off]
    occupied = counts > 0
    n_occ = jnp.sum(occupied, axis=-1)
    overflow = n_occ > top_k
    _, sel = jax.lax.top_k(counts, top_k)  # [P, top_k] offset indices
    sel_flat = jnp.take_along_axis(flat, sel, axis=-1)
    sel_occ = jnp.take_along_axis(occupied, sel, axis=-1)

    def per_step(acc, idx):
        fl = sel_flat[:, idx]  # [P]
        live = sel_occ[:, idx]
        cand = grid.points[fl]  # [P, cap, 3]
        rel = cand - body_pos[:, None, :]

        def per_pose(rel_p, q):
            def per_leg(leg):
                return jnp.any(reachability_oriented(rel_p, leg, q))

            return jax.vmap(per_leg)(robot)

        got = jax.vmap(per_pose)(rel, body_quat)  # [P, L]
        return acc | (got & live[:, None]), None

    acc0 = jnp.zeros((P, L), bool)
    legs, _ = jax.lax.scan(per_step, acc0, jnp.arange(top_k))
    quorum = jnp.sum(legs, axis=-1) >= jnp.int32(k if k else L)
    return legs, quorum, overflow
