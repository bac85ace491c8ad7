"""CSR (variable-capacity) foothold storage + windowed candidate solver.

The fixed-capacity bucket table (ops/grid.py) pads every cell to the
terrain's densest cell: on the 10M-point moon map that is a 1.95 GB
device table of which ~80% is sentinel padding, and every padded slot
costs full kernel work.  This module stores footholds in CSR form —
points sorted by cell id (z-fastest, so each (x, y) cell *column* is one
contiguous range), plus a ``starts`` prefix array — 12 B/point exactly,
and streams candidates to the fused multi-leg kernel in fixed-size
windows of REAL points:

* the neighbor-offset ball is decomposed once into (dx, dy, dz_lo,
  dz_hi) **columns**; a pose's candidates in one column are one
  contiguous CSR slice;
* per round, each pose builds a queue over the statically nearest-first
  column order, keeping columns relevant to a still-missing leg's reach
  ball (the same exact per-pose relevance as
  pallas_multileg.make_adaptive_grid_solver);
* a while-loop walks fixed ``window`` chunks of each pose's own queue
  (per-pose chunk decode by prefix sums), so dense and sparse poses
  advance independently — no fixed-cap padding anywhere, only ≤1
  partial window per column;
* pose compaction rounds and the proven-infeasible early exit work as in
  the adaptive dense solver; results are exact unless ``overflow``.

Reference anchor: this replaces the octree's per-node foothold loops +
elongated-box early-outs (several_leg_octree.cu:45-131) with sorted-grid
slicing, per BASELINE's Morton/sorted-grid mandate; linear z-fastest cell
order gives the same contiguity Morton codes would here.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.ops.pallas_multileg import (
    POSE_ROWS,
    leg_constants,
    make_multileg_kernel,
    oriented_tables,
    table_width,
    tile_one_leg_bit,
    tile_unrotate,
)
from legmov_tpu.ops.solve_schedule import (
    make_undecided,
    robot_geometry,
    run_schedule,
    wanted,
)

_LANES = 128


def _pose_columns(
    body, quats, starts, origin, columns, cs, dims, mount_vec, reach_l,
    with_zclip: bool = False,
):
    """Per-(pose, column) CSR ranges + per-(pose, column, leg) relevance.

    Returns ``(col_start [P, C], col_len [P, C], rel [P, C, L])`` where
    ``rel`` is the exact leg-reach-ball vs column-AABB test (a column is
    relevant to leg l iff the ball around the pose's rotated mount point
    intersects the column's clamped box) AND the column is non-empty.

    With ``with_zclip`` a fourth element is returned for per-round
    z-subrange clipping: ``(colflat [P, C], zlo [P, C], zhi [P, C],
    dxy2 [P, C, L], cz [P, L])`` — the column's flat cell base
    (z index 0), its ball-clipped z-cell bounds, each leg's squared
    horizontal distance to the column's xy-AABB, and each leg's ball
    center z (body-relative).  A leg's reachable z-range inside a
    column is ``cz ± sqrt(reach² - dxy2)`` (exact superset of its
    reachable footholds there), so a chunk queued for specific missing
    legs may clip the column slice to the union of their z-ranges.
    """
    from legmov_tpu.ops import quaternion as _quat

    nx, ny, nz = dims
    base = jnp.floor((body - origin) / cs).astype(jnp.int32)

    cx = base[:, 0:1] + columns[None, :, 0]  # [P, C]
    cy = base[:, 1:2] + columns[None, :, 1]
    zlo = jnp.clip(base[:, 2:3] + columns[None, :, 2], 0, nz - 1)
    zhi = jnp.clip(base[:, 2:3] + columns[None, :, 3], 0, nz - 1)
    xy_ok = (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
    z_ok = (base[:, 2:3] + columns[None, :, 3] >= 0) & (
        base[:, 2:3] + columns[None, :, 2] <= nz - 1
    )
    ok = xy_ok & z_ok
    cxc = jnp.clip(cx, 0, nx - 1)
    cyc = jnp.clip(cy, 0, ny - 1)
    flat_lo = (cxc * ny + cyc) * nz + zlo
    flat_hi = (cxc * ny + cyc) * nz + zhi
    col_start = starts[flat_lo]  # [P, C]
    col_len = jnp.where(ok, starts[flat_hi + 1] - col_start, 0)

    centers = jax.vmap(
        lambda q: jax.vmap(lambda m: _quat.rotate(q, m))(
            jnp.asarray(mount_vec)
        )
    )(quats)  # [P, L, 3]
    lo = jnp.stack(
        [cxc.astype(jnp.float32) * cs + origin[0] - body[:, 0:1],
         cyc.astype(jnp.float32) * cs + origin[1] - body[:, 1:2],
         zlo.astype(jnp.float32) * cs + origin[2] - body[:, 2:3]],
        axis=-1,
    )  # [P, C, 3]
    hi = lo + jnp.stack(
        [jnp.broadcast_to(cs, cxc.shape),
         jnp.broadcast_to(cs, cxc.shape),
         (zhi - zlo + 1).astype(jnp.float32) * cs], -1,
    )
    nearest = jnp.clip(centers[:, None, :, :], lo[:, :, None, :],
                       hi[:, :, None, :])
    d2 = jnp.sum((nearest - centers[:, None, :, :]) ** 2, -1)
    rel = (d2 <= jnp.asarray(reach_l, jnp.float32)[None, None, :] ** 2)
    rel &= (col_len > 0)[:, :, None]  # [P, C, L]
    if not with_zclip:
        return col_start, col_len, rel
    dxy2 = jnp.sum(
        (nearest[..., :2] - centers[:, None, :, :2]) ** 2, -1
    )  # [P, C, L]
    colflat = (cxc * ny + cyc) * nz  # [P, C] z-index-0 cell base
    return col_start, col_len, rel, (colflat, zlo, zhi, dxy2,
                                     centers[:, :, 2])


class CSRGrid(NamedTuple):
    """Footholds sorted by cell id + prefix offsets (device arrays)."""

    xs: jnp.ndarray  # [F] f32, cell-sorted
    ys: jnp.ndarray  # [F]
    zs: jnp.ndarray  # [F]
    starts: jnp.ndarray  # [n_cells + 1] int32
    origin: jnp.ndarray  # [3] f32
    cell_size: float
    dims: tuple[int, int, int]


def build_csr_grid(footholds: np.ndarray, cell_size: float) -> CSRGrid:
    """Sort ``[F, 3]`` footholds by cell id (z-fastest) and build offsets."""
    fh = np.asarray(footholds, np.float32)
    if fh.shape[0] == 0:
        return CSRGrid(
            xs=jnp.zeros(0, jnp.float32), ys=jnp.zeros(0, jnp.float32),
            zs=jnp.zeros(0, jnp.float32),
            starts=jnp.zeros(2, jnp.int32),
            origin=jnp.zeros(3, jnp.float32),
            cell_size=float(cell_size), dims=(1, 1, 1),
        )
    from legmov_tpu import native

    origin = fh.min(axis=0)
    idx = np.floor((fh - origin) / cell_size).astype(np.int64)
    dims = tuple(int(d) + 1 for d in idx.max(axis=0))
    # native OpenMP counting sort when built; NumPy argsort fallback
    xs, ys, zs, starts = native.csr_grid(fh, origin, cell_size, dims)
    return CSRGrid(
        xs=jnp.asarray(xs),
        ys=jnp.asarray(ys),
        zs=jnp.asarray(zs),
        starts=jnp.asarray(starts),
        origin=jnp.asarray(origin),
        cell_size=float(cell_size),
        dims=dims,
    )


def build_csr_grid_device(
    z_lattice: np.ndarray,
    xs_axis: np.ndarray,
    ys_axis: np.ndarray,
    cell_size: float,
) -> CSRGrid:
    """CSR grid assembled ON DEVICE from a lattice terrain (r5).

    The map-scale setup cost is dominated by the relay upload of the
    terrain SoA (65M points: 780 MB at ~3.5 MB/s through the relay,
    ~225 s — RESULTS.md "End-to-end ops costs").  Lattice terrains
    (every ``moon_ground``/``flat_grid`` map, and the reference's own
    maps.py grids) carry no information in x/y beyond their axis
    vectors, so this path uploads ONLY the height field plus the two
    f32 axes (1/3 of the bytes) and rebuilds the cell-sorted SoA on
    device: x/y regenerated by gathering the uploaded axis values
    (bit-identical to the host lattice by construction — the axes ARE
    the host's f32 values), cell ids in the same f32 op order as
    :func:`build_csr_grid`, a stable device argsort (within-cell order
    = lattice order, matching the host counting sort's stable input
    order), and a bincount+cumsum for the offsets.

    ``terrain[i] = (xs_axis[i // ny_lat], ys_axis[i % ny_lat],
    z_lattice[i])`` — the row-major x-outer layout of
    terrain/maps.py (np.meshgrid indexing="ij").
    """
    import jax

    z = np.asarray(z_lattice, np.float32)
    xa = np.asarray(xs_axis, np.float32)
    ya = np.asarray(ys_axis, np.float32)
    nx_lat, ny_lat = xa.shape[0], ya.shape[0]
    if z.shape[0] != nx_lat * ny_lat:
        raise ValueError("z_lattice length != nx * ny")
    if z.shape[0] == 0:
        return build_csr_grid(np.zeros((0, 3), np.float32), cell_size)
    # origin/dims mirror build_csr_grid's f32 host arithmetic exactly
    # (shapes must be static for the jit below)
    origin = np.array(
        [xa.min(), ya.min(), z.min()], np.float32
    )
    cs = np.float32(cell_size)
    dims = (
        int(np.floor((xa.max() - origin[0]) / cs)) + 1,
        int(np.floor((ya.max() - origin[1]) / cs)) + 1,
        int(np.floor((z.max() - origin[2]) / cs)) + 1,
    )
    nx, ny, nz = dims
    ncell = nx * ny * nz

    @partial(jax.jit, static_argnames=("nyl", "ncells", "nzc", "nyc"))
    def assemble(zd, xad, yad, od, nyl: int, ncells: int, nzc: int,
                 nyc: int):
        n = zd.shape[0]
        i = jnp.arange(n, dtype=jnp.int32)
        x = xad[i // nyl]
        y = yad[i % nyl]
        cx = jnp.floor((x - od[0]) / cs).astype(jnp.int32)
        cy = jnp.floor((y - od[1]) / cs).astype(jnp.int32)
        cz = jnp.floor((zd - od[2]) / cs).astype(jnp.int32)
        cell = (cx * nyc + cy) * nzc + cz
        order = jnp.argsort(cell, stable=True)
        counts = jnp.bincount(cell, length=ncells)
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(counts).astype(jnp.int32)]
        )
        return x[order], y[order], zd[order], starts

    dev = jax.devices()[0]
    zd = jax.device_put(z, dev)
    xs, ys, zs, starts = assemble(
        zd, jax.device_put(xa, dev), jax.device_put(ya, dev),
        jax.device_put(origin, dev), nyl=ny_lat, ncells=ncell,
        nzc=nz, nyc=ny,
    )
    return CSRGrid(
        xs=xs, ys=ys, zs=zs, starts=starts,
        origin=jnp.asarray(origin), cell_size=float(cell_size),
        dims=dims,
    )


def ball_columns(offsets: np.ndarray) -> np.ndarray:
    """Decompose an offset ball into ``[C, 4]`` (dx, dy, dz_lo, dz_hi)
    columns, statically ordered nearest-first (horizontal distance, then
    index) — each column is one contiguous CSR slice per pose."""
    offs = np.asarray(offsets)
    cols: dict[tuple[int, int], list[int]] = {}
    for i, j, k in offs:
        cols.setdefault((int(i), int(j)), []).append(int(k))
    rows = []
    for (i, j), ks in cols.items():
        ks = sorted(ks)
        assert ks == list(range(ks[0], ks[-1] + 1)), "ball z-range not contiguous"
        rows.append((i, j, ks[0], ks[-1]))
    rows.sort(key=lambda r: (r[0] * r[0] + r[1] * r[1], r[:2]))
    return np.asarray(rows, np.int32)


def _column_occupancy(csr: "CSRGrid", quantile: float) -> float:
    """The ``quantile`` of per-(x, y) column occupancy (full z-extent) —
    a conservative upper proxy for any pose's per-column candidate
    count."""
    starts = np.asarray(csr.starts)
    nx, ny, nz = csr.dims
    per_xy = starts[nz::nz][: nx * ny] - starts[0:-1:nz][: nx * ny]
    occ = per_xy[per_xy > 0]
    return float(np.quantile(occ, quantile)) if occ.size else 0.0


def suggest_window(
    csr: "CSRGrid", quantile: float = 0.90,
    lo: int = 1024, hi: int = 8192,
) -> int:
    """Density-aware candidate window for the CSR solvers.

    The optimal window tracks column occupancy up to a hard ceiling:
    on the 10.24M-point moon map (columns ~20k points) widening
    2048 -> 4096 -> 8192 measured 7.0k -> 9.3k -> 11.5k poses/s
    on-chip (fewer grid steps, bigger DMAs) but 16384 collapsed to
    4.8k (the [136, 128] scratch tiles blow past the VMEM pipelining
    sweet spot), and at 1M points (columns ~2k) 4096 beat 2048
    (32.9k vs 27.9k poses/s).  Pick the column occupancy rounded to a
    power of two, clamped to [lo, hi] with the measured 8192 ceiling.
    """
    occ = max(1.0, _column_occupancy(csr, quantile))
    w = 1 << int(np.ceil(np.log2(occ)))
    return int(min(max(w, lo), hi))


def suggest_zclip(
    csr: "CSRGrid", window: int, quantile: float = 0.90
) -> bool:
    """Whether per-round z-subrange clipping pays for this grid.

    Clipping shortens column slices to the missing legs' union ball
    chord, but the kernel evaluates whole windows — so it only saves
    work when columns span multiple windows.  On-chip: +28% at 65M
    points and +63% on the 10M multirot sweep (straggler-heavy), +1.5%
    at 10M, but -12% at 1M where columns fit one window and the
    per-round [A, C, L] clip math is pure overhead.
    """
    return _column_occupancy(csr, quantile) > window


def suggest_rounds(
    csr: "CSRGrid", columns: np.ndarray, window: int,
    quantile: float = 0.90, first: int = 8,
) -> tuple:
    """Density-aware early-exit schedule for the CSR solvers.

    A round over pose fraction ``f`` with quota ``S`` costs roughly
    ``f x P x S`` kernel grid steps no matter how many poses actually
    need it, so the schedule that minimizes wasted (pose, window) slots
    keeps every round's ``f x S`` product constant: start with a SMALL
    full-pose round (most poses on continuous terrain decide within a
    few windows) and extend a doubling-quota / halving-fraction ladder
    until the cumulative quota covers a worst-case pose's full queue —
    on-chip at 10M points, front-loading the budget into the early
    full-pose rounds measured 6.1k poses/s vs 7.0k for a small-start
    schedule of the same total coverage.

    The queue size is estimated from the grid itself: the ``quantile``
    of per-(x, y) column occupancy (full z-extent — a conservative
    upper proxy for any pose's z-window) converted to window chunks,
    times the ball's column count — ~37 chunks on the 1M-point moon
    map, ~370 at 10M (same extent, 10x denser columns).  The target is
    quantized to the next power of two so terrains of similar density
    share the compile cache (round quotas are static shapes; every
    distinct schedule is a distinct compiled program).
    """
    len_col = _column_occupancy(csr, quantile)
    chunks = max(1, int(np.ceil(len_col / window)))
    q = max(2 * first, int(np.asarray(columns).shape[0]) * chunks)
    q = 1 << int(np.ceil(np.log2(q)))
    rounds = []
    quota, frac, done = first, 1.0, 0
    # fraction floor 1/256: at 65M points (q=1024) a 1/64 floor cut the
    # ladder at 504 scheduled chunks and starved ~600-chunk stragglers
    # into the (uncompacted) safety round
    while done + quota < q and frac > 1.0 / 256.0:
        rounds.append((quota, frac))
        done += quota
        quota *= 2
        frac /= 2.0
    rounds.append((0, frac))  # unbounded tail for the stragglers
    # widening tail ladder (r4): ONE fixed-fraction tail undersizes
    # whenever the undecided population entering it exceeds frac * P —
    # measured at 65M (tools/straggler_study.py): 668/2048 poses end
    # with missing legs while the 1/128 tail compacts only 16, so the
    # rest rode the UNCOMPACTED full-width safety round
    # (overflow=True).  Each extra unbounded tail fully finishes the
    # top-k undecided poses it gathers and costs ~nothing once nothing
    # is undecided (empty queues -> the while-loop runs zero kernel
    # steps), so the ladder bounds the safety round to the pathological
    # case of >(1/128 + 1/32 + 1/8 + 1/2) * P stragglers.
    f2 = frac
    while f2 < 0.5:
        f2 = min(4.0 * f2, 0.5)
        rounds.append((0, f2))
    return tuple(rounds)


def _column_queue(cl_, rel_, legs_, scanned_, undecided, w32, mis_=None):
    """Per-pose window queue over still-wanted columns.

    Returns ``(want [A, C], cum [A, C])`` where ``cum`` is the inclusive
    cumsum of per-column chunk counts (``ceil(len / window)`` for wanted
    columns, 0 otherwise) — chunk q of a pose's queue decodes to
    (column, offset-within-column) by searching ``cum``.

    ``mis_`` (DMA solver, aligned layout): per-column start
    misalignment to the DMA quantum; chunks then anchor on the quantum
    grid (count ``ceil((len + mis) / window)``) so each fetch is
    exactly ``window`` elements with zero alignment slack.
    """
    want = wanted(rel_, legs_, scanned_, undecided)
    off = 0 if mis_ is None else mis_
    chunks = jnp.where(want, (cl_ + off + (w32 - 1)) // w32, 0)
    cum = jnp.cumsum(chunks, axis=1)
    return want, cum


def make_csr_solver(
    robot: LegDimensions, window: int = 2048, interpret: bool = False,
    rounds: tuple = ((12, 1.0), (24, 0.5), (48, 0.25), (96, 0.125),
                     (0, 0.0625)),
    decide: str = "legs",
):
    """Windowed CSR positionability solver.

    ``solve(body [P,3], quats [P,4], grid: CSRGrid fields as args,
    columns [C,4], k) -> (legs [P,L], quorum [P], overflow)``.
    ``window`` (multiple of 128) is the candidate chunk per kernel call;
    ``rounds`` are (n_windows, pose_fraction) like the adaptive dense
    solver (0 = no limit, bounded by each pose's own queue).

    A full-width safety round is always appended, so results are
    unconditionally exact: when the scheduled rounds already decided
    every pose, the safety round's live-prefix loop runs ZERO kernel
    steps (its only cost is the queue bookkeeping); when quotas starved,
    it finishes the stragglers.  ``overflow`` reports whether the safety
    round had to do real work (i.e. the schedule was undersized).

    ``decide`` picks the exactness contract / stopping rule:

    * ``"legs"`` (default): every leg bit is resolved exactly — a pose
      scans until each leg either succeeded or exhausted its relevant
      columns.
    * ``"quorum"``: only the quorum bit is guaranteed exact.  A pose
      stops as soon as the quorum is DECIDED: achieved (``found >= k``)
      or impossible (``found + still-open legs < k``).  With ``k == L``
      one proven-infeasible leg kills the pose immediately — the
      octree's per-node early-out (several_leg_octree.cu:117-131) as a
      scan-scheduling rule; for such poses the other legs' bits are
      under-reported (never over-reported), so the final
      ``sum(legs) >= k`` test still returns the exact quorum.
    """
    make_undecided(decide, 0)  # validate ``decide`` eagerly
    if window % _LANES:
        raise ValueError(f"window {window} not a multiple of {_LANES}")
    kernel_fn = make_multileg_kernel(robot, window, interpret)
    L = int(jax.tree.leaves(robot)[0].shape[0])
    mount_vec, reach_l = robot_geometry(robot)

    #: r4 on-chip bisect (tools/gather_fault_bisect.py, RESULTS.md): a
    #: while_loop issuing THREE [poses, window] XLA gathers per step
    #: from ~10M-element f32 source arrays crashes the TPU worker
    #: process at every window width — with NO Pallas involved (the
    #: multi-leg kernel runs clean on the same gathered shapes, and the
    #: identical program survives at 1M).  The fault is in XLA:TPU
    #: gather at large source scale, so this path hard-fails above the
    #: known-good scale instead of letting users crash the shared
    #: worker; the in-kernel-DMA solver (make_csr_dma_solver) runs the
    #: same queues exactly at 65M+ and is the supported map-scale path.
    #: Boundary placed by measurement (r5 probes, /tmp/r5 logs +
    #: RESULTS.md): full solves clean at 2M and 4M (and at 8M, see the
    #: r5 probe), crash at 10M — the guard sits at the largest
    #: round-power scale with measured-clean margin below the fault.
    _GATHER_F_MAX = 4_000_000

    @partial(jax.jit, static_argnames=("k", "dims", "cell_size"))
    def solve(
        body, quats, xs, ys, zs, starts, origin, columns,
        cell_size: float, k: int, dims: tuple,
    ):
        P = body.shape[0]
        C = columns.shape[0]
        F = xs.shape[0]
        if (F > _GATHER_F_MAX and not interpret
                and jax.default_backend() == "tpu"):
            import os as _os

            if not _os.environ.get("LEGMOV_ALLOW_BIG_GATHER"):
                raise ValueError(
                    f"make_csr_solver: {F} footholds exceeds the "
                    f"known-good XLA-gather scale ({_GATHER_F_MAX}) on "
                    "this TPU target - the gather path crashes the TPU "
                    "worker at ~10M-element sources (r4 bisect, "
                    "RESULTS.md).  Use make_csr_dma_solver (exact same "
                    "results, runs at 65M+), or set "
                    "LEGMOV_ALLOW_BIG_GATHER=1 to override."
                )
        if F == 0:
            return (
                jnp.zeros((P, L), bool),
                jnp.zeros(P, bool) if k else jnp.zeros(P, bool),
                jnp.zeros((), bool),
            )
        cs = jnp.float32(cell_size)
        col_start, col_len, rel = _pose_columns(
            body, quats, starts, origin, columns, cs, dims, mount_vec,
            reach_l,
        )

        tab = oriented_tables(body, quats, robot)
        sentinel = jnp.float32(1e9)
        w32 = jnp.int32(window)

        k_eff = jnp.int32(k if k else L)
        undecided = make_undecided(decide, k_eff)

        def run_round(per_pose, rel_, legs_, scanned_, n_windows):
            """Walk up to n_windows chunks of each pose's column queue."""
            tab_, cs_, cl_ = per_pose
            want, cum = _column_queue(
                cl_, rel_, legs_, scanned_, undecided, w32
            )
            q_tot = cum[:, -1]
            limit = jnp.minimum(
                jnp.max(q_tot),
                jnp.int32(n_windows) if n_windows else jnp.int32(1 << 30),
            )

            def cond(c):
                return c[0] < limit

            def step(c):
                q, legs_c = c
                # which column does chunk q of each pose fall in?
                col = jnp.sum((cum <= q).astype(jnp.int32), 1)  # [A]
                colc = jnp.minimum(col, C - 1)
                prev = jnp.where(
                    colc > 0,
                    jnp.take_along_axis(cum, jnp.maximum(colc - 1, 0)[:, None],
                                        1)[:, 0],
                    0,
                )
                within = q - prev
                st = jnp.take_along_axis(cs_, colc[:, None], 1)[:, 0]
                ln = jnp.take_along_axis(cl_, colc[:, None], 1)[:, 0]
                start = st + within * w32
                rem = ln - within * w32
                live = q < q_tot
                pos = jnp.arange(window, dtype=jnp.int32)[None, :]
                idxs = jnp.clip(start[:, None] + pos, 0, max(F - 1, 0))
                mask = live[:, None] & (pos < rem[:, None])

                def take(comp):
                    g = comp[idxs]  # [A, window]
                    return jnp.where(mask, g, sentinel)

                got = kernel_fn(tab_, take(xs), take(ys), take(zs))
                return q + 1, legs_c | got

            q_done, legs_ = jax.lax.while_loop(
                cond, step, (jnp.int32(0), legs_)
            )
            # columns fully consumed this round become scanned; a column
            # cut mid-way is re-queued next round (correct, mildly
            # wasteful)
            scanned_ = scanned_ | (want & (cum <= q_done))
            return legs_, scanned_

        legs, scanned, over_quota = run_schedule(
            tuple(rounds) + ((0, 1.0),),  # full-width safety round
            (tab, col_start, col_len), rel,
            jnp.zeros((P, L), bool), jnp.zeros((P, C), bool),
            undecided, run_round,
        )
        quorum = jnp.sum(legs, axis=-1) >= k_eff
        return legs, quorum, over_quota

    return solve


#: 1-D f32 memrefs are tiled (1024) = 8 sublanes x 128 lanes on this
#: target, so dynamic-start DMA slices must be 1024-aligned in both
#: start and shape; the candidate arrays are kept as [rows, 128] 2-D
#: (dim-0 tiling 8 rows = the same 1024-element quantum).
_ALIGN = 8 * _LANES


def make_csr_dma_solver(
    robot: LegDimensions, window: int = 2048, interpret: bool = False,
    rounds: tuple = ((12, 1.0), (24, 0.5), (48, 0.25), (96, 0.125),
                     (0, 0.0625)),
    decide: str = "legs", super_step: int = 64, zclip: bool = True,
):
    """CSR positionability solver with IN-KERNEL DMA candidate streaming.

    Same contract, schedule semantics, and ``decide`` modes as
    :func:`make_csr_solver`, but the candidate windows are not gathered
    by XLA: per-(pose, step) CSR start offsets ride to the kernel as
    per-tile SMEM blocks ([POSE_ROWS, S] of the [A, S] starts matrix —
    whole-matrix scalar prefetch blows the 1 MB SMEM budget), the
    foothold component arrays stay in HBM (``memory_space=ANY``, laid
    out ``[rows, 128]``), and each grid step DMAs its 8 pose rows'
    windows HBM->VMEM with ``pltpu.make_async_copy`` before running the
    shared circle evaluation (:func:`tile_leg_bits` in single-pose
    ``s_fn`` form over each ``[w_rows, 128]`` tile).  A whole round is ONE ``pallas_call``
    over a ``(pose_tiles, steps)`` grid (the unbounded rounds loop a
    fixed queue in ``super_step``-step grids), replacing the
    while-loop-of-gathers round body.

    Alignment: Mosaic requires dynamic-start DMA slices to respect the
    f32 tiling — (8, 128) for the 2-D layout, i.e. a 1024-element
    quantum.  Every DMA start is the CSR element start rounded DOWN to
    1024 (shipped as a row index, always a multiple of 8) and the fetch
    is widened to ``ceil(window / 1024) * 1024 + 1024`` elements (shape
    a multiple of the quantum too), so the nominal window is always
    covered for any window that is a multiple of 128.

    Exactness rests on the over-fetch property: every candidate window
    contains only real footholds (or the far-sentinel pad), and any
    genuinely reachable foothold lies inside some relevant column that
    the queue fully covers, so evaluating extra real points — window
    tails crossing a column end, align-down widening — can never flip a
    bit the exhaustive path wouldn't set.  Dead chunks point at the
    sentinel pad appended after the real points.

    Reference anchor: replaces the octree's per-node foothold loops
    (several_leg_octree.cu:45-131); the DMA streaming is the TPU-native
    form of the verdict-mandated "scalar-prefetch / async-copy candidate
    streaming" (VERDICT round 1, next-round item 1).
    """
    make_undecided(decide, 0)  # validate ``decide`` eagerly
    if window % _LANES:
        raise ValueError(f"window {window} not a multiple of {_LANES}")
    L = int(jax.tree.leaves(robot)[0].shape[0])
    W = table_width(L)
    legs_const = leg_constants(robot)
    mount_vec, reach_l = robot_geometry(robot)
    # fetch width (the DMA slice SHAPE must respect the (8, 128)
    # tiling, so w_rows is a multiple of 8): ALIGN-multiple windows use
    # the r5 anchored layout — chunks start ON the quantum grid and
    # each fetch is exactly `window` elements (the legacy layout's
    # +1024 slack was pure extra kernel work: +12.5% at w8192, +50% at
    # w2048).  Non-multiple windows keep the legacy widened fetch.
    aligned = window % _ALIGN == 0
    w_fetch = window if aligned else (-(-window // _ALIGN) + 1) * _ALIGN
    w_rows = w_fetch // _LANES  # scratch sublane rows (multiple of 8)

    def make_kernel(dead_row: int):
        del dead_row  # liveness rides in the mask operand now

        def kernel(starts_ref, mask_ref, tab_ref, legsin_ref,
                   xs_ref, ys_ref, zs_ref, o_ref, sx, sy, sz, sems):
            # starts_ref/mask_ref are SMEM-BLOCKED inputs ([POSE_ROWS,
            # S] per pose tile), NOT scalar-prefetch operands: the
            # whole [A, S] matrices in SMEM blow the 1 MB SMEM budget
            # at production pose-chunk sizes (observed: s32[2048, 128]
            # = 1 MB), while a tile only ever reads its own rows.
            # mask_ref[row, s] is the bitmask of legs this chunk's
            # column serves (relevant AND missing at queue-build time);
            # 0 = dead chunk.  Per-leg predication is EXACT: relevance
            # is a superset of reachability (a leg's reachable points
            # lie inside its reach ball), so a leg absent from the mask
            # cannot gain a bit from this chunk, and found legs are
            # monotone.
            s = pl.program_id(1)

            @pl.when(s == 0)
            def _init():
                o_ref[...] = legsin_ref[...]

            comps = ((xs_ref, sx, 0), (ys_ref, sy, 1), (zs_ref, sz, 2))
            for row in range(POSE_ROWS):
                st = starts_ref[row, s]  # row index
                m = mask_ref[row, s]

                @pl.when(m != 0)
                def _start(st=st, row=row):
                    for src, dst, ci in comps:
                        pltpu.make_async_copy(
                            src.at[pl.ds(st, w_rows), :], dst.at[row],
                            sems.at[ci, row],
                        ).start()

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
            for row in range(POSE_ROWS):
                st = starts_ref[row, s]
                m = mask_ref[row, s]

                @pl.when(m != 0)
                def _finish(st=st, m=m, row=row):
                    for src, dst, ci in comps:
                        pltpu.make_async_copy(
                            src.at[pl.ds(st, w_rows), :], dst.at[row],
                            sems.at[ci, row],
                        ).wait()

                    def s_fn(i, _r=row):
                        return tab_ref[_r, i]

                    vx, vy, vz = tile_unrotate(
                        s_fn, sx[row], sy[row], sz[row]
                    )
                    for l, c in enumerate(legs_const):
                        # evaluate ONLY the legs this chunk serves
                        @pl.when(((m >> l) & 1) != 0)
                        def _leg(l=l, c=c):
                            b = tile_one_leg_bit(s_fn, l, c, vx, vy, vz)
                            # scalar any-hit, folded into lane l of the
                            # row's output vector (multiply, not
                            # where-on-bools)
                            hit = (
                                jnp.max(b.astype(jnp.float32)) > 0
                            ).astype(jnp.int32)
                            o_ref[row : row + 1, :] = o_ref[
                                row : row + 1, :
                            ] | ((lane == l).astype(jnp.int32) * hit)

        return kernel

    def dma_round(tab_, legs_i32, starts_mat, mask_mat, dead_row,
                  xs2, ys2, zs2):
        """One ``(tiles, steps)`` grid over a fixed queue chunk."""
        A, S = starts_mat.shape
        smem_spec = pl.BlockSpec((POSE_ROWS, S), lambda t, s: (t, 0),
                                 memory_space=pltpu.SMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(A // POSE_ROWS, S),
            in_specs=[
                # per-tile SMEM blocks, full step axis (8*S ints each;
                # the whole [A, S] matrices as prefetch operands exceed
                # the 1 MB SMEM budget, and Mosaic requires the last
                # block dim to equal the array dim in SMEM)
                smem_spec,
                smem_spec,
                pl.BlockSpec((POSE_ROWS, W), lambda t, s: (t, 0)),
                pl.BlockSpec((POSE_ROWS, _LANES), lambda t, s: (t, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (POSE_ROWS, _LANES), lambda t, s: (t, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((POSE_ROWS, w_rows, _LANES), jnp.float32),
                pltpu.VMEM((POSE_ROWS, w_rows, _LANES), jnp.float32),
                pltpu.VMEM((POSE_ROWS, w_rows, _LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((3, POSE_ROWS)),
            ],
        )
        return pl.pallas_call(
            make_kernel(dead_row),
            out_shape=jax.ShapeDtypeStruct((A, _LANES), jnp.int32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(starts_mat, mask_mat, tab_, legs_i32, xs2, ys2, zs2)

    @partial(jax.jit, static_argnames=("k", "dims", "cell_size"))
    def solve(
        body, quats, xs, ys, zs, starts, origin, columns,
        cell_size: float, k: int, dims: tuple,
    ):
        P = body.shape[0]
        C = columns.shape[0]
        F = xs.shape[0]
        if F == 0:
            return (
                jnp.zeros((P, L), bool),
                jnp.zeros(P, bool),
                jnp.zeros((), bool),
            )
        # the (tiles, steps) grid and live-tile reshapes cover whole
        # POSE_ROWS tiles: pad the pose axis with far-away identity
        # poses (relevant to no column -> zero queue work) and slice the
        # pad off the returned arrays
        pose_pad = (-P) % POSE_ROWS
        if pose_pad:
            body = jnp.concatenate(
                [body, jnp.full((pose_pad, 3), 1e9, body.dtype)]
            )
            quats = jnp.concatenate(
                [quats,
                 jnp.tile(jnp.asarray([1.0, 0, 0, 0], quats.dtype),
                          (pose_pad, 1))]
            )
        P_in, P = P, P + pose_pad
        # sentinel pad: dead chunks DMA from [dead, dead + w_fetch) and
        # window tails clamp into it; sentinels are never reachable.
        # dead is F rounded UP to the align quantum so dead-chunk
        # fetches see only sentinels; total length dead + w_fetch keeps
        # every (aligned-down start) + w_fetch fetch in bounds.
        dead_elem = ((F + _ALIGN - 1) // _ALIGN) * _ALIGN
        pad_n = dead_elem + w_fetch - F

        def pad2d(comp):
            sent = jnp.full((pad_n,), 1e9, jnp.float32)
            return jnp.concatenate([comp, sent]).reshape(-1, _LANES)

        xs2, ys2, zs2 = pad2d(xs), pad2d(ys), pad2d(zs)
        dead = jnp.int32(dead_elem)  # start of the sentinel region
        dead_row = dead_elem // _LANES  # baked into the kernel as the
        # dead-chunk sentinel start (skip marker)

        cs = jnp.float32(cell_size)
        if zclip:
            col_start, col_len, rel, zinfo = _pose_columns(
                body, quats, starts, origin, columns, cs, dims,
                mount_vec, reach_l, with_zclip=True,
            )
            colflat, col_zlo, col_zhi, dxy2, cz = zinfo
            cz_abs = body[:, 2:3] + cz  # [P, L] absolute ball-center z
            reach2 = jnp.asarray(reach_l, jnp.float32)[None, None, :] ** 2
            oz = origin[2]
        else:
            col_start, col_len, rel = _pose_columns(
                body, quats, starts, origin, columns, cs, dims,
                mount_vec, reach_l,
            )
        tab = oriented_tables(body, quats, robot)
        w32 = jnp.int32(window)
        k_eff = jnp.int32(k if k else L)
        undecided = make_undecided(decide, k_eff)

        def clipped_slices(colflat_, zlo_, zhi_, dxy2_, cza_, need):
            """Per-(pose, column) CSR (start, len) clipped to the union
            z-range of the legs in ``need`` [A, C, L].

            Exact superset: leg l's reachable footholds in a column lie
            within ``cz ± sqrt(reach² - dxy2)`` (its ball's z-chord at
            the column's horizontal distance), so clipping the slice to
            the union over still-needed legs can only drop points no
            needed leg could reach.  The union only narrows as legs are
            found (monotone), so marking a clipped column scanned stays
            valid for later rounds."""
            dz = jnp.sqrt(jnp.maximum(reach2 - dxy2_, 0.0))
            any_need = jnp.any(need, -1)
            neg = jnp.float32(-3e38)
            zlo_u = -jnp.max(
                jnp.where(need, -(cza_[:, None, :] - dz), neg), -1
            )
            zhi_u = jnp.max(jnp.where(need, cza_[:, None, :] + dz, neg),
                            -1)
            zlo_u = jnp.where(any_need, zlo_u, 0.0)
            zhi_u = jnp.where(any_need, zhi_u, -1.0)
            zl = jnp.maximum(
                jnp.floor((zlo_u - oz) / cs).astype(jnp.int32), zlo_
            )
            zh = jnp.minimum(
                jnp.floor((zhi_u - oz) / cs).astype(jnp.int32), zhi_
            )
            ok = any_need & (zh >= zl)
            zlc = jnp.clip(zl, 0, jnp.int32(dims[2] - 1))
            zhc = jnp.clip(zh, 0, jnp.int32(dims[2] - 1))
            st = starts[colflat_ + zlc]
            ln = jnp.where(ok, starts[colflat_ + zhc + 1] - st, 0)
            return st, ln

        def starts_for(cs_, cum, legbits, q0, S):
            """Per-(pose, chunk) CSR start ROW indices + leg bitmasks
            for chunks q0 .. q0+S of each pose's queue.

            ``legbits [A, C]`` is the bitmask of legs each column still
            serves (relevant AND missing at queue-build time); dead
            chunks get mask 0, which is the kernel's skip marker."""
            A = cs_.shape[0]
            q = q0 + jnp.arange(S, dtype=jnp.int32)[None, :]  # [1|A, S]
            q = jnp.broadcast_to(q, (A, S))
            col = jnp.sum(
                (cum[:, None, :] <= q[:, :, None]).astype(jnp.int32), -1
            )  # [A, S]
            colc = jnp.minimum(col, C - 1)
            prev = jnp.where(
                colc > 0,
                jnp.take_along_axis(cum, jnp.maximum(colc - 1, 0), 1),
                0,
            )
            within = q - prev
            st = jnp.take_along_axis(cs_, colc, 1)
            if aligned:
                # anchored layout: chunk 0 starts at the column start
                # rounded DOWN to the quantum; every raw is then a
                # quantum multiple and the align-down below is exact.
                # The pre-column elements in chunk 0 are real footholds
                # from neighboring CSR ranges — harmless by the same
                # over-fetch argument as the legacy slack (any okp from
                # a real foothold is a true reachability fact).
                st = st - st % jnp.int32(_ALIGN)
            raw = st + within * w32
            live = q < cum[:, -1:]
            starts_mat = jnp.where(
                live, jnp.clip(raw, 0, dead), dead
            ).astype(jnp.int32)
            # tile-aligned DMA starts, shipped as ROW indices into the
            # [rows, 128] layout (multiples of 8 by construction); the
            # widened fetch keeps the nominal window covered and extra
            # points are real footholds (harmless by over-fetch).  Live
            # starts can never alias the sentinel region: raw < F <=
            # dead_elem, so the align-down lands strictly below it.
            starts_mat = (starts_mat // _ALIGN) * (_ALIGN // _LANES)
            mask_mat = jnp.where(
                live, jnp.take_along_axis(legbits, colc, 1), 0
            ).astype(jnp.int32)
            return starts_mat, mask_mat

        def legs_to_i32(legs_):
            A = legs_.shape[0]
            out = jnp.zeros((A, _LANES), jnp.int32)
            return out.at[:, :L].set(legs_.astype(jnp.int32))

        def run_round(per_pose, rel_, legs_, scanned_, n_windows):
            # legs each column still serves, and (when zclip) the column
            # slice clipped to their union z-range (both exact:
            # relevance is a superset of reachability, found legs are
            # monotone).  zclip pays per-round [A, C, L] work that only
            # helps when columns span multiple windows — callers gate it
            # on column occupancy (see suggest_zclip).
            need0 = rel_ & ~legs_[:, None, :]
            if zclip:
                (tab_, colflat_, zlo_, zhi_, dxy2_, cza_) = per_pose
                cs_, cl_ = clipped_slices(
                    colflat_, zlo_, zhi_, dxy2_, cza_, need0
                )
            else:
                tab_, cs_, cl_ = per_pose
            want, cum = _column_queue(
                cl_, rel_, legs_, scanned_, undecided, w32,
                mis_=(cs_ % jnp.int32(_ALIGN)) if aligned else None,
            )
            need = need0 & want[:, :, None]
            legbits = jnp.sum(
                need.astype(jnp.int32)
                * (1 << jnp.arange(L, dtype=jnp.int32))[None, None, :],
                axis=-1,
            )  # [A, C]
            legs_i = legs_to_i32(legs_)
            if n_windows:
                starts_mat, mask_mat = starts_for(
                    cs_, cum, legbits, jnp.int32(0), n_windows
                )
                legs_i = dma_round(
                    tab_, legs_i, starts_mat, mask_mat, dead_row,
                    xs2, ys2, zs2,
                )
                q_done = jnp.int32(n_windows)
            else:
                q_max = jnp.max(cum[:, -1])

                def cond(c):
                    return c[0] < q_max

                def step(c):
                    q0, li = c
                    starts_mat, mask_mat = starts_for(
                        cs_, cum, legbits, q0, super_step
                    )
                    li = dma_round(tab_, li, starts_mat, mask_mat,
                                   dead_row, xs2, ys2, zs2)
                    return q0 + jnp.int32(super_step), li

                q_done, legs_i = jax.lax.while_loop(
                    cond, step, (jnp.int32(0), legs_i)
                )
            legs_ = legs_i[:, :L] > 0
            scanned_ = scanned_ | (want & (cum <= q_done))
            return legs_, scanned_

        per_pose = (
            (tab, colflat, col_zlo, col_zhi, dxy2, cz_abs) if zclip
            else (tab, col_start, col_len)
        )
        legs, scanned, over_quota = run_schedule(
            tuple(rounds) + ((0, 1.0),),  # full-width safety round
            per_pose, rel,
            jnp.zeros((P, L), bool), jnp.zeros((P, C), bool),
            undecided, run_round,
        )
        quorum = jnp.sum(legs, axis=-1) >= k_eff
        return legs[:P_in], quorum[:P_in], over_quota

    return solve
