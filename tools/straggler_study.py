"""65M-map straggler study: would per-leg z-subrange slicing pay?

The shipped zclip (ops/csr_grid.py ``clipped_slices``) cuts each column's
CSR slice to the UNION z-chord of the legs the chunk still serves.  For a
pose missing ONE leg the union IS that leg's chord, so per-leg slicing
only wins on poses missing 2+ legs whose per-leg chords leave a GAP
inside the union chord — at the cost of per-(column, leg-group) queue
entries.  This tool measures that population (VERDICT r2 next-round
item 8) before anyone builds the machinery:

1. solve one pose chunk exactly (CSR-DMA solver) to get the final
   per-leg bits — the legs a pose is missing at the END are exactly the
   legs whose candidate streams the late straggler rounds must exhaust
   to prove infeasibility (feasible poses leave the queue early);
2. host-side, for every pose with missing legs, per ball column: the
   per-leg z-chords (``cz_l +- sqrt(reach_l^2 - dxy2_l)`` — the same
   exact bound ``clipped_slices`` uses), quantized to CSR z-cells and
   weighted by the actual CSR point counts; compare window-chunk costs
   of the union chord vs the merged per-leg intervals.

Output: one JSON line with the missing-leg pose population and the
chunk-count saving per-leg slicing could deliver on the straggler set.

Reference anchor: the octree's per-node early-out loop
(several_leg_octree.cu:117-131) — the reference has no counterpart
optimization; this bounds one the TPU rebuild considered.

Run (TPU, rides the 65M terrain cache of map_solve_bench):
``python tools/straggler_study.py --points 65000000``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.models.robot import HEX_MOUNTS, QUAD_MOUNTS, make_robot
from legmov_tpu.ops import quaternion as qt
from legmov_tpu.ops.csr_grid import (
    ball_columns,
    build_csr_grid,
    make_csr_dma_solver,
    suggest_rounds,
    suggest_window,
    suggest_zclip,
)
from legmov_tpu.ops.grid import cell_size_for, neighbor_offsets
from legmov_tpu.ops.solve_schedule import robot_geometry

from map_solve_bench import sample_poses, terrain_at


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=65_000_000)
    ap.add_argument("--poses", type=int, default=2048)
    ap.add_argument("--legs", type=int, choices=(4, 6), default=6)
    ap.add_argument("--k", type=int, default=0, help="0 = legs (all)")
    ap.add_argument("--clearance", type=float, default=200.0)
    ap.add_argument("--window", type=int, default=0)
    args = ap.parse_args()

    mounts = HEX_MOUNTS if args.legs == 6 else QUAD_MOUNTS
    robot = make_robot(mounts)
    L = args.legs
    k = args.k or L

    t0 = time.perf_counter()
    terrain = terrain_at(args.points)
    print(f"terrain: {terrain.shape[0]} pts in {time.perf_counter()-t0:.1f}s",
          flush=True)
    reach = cell_size_for(robot)
    cs = reach / 2
    offs = neighbor_offsets(cs, reach)
    cols_np = ball_columns(np.asarray(offs))

    t0 = time.perf_counter()
    csr = build_csr_grid(terrain, cs)
    starts_h = np.asarray(csr.starts)  # host copy for the chunk counting
    origin_h = np.asarray(csr.origin)
    window = args.window or suggest_window(csr)
    rounds = suggest_rounds(csr, cols_np, window)
    print(f"csr built in {time.perf_counter()-t0:.1f}s window={window} "
          f"rounds={rounds}", flush=True)

    body, quats = sample_poses(terrain, args.poses, args.clearance)

    solver = make_csr_dma_solver(
        robot, window=window, rounds=rounds,
        interpret=jax.devices()[0].platform == "cpu",
        zclip=suggest_zclip(csr, window),
    )
    t0 = time.perf_counter()
    legs_b, quorum, overflow = solver(
        jnp.asarray(body), jnp.asarray(quats), csr.xs, csr.ys, csr.zs,
        csr.starts, csr.origin, jnp.asarray(cols_np),
        cell_size=csr.cell_size, k=k, dims=csr.dims,
    )
    legs_b = np.asarray(legs_b)
    print(f"solve: {time.perf_counter()-t0:.1f}s "
          f"feasible={int(np.asarray(quorum).sum())}/{args.poses} "
          f"overflow={bool(np.asarray(overflow))}", flush=True)

    # ---- host-side chord analysis over the missing legs ----
    mount_vec, reach_l = robot_geometry(robot)
    mount_vec = np.asarray(mount_vec, np.float64)
    reach_l = np.asarray(reach_l, np.float64)
    nx, ny, nz = csr.dims

    def rot(q, v):
        return np.asarray(qt.rotate(jnp.asarray(q, jnp.float32),
                                    jnp.asarray(v, jnp.float32)))

    missing = ~legs_b  # [P, L]
    n_missing = missing.sum(axis=1)
    idx_straggler = np.nonzero(n_missing >= 1)[0]
    idx_multi = np.nonzero(n_missing >= 2)[0]

    def col_points(flat_col, zl, zh):
        """CSR point count of column cells z in [zl, zh] (clipped)."""
        if zh < zl:
            return 0
        return int(starts_h[flat_col + zh + 1] - starts_h[flat_col + zl])

    chunks_union = 0  # chunk cost of the union chord (shipped zclip)
    chunks_perleg = 0  # chunk cost of merged per-leg intervals
    gap_poses = 0  # poses where some column's per-leg merge < union
    for p in idx_multi:
        centers = np.stack([rot(quats[p], m) for m in mount_vec])
        centers = centers.astype(np.float64) + body[p]
        ml = np.nonzero(missing[p])[0]
        base = np.floor((body[p] - origin_h) / cs).astype(np.int64)
        gap_here = False
        for dx, dy, dzlo, dzhi in cols_np:
            cx, cy = base[0] + dx, base[1] + dy
            if not (0 <= cx < nx and 0 <= cy < ny):
                continue
            zlo = max(int(base[2] + dzlo), 0)
            zhi = min(int(base[2] + dzhi), nz - 1)
            if zhi < zlo:
                continue
            flat = (cx * ny + cy) * nz
            # column xy-AABB nearest point per missing leg
            x0, x1 = origin_h[0] + cx * cs, origin_h[0] + (cx + 1) * cs
            y0, y1 = origin_h[1] + cy * cs, origin_h[1] + (cy + 1) * cs
            ivals = []
            for l in ml:
                mx = min(max(centers[l, 0], x0), x1)
                my = min(max(centers[l, 1], y0), y1)
                dxy2 = (mx - centers[l, 0]) ** 2 + (my - centers[l, 1]) ** 2
                r2 = reach_l[l] ** 2
                if dxy2 > r2:
                    continue
                dz = np.sqrt(r2 - dxy2)
                zl = int(np.floor((centers[l, 2] - dz - origin_h[2]) / cs))
                zh = int(np.floor((centers[l, 2] + dz - origin_h[2]) / cs))
                zl, zh = max(zl, zlo), min(zh, zhi)
                if zh >= zl:
                    ivals.append((zl, zh))
            if not ivals:
                continue
            ulo = min(i[0] for i in ivals)
            uhi = max(i[1] for i in ivals)
            cu = -(-col_points(flat, ulo, uhi) // window)
            chunks_union += cu
            # merge the per-leg z-cell intervals
            ivals.sort()
            merged = [list(ivals[0])]
            for lo, hi in ivals[1:]:
                if lo <= merged[-1][1] + 1:
                    merged[-1][1] = max(merged[-1][1], hi)
                else:
                    merged.append([lo, hi])
            cp = sum(
                -(-col_points(flat, lo, hi) // window) for lo, hi in merged
            )
            chunks_perleg += cp
            if cp < cu:
                gap_here = True
        if gap_here:
            gap_poses += 1

    saving = (
        (chunks_union - chunks_perleg) / chunks_union
        if chunks_union else 0.0
    )
    print(json.dumps({
        "metric": "straggler_perleg_zslice_saving",
        "value": round(100.0 * saving, 2),
        "unit": "% of multi-missing straggler chunk work",
        "terrain_points": int(terrain.shape[0]),
        "poses": args.poses,
        "legs": L,
        "quorum": k,
        "window": window,
        "poses_missing_any": int(idx_straggler.shape[0]),
        "poses_missing_2plus": int(idx_multi.shape[0]),
        "poses_with_chord_gap": gap_poses,
        "chunks_union": int(chunks_union),
        "chunks_perleg_merged": int(chunks_perleg),
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
