"""Map-scale positionability benchmark (BASELINE.json config 4).

Hexapod (or quadruped) body-pose feasibility over a large rough-terrain
pointcloud with bucket-grid foothold pruning — the workload the reference
runs through its CUDA octree (several_leg_octree.cu).  Generates a
moon_ground terrain at the requested point count (up to 10M+), samples
body-pose candidates hovering above the surface, and measures poses/s for
the per-leg-quorum solve.

Run: ``python tools/map_solve_bench.py [--points 10000000] [--poses 32768]
[--legs 6]``
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.models.robot import HEX_MOUNTS, QUAD_MOUNTS, make_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.grid import (build_grid, cell_size_for,
                                 grid_reachable_legs,
                                 grid_reachable_legs_topk, neighbor_offsets)
from legmov_tpu.terrain import moon_ground


def terrain_at(n_points: int) -> np.ndarray:
    """moon_ground scaled to ~n_points (side rounded to a 128 multiple),
    cached on disk (generation is host-bound at 10M+ points)."""
    side = max(256, int(round(math.sqrt(n_points) / 128.0)) * 128)
    cache = f"/tmp/legmov_moon_{side}.npy"
    if os.path.exists(cache):
        return np.load(cache)
    t = moon_ground(shape=(side, side))
    np.save(cache, t)
    return t


def sample_poses(terrain: np.ndarray, n: int, clearance: float, seed=0):
    """Poses hovering ``clearance`` mm above the nearest terrain point."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, terrain.shape[0], n)
    base = terrain[idx]
    jitter = rng.uniform(-100, 100, (n, 2)).astype(np.float32)
    pos = np.stack(
        [base[:, 0] + jitter[:, 0], base[:, 1] + jitter[:, 1],
         base[:, 2] + clearance],
        axis=-1,
    ).astype(np.float32)
    rpy = rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32)
    return pos, np.asarray(quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10_000_000)
    ap.add_argument("--poses", type=int, default=32768)
    ap.add_argument("--legs", type=int, choices=(4, 6), default=6)
    ap.add_argument("--clearance", type=float, default=180.0)
    ap.add_argument("--k", type=int, default=0, help="leg quorum (0 = all)")
    ap.add_argument("--subdiv", type=int, default=2,
                    help="grid cells per leg reach (finer = tighter pruning)")
    ap.add_argument("--pose-chunk", type=int, default=2048)
    ap.add_argument("--topk", action="store_true", default=True,
                    help="compact to each pose's occupied neighbor cells")
    ap.add_argument("--no-topk", dest="topk", action="store_false")
    ap.add_argument("--fused", action="store_true", default=True,
                    help="use the fused multi-leg Pallas kernel")
    ap.add_argument("--no-fused", dest="fused", action="store_false")
    ap.add_argument("--solver",
                    choices=("csr", "csr-dma", "adaptive", "fused", "xla"),
                    default="csr-dma",
                    help="csr-dma (default) = CSR streaming with in-kernel "
                    "DMA candidate windows (SMEM starts, HBM->VMEM async "
                    "copies); csr = same queue with XLA-gather windows "
                    "(slower; observed to fault the TPU worker at "
                    "10M-point scale on this target); adaptive = "
                    "early-exit dense-table solver; fused = exhaustive "
                    "dense-table kernel; xla = no Pallas")
    ap.add_argument("--rounds", default="",
                    help="override the early-exit schedule as "
                    "cells:pose_fraction pairs")
    ap.add_argument("--decide", choices=("quorum", "legs"), default="quorum",
                    help="quorum = stop a pose once its quorum is decided "
                    "(quorum exact, per-leg bits best-effort); legs = "
                    "resolve every leg bit exactly")
    ap.add_argument("--window", type=int, default=0,
                    help="CSR candidate window (multiple of 128; "
                    "0 = auto from column density)")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--device-csr", action="store_true",
                    help="assemble the CSR grid on device from a z-only "
                    "upload (lattice terrains; ~1/3 the setup bytes)")
    ap.add_argument("--rot-serial", action="store_true",
                    help="rot-sweep: the r2 one-orientation-per-round "
                    "driver instead of the packed r5 default")
    ap.add_argument("--rot-sweep", action="store_true",
                    help="any-orientation feasibility over the 3x3x5 "
                    "orientation sweep (the reference multi_rot_estimator "
                    "workload; csr solvers only)")
    args = ap.parse_args()

    mounts = HEX_MOUNTS if args.legs == 6 else QUAD_MOUNTS
    robot = make_robot(mounts)
    k = args.k or args.legs

    t0 = time.perf_counter()
    terrain = terrain_at(args.points)
    t_terrain = time.perf_counter() - t0
    print(f"terrain: {terrain.shape[0]} points in {t_terrain:.2f}s", flush=True)

    reach = cell_size_for(robot)
    cell = reach / args.subdiv
    offs = jnp.asarray(neighbor_offsets(cell, reach))

    n_chunk = min(args.pose_chunk, args.poses)
    body, quats = sample_poses(terrain, args.poses, args.clearance)
    body_d = jnp.asarray(body[:n_chunk])
    quats_d = jnp.asarray(quats[:n_chunk])
    interp = jax.devices()[0].platform == "cpu"  # pallas on CPU
    rounds = tuple(
        (int(c), float(f))
        for c, f in (p.split(":") for p in args.rounds.split(","))
    ) if args.rounds else None

    if args.solver in ("csr", "csr-dma"):
        from legmov_tpu.ops.csr_grid import (
            ball_columns,
            build_csr_grid,
            make_csr_dma_solver,
            make_csr_solver,
            suggest_rounds,
            suggest_window,
            suggest_zclip,
        )

        t0 = time.perf_counter()
        if args.device_csr:
            # r5 setup reduction: lattice terrains upload only the
            # height field + the two axis vectors (1/3 of the bytes);
            # x/y regenerate on device and the cell sort + offsets run
            # there too (build_csr_grid_device — exact vs the host
            # build, tests/test_csr_tuning.py)
            from legmov_tpu.ops.csr_grid import build_csr_grid_device

            side = int(round(math.sqrt(terrain.shape[0])))
            assert side * side == terrain.shape[0], "non-square lattice"
            csr = build_csr_grid_device(
                np.ascontiguousarray(terrain[:, 2]),
                np.ascontiguousarray(terrain[::side, 0]),
                np.ascontiguousarray(terrain[:side, 1]), cell,
            )
        else:
            csr = build_csr_grid(terrain, cell)
        t_grid = time.perf_counter() - t0
        # one-time device upload of the CSR tables (12 B/point through the
        # relay — the dominant setup cost at 65M points); forced here with
        # a dependent scalar fetch so it is measured, not lazily folded
        # into the first solve.  In --device-csr mode this measures the
        # z-only upload + on-device assembly instead.
        t0 = time.perf_counter()
        jax.block_until_ready((csr.xs, csr.ys, csr.zs, csr.starts))
        float(csr.xs[-1] + csr.ys[-1] + csr.zs[-1] + csr.starts[-1])
        t_upload = time.perf_counter() - t0
        one_time = dict(
            terrain_gen_s=round(t_terrain, 1),
            csr_build_s=round(t_grid, 3),
            csr_upload_s=round(t_upload, 1),
            csr_device_mb=round(csr.xs.nbytes * 3 / 1e6, 1),
            device_csr=bool(args.device_csr),
        )
        cols_np = ball_columns(np.asarray(offs))
        cols = jnp.asarray(cols_np)
        window = args.window or suggest_window(csr)
        kw = dict(window=window, interpret=interp, decide=args.decide)
        # density-aware window + schedule by default: hand-tuned
        # constants starve on dense grids (safety-round churn) and
        # waste lanes/steps on sparse ones
        kw["rounds"] = rounds or suggest_rounds(csr, cols_np, window)
        if args.solver == "csr-dma":
            kw["zclip"] = suggest_zclip(csr, window)
        print(f"window={window}{' (auto)' if not args.window else ''} "
              f"zclip={kw.get('zclip')} "
              f"rounds schedule: {kw['rounds']}"
              f"{' (auto)' if not rounds else ''}", flush=True)
        make_fn = (make_csr_dma_solver if args.solver == "csr-dma"
                   else make_csr_solver)
        csr_solver = make_fn(robot, **kw)
        csr_args = (csr.xs, csr.ys, csr.zs, csr.starts, csr.origin, cols)
        print(
            f"CSR grid: dims={csr.dims} {csr.xs.nbytes * 3 / 1e6:.0f} MB "
            f"device storage, {cols.shape[0]} ball columns, "
            f"window={window}, built in {t_grid:.2f}s",
            flush=True,
        )

        if args.rot_sweep:
            from legmov_tpu.models.pipeline import (
                multirot_positionable,
                multirot_positionable_packed,
                sweep_orientations,
            )

            def solve_fn(b, q):
                _, quorum, _ = csr_solver(
                    b, q, *csr_args, cell_size=csr.cell_size, k=k,
                    dims=csr.dims,
                )
                return quorum

            ors = sweep_orientations()
            body_np = np.asarray(body[:n_chunk])
            # warm/compile with the first orientation
            np.asarray(solve_fn(
                jnp.asarray(body_np),
                jnp.asarray(np.tile(np.asarray(ors)[0], (n_chunk, 1))),
            ))
            driver = (multirot_positionable if args.rot_serial
                      else multirot_positionable_packed)
            t0 = time.perf_counter()
            feasible, per_round = driver(
                solve_fn, body_np, ors
            )
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": "multirot_positionability_poses_per_s",
                "value": round(n_chunk / dt, 1),
                "unit": "poses/s/chip",
                "terrain_points": int(terrain.shape[0]),
                "poses_timed": n_chunk,
                "legs": args.legs,
                "quorum": k,
                "orientations": int(np.asarray(ors).shape[0]),
                "rounds_used": len(per_round),
                "driver": "serial" if args.rot_serial else "packed",
                "feasible_any_orientation": int(feasible.sum()),
                "newly_per_round_head": per_round[:5],
                "sweep_s": round(dt, 3),
                **one_time,
                "device": jax.devices()[0].platform,
                "impl": ("pallas-csr-dma" if args.solver == "csr-dma"
                         else "pallas-csr-window"),
            }))
            return

        from functools import partial

        @partial(jax.jit, static_argnames=("iters", "kk"))
        def chain_csr(b, q, xs, ys, zs, starts, origin, columns, iters, kk):
            def bodyf(_, acc):
                legs, quorum, _ = csr_solver(
                    b + acc, q, xs, ys, zs, starts, origin, columns,
                    cell_size=csr.cell_size, k=kk, dims=csr.dims,
                )
                return acc + jnp.float32(1e-7) * jnp.sum(
                    quorum.astype(jnp.float32)
                )

            return jax.lax.fori_loop(0, iters, bodyf, jnp.float32(0.0))

        def run_chain(it):
            return chain_csr(body_d, quats_d, *csr_args, it, k)

        def final_solve():
            return csr_solver(
                body_d, quats_d, *csr_args,
                cell_size=csr.cell_size, k=k, dims=csr.dims,
            )

        timed_report = dict(
            grid_build_s=round(t_grid, 3),
            candidate_points_per_pose=None,
            top_k=0,
            impl=("pallas-csr-dma" if args.solver == "csr-dma"
                  else "pallas-csr-window"),
            decide=args.decide,
            **one_time,
        )
        run_bench(args, n_chunk, terrain, run_chain, final_solve,
                  timed_report, k)
        return

    t0 = time.perf_counter()
    grid = build_grid(terrain, cell)
    t_grid = time.perf_counter() - t0
    cap = grid.points.shape[1]
    print(
        f"grid: dims={grid.dims} cap={cap} offsets={offs.shape[0]} "
        f"built in {t_grid:.2f}s (native host bucketing)",
        flush=True,
    )

    top_k = 0
    if args.topk:
        # exact required K for this pose set, computed host-side: nonempty
        # neighbor cells per pose (+slack for the chained timing jitter)
        base = np.floor(
            (body[:n_chunk] - np.asarray(grid.origin)) / cell
        ).astype(np.int64)
        offs_np = np.asarray(offs)
        cells = base[:, None, :] + offs_np[None, :, :]
        dims_a = np.asarray(grid.dims)
        ok_rng = np.all((cells >= 0) & (cells < dims_a), axis=-1)
        cl = np.clip(cells, 0, dims_a - 1)
        flat = (cl[..., 0] * dims_a[1] + cl[..., 1]) * dims_a[2] + cl[..., 2]
        counts_np = np.asarray(grid.counts)[flat] * ok_rng
        n_occ = (counts_np > 0).sum(axis=1)
        top_k = min(int(n_occ.max()) + 8, int(offs_np.shape[0]))
        print(
            f"top-k compaction: occupied neighbor cells per pose "
            f"median={int(np.median(n_occ))} max={int(n_occ.max())} "
            f"-> K={top_k} (of {offs_np.shape[0]} offsets)",
            flush=True,
        )

    # dependency-chained slope timing (see bench.py): jitter the pose batch
    # by the previous feasible-count so iterations cannot overlap/fold.
    # The grid table and robot MUST be jit arguments, not closures — a
    # closed-over 10M-point device array would be baked into the program as
    # a constant (and blow up the remote-compile request).
    from functools import partial

    fused_solver = None
    fused_args = ()
    if args.solver in ("adaptive", "fused") and top_k:
        from legmov_tpu.ops.pallas_multileg import (
            make_adaptive_grid_solver,
            make_fused_grid_solver,
            pad_grid_soa,
        )

        (gxp, gyp, gzp), cap_pad = pad_grid_soa(grid)
        fused_args = (gxp, gyp, gzp, grid.counts, grid.origin,
                      grid.cell_size, offs)
        if args.solver == "adaptive":
            kw = dict(interpret=interp, decide=args.decide)
            if rounds:
                kw["rounds"] = rounds
            fused_solver = make_adaptive_grid_solver(robot, cap_pad, **kw)
            print(f"adaptive fused solver: cap_pad={cap_pad}", flush=True)
        else:
            fused_solver = make_fused_grid_solver(
                robot, cap_pad, interpret=interp
            )
            print(f"fused multi-leg kernel: cap_pad={cap_pad}", flush=True)

    @partial(jax.jit, static_argnames=("iters", "kk", "tk"))
    def chain_fused(b, q, gxp, gyp, gzp, counts, origin, cell_size, off,
                    iters, kk, tk):
        def bodyf(_, acc):
            legs, quorum, _ = fused_solver(
                b + acc, q, gxp, gyp, gzp, counts, origin, cell_size, off,
                top_k=tk, k=kk, dims=grid.dims,
            )
            return acc + jnp.float32(1e-7) * jnp.sum(
                quorum.astype(jnp.float32)
            )

        return jax.lax.fori_loop(0, iters, bodyf, jnp.float32(0.0))

    @partial(jax.jit, static_argnames=("iters", "kk", "tk"))
    def chain(b, q, g, rb, off, iters, kk, tk):
        def bodyf(_, acc):
            if tk:
                legs, quorum, _ = grid_reachable_legs_topk(
                    b + acc, q, g, rb, off, top_k=tk, k=kk
                )
            else:
                legs, quorum = grid_reachable_legs(
                    b + acc, q, g, rb, k=kk, offsets=off
                )
            return acc + jnp.float32(1e-7) * jnp.sum(
                quorum.astype(jnp.float32)
            )

        return jax.lax.fori_loop(0, iters, bodyf, jnp.float32(0.0))

    def run_chain(it):
        if fused_solver is not None:
            return chain_fused(body_d, quats_d, *fused_args, it, k, top_k)
        return chain(body_d, quats_d, grid, robot, offs, it, k, top_k)

    def final_solve():
        if fused_solver is not None:
            return fused_solver(
                body_d, quats_d, *fused_args, top_k=top_k, k=k,
                dims=grid.dims,
            )
        if top_k:
            return grid_reachable_legs_topk(
                body_d, quats_d, grid, robot, offs, top_k=top_k, k=k
            )
        legs_r, quorum_r = grid_reachable_legs(
            body_d, quats_d, grid, robot, k=k, offsets=offs
        )
        return legs_r, quorum_r, jnp.zeros((), bool)

    timed_report = dict(
        grid_build_s=round(t_grid, 3),
        candidate_points_per_pose=(top_k or int(offs.shape[0])) * cap,
        top_k=top_k,
        decide=args.decide,
        impl=(
            "pallas-fused-adaptive" if args.solver == "adaptive"
            and fused_solver is not None else
            "pallas-fused" if fused_solver is not None else "xla"
        ),
    )
    run_bench(args, n_chunk, terrain, run_chain, final_solve, timed_report,
              k)


def run_bench(args, n_chunk, terrain, run_chain, final_solve, extra, k):
    def timed(it):
        float(run_chain(it))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run_chain(it))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(1)
    tk = timed(args.iters)
    per = max((tk - t1) / (args.iters - 1), 1e-12)
    legs_r, quorum_r, overflow_r = final_solve()
    feasible = int(np.asarray(quorum_r).sum())
    overflowed = bool(np.asarray(overflow_r).any())
    if overflowed:
        if args.solver in ("csr", "csr-dma", "adaptive"):
            # these solvers append a full-width safety round, so results
            # stay unconditionally exact; the flag means the scheduled
            # rounds starved and the safety round did real (slow) work
            print("NOTE: overflow — round schedule undersized for this "
                  "density; results exact (safety round engaged) but "
                  "timing includes straggler work. Tune --rounds/--window.",
                  flush=True)
        else:
            print("WARNING: overflow — top_k undersized; result may "
                  "under-report", flush=True)
    result = {
        "metric": "positionability_poses_per_s",
        "value": round(n_chunk / per, 1),
        "unit": "poses/s/chip",
        "terrain_points": int(terrain.shape[0]),
        "poses_timed": n_chunk,
        "legs": args.legs,
        "quorum": k,
        "feasible_poses_in_chunk": feasible,
        "solve_s_per_chunk": round(per, 4),
        "overflow": overflowed,
        "device": jax.devices()[0].platform,
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
