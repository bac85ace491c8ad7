"""Command-line pipeline: prepare -> evaluate -> report -> solve.

The TPU-native equivalent of the reference's ``LAUNCH.bash`` workflow
(before.py -> ./cuda -> after.py) and of the ``cuda`` binary's ``main()``
(several_leg.cpp:17-224), as one CLI:

* ``prepare``  — generate terrain + body-candidate voxel grid + query grid,
  write the reference's ``.bin`` SoA files (before.py semantics);
* ``evaluate`` — read the query grid, run reachability + distance on the
  accelerator, write ``out_reachability.bin`` / ``out_dist_x{x,y,z}.bin``
  and print ms / ns-per-point like several_leg.cpp:151-155;
* ``report``   — render the reachability / distance images and the
  reachable-volume estimate (after.py semantics);
* ``solve``    — hierarchical body-pose positionability over the terrain
  (the several_leg_octree path), writing valid cell centers;
* ``map``      — flat body-pose feasibility over the prepared body
  voxel candidates (the several_leg.cu eliminateUnreachable /
  agregateReachability surface) via the CSR-DMA streaming solver.

Run as ``python -m legmov_tpu.cli <command> [options]``.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from legmov_tpu import io as lio

LEGS = ("moonbot", "m2")


def _get_leg(name: str, azimuth: float = 0.0):
    from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg

    return {"moonbot": get_moonbot_leg, "m2": get_m2_leg}[name](azimuth)


def cmd_prepare(args) -> None:
    from legmov_tpu.terrain import moon_ground

    os.makedirs(args.dir, exist_ok=True)
    terrain = moon_ground(seed=args.seed)
    np.save(os.path.join(args.dir, "map.npy"), terrain)
    lio.save_points(terrain, os.path.join(args.dir, "numpy_input_t"))
    print("map shape:", terrain.shape)

    # body-candidate voxel grid over the map extent + 350 mm of height
    # (before.py:24-61)
    vox = args.voxel
    xs = np.arange(terrain[:, 0].min(), terrain[:, 0].max(), vox)
    ys = np.arange(terrain[:, 1].min(), terrain[:, 1].max(), vox)
    zs = np.arange(terrain[:, 2].min(), terrain[:, 2].max() + 350, vox)
    X, Y, Z = np.meshgrid(xs, ys, zs)
    body = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    lio.save_points(body, os.path.join(args.dir, "numpy_input_b"))
    print("body samples shape:", body.shape)

    # reachability/distance query grid (before.py:65-99 WHOLE3D)
    pix = args.pix_size
    xs = np.arange(-100, 601, pix)
    ys = np.arange(-400, 401, pix)
    zs = np.arange(-500, 201, pix)
    X, Y, Z = np.meshgrid(xs, ys, zs)
    grid = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    lio.save_points(grid, os.path.join(args.dir, "dist_input_t"))
    print("reachability shape:", grid.shape)


def cmd_evaluate(args) -> None:
    import jax
    import jax.numpy as jnp

    from legmov_tpu.ops.distance import distance_batch
    from legmov_tpu.ops.reachability import reachability_batch

    leg = _get_leg(args.leg)
    comps = lio.load_components(os.path.join(args.dir, "dist_input_t"))
    n = comps[0].shape[0]
    if n == 0:
        raise SystemExit("no dist_input_t{x,y,z}.bin found; run prepare first")

    backend = args.backend
    if backend == "auto":
        backend = "xla" if (
            args.no_pallas or jax.devices()[0].platform == "cpu"
        ) else "pallas"
    if backend in ("oracle", "ik"):
        # the reference main()'s ComputeMode switch (several_leg.cpp:
        # 143-148: GPUMode / CPUMode / RBDLMode) — the CPU twin and the
        # LM-IK baseline as product backends for end-to-end
        # cross-checks on user data.  Both are host-side Python
        # (~30-300 us/point); meant for audit runs, not throughput.
        t0 = time.perf_counter()
        pts = np.stack(comps, axis=-1)
        if backend == "oracle":
            from legmov_tpu.oracle.numpy_ref import (
                oracle_distance,
                oracle_reachability,
            )

            reach = oracle_reachability(pts, leg)
            _, vec = oracle_distance(pts, leg)
            vec_comps = (vec[:, 0], vec[:, 1], vec[:, 2])
        else:
            from legmov_tpu.oracle.ik_oracle import ik_reachability

            # like the reference's RBDLMode, the LM-IK baseline
            # produces reachability only
            reach = ik_reachability(pts, leg)
            vec_comps = None
        dt = time.perf_counter() - t0
        lio.save_bools(reach, os.path.join(args.dir, "out_reachability.bin"))
        if vec_comps is not None:
            for comp, ax in zip(vec_comps, "xyz"):
                lio.save_array(
                    comp, os.path.join(args.dir, f"out_dist_x{ax}.bin")
                )
        else:
            print("ik backend: reachability only (no distance outputs), "
                  "matching the reference's RBDLMode")
        print(f"{backend}: {n} points in {dt:.2f} s "
              f"({dt / n * 1e9:.0f} ns/point, host CPU)")
        print(f"reachable fraction: {float(reach.mean()):.4f}")
        return
    use_pallas = backend == "pallas"
    if args.adaptive:
        # adaptive multi-resolution evaluation (the reference's
        # recursive_kernel/apply_recurs product path,
        # one_leg_global.cu:168-251, cross_compiled.cu:81-139):
        # reachability stays bit-identical to the dense path; distance
        # is exact on boundary-band points and a cell-center paint in
        # certified cells (exactly the reference's fillOutKernel
        # semantics, octree_util.cu:9-26)
        from legmov_tpu.models.adaptive_field import (
            adaptive_distance_field,
        )

        dist_fn = None
        if use_pallas:
            from legmov_tpu.ops.pallas_kernels import make_distance_kernel

            kd = make_distance_kernel(leg)

            def dist_fn(p):
                # pow2 bucketing bounds the compile count across the
                # per-level batch shapes
                m = p.shape[0]
                cap = 1 << max(m - 1, 1).bit_length()
                pp = jnp.pad(p, ((0, cap - m), (0, 0)))
                ok, vec = kd(pp)
                return ok[:m], vec[:m]

        pts = np.stack(comps, axis=-1)
        t0 = time.perf_counter()
        f = adaptive_distance_field(
            pts, leg, max_depth=args.adaptive_depth, dist_fn=dist_fn
        )
        t_all = time.perf_counter() - t0
        reach = f.reachable
        vec_comps = (f.distance[:, 0], f.distance[:, 1], f.distance[:, 2])
        n23 = n ** (2.0 / 3.0)
        print(
            f"adaptive: {n} points, {f.evals} exact distance evals "
            f"(N^(2/3)={n23:.0f}, evals/N^(2/3)={f.evals / n23:.2f}, "
            f"evals/N={f.evals / n:.4f}), exact-distance fraction "
            f"{float(f.exact_mask.mean()):.4f}, {t_all:.2f} s total"
        )
        lio.save_bools(reach, os.path.join(args.dir, "out_reachability.bin"))
        for comp, ax in zip(vec_comps, "xyz"):
            lio.save_array(
                comp, os.path.join(args.dir, f"out_dist_x{ax}.bin")
            )
        frac = float(reach.mean()) if n else 0.0
        print(f"reachable fraction: {frac:.4f}")
        return
    if use_pallas:
        # fused SoA kernels: the .bin protocol is already SoA, so no
        # layout conversion happens anywhere on this path
        from legmov_tpu.ops.pallas_kernels import (
            make_distance_kernel,
            make_reachability_kernel,
        )

        kr = make_reachability_kernel(leg)
        kd = make_distance_kernel(leg)
        x, y, z = (jnp.asarray(c) for c in comps)

        t0 = time.perf_counter()
        reach = np.asarray(kr.soa(x, y, z))
        t_reach = time.perf_counter() - t0
        t0 = time.perf_counter()
        ok, dx, dy, dz = kd.soa(x, y, z)
        vec_comps = (np.asarray(dx), np.asarray(dy), np.asarray(dz))
        t_dist = time.perf_counter() - t0
    else:
        pts = jnp.asarray(np.stack(comps, axis=-1))
        t0 = time.perf_counter()
        reach = np.asarray(reachability_batch(pts, leg))
        t_reach = time.perf_counter() - t0
        t0 = time.perf_counter()
        ok, vec = distance_batch(pts, leg)
        vec = np.asarray(vec)
        t_dist = time.perf_counter() - t0
        vec_comps = (vec[:, 0], vec[:, 1], vec[:, 2])

    lio.save_bools(reach, os.path.join(args.dir, "out_reachability.bin"))
    for comp, ax in zip(vec_comps, "xyz"):
        lio.save_array(comp, os.path.join(args.dir, f"out_dist_x{ax}.bin"))
    print(
        f"reachability: {n} points in {t_reach*1e3:.2f} ms "
        f"({t_reach/n*1e9:.3f} ns/point incl. host transfer)"
    )
    print(
        f"distance: {n} points in {t_dist*1e3:.2f} ms "
        f"({t_dist/n*1e9:.3f} ns/point incl. host transfer)"
    )
    frac = float(reach.mean()) if n else 0.0
    print(f"reachable fraction: {frac:.4f}")


def cmd_report(args) -> None:
    from legmov_tpu.viz import (
        reachable_volume_m3,
        render_distance,
        render_reachability,
    )

    targets = lio.load_points(os.path.join(args.dir, "dist_input_t"))
    reach = lio.load_bools(os.path.join(args.dir, "out_reachability.bin"))
    dist = lio.load_points(os.path.join(args.dir, "out_dist_x"))
    render_reachability(
        targets, reach, os.path.join(args.dir, "reachability_result.png")
    )
    render_distance(
        targets,
        dist,
        os.path.join(args.dir, "distance_result.png"),
        pix_size=args.pix_size,
    )
    np.save(os.path.join(args.dir, "leg0_reach.npy"), reach)
    vol = reachable_volume_m3(reach, args.pix_size)
    print(f"reachable volume: {vol:.4f} m^3")
    print("wrote reachability_result.png, distance_result.png, leg0_reach.npy")


def cmd_solve(args) -> None:
    from legmov_tpu.config import SolverConfig
    from legmov_tpu.models.hier_solver import solve_positionability
    from legmov_tpu.models.robot import make_robot
    from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg

    from legmov_tpu.models.robot import HEX_MOUNTS, QUAD_MOUNTS

    terrain = lio.load_points(os.path.join(args.dir, "numpy_input_t"))
    if terrain.shape[0] == 0:
        raise SystemExit("no terrain; run prepare first")
    leg_fn = {"moonbot": get_moonbot_leg, "m2": get_m2_leg}[args.leg]
    mounts = HEX_MOUNTS if args.legs == 6 else QUAD_MOUNTS
    robot = make_robot(mounts, leg_fn=leg_fn)
    cfg = SolverConfig(
        box_center=tuple(np.median(terrain, axis=0).tolist()),
        box_size=(args.box, args.box, args.box),
        max_depth=args.depth,
        min_box=(args.min_box,) * 3,
        enable_rot_below=args.rot_below,
        legs_for_stability=args.k,
    )
    t0 = time.perf_counter()
    res = solve_positionability(
        terrain, robot, cfg, shared_foothold=(args.mode == "shared"),
        cell_batch=args.cell_batch,
        csr_window=args.csr_window, csr_cell_chunk=args.csr_cell_chunk,
    )
    dt = time.perf_counter() - t0
    valid = res.centers[res.valid]
    lio.save_points(valid, os.path.join(args.dir, "out_valid_cells_"))
    np.save(os.path.join(args.dir, "robot_reach.npy"), valid)
    print(
        json.dumps(
            {
                "cells": int(res.centers.shape[0]),
                "valid": int(res.valid.sum()),
                "edge": int(res.edge.sum()),
                "max_depth": int(res.depth.max()) if res.depth.size else 0,
                "seconds": round(dt, 3),
            }
        )
    )


def cmd_map(args) -> None:
    """Flat body-pose feasibility map over the prepared candidates.

    The reference's dense multi-leg elimination surface
    (several_leg.cu ``eliminateUnreachable``/``agregateReachability``
    over the before.py body voxel grid) at map scale: every body
    candidate from ``numpy_input_b`` is tested for >= k reachable legs
    against the terrain footholds, through the CSR-DMA streaming solver
    (ops/csr_grid.py).  Writes the feasible candidates as
    ``out_feasible_body_*.bin`` + ``body_feasible.npy`` (bool mask)."""
    import jax
    import jax.numpy as jnp

    from legmov_tpu.models.robot import HEX_MOUNTS, QUAD_MOUNTS, make_robot
    from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg
    from legmov_tpu.ops.csr_grid import (ball_columns, build_csr_grid,
                                         make_csr_dma_solver,
                                         make_csr_solver, suggest_rounds,
                                         suggest_window, suggest_zclip)
    from legmov_tpu.ops.grid import cell_size_for, neighbor_offsets

    terrain = lio.load_points(os.path.join(args.dir, "numpy_input_t"))
    body = lio.load_points(os.path.join(args.dir, "numpy_input_b"))
    if terrain.shape[0] == 0 or body.shape[0] == 0:
        raise SystemExit("no terrain/body candidates; run prepare first")
    leg_fn = {"moonbot": get_moonbot_leg, "m2": get_m2_leg}[args.leg]
    mounts = HEX_MOUNTS if args.legs == 6 else QUAD_MOUNTS
    robot = make_robot(mounts, leg_fn=leg_fn)

    reach = cell_size_for(robot)
    cell = reach / args.subdiv
    offs = neighbor_offsets(cell, reach)
    csr = build_csr_grid(terrain, cell)
    cols_np = ball_columns(np.asarray(offs))
    cols = jnp.asarray(cols_np)
    window = args.window or suggest_window(csr)
    rounds = suggest_rounds(csr, cols_np, window)
    interp = jax.devices()[0].platform == "cpu"
    kw = dict(window=window, rounds=rounds, interpret=interp,
              decide="quorum")
    if args.solver == "csr-dma":
        kw["zclip"] = suggest_zclip(csr, window)
        make_fn = make_csr_dma_solver
    else:
        make_fn = make_csr_solver
    solver = make_fn(robot, **kw)

    P = body.shape[0]
    chunk = min(args.pose_chunk, P)
    feasible = np.zeros(P, bool)
    t0 = time.perf_counter()
    for lo in range(0, P, chunk):
        hi = min(lo + chunk, P)
        b = body[lo:hi]
        if hi - lo < chunk:  # pad the tail: one compiled shape total
            b = np.concatenate(
                [b, np.full((chunk - (hi - lo), 3), 1e9, np.float32)]
            )
        if args.rot_sweep:
            from legmov_tpu.models.pipeline import multirot_positionable

            def solve_fn(bb, qq):
                _, quorum, _ = solver(
                    bb, qq, csr.xs, csr.ys, csr.zs, csr.starts,
                    csr.origin, cols, cell_size=csr.cell_size, k=args.k,
                    dims=csr.dims,
                )
                return quorum

            got, _ = multirot_positionable(solve_fn, b)
        else:
            ident = np.tile(
                np.asarray([1.0, 0, 0, 0], np.float32), (chunk, 1)
            )
            _, quorum, _ = solver(
                jnp.asarray(b), jnp.asarray(ident), csr.xs, csr.ys,
                csr.zs, csr.starts, csr.origin, cols,
                cell_size=csr.cell_size, k=args.k, dims=csr.dims,
            )
            got = np.asarray(quorum)
        feasible[lo:hi] = got[: hi - lo]
    dt = time.perf_counter() - t0

    lio.save_points(body[feasible],
                    os.path.join(args.dir, "out_feasible_body_"))
    np.save(os.path.join(args.dir, "body_feasible.npy"), feasible)
    print(json.dumps({
        "body_candidates": int(P),
        "feasible": int(feasible.sum()),
        "terrain_points": int(terrain.shape[0]),
        "legs": args.legs,
        "k": args.k,
        "orientations": 45 if args.rot_sweep else 1,
        "seconds": round(dt, 3),
        "poses_per_s": round(P / max(dt, 1e-9), 1),
    }))


def main() -> None:
    ap = argparse.ArgumentParser(prog="legmov_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("prepare", help="generate terrain + grids -> .bin files")
    p.add_argument("--dir", default="data")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--voxel", type=float, default=50.0)
    p.add_argument("--pix-size", type=float, default=5.0)
    p.set_defaults(fn=cmd_prepare)

    p = sub.add_parser("evaluate", help="run reachability+distance kernels")
    p.add_argument("--dir", default="data")
    p.add_argument("--leg", choices=LEGS, default="m2")
    p.add_argument("--no-pallas", action="store_true",
                   help="force the XLA path even on accelerator")
    p.add_argument("--backend",
                   choices=("auto", "pallas", "xla", "oracle", "ik"),
                   default="auto",
                   help="compute mode (several_leg.cpp:143-148 "
                   "ComputeMode): auto = pallas on accelerator / xla on "
                   "CPU; oracle = strict-fp32 scalar CPU twin; ik = "
                   "LM-IK baseline (reachability only, like RBDLMode)")
    p.add_argument("--adaptive", action="store_true",
                   help="adaptive multi-resolution evaluation "
                   "(recursive_kernel equivalent): exact reachability "
                   "at ~O(N^(2/3)) distance evaluations")
    p.add_argument("--adaptive-depth", type=int, default=8,
                   help="max refinement depth of the adaptive octree")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("report", help="render result images")
    p.add_argument("--dir", default="data")
    p.add_argument("--pix-size", type=float, default=5.0)
    p.set_defaults(fn=cmd_report)

    p = sub.add_parser("solve", help="hierarchical positionability solve")
    p.add_argument("--dir", default="data")
    p.add_argument("--leg", choices=LEGS, default="m2")
    p.add_argument("--legs", type=int, choices=(4, 6), default=4,
                   help="leg count: 4 = QUAD_MOUNTS (settings.h:42), "
                   "6 = HEX_MOUNTS")
    p.add_argument("--box", type=float, default=5000.0)
    p.add_argument("--depth", type=int, default=1)
    p.add_argument("--min-box", type=float, default=100.0,
                   help="per-axis minimum cell half-extent (settings.h:17 "
                   "MIN_BOX); below enable-rot-below/2 the orientation "
                   "sweep activates for the refined cells")
    p.add_argument("--rot-below", type=float, default=50.0,
                   help="orientation sampling activates for cells smaller "
                   "than this (settings.h:33 EnableRotBelow)")
    p.add_argument("--k", type=int, default=4,
                   help="legs-for-stability quorum (settings.h:46)")
    p.add_argument(
        "--mode",
        choices=("shared", "per-leg"),
        default="per-leg",
        help="shared = reference octree rule (k legs on one foothold); "
        "per-leg = each leg may use its own foothold",
    )
    p.add_argument("--cell-batch", type=int, default=1024,
                   help="cells per dispatch on identity (non-rot) levels; "
                   "larger batches cut per-dispatch relay latency on deep "
                   "identity levels at the cost of bigger compiles")
    p.add_argument("--csr-window", type=int, default=0,
                   help="CSR cell-evaluator candidate window (multiple "
                   "of 128; 0 = per-mode optimum: 2048 shared / 1024 "
                   "per-leg, measured r4)")
    p.add_argument("--csr-cell-chunk", type=int, default=0,
                   help="cell batch size for the CSR deep levels "
                   "(0 = per-mode optimum: 16384 shared / 32768 "
                   "per-leg, measured r4)")
    p.set_defaults(fn=cmd_solve)

    p = sub.add_parser(
        "map", help="flat body-pose feasibility map (CSR streaming solve)"
    )
    p.add_argument("--dir", default="data")
    p.add_argument("--leg", choices=LEGS, default="m2")
    p.add_argument("--legs", type=int, choices=(4, 6), default=4,
                   help="mount count (4 = quad like the reference robot)")
    p.add_argument("--k", type=int, default=4,
                   help="legs-for-stability quorum (settings.h:46)")
    p.add_argument("--subdiv", type=int, default=2,
                   help="grid cells per leg reach")
    p.add_argument("--window", type=int, default=0,
                   help="CSR candidate window (multiple of 128; "
                   "0 = auto from column density)")
    p.add_argument("--pose-chunk", type=int, default=2048)
    p.add_argument("--solver", choices=("csr-dma", "csr"),
                   default="csr-dma")
    p.add_argument("--rot-sweep", action="store_true",
                   help="accept a candidate if ANY of the 3x3x5 "
                   "orientation sweep stands (multi_rot_estimator "
                   "semantics) instead of identity orientation only")
    p.set_defaults(fn=cmd_map)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
