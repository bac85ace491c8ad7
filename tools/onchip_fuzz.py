"""ON-CHIP (interpret=False) exactness fuzz for the positionability solvers.

tools/solver_fuzz.py runs the Pallas kernels in interpret mode; this tool
closes the remaining gap (VERDICT r2 weak #3): the CSR windowed solver,
the CSR-DMA streaming solver (both ``decide`` modes), and the adaptive
dense solver run with ``interpret=False`` on the session's real backend
and must bit-match the exhaustive ``grid_reachable_legs_topk`` XLA path
computed on the same device.

Compile-cost design: remote Mosaic compiles on this target take minutes
per NEW program, so every trial shares ONE set of compiled programs —
the terrain box is pinned by 8 corner points (constant CSR/grid dims),
the foothold count, pose count, window, schedule, and super_step are
fixed, and only the data varies per seed.  First trial pays the
compiles; the rest run from cache.

Run: ``python tools/onchip_fuzz.py [--trials 6] [--seed 100]
[--robot hex-m2|quad-moonbot]`` — intended for the real TPU (no
backend forcing here, unlike solver_fuzz.py).

Reference anchor: the CPU-twin parity methodology of
one_leg_global.cu:132-147, applied on-device to the solver stack.
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

from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg
from legmov_tpu.models.robot import HEX_MOUNTS, QUAD_MOUNTS, make_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.csr_grid import (
    ball_columns,
    build_csr_grid,
    make_csr_dma_solver,
    make_csr_solver,
)
from legmov_tpu.ops.grid import (
    build_grid,
    cell_size_for,
    grid_reachable_legs_topk,
    neighbor_offsets,
)
from legmov_tpu.ops.pallas_multileg import (
    make_adaptive_grid_solver,
    pad_grid_soa,
)

BOX = 1500.0
Z_LO, Z_HI = -220.0, -60.0
F = 16384  # fixed foothold count (includes the 8 corner pins)
P = 64  # fixed pose count
WINDOW = 256
ROUNDS = ((2, 1.0), (8, 0.5), (0, 0.25))
SUPER_STEP = 8
CAP_FIXED = 4096  # fixed dense-table capacity (lane-padded)


def corner_pins() -> np.ndarray:
    """8 points at the terrain box corners: pins the grid origin and
    dims to constants so every trial reuses the same compiled shapes."""
    return np.asarray(
        [(sx * BOX, sy * BOX, z)
         for sx in (-1, 1) for sy in (-1, 1) for z in (Z_LO, Z_HI)],
        np.float32,
    )


def random_terrain(rng: np.random.Generator) -> np.ndarray:
    """F points inside the pinned box (same families as solver_fuzz)."""
    n = F - 8
    kind = rng.integers(0, 3)
    if kind == 0:  # uniform slab
        fh = rng.uniform(-BOX, BOX, (n, 3)).astype(np.float32)
        fh[:, 2] = rng.uniform(Z_LO, Z_HI, n)
    elif kind == 1:  # clusters
        c = rng.uniform(-BOX * 0.8, BOX * 0.8, (8, 3)).astype(np.float32)
        c[:, 2] = rng.uniform(Z_LO + 20, Z_HI - 20, 8)
        idx = rng.integers(0, 8, n)
        fh = c[idx] + rng.normal(0, 120, (n, 3)).astype(np.float32)
        fh = np.clip(fh, [-BOX, -BOX, Z_LO], [BOX, BOX, Z_HI])
    else:  # slab with a dead zone re-filled outside it (keeps F fixed)
        fh = rng.uniform(-BOX, BOX, (n, 3)).astype(np.float32)
        fh[:, 2] = rng.uniform(Z_LO, Z_HI, n)
        hole = (np.abs(fh[:, 0]) < 500) & (fh[:, 1] > 0)
        fh[hole, 1] = rng.uniform(-BOX, 0, int(hole.sum()))
    return np.concatenate([fh, corner_pins()]).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--seed", type=int, default=100)
    ap.add_argument("--robot", choices=("hex-m2", "quad-moonbot"),
                    default="hex-m2")
    ap.add_argument("--k", type=int, default=0,
                    help="quorum (0 = legs-1, a mid quorum)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode: run the kernels in interpret "
                    "mode (for checking the harness logic off-TPU; the "
                    "on-chip evidence requires the default)")
    args = ap.parse_args()
    interp = args.interpret
    if interp:
        jax.config.update("jax_platforms", "cpu")

    if args.robot == "hex-m2":
        robot = make_robot(HEX_MOUNTS, get_m2_leg)
        L = 6
    else:
        robot = make_robot(QUAD_MOUNTS, get_moonbot_leg)
        L = 4
    k = args.k or (L - 1)

    platform = jax.devices()[0].platform
    print(f"backend={platform} robot={args.robot} k={k} "
          f"F={F} P={P} window={WINDOW} rounds={ROUNDS}", flush=True)

    reach = cell_size_for(robot)
    cell = reach / 2
    offs = neighbor_offsets(cell, reach)
    cols = jnp.asarray(ball_columns(offs))
    offs_d = jnp.asarray(offs)

    sv_csr = make_csr_solver(robot, window=WINDOW, interpret=interp,
                             rounds=ROUNDS)
    sv_dma = make_csr_dma_solver(robot, window=WINDOW, interpret=interp,
                                 rounds=ROUNDS, super_step=SUPER_STEP,
                                 zclip=True)
    sv_dma_q = make_csr_dma_solver(robot, window=WINDOW, interpret=interp,
                                   rounds=ROUNDS, super_step=SUPER_STEP,
                                   decide="quorum", zclip=False)
    sv_ad = make_adaptive_grid_solver(robot, CAP_FIXED, interpret=interp,
                                      rounds=ROUNDS)

    dims0 = None
    bad = 0
    t_start = time.perf_counter()
    for trial in range(args.trials):
        seed = args.seed + trial
        rng = np.random.default_rng(seed)
        fh = random_terrain(rng)
        body = np.stack(
            [rng.uniform(-BOX * 0.8, BOX * 0.8, P),
             rng.uniform(-BOX * 0.8, BOX * 0.8, P),
             rng.uniform(20, 150, P)], -1,
        ).astype(np.float32)
        rpy = rng.uniform(-0.25, 0.25, (P, 3)).astype(np.float32)
        quats = jnp.asarray(quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]))
        body_d = jnp.asarray(body)

        g = build_grid(fh, cell)
        cap = g.points.shape[1]
        assert cap <= CAP_FIXED, f"trial cap {cap} > fixed {CAP_FIXED}"
        # pad the dense table to the FIXED capacity so the adaptive
        # solver's kernel shape is constant across trials
        pts = jnp.pad(g.points, ((0, 0), (0, CAP_FIXED - cap), (0, 0)),
                      constant_values=np.float32(1e9))
        g_fixed = g._replace(points=pts)
        (gx, gy, gz), cap_pad = pad_grid_soa(g_fixed)
        assert cap_pad == CAP_FIXED

        csr = build_csr_grid(fh, cell)
        if dims0 is None:
            dims0 = (csr.dims, g.dims)
            print(f"pinned dims: csr={csr.dims} grid={g.dims}", flush=True)
        assert (csr.dims, g.dims) == dims0, "dims drifted — pins broken"

        t0 = time.perf_counter()
        legs_t, q_t, _ = grid_reachable_legs_topk(
            body_d, quats, g, robot, offs_d, top_k=int(offs.shape[0]), k=k
        )
        legs_t, q_t = np.asarray(legs_t), np.asarray(q_t)

        csr_args = (csr.xs, csr.ys, csr.zs, csr.starts, csr.origin, cols)
        kwargs = dict(cell_size=csr.cell_size, k=k, dims=csr.dims)

        legs_c, q_c, of_c = sv_csr(body_d, quats, *csr_args, **kwargs)
        ok_csr = (np.asarray(legs_c) == legs_t).all() and (
            np.asarray(q_c) == q_t).all()

        legs_d, q_d, of_d = sv_dma(body_d, quats, *csr_args, **kwargs)
        ok_dma = (np.asarray(legs_d) == legs_t).all() and (
            np.asarray(q_d) == q_t).all()

        legs_q, q_q, _ = sv_dma_q(body_d, quats, *csr_args, **kwargs)
        ok_q = (np.asarray(q_q) == q_t).all() and not (
            np.asarray(legs_q) & ~legs_t).any()

        legs_a, q_a, _ = sv_ad(
            body_d, quats, gx, gy, gz, g_fixed.counts, g_fixed.origin,
            g_fixed.cell_size, offs_d, top_k=0, k=k, dims=g_fixed.dims,
        )
        ok_ad = (np.asarray(legs_a) == legs_t).all() and (
            np.asarray(q_a) == q_t).all()

        dt = time.perf_counter() - t0
        ok = ok_csr and ok_dma and ok_q and ok_ad
        print(
            f"{'OK ' if ok else 'FAIL'} seed={seed} feas={int(q_t.sum())}/{P} "
            f"csr={ok_csr} dma={ok_dma} dma_quorum={ok_q} adaptive={ok_ad} "
            f"overflow(csr={bool(np.asarray(of_c))} "
            f"dma={bool(np.asarray(of_d))}) trial_s={dt:.1f}",
            flush=True,
        )
        if not ok:
            bad += 1

    total = time.perf_counter() - t_start
    print(json.dumps({
        "metric": "onchip_fuzz_trials_exact",
        "value": args.trials - bad,
        "unit": f"of {args.trials}",
        "backend": platform,
        "robot": args.robot,
        "interpret": interp,
        "total_s": round(total, 1),
    }))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
