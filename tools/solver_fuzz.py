"""Randomized equivalence fuzz for the positionability solvers.

Draws random terrains (clustered + uniform + holes), robots, quorums,
cell subdivisions, windows, and round schedules, and checks that the CSR
windowed solver and the adaptive dense solver agree EXACTLY with the
exhaustive `grid_reachable_legs_topk` path (legs bits and quorum).  Runs
on CPU in interpret mode; any mismatch prints a full repro seed.

Run: ``python tools/solver_fuzz.py [--trials 20] [--seed 0]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from legmov_tpu.models.robot import HEX_MOUNTS, QUAD_MOUNTS, make_robot
from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg
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


def random_terrain(rng, n):
    kind = rng.integers(0, 3)
    if kind == 0:  # uniform slab
        fh = rng.uniform(-1500, 1500, (n, 3)).astype(np.float32)
        fh[:, 2] = rng.uniform(-200, -80, n)
    elif kind == 1:  # clusters
        c = rng.uniform(-1200, 1200, (8, 3)).astype(np.float32)
        c[:, 2] = rng.uniform(-200, -100, 8)
        idx = rng.integers(0, 8, n)
        fh = c[idx] + rng.normal(0, 120, (n, 3)).astype(np.float32)
    else:  # slab with a hole
        fh = rng.uniform(-1500, 1500, (n, 3)).astype(np.float32)
        fh[:, 2] = rng.uniform(-220, -60, n)
        fh = fh[~((np.abs(fh[:, 0]) < 500) & (fh[:, 1] > 0))]
    return np.ascontiguousarray(fh, np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device", choices=("cpu", "default"), default="cpu",
                    help="cpu (default) forces the CPU backend — the "
                    "kernels run in interpret mode either way, and an "
                    "accidental TPU client from a fuzz loop can wedge "
                    "the shared relay; 'default' keeps the session "
                    "backend (XLA scheduling/gather paths on-device)")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    bad = 0
    for trial in range(args.trials):
        seed = args.seed + trial
        rng = np.random.default_rng(seed)
        mounts = HEX_MOUNTS if rng.random() < 0.5 else QUAD_MOUNTS
        leg_fn = get_m2_leg if rng.random() < 0.5 else get_moonbot_leg
        robot = make_robot(mounts, leg_fn)
        L = len(mounts)
        k = int(rng.integers(1, L + 1))
        subdiv = int(rng.integers(1, 4))
        reach = cell_size_for(robot)
        cell = reach / subdiv
        fh = random_terrain(rng, int(rng.integers(2000, 20000)))
        P = int(rng.integers(2, 7)) * 8
        body = np.stack(
            [rng.uniform(-1200, 1200, P), rng.uniform(-1200, 1200, P),
             rng.uniform(20, 150, P)], -1,
        ).astype(np.float32)
        rpy = rng.uniform(-0.25, 0.25, (P, 3)).astype(np.float32)
        quats = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
        body_d = jnp.asarray(body)

        offs = neighbor_offsets(cell, reach)
        g = build_grid(fh, cell)
        top_k = int(offs.shape[0])
        legs_t, q_t, _ = grid_reachable_legs_topk(
            body_d, quats, g, robot, jnp.asarray(offs), top_k=top_k, k=k
        )
        legs_t, q_t = np.asarray(legs_t), np.asarray(q_t)

        window = int(rng.choice([128, 256, 512, 1024]))
        rounds = (
            (int(rng.integers(1, 6)), 1.0),
            (int(rng.integers(4, 16)), float(rng.choice([0.5, 0.25]))),
            (0, float(rng.choice([0.125, 0.25]))),
        )
        if rng.random() < 0.5:
            # widening tail ladder (r4 suggest_rounds shape): extra
            # unbounded tails must stay exact whether or not anything
            # is left undecided when they run
            rounds = rounds + ((0, min(1.0, rounds[-1][1] * 4)),)
        csr = build_csr_grid(fh, cell)
        cols = jnp.asarray(ball_columns(offs))
        sv = make_csr_solver(robot, window=window, interpret=True,
                             rounds=rounds)
        legs_c, q_c, of_c = sv(
            body_d, quats, csr.xs, csr.ys, csr.zs, csr.starts, csr.origin,
            cols, cell_size=csr.cell_size, k=k, dims=csr.dims,
        )
        ok_csr = (np.asarray(legs_c) == legs_t).all() and (
            np.asarray(q_c) == q_t
        ).all()

        (gx, gy, gz), cap_pad = pad_grid_soa(g)
        ok_ad = True
        if cap_pad <= 8192:
            ad = make_adaptive_grid_solver(
                robot, cap_pad, interpret=True, rounds=rounds
            )
            legs_a, q_a, _ = ad(
                body_d, quats, gx, gy, gz, g.counts, g.origin, g.cell_size,
                jnp.asarray(offs), top_k=0, k=k, dims=g.dims,
            )
            ok_ad = (np.asarray(legs_a) == legs_t).all() and (
                np.asarray(q_a) == q_t
            ).all()

        # in-kernel DMA streaming variant: full legs exactness
        svd = make_csr_dma_solver(
            robot, window=window, interpret=True, rounds=rounds,
            super_step=int(rng.choice([4, 8, 16])),
        )
        legs_d, q_d, _ = svd(
            body_d, quats, csr.xs, csr.ys, csr.zs, csr.starts, csr.origin,
            cols, cell_size=csr.cell_size, k=k, dims=csr.dims,
        )
        ok_dma = (np.asarray(legs_d) == legs_t).all() and (
            np.asarray(q_d) == q_t
        ).all()

        # decide="quorum": quorum must stay exact; leg bits may only be
        # under-reported
        svq = make_csr_solver(robot, window=window, interpret=True,
                              rounds=rounds, decide="quorum")
        legs_q, q_q, _ = svq(
            body_d, quats, csr.xs, csr.ys, csr.zs, csr.starts, csr.origin,
            cols, cell_size=csr.cell_size, k=k, dims=csr.dims,
        )
        ok_q = (np.asarray(q_q) == q_t).all() and not (
            np.asarray(legs_q) & ~legs_t
        ).any()

        tag = "OK " if (ok_csr and ok_ad and ok_q and ok_dma) else "FAIL"
        print(
            f"{tag} seed={seed} legs={L} k={k} subdiv={subdiv} "
            f"F={fh.shape[0]} P={P} win={window} rounds={rounds} "
            f"feas={int(q_t.sum())}/{P} csr={ok_csr} adaptive={ok_ad} "
            f"dma={ok_dma} quorum_mode={ok_q} "
            f"csr_overflow={bool(np.asarray(of_c))}",
            flush=True,
        )
        if not (ok_csr and ok_ad and ok_q and ok_dma):
            bad += 1
    print(f"{args.trials - bad}/{args.trials} trials exact")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
