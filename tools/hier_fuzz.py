"""Randomized equivalence fuzz for the hierarchical solver's fast paths.

Draws random footholds, solver boxes (some activating orientation
sampling), quorums and modes, then checks that
``solve_positionability(use_pallas="on")`` (identity fast path + fused
multi-leg distance kernel, interpret mode on CPU) produces exactly the
same terminal cells as the XLA path.

Run: ``python tools/hier_fuzz.py [--trials 6] [--seed 0]``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from legmov_tpu.config import SolverConfig
from legmov_tpu.models.hier_solver import solve_positionability
from legmov_tpu.models.robot import HEX_MOUNTS, QUAD_MOUNTS, make_robot
from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    bad = 0
    for trial in range(args.trials):
        seed = args.seed + trial
        rng = np.random.default_rng(seed)
        mounts = QUAD_MOUNTS if rng.random() < 0.7 else HEX_MOUNTS
        leg_fn = get_m2_leg if rng.random() < 0.5 else get_moonbot_leg
        robot = make_robot(mounts, leg_fn)
        k = int(rng.integers(1, len(mounts) + 1))
        # half the trials use boxes small enough to activate rotations
        if rng.random() < 0.5:
            box, min_box, depth = 60.0, 25.0, 2
        else:
            box, min_box, depth = 400.0, 100.0, 2
        n = int(rng.integers(16, 64))
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        radius = rng.uniform(250, 400)
        fh = np.stack(
            [radius * np.cos(ang) + rng.normal(0, 30, n),
             radius * np.sin(ang) + rng.normal(0, 30, n),
             rng.uniform(-160, -90, n)], -1,
        ).astype(np.float32)
        cfg = SolverConfig(
            box_center=(0.0, 0.0, 0.0), box_size=(box,) * 3,
            min_box=(min_box,) * 3, max_depth=depth,
            legs_for_stability=k,
        )
        shared = bool(rng.random() < 0.5)
        a = solve_positionability(
            fh, robot, cfg, chunk=32, cell_batch=64,
            shared_foothold=shared, use_pallas="off",
        )
        b = solve_positionability(
            fh, robot, cfg, chunk=32, cell_batch=64,
            shared_foothold=shared, use_pallas="on",
        )
        same = (
            a.centers.shape == b.centers.shape
            and (a.centers == b.centers).all()
            and (a.valid == b.valid).all()
            and (a.edge == b.edge).all()
        )
        rot = box / 2 < cfg.enable_rot_below
        print(
            f"{'OK ' if same else 'FAIL'} seed={seed} "
            f"legs={len(mounts)} k={k} box={box:g} rot={rot} "
            f"shared={shared} cells={a.centers.shape[0]} "
            f"valid={int(a.valid.sum())}",
            flush=True,
        )
        if not same:
            bad += 1
    print(f"{args.trials - bad}/{args.trials} trials exact")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
