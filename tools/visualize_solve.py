"""Positionability map visualization (after.py robot_reach equivalent).

Renders, for a terrain pointcloud, the 2-D map of feasible body positions
at a fixed clearance above the surface: terrain height as the base image,
feasible / infeasible candidate poses on top — the equivalent of the
reference's ``robot_reach.npy`` product (after.py:284-319) for the TPU
positionability stack.

Run: ``python tools/visualize_solve.py [--points 1000000] [--legs 6]
[--out positionability_map.png]``
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from legmov_tpu.models.robot import HEX_MOUNTS, QUAD_MOUNTS, make_robot
from legmov_tpu.ops.grid import (
    build_grid,
    cell_size_for,
    grid_reachable_legs,
    neighbor_offsets,
)
from legmov_tpu.ops.quaternion import IDENTITY
from tools.map_solve_bench import terrain_at


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--legs", type=int, choices=(4, 6), default=6)
    ap.add_argument("--clearance", type=float, default=180.0)
    ap.add_argument("--grid-pitch", type=float, default=100.0)
    ap.add_argument("--subdiv", type=int, default=2)
    ap.add_argument("--k", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--out", default="positionability_map.png")
    args = ap.parse_args()

    terrain = terrain_at(args.points)
    robot = make_robot(HEX_MOUNTS if args.legs == 6 else QUAD_MOUNTS)
    k = args.k or args.legs
    reach = cell_size_for(robot)
    cell = reach / args.subdiv
    grid = build_grid(terrain, cell)
    offs = jnp.asarray(neighbor_offsets(cell, reach))

    # body-pose candidates: a regular xy lattice riding the local surface
    xs = np.arange(terrain[:, 0].min(), terrain[:, 0].max(), args.grid_pitch)
    ys = np.arange(terrain[:, 1].min(), terrain[:, 1].max(), args.grid_pitch)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    # local surface height via a coarse 2-D max-height raster
    hx = ((terrain[:, 0] - terrain[:, 0].min()) / args.grid_pitch).astype(int)
    hy = ((terrain[:, 1] - terrain[:, 1].min()) / args.grid_pitch).astype(int)
    H = np.full((xs.size + 1, ys.size + 1), -np.inf)
    np.maximum.at(H, (np.minimum(hx, xs.size), np.minimum(hy, ys.size)),
                  terrain[:, 2])
    Z = H[: xs.size, : ys.size]
    empty = ~np.isfinite(Z)
    fill = np.median(Z[~empty]) if (~empty).any() else 0.0
    Zf = np.where(empty, fill, Z)
    Z = np.where(empty, np.nan, Z)  # display only
    body = np.stack(
        [X.ravel(), Y.ravel(), Zf.ravel() + args.clearance], -1
    ).astype(np.float32)

    feas = np.zeros(body.shape[0], bool)
    quats = jnp.broadcast_to(jnp.asarray(IDENTITY), (args.chunk, 4))
    for s in range(0, body.shape[0], args.chunk):
        e = min(s + args.chunk, body.shape[0])
        bp = jnp.asarray(
            np.concatenate(
                [body[s:e],
                 np.full((args.chunk - (e - s), 3), 1e9, np.float32)]
            )
        )
        _, quorum = grid_reachable_legs(
            bp, quats, grid, robot, k=k, offsets=offs
        )
        feas[s:e] = np.asarray(quorum)[: e - s]
        print(f"poses {e}/{body.shape[0]}", flush=True)

    F = feas.reshape(X.shape)
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(13, 6))
    im = a1.imshow(Z.T, origin="lower", cmap="terrain",
                   extent=(xs.min(), xs.max(), ys.min(), ys.max()))
    plt.colorbar(im, ax=a1, label="terrain z (mm)")
    a1.set_title("terrain height")
    a2.imshow(Z.T, origin="lower", cmap="gray",
              extent=(xs.min(), xs.max(), ys.min(), ys.max()))
    a2.imshow(
        np.where(F.T, 1.0, np.nan), origin="lower", cmap="Greens",
        extent=(xs.min(), xs.max(), ys.min(), ys.max()), alpha=0.6,
        vmin=0, vmax=1.3,
    )
    a2.set_title(
        f"{args.legs}-leg stance feasible (k={k}, clearance "
        f"{args.clearance:.0f} mm): {feas.mean():.1%} of candidates"
    )
    for a in (a1, a2):
        a.set_xlabel("x (mm)")
        a.set_ylabel("y (mm)")
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    print("wrote", args.out, f"feasible fraction {feas.mean():.4f}")


if __name__ == "__main__":
    main()
