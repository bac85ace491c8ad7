"""Render a hierarchical-solve result (valid cells over the terrain).

Companion to ``cli solve``: loads the terrain (`numpy_input_t*.bin`) and
the solve output (`out_valid_cells_*.bin`) from a data dir and draws the
top-down map — terrain height as the base image, valid body-pose cell
centers on top — next to the reference's octree-demo product
(`extractValidAsArray` centers, octree_util.cu:155-180).

Run: ``python tools/render_solve_cells.py [--dir data] [--out solve_cells.png]``
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from legmov_tpu import io as lio  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="data")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(args.dir, "solve_cells.png")

    terrain = lio.load_points(os.path.join(args.dir, "numpy_input_t"))
    cells = lio.load_points(os.path.join(args.dir, "out_valid_cells_"))

    fig, ax = plt.subplots(figsize=(9, 6))
    sc = ax.scatter(
        terrain[:, 0], terrain[:, 1], c=terrain[:, 2], s=1,
        cmap="terrain", alpha=0.6, rasterized=True,
    )
    plt.colorbar(sc, ax=ax, label="terrain z (mm)")
    if cells.shape[0]:
        ax.scatter(
            cells[:, 0], cells[:, 1], c="red", s=4, alpha=0.8,
            label=f"valid body cells ({cells.shape[0]})",
        )
        ax.legend(loc="upper right")
    ax.set_xlabel("x (mm)")
    ax.set_ylabel("y (mm)")
    ax.set_title("hierarchical positionability: valid body-pose cells")
    plt.savefig(out, dpi=140, bbox_inches="tight")
    print("wrote", out, f"({cells.shape[0]} valid cells)")


if __name__ == "__main__":
    main()
