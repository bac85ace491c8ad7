"""Workspace circle-decomposition figure (circleIllu.py equivalent).

Renders the in-plane circles (inner, outer, fromabove+-, winglet+-), the
corner points and the actual reachable silhouette for a leg — the
publication figure the reference builds in circleIllu.py, and a visual
debugging aid for the workspace tables.

Run: ``python tools/circle_figure.py [--leg m2|moonbot] [--out circles.png]``
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg  # noqa: E402
from legmov_tpu.models.workspace import build_workspace  # noqa: E402
from legmov_tpu.ops.plane import plane_validate  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=("m2", "moonbot"), default="m2")
    ap.add_argument("--out", default="circles.png")
    args = ap.parse_args()

    leg = {"m2": get_m2_leg, "moonbot": get_moonbot_leg}[args.leg]()
    ws = build_workspace(leg)

    # silhouette: plane_validate over a fine femur-frame grid
    lim = float(np.asarray(leg.femur_length + leg.tibia_length)) * 1.3
    xs = np.linspace(-lim, lim, 800, dtype=np.float32)
    ys = np.linspace(-lim, lim, 800, dtype=np.float32)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    valid = np.asarray(
        plane_validate(jnp.asarray(X.ravel()), jnp.asarray(Y.ravel()), ws)
    ).reshape(X.shape)

    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(
        valid.T,
        origin="lower",
        extent=(-lim, lim, -lim, lim),
        cmap="Greens",
        alpha=0.5,
        vmin=0,
        vmax=1.6,
    )

    labels = {
        (0, 0): "$C_{in}$",
        (0, 1): "$C_{-}$",
        (0, 2): "$C_{+}$",
        (0, 3): "$C_{w}^-$",
    }
    theta = np.linspace(0, 2 * np.pi, 256)
    seen = set()
    for r in range(2):
        for e in range(2):
            for s in range(4):
                cx = float(ws.circle_x[r, e, s])
                cy = float(ws.circle_y[r, e, s])
                rad = float(ws.circle_r[r, e, s])
                key = (round(cx, 3), round(cy, 3), round(rad, 3))
                if key in seen or rad < 1e-3:
                    continue
                seen.add(key)
                att = bool(ws.circle_attract[r, e, s])
                ax.plot(
                    cx + rad * np.cos(theta),
                    cy + rad * np.sin(theta),
                    "-" if att else "--",
                    lw=1.2,
                )
                ax.plot(cx, cy, "k+", ms=6)

    corners = np.asarray(ws.corner_xy)
    cval = np.asarray(ws.corner_valid)
    ax.plot(corners[cval, 0], corners[cval, 1], "ro", ms=5,
            label="corner points")
    ax.plot(corners[~cval, 0], corners[~cval, 1], "rx", ms=5, alpha=0.4)

    ax.set_xlabel("radial (mm, femur frame)")
    ax.set_ylabel("vertical (mm)")
    ax.set_title(
        f"{args.leg} leg — circle decomposition "
        "(solid: attractive, dashed: repulsive; green: reachable)"
    )
    ax.legend(loc="lower left")
    ax.set_aspect("equal")
    plt.savefig(args.out, dpi=150, bbox_inches="tight")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
