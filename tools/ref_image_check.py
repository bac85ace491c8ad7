"""Cross-check our kernels against the reference's committed renders.

The reference repo commits expected result images under ``image/``
(reachability_result_{side,top}.jpg, distance_result_{side,top}.jpg,
produced by after.py:150-283 from the CUDA kernels on the M2 leg).  This
tool regenerates the same four slices from OUR evaluators on the same
grids and writes them side-by-side-able PNGs plus a JSON of silhouette
landmarks (extents, notch, area) for RESULTS.md — the one semantic anchor
that is fully independent of this repo's own oracle.

Slices (after.py / setting.py): side = y≈0 plane over x in [-100, 601],
z in [-350, 51]; top = z≈Z_CUT(-200) plane over x, y in [-400, 401].
Grid pitch PIX_SIZE = 5.  Run anywhere (CPU ok): ``python
tools/ref_image_check.py [--out bdata/refcheck]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from legmov_tpu.models.leg import get_m2_leg  # noqa: E402
from legmov_tpu.ops.distance import distance  # noqa: E402
from legmov_tpu.ops.reachability import reachability  # noqa: E402
from legmov_tpu.viz import render_distance, render_reachability  # noqa: E402

PIX = 5.0
Z_CUT = -200.0


def grid(xs, ys, zs):
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)


def landmarks(pts: np.ndarray, reach: np.ndarray) -> dict:
    """Silhouette landmarks comparable against the committed images."""
    r = pts[reach]
    if r.shape[0] == 0:
        return {"empty": True}
    return {
        "x_min": float(r[:, 0].min()),
        "x_max": float(r[:, 0].max()),
        "z_min": float(r[:, 2].min()),
        "z_max": float(r[:, 2].max()),
        "y_min": float(r[:, 1].min()),
        "y_max": float(r[:, 1].max()),
        "area_mm2": float(reach.sum()) * PIX * PIX,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bdata/refcheck")
    ap.add_argument("--tibia", type=float, default=None,
                    help="override tibia_length (femur2tip). The committed "
                    "reference images predate the current "
                    "static_variables.cpp:75 value of 135: their silhouette "
                    "landmarks (x_max 514.6, z_min -335, x_min ~-25, "
                    "measured from the JPG's gridline pixels) are "
                    "reproduced by femur2tip=160, not 135.")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    leg = get_m2_leg()
    if args.tibia is not None:
        leg = leg._replace(tibia_length=jnp.float32(args.tibia))
    report = {"tibia_length": float(leg.tibia_length)}

    # --- side view: y = 0 slice (reachability_result_side.jpg extents)
    xs = np.arange(-100, 601, PIX, dtype=np.float32)
    zs = np.arange(-350, 51, PIX, dtype=np.float32)
    pts = grid(xs, np.zeros(1, np.float32), zs)
    reach = np.asarray(reachability(jnp.asarray(pts), leg))
    ok, vec = distance(jnp.asarray(pts), leg)
    vec = np.asarray(vec)
    render_reachability(
        pts, reach, os.path.join(args.out, "reachability_side.png"),
        axis=1, cut=0.0, title="legmov_tpu M2 reachability, y=0",
    )
    render_distance(
        pts, vec, os.path.join(args.out, "distance_side.png"),
        axis=1, cut=0.0, saturate=200.0, pix_size=PIX,
        title="legmov_tpu M2 distance, y=0",
    )
    report["side"] = landmarks(pts, reach)
    # the side silhouette's characteristic notch: the local maximum of the
    # lower reachability boundary between x=50 and x=250 (visible at
    # ~(140, -170) in the reference render)
    nx, nz = [], []
    for xi in np.arange(50, 250, PIX):
        col = reach[(pts[:, 0] == np.float32(xi))]
        zcol = pts[pts[:, 0] == np.float32(xi), 2]
        if col.any():
            nx.append(xi)
            nz.append(zcol[col].min())
    if nz:
        j = int(np.argmax(nz))
        report["side"]["notch_xz"] = [float(nx[j]), float(nz[j])]

    # --- top view: z = Z_CUT slice (reachability_result_top.jpg extents)
    ys = np.arange(-400, 401, PIX, dtype=np.float32)
    ptst = grid(xs, ys, np.asarray([Z_CUT], np.float32))
    reacht = np.asarray(reachability(jnp.asarray(ptst), leg))
    okt, vect = distance(jnp.asarray(ptst), leg)
    render_reachability(
        ptst, reacht, os.path.join(args.out, "reachability_top.png"),
        axis=2, cut=Z_CUT, title=f"legmov_tpu M2 reachability, z={Z_CUT:g}",
    )
    render_distance(
        ptst, np.asarray(vect), os.path.join(args.out, "distance_top.png"),
        axis=2, cut=Z_CUT, saturate=200.0, pix_size=PIX,
        title=f"legmov_tpu M2 distance, z={Z_CUT:g}",
    )
    report["top"] = landmarks(ptst, reacht)

    with open(os.path.join(args.out, "landmarks.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
