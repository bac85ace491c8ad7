"""N-sweep benchmark: ns/point vs batch size, CSV + plot.

Reproduces the reference's sweep protocol (bench.cpp:52-181 +
setting_bench.h: pixel pitch halved from 50 mm until the grid reaches tens
of millions of points) and its CSV format ``N;ns_per_point`` (one row per
repeat), written to ``bdata/tpu/{r,d}tpu.csv`` so the reference's
``benchIllu.py``-style aggregation applies unchanged.  Timing uses the
dependency-chained slope method from bench.py (the relay's
``block_until_ready`` is unreliable, see bench.py docstring).

Run: ``python tools/bench_sweep.py [--out bdata/tpu] [--max-points N]``.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chained_timer  # noqa: E402
from legmov_tpu.models.leg import get_m2_leg  # noqa: E402
from legmov_tpu.ops.distance import distance  # noqa: E402
from legmov_tpu.ops.reachability import reachability  # noqa: E402


def grids(max_points: int, start_pix: float = 50.0):
    """Pixel-pitch sweep like bench.cpp:109-120 / setting_bench.h:8-18."""
    pix = start_pix
    while True:
        xs = np.arange(-100, 601, pix, dtype=np.float32)
        zs = np.arange(-350, 51, pix, dtype=np.float32)
        ys = np.arange(-400, 401, pix, dtype=np.float32)
        n = xs.size * ys.size * zs.size
        if n > max_points:
            return
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        yield pix, np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
        pix /= 2.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bdata/tpu")
    ap.add_argument("--max-points", type=int, default=1 << 25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--impl", choices=("auto", "pallas", "xla"),
                    default="auto")
    ap.add_argument("--start-pix", type=float, default=50.0,
                    help="coarsest grid pitch (larger = fewer sweep sizes; "
                    "each size costs fresh compiles through the relay)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    leg = get_m2_leg()

    kr = kd = None
    if args.impl in ("auto", "pallas"):
        try:
            from legmov_tpu.ops.pallas_kernels import (
                make_distance_kernel,
                make_reachability_kernel,
            )

            kr = make_reachability_kernel(leg)
            kd = make_distance_kernel(leg)
        except Exception:
            if args.impl == "pallas":
                raise

    def reach_scalar(p, leg):
        return jnp.sum(reachability(p, leg).astype(jnp.float32))

    def dist_scalar(p, leg):
        ok, vec = distance(p, leg)
        return jnp.sum(vec[:, 0]) + jnp.sum(ok.astype(jnp.float32))

    rows_r, rows_d = [], []
    for pix, pts_np in grids(args.max_points, args.start_pix):
        n = pts_np.shape[0]
        if kr is not None:
            # SoA pallas path, same methodology as bench.py
            comps = tuple(
                jnp.asarray(np.ascontiguousarray(pts_np[:, i]))
                for i in range(3)
            )

            def reach_fn(x, _leg, _c=comps):
                return jnp.sum(kr.soa(x, _c[1], _c[2]).astype(jnp.float32))

            def dist_fn(x, _leg, _c=comps):
                ok, vx, vy, vz = kd.soa(x, _c[1], _c[2])
                return jnp.sum(vx) + jnp.sum(ok.astype(jnp.float32))

            timed_arg = comps[0]
        else:
            pts = jnp.asarray(pts_np)
            reach_fn, dist_fn, timed_arg = reach_scalar, dist_scalar, pts

        # chain enough evaluations that the slope dwarfs the ~30 ms relay
        # fetch noise even for tiny batches (~3e8 points per chain)
        iters = max(args.iters, int(3e8 // max(n, 1)) + 1)
        t_r = chained_timer(reach_fn, timed_arg, leg, iters, args.reps)
        rows_r.append((n, t_r / n * 1e9))
        if n <= args.max_points // 4:
            t_d = chained_timer(dist_fn, timed_arg, leg, iters, args.reps)
            rows_d.append((n, t_d / n * 1e9))
        print(
            f"pix={pix:<8g} N={n:<10d} reach={rows_r[-1][1]:.4f} ns/pt"
            + (f" dist={rows_d[-1][1]:.4f} ns/pt" if rows_d and rows_d[-1][0] == n else ""),
            flush=True,
        )

    for name, rows in (("rtpu", rows_r), ("dtpu", rows_d)):
        with open(os.path.join(args.out, f"{name}.csv"), "w") as f:
            for n, ns in rows:
                f.write(f"{n};{ns}\n")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(7, 5))
        for rows, label, base in (
            (rows_r, "reachability (TPU v5e)", 0.403),
            (rows_d, "distance (TPU v5e)", 1.437),
        ):
            arr = np.array(rows)
            plt.loglog(arr[:, 0], arr[:, 1], "o-", label=label)
            plt.axhline(base, ls="--", lw=0.8, color="gray")
        plt.xlabel("points per batch")
        plt.ylabel("ns / point")
        plt.title("legmov_tpu kernel throughput (dashed: GTX 1080 Ti ref)")
        plt.grid(True, which="both", lw=0.3)
        plt.legend()
        plt.savefig(os.path.join(args.out, "sweep.png"), dpi=150,
                    bbox_inches="tight")
        print("wrote", os.path.join(args.out, "sweep.png"))
    except Exception as e:  # plotting is best-effort
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
