"""N-sweep benchmark: ns/point vs batch size, CSV + plot.

Reproduces the reference's sweep protocol EXACTLY (bench.cpp:52-181 +
setting_bench.h:8-18): pixel pitch swept 0.04 -> 50 doubling each step,
grids over x in [-100, 601], y = 0, z in [-100, 51] (the reference's
``z_start = XMin`` quirk at bench.cpp:118 is reproduced so the point
counts match its committed CSVs: 72 ... 66,160,650), inclusive
float32-accumulating arange, and the CSV format ``N;ns_per_point`` with
ONE ROW PER REPEAT (SubSamples, bench.cpp:121-171) so the reference's
``benchIllu.py``-style 5-95th-percentile aggregation applies unchanged.

Timing uses the dependency-chained slope method from bench.py (the
relay's ``block_until_ready`` is unreliable, see bench.py docstring);
each rep contributes one slope sample between the K and 5K chains
(the r4 debiased form — a K=1 baseline lets one-sided fetch jitter
fabricate too-fast slopes) — the analogue of the reference's
per-subsample cudaEvent rows.  ``bdata/tpu/`` holds the r2 CSVs taken
under the older estimator; ``bdata/tpu_r4/`` the debiased refresh.

Run:  python tools/bench_sweep.py --kernels reach          # ~11 compiles
      python tools/bench_sweep.py --kernels dist
Already-recorded sizes (>= --reps rows in the CSV) are skipped, so an
interrupted sweep resumes where it stopped.

Besides the TPU kernels, ``--impl`` selects the reference's OTHER
compute modes so the full 5-column bench matrix (bench.cpp:61-171) is
self-measured on this host rather than borrowed from the reference's
committed CSVs:

* ``--impl oracle``: the strict-fp32 scalar CPU twin
  (`legmov_tpu.oracle.numpy_ref`) — the `apply_reach_cpu` /
  `apply_dist_cpu` counterpart (one_leg_global.cu:132-147).  CSVs
  ``rcpu.csv`` / ``dcpu.csv``, SubSamples_CPU=10 reps.  The twin is a
  deliberately unvectorized per-point Python loop (~30/300 us per
  point), so for N > ``--cpu-point-cap`` each rep times a fixed-seed
  uniform subsample of the grid's points (an unbiased estimate of the
  mean per-point cost; the true N still labels the row).  Timing is
  plain ``perf_counter`` — host CPU, no relay.
* ``--impl ik``: the LM-IK independent baseline
  (`legmov_tpu.oracle.ik_oracle`) — the RBDL counterpart
  (rbdl_benchmark.cpp:18-111).  CSV ``ik.csv``, SubSamples_RBDL=3
  reps, MinPixRBDL=0.4 (reach only, like the reference).  The IK is
  batch-vectorized NumPy, so full N is timed at every size.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chained_timer_samples  # noqa: E402
from legmov_tpu.models.leg import get_m2_leg  # noqa: E402
from legmov_tpu.ops.distance import distance  # noqa: E402
from legmov_tpu.ops.reachability import reachability  # noqa: E402

_LANES = 128


def ref_arange(start: float, end: float, step: float) -> np.ndarray:
    """bench.cpp:21-27 arange: inclusive end, float32 accumulation."""
    out = []
    v = np.float32(start)
    step = np.float32(step)
    while v <= np.float32(end):
        out.append(float(v))
        v = np.float32(v + step)
    return np.asarray(out, np.float32)


def ref_pitches(min_pix: float = 0.04, max_pix: float = 50.0) -> list:
    p, out = min_pix, []
    while p <= max_pix:
        out.append(p)
        p *= 2.0
    return out


def ref_grid(pix: float) -> np.ndarray:
    """One sweep grid, loop order x-outer / z-inner like generate3DGrid."""
    xs = ref_arange(-100.0, 601.0, pix)
    ys = np.zeros(1, np.float32)
    zs = ref_arange(-100.0, 51.0, pix)  # z_start = XMin (bench.cpp:118)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1).astype(np.float32)


def rows_in_csv(path: str, n: int) -> int:
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return sum(1 for line in f if line.startswith(f"{n};"))


def run_cpu_sweep(args, leg) -> None:
    """Oracle-twin / LM-IK ns-per-point sweep on the host CPU.

    Same grid protocol and ``N;ns_per_point`` one-row-per-rep CSV format
    as the accelerator sweep; see the module docstring for the
    subsampling rule.  Counterpart of bench.cpp:127-160 CPUMode/RBDLMode.
    """
    import time

    from legmov_tpu.oracle.numpy_ref import (
        oracle_distance,
        oracle_reachability,
    )

    if args.impl == "oracle":
        fns = {"reach": ("rcpu.csv", lambda p: oracle_reachability(p, leg)),
               "dist": ("dcpu.csv", lambda p: oracle_distance(p, leg))}
    else:
        from legmov_tpu.oracle.ik_oracle import ik_reachability

        fns = {"reach": ("ik.csv", lambda p: ik_reachability(p, leg))}

    pitches = sorted(ref_pitches(args.min_pix, args.max_pix), reverse=True)
    for which in args.kernels.split(","):
        if which not in fns:
            continue
        csv_name, fn = fns[which]
        csv_path = os.path.join(args.out, csv_name)
        for pix in pitches:
            pts = ref_grid(pix)
            n = pts.shape[0]
            if n > args.max_points:
                continue
            have = rows_in_csv(csv_path, n)
            if have >= args.reps:
                print(f"[{which}] N={n}: {have} rows present, skip",
                      flush=True)
                continue
            # oracle: scalar Python loop — subsample huge grids (the
            # true N labels the row; ns/pt is the subsample mean).
            # ik: batch-vectorized — always timed at full N.
            cap = args.cpu_point_cap if args.impl == "oracle" else n
            rows = []
            for rep in range(args.reps - have):
                if n > cap:
                    sel = np.random.default_rng(1000 + rep).choice(
                        n, cap, replace=False
                    )
                    timed_pts, m = pts[sel], cap
                else:
                    timed_pts, m = pts, n
                t0 = time.perf_counter()
                fn(timed_pts)
                rows.append((time.perf_counter() - t0) / m * 1e9)
            with open(csv_path, "a") as f:
                for ns in rows:
                    f.write(f"{n};{ns}\n")
            print(f"[{which}] pix={pix:<8g} N={n:<10d} "
                  f"med={float(np.median(rows)):.1f} ns/pt "
                  f"({len(rows)} rows{', subsampled' if n > cap else ''})",
                  flush=True)
            del pts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bdata/tpu")
    ap.add_argument("--reps", type=int, default=25)
    ap.add_argument("--kernels", default="reach,dist",
                    help="comma list of reach,dist")
    ap.add_argument("--min-pix", type=float, default=0.04)
    ap.add_argument("--max-pix", type=float, default=50.0)
    ap.add_argument("--max-points", type=int, default=1 << 27)
    ap.add_argument("--impl", choices=("pallas", "xla", "oracle", "ik"),
                    default="pallas")
    ap.add_argument("--cpu-point-cap", type=int, default=10_000,
                    help="oracle impl: max points actually timed per rep "
                    "(larger grids are uniformly subsampled, see docstring)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    leg = get_m2_leg()
    kernels = args.kernels.split(",")
    if args.impl in ("oracle", "ik"):
        if args.impl == "ik" and args.min_pix < 0.4:
            args.min_pix = 0.4  # MinPixRBDL (setting_bench.h:10)
        run_cpu_sweep(args, leg)
        return

    # smallest grid first: fast feedback + warms the toolchain before the
    # multi-minute 66M-point compiles
    pitches = sorted(ref_pitches(args.min_pix, args.max_pix), reverse=True)

    for which in kernels:
        csv_path = os.path.join(
            args.out, ("rtpu.csv" if which == "reach" else "dtpu.csv")
        )
        for pix in pitches:
            pts_np = ref_grid(pix)
            n = pts_np.shape[0]
            if n > args.max_points:
                continue
            have = rows_in_csv(csv_path, n)
            if have >= args.reps:
                print(f"[{which}] N={n}: {have} rows present, skip",
                      flush=True)
                continue

            if args.impl == "pallas":
                from legmov_tpu.ops.pallas_kernels import (
                    make_distance_kernel,
                    make_reachability_kernel,
                )

                # small batches: shrink the block so padding stays ~1 tile
                rows = (n + _LANES - 1) // _LANES
                if which == "reach":
                    br = min(256, max(8, rows))
                    k = make_reachability_kernel(leg, block_rows=br)

                    def fn(c, _leg):
                        return jnp.sum(k.soa(*c).astype(jnp.float32))
                else:
                    br = min(128, max(8, rows))
                    k = make_distance_kernel(leg, block_rows=br)

                    def fn(c, _leg):
                        ok, vx, vy, vz = k.soa(*c)
                        return jnp.sum(vx) + jnp.sum(ok.astype(jnp.float32))

                # pre-pad to the kernel block on the HOST: an unaligned N
                # makes fn_soa's jnp.pad copy all three components every
                # evaluation (~24 B/pt of pure HBM traffic — measured +50%
                # on the 16.5M grid).  ns/pt still divides by the true N,
                # so the <=0.4% padded compute counts against us, honestly.
                pad = (-n) % (br * _LANES)
                padded = np.concatenate(
                    [pts_np, np.zeros((pad, 3), np.float32)]
                ) if pad else pts_np
                timed = tuple(
                    jnp.asarray(np.ascontiguousarray(padded[:, i]))
                    for i in range(3)
                )
            else:
                if which == "reach":
                    def fn(p, _leg):
                        return jnp.sum(reachability(p, _leg)
                                       .astype(jnp.float32))
                else:
                    def fn(p, _leg):
                        ok, vec = distance(p, _leg)
                        return (jnp.sum(vec[:, 0])
                                + jnp.sum(ok.astype(jnp.float32)))

                timed = jnp.asarray(pts_np)

            # chain enough evaluations that the slope dwarfs the ~30 ms
            # relay fetch noise even for tiny batches
            iters = int(np.clip(3e8 // max(n, 1), 6, 1 << 18))
            slopes = chained_timer_samples(
                fn, timed, leg, iters, args.reps - have
            )
            with open(csv_path, "a") as f:
                for s in slopes:
                    f.write(f"{n};{s / n * 1e9}\n")
            best = min(slopes) / n * 1e9
            med = float(np.median(slopes)) / n * 1e9
            print(f"[{which}] pix={pix:<8g} N={n:<10d} "
                  f"best={best:.4f} med={med:.4f} ns/pt "
                  f"({len(slopes)} rows)", flush=True)
            del timed, pts_np

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(7, 5))
        for fname, label, refcsv in (
            ("rtpu.csv", "reachability (TPU v5e)", "rgpu.csv"),
            ("dtpu.csv", "distance (TPU v5e)", "dgpu.csv"),
        ):
            path = os.path.join(args.out, fname)
            if not os.path.exists(path):
                continue
            data = np.loadtxt(path, delimiter=";")
            ns, med = [], []
            for n in np.unique(data[:, 0]):
                v = data[data[:, 0] == n, 1]
                lo, hi = np.percentile(v, [5, 95])
                v = v[(v >= lo) & (v <= hi)] if v.size > 4 else v
                ns.append(n)
                med.append(v.mean())
            (line,) = plt.loglog(ns, med, "o-", label=label)
            ref = os.path.join("/root/reference/bdata/pc", refcsv)
            if os.path.exists(ref):
                rd = np.loadtxt(ref, delimiter=";")
                rn, rm = [], []
                for n in np.unique(rd[:, 0]):
                    v = rd[rd[:, 0] == n, 1]
                    lo, hi = np.percentile(v, [5, 95])
                    rn.append(n)
                    rm.append(v[(v >= lo) & (v <= hi)].mean())
                plt.loglog(rn, rm, "s--", color=line.get_color(), lw=0.8,
                           label=label.split(" (")[0] + " (GTX 1080 Ti)")
        plt.xlabel("points per batch")
        plt.ylabel("ns / point")
        plt.title("legmov_tpu kernel throughput vs reference GPU")
        plt.grid(True, which="both", lw=0.3)
        plt.legend()
        plt.savefig(os.path.join(args.out, "sweep.png"), dpi=150,
                    bbox_inches="tight")
        print("wrote", os.path.join(args.out, "sweep.png"))
    except Exception as e:  # plotting is best-effort
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
