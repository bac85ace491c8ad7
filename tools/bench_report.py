"""Benchmark aggregation + comparison report (benchIllu.py equivalent).

Aggregates ``N;ns_per_point`` CSVs exactly like the reference's
benchIllu.py:254-322 (keep N > 10,000; per-N 5-95th percentile filter;
mean), compares this repo's TPU sweeps against the reference's committed
``bdata/{pc,jetson}`` CSVs, and renders the log-log curve + bar chart.

Run: ``python tools/bench_report.py [--ours bdata/tpu] [--ref /root/reference/bdata]``
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import numpy as np


def load_csv(path: str) -> dict[int, list[float]]:
    rows = defaultdict(list)
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            n_s, ns_s = line.split(";")
            rows[int(float(n_s))].append(float(ns_s))
    return rows


def aggregate(rows: dict[int, list[float]], min_n: int = 10_000) -> float:
    """benchIllu.py:254-322: N > min_n, 5-95th pct filter per N, mean."""
    vals = []
    for n, samples in rows.items():
        if n <= min_n:
            continue
        s = np.asarray(samples)
        if s.size >= 3:
            lo, hi = np.percentile(s, [5, 95])
            s = s[(s >= lo) & (s <= hi)]
        vals.extend(s.tolist())
    return float(np.mean(vals)) if vals else float("nan")


def curve(rows: dict[int, list[float]]):
    ns = sorted(rows)
    return np.array(ns), np.array([np.mean(rows[n]) for n in ns])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="bdata/tpu_r4",
                    help="accelerator sweep CSVs (debiased r4 refresh)")
    ap.add_argument("--ours-cpu", default="bdata/tpu_r5",
                    help="self-measured CPU-twin / LM-IK CSVs "
                    "(tools/bench_sweep.py --impl oracle|ik)")
    ap.add_argument("--ref", default="/root/reference/bdata")
    ap.add_argument("--out", default="bdata/tpu/report.png")
    args = ap.parse_args()

    # our five self-measured compute modes (bench.cpp:61-171 counterparts:
    # {r,d}gpu -> TPU kernels, {r,d}cpu -> strict-fp32 oracle twin,
    # rbdl -> LM-IK oracle) beside the reference's five committed columns
    series = {
        "TPU v5e reach": os.path.join(args.ours, "rtpu.csv"),
        "TPU v5e dist": os.path.join(args.ours, "dtpu.csv"),
        "oracle twin reach (py, 1 thread)":
            os.path.join(args.ours_cpu, "rcpu.csv"),
        "oracle twin dist (py, 1 thread)":
            os.path.join(args.ours_cpu, "dcpu.csv"),
        "LM-IK oracle (py)": os.path.join(args.ours_cpu, "ik.csv"),
        "GTX1080Ti reach": os.path.join(args.ref, "pc", "rgpu.csv"),
        "GTX1080Ti dist": os.path.join(args.ref, "pc", "dgpu.csv"),
        "Jetson reach": os.path.join(args.ref, "jetson", "rgpu.csv"),
        "Jetson dist": os.path.join(args.ref, "jetson", "dgpu.csv"),
        "i5-12600K reach (1 thread)": os.path.join(args.ref, "pc", "rcpu.csv"),
        "i5-12600K dist (1 thread)": os.path.join(args.ref, "pc", "dcpu.csv"),
        "RBDL LM-IK": os.path.join(args.ref, "pc", "rbdl.csv"),
    }
    data = {k: load_csv(p) for k, p in series.items()}

    print(f"{'series':<28} {'ns/point (aggregated)':>22}")
    aggs = {}
    for k, rows in data.items():
        aggs[k] = aggregate(rows)
        if rows:
            print(f"{k:<28} {aggs[k]:>22.4f}")

    for kind in ("reach", "dist"):
        ours = aggs.get(f"TPU v5e {kind}", float("nan"))
        ref = aggs.get(f"GTX1080Ti {kind}", float("nan"))
        if np.isfinite(ours) and np.isfinite(ref):
            print(f"speedup vs GTX1080Ti ({kind}): {ref / ours:.2f}x")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(13, 5))
        for k, rows in data.items():
            if not rows:
                continue
            n, v = curve(rows)
            a1.loglog(n, v, "o-", ms=3, lw=1, label=k)
        a1.set_xlabel("points per batch")
        a1.set_ylabel("ns / point")
        a1.grid(True, which="both", lw=0.3)
        a1.legend(fontsize=7)

        keys = [k for k, v in aggs.items() if np.isfinite(v)]
        a2.bar(range(len(keys)), [aggs[k] for k in keys])
        a2.set_yscale("log")
        a2.set_xticks(range(len(keys)))
        a2.set_xticklabels(keys, rotation=30, ha="right", fontsize=7)
        a2.set_ylabel("ns / point (aggregated)")
        a2.grid(True, axis="y", lw=0.3)
        fig.suptitle("legmov_tpu vs reference CUDA baselines")
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        plt.savefig(args.out, dpi=150, bbox_inches="tight")
        print("wrote", args.out)
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
