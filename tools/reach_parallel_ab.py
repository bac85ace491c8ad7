"""Interleaved A/B: default vs Mosaic-parallel reachability kernel.

Single-shot config sweeps (tools/reach_kernel_probe.py) rank configs
unreliably on this relay: contention drifts BETWEEN cases, so a config
measured in a quiet minute beats a better config measured in a noisy
one (round-2 and round-4 probes ranked default-128 vs ``parallel``
OPPOSITELY).  This tool interleaves the two kernels round-robin for
several rounds and compares per-config MINIMA, which subtracts any
drift that is slower than one round (~seconds).

Run (TPU): ``python tools/reach_parallel_ab.py [--rounds 6]``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from bench import chained_timer_samples, make_grid  # noqa: E402
from legmov_tpu.models.leg import get_m2_leg  # noqa: E402
from legmov_tpu.ops.pallas_kernels import make_reachability_kernel  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1 << 24)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    leg = get_m2_leg()
    pts = make_grid(args.points)
    n = pts.shape[0]
    comps = tuple(
        jnp.asarray(np.ascontiguousarray(np.asarray(pts)[:, i]))
        for i in range(3)
    )

    cases = {
        "default128": make_reachability_kernel(leg, interpret=args.interpret),
        "parallel": make_reachability_kernel(
            leg, interpret=args.interpret, parallel=True
        ),
    }
    fns = {}
    for name, kr in cases.items():
        def fn(c, _leg, kr=kr):
            return jnp.sum(kr.soa(*c).astype(jnp.float32))
        fns[name] = fn

    best = {name: float("inf") for name in cases}
    for r in range(args.rounds):
        for name in cases:
            s = chained_timer_samples(
                fns[name], comps, leg, args.iters, args.reps
            )
            b = float(np.min(s)) / n * 1e9
            best[name] = min(best[name], b)
            print(f"round {r} {name:<11} min {b:.4f} ns/pt "
                  f"(best {best[name]:.4f})", flush=True)
    d, p = best["default128"], best["parallel"]
    verdict = "parallel" if p < d * 0.97 else (
        "default128" if d < p * 0.97 else "tie")
    print(f"RESULT default128={d:.4f} parallel={p:.4f} winner={verdict}")


if __name__ == "__main__":
    main()
