"""Distance-kernel cost attribution probe (profiling only).

Times the Pallas distance kernel with individual sections ablated
(results are WRONG under ablation — this is a profiler, not a product
path) to locate where the 0.35 ns/pt goes before optimizing:

* ``no_validate``  — drop the 12 clamp re-validations
* ``no_corners``   — drop the corner-point candidates
* ``single_branch``— drop the pi-flip duplicate evaluation

Run on the real TPU: ``python tools/dist_kernel_probe.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chained_timer, make_grid  # noqa: E402
from legmov_tpu.models.leg import get_m2_leg  # noqa: E402
from legmov_tpu.ops.pallas_kernels import make_distance_kernel  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1 << 22)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    leg = get_m2_leg()
    pts = make_grid(args.points)
    n = pts.shape[0]
    import numpy as np

    comps = tuple(
        jnp.asarray(np.ascontiguousarray(np.asarray(pts)[:, i]))
        for i in range(3)
    )

    OPTS = frozenset(["opt_rsqrt", "opt_corner_linear"])
    cases = [
        # current default = plain (the probed opts lost on hardware; a
        # feature name IN the ablate set turns that variant ON)
        ("plain(default)", dict()),
        ("both_opts", dict(ablate=OPTS)),
        ("opt_rsqrt", dict(ablate=frozenset(["opt_rsqrt"]))),
        ("opt_corner_lin", dict(ablate=frozenset(["opt_corner_linear"]))),
        ("block256", dict(block_rows=256)),
        # section ablations off the plain kernel (results WRONG — cost
        # attribution only)
        ("no_validate", dict(ablate=frozenset({"no_validate"}))),
        ("no_corners", dict(ablate=frozenset({"no_corners"}))),
        ("single_branch", dict(ablate=frozenset({"single_branch"}))),
        ("all_off", dict(ablate=frozenset(
            {"no_validate", "no_corners", "single_branch"}))),
    ]
    base = None
    for name, kw in cases:
        kd = make_distance_kernel(leg, **kw)

        def fn(c, _leg):
            ok, vx, vy, vz = kd.soa(*c)
            return jnp.sum(vx) + jnp.sum(ok.astype(jnp.float32))

        t = chained_timer(fn, comps, leg, args.iters, args.reps)
        ns = t / n * 1e9
        if base is None:
            base = ns
        print(f"{name:<14} {ns:.4f} ns/pt  delta={base - ns:+.4f}",
              flush=True)


if __name__ == "__main__":
    main()
