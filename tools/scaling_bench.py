"""Multi-device scaling-efficiency benchmark (pose-sweep workload).

Measures the sharded positionability solve (legmov_tpu.parallel) on
1, 2, 4, ... devices of whatever platform is available and reports the
scaling efficiency per step — the BASELINE.json config-5 measurement
(">= 85% scaling efficiency to 2+ hosts").  On a CPU host, run with
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to validate the sharding layout; on a pod slice the same script measures
real ICI scaling.

Run: ``python tools/scaling_bench.py [--poses 4096] [--footholds 8192]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.models.robot import get_m2_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.parallel import make_mesh, sharded_positionable


def time_solve(fn, args_, reps=5):
    jax.block_until_ready(fn(*args_))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args_))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=4096)
    ap.add_argument("--footholds", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    robot = get_m2_robot()
    rng = np.random.default_rng(0)
    body = jnp.asarray(rng.uniform(-300, 300, (args.poses, 3)).astype(np.float32))
    rpy = rng.uniform(-0.2, 0.2, (args.poses, 3)).astype(np.float32)
    quats = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    fh = jnp.asarray(rng.uniform(-600, 600, (args.footholds, 3)).astype(np.float32))

    results = []
    base = None
    n = 1
    while n <= n_dev:
        mesh = make_mesh(n, points_axis=1)
        fn = sharded_positionable(mesh, k=3)
        t = time_solve(fn, (body, quats, fh, robot), args.reps)
        rate = args.poses / t
        eff = 1.0 if base is None else (base / t) / n
        results.append(
            {"devices": n, "seconds": round(t, 4),
             "poses_per_s": round(rate, 1),
             "scaling_efficiency": round(eff, 4)}
        )
        if base is None:
            base = t
        print(json.dumps(results[-1]), flush=True)
        n *= 2

    note = None
    if jax.devices()[0].platform == "cpu":
        note = ("virtual CPU devices share one physical socket: XLA already "
                "uses all cores at n=1, so efficiency here validates the "
                "sharding layout, not real scaling — run on a pod slice for "
                "ICI numbers")
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "results": results, "note": note}))


if __name__ == "__main__":
    main()
