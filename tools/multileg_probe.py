"""Isolated multi-leg kernel throughput probe.

Times `make_multileg_kernel` (the CSR / adaptive solvers' inner kernel)
alone on synthetic tables+candidates — the number that bounds the
map-scale positionability solve (round-1 measured 0.154 ns/leg-eval with
the 16-slot table layout; the unique-circle + fal/falo restructure
should cut the circle section ~35%).

Run on the TPU: ``python tools/multileg_probe.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chained_timer  # noqa: E402
from legmov_tpu.models.robot import HEX_MOUNTS, make_robot  # noqa: E402
from legmov_tpu.ops import quaternion as quat  # noqa: E402
from legmov_tpu.ops.pallas_multileg import (  # noqa: E402
    make_multileg_kernel,
    oriented_tables,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=1024)
    ap.add_argument("--cands", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    robot = make_robot(HEX_MOUNTS)
    L = 6
    rng = np.random.default_rng(3)
    P, C = args.poses, args.cands
    body = jnp.asarray(
        (rng.uniform(-300, 300, (P, 3)) * [1, 1, 0.3]).astype(np.float32)
    )
    rpy = rng.uniform(-0.15, 0.15, (P, 3)).astype(np.float32)
    quats = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    tab = oriented_tables(body, quats, robot)
    cands = rng.uniform(-700, 700, (P, C, 3)).astype(np.float32)
    gx = jnp.asarray(np.ascontiguousarray(cands[..., 0]))
    gy = jnp.asarray(np.ascontiguousarray(cands[..., 1]))
    gz = jnp.asarray(np.ascontiguousarray(cands[..., 2]))

    fn = make_multileg_kernel(robot, C)

    # all operands threaded as arguments (closures would bake ~8 MB
    # constants into the compile request)
    def scalar(operands, _leg):
        t, x, y, z = operands
        return jnp.sum(fn(t, x, y, z).astype(jnp.float32))

    per = chained_timer(
        scalar, (tab, gx, gy, gz), None, args.iters, args.reps
    )
    evals = P * C * L
    print(
        f"multileg kernel: {per * 1e3:.3f} ms/call, "
        f"{per / evals * 1e9:.4f} ns/leg-eval "
        f"({P} poses x {C} cands x {L} legs)"
    )


if __name__ == "__main__":
    main()
