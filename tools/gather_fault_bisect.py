"""On-chip bisect of the 10M XLA-gather CSR solver worker fault.

`make_csr_solver` (XLA-gather windows) crashes the TPU worker at 10M
points at EVERY window width (2048/4096/8192 — r4 ladder,
/tmp/r4/gather_w*.log), while the in-kernel-DMA solver runs the same
queues at 65M and the dense multi-leg kernel alone runs fine at width
8192 (tools/multileg_probe.py).  The components unique to the gather
path are (1) the `comp[idxs]` XLA gather of candidate windows from the
~10M-element CSR component arrays and (2) feeding those GATHERED
operands to the Pallas kernel.  This tool isolates them:

* ``--stage gather``: while_loop of N steps, each gathering
  ``[A, window]`` from the 10M array at queue-like indices and folding
  a sum — no Pallas anywhere.
* ``--stage kernel``: the same loop, but each step feeds the gathered
  windows to ``make_multileg_kernel`` exactly like
  ``make_csr_solver.step`` does.
* ``--stage control``: the kernel stage at 1M points (the scale where
  the production path is known-good) — a pass here plus a fail at 10M
  pins the fault to scale, not shape.

Each stage runs in its OWN process (the worker crash kills the client);
run them serially and read the verdict from which stages survive.

Run (TPU): ``python tools/gather_fault_bisect.py --stage gather`` etc.
Reference anchor: several_leg.cu:92-129 (the reference's equivalent
workload, which just works at 66M on the 1080 Ti).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu.models.robot import HEX_MOUNTS, make_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.csr_grid import build_csr_grid
from legmov_tpu.ops.grid import cell_size_for
from legmov_tpu.ops.pallas_multileg import (
    make_multileg_kernel,
    oriented_tables,
)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from map_solve_bench import terrain_at  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("gather", "kernel", "control"),
                    required=True)
    ap.add_argument("--barrier", action="store_true",
                    help="insert jax.lax.optimization_barrier between "
                    "the gathers and the kernel (fusion/layout bisect)")
    ap.add_argument("--points", type=int, default=10_240_000)
    ap.add_argument("--poses", type=int, default=2048)
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=256)
    args = ap.parse_args()

    n_points = 1_048_576 if args.stage == "control" else args.points
    terrain = terrain_at(n_points)
    robot = make_robot(HEX_MOUNTS)
    cs = cell_size_for(robot) / 2
    csr = build_csr_grid(terrain, cs)
    F = int(csr.xs.shape[0])
    A, W = args.poses, args.window
    print(f"stage={args.stage} F={F} A={A} window={W} "
          f"steps={args.steps}", flush=True)

    rng = np.random.default_rng(5)
    body = terrain[rng.integers(0, F, A)] + np.asarray(
        [0, 0, 180.0], np.float32
    )
    rpy = rng.uniform(-0.1, 0.1, (A, 3)).astype(np.float32)
    quats = np.asarray(quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]))
    tab = oriented_tables(jnp.asarray(body), jnp.asarray(quats), robot)

    # queue-like starts: random in-range column starts, advanced per
    # step like `start + within * window` (clip keeps the production
    # path's exact index construction incl. its max-F clip)
    starts0 = jnp.asarray(
        rng.integers(0, max(F - W, 1), A).astype(np.int32)
    )
    sentinel = jnp.float32(1e9)
    use_kernel = args.stage in ("kernel", "control")
    kernel_fn = make_multileg_kernel(robot, W, False) if use_kernel else None
    L = 6

    @jax.jit
    def chain(xs, ys, zs, tab):
        def step(c):
            q, legs_c = c
            start = (starts0 + q * jnp.int32(W)) % jnp.int32(max(F - W, 1))
            pos = jnp.arange(W, dtype=jnp.int32)[None, :]
            idxs = jnp.clip(start[:, None] + pos, 0, max(F - 1, 0))
            rem = jnp.int32(F) - start
            mask = pos < rem[:, None]

            def take(comp):
                g = comp[idxs]
                return jnp.where(mask, g, sentinel)

            gx, gy, gz = take(xs), take(ys), take(zs)
            if args.barrier:
                gx, gy, gz = jax.lax.optimization_barrier((gx, gy, gz))
            if use_kernel:
                got = kernel_fn(tab, gx, gy, gz)
            else:
                # all three gathers must stay live: fold each into a
                # runtime scalar XLA cannot constant-fold away
                s = (jnp.sum(gx, axis=1) + jnp.sum(gy, axis=1)
                     + jnp.sum(gz, axis=1))  # [A]
                got = jnp.broadcast_to(
                    (s > -jnp.inf)[:, None], (A, L)
                )
            return q + 1, legs_c | got

        def cond(c):
            return c[0] < jnp.int32(args.steps)

        _, legs = jax.lax.while_loop(
            cond, step, (jnp.int32(0), jnp.zeros((A, L), bool))
        )
        return jnp.sum(legs.astype(jnp.int32))

    t0 = time.perf_counter()
    out = float(chain(csr.xs, csr.ys, csr.zs, tab))
    print(f"SURVIVED stage={args.stage}: chain sum={out} "
          f"wall={time.perf_counter() - t0:.1f}s "
          f"backend={jax.devices()[0].platform}", flush=True)


if __name__ == "__main__":
    main()
