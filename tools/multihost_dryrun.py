"""Two-process `jax.distributed` dry-run of the multi-host layer.

Exercises, with real separate processes on localhost (CPU backend, 2
virtual devices per process -> a 4-device global mesh):

* ``initialize_distributed`` with explicit coordinator kwargs
  (legmov_tpu/parallel/multihost.py),
* ``global_pose_batch`` assembling a globally-sharded pose batch from
  per-process local shards,
* ``sharded_positionable`` running shard_map + psum across the process
  boundary (the DCN path of SURVEY.md section 2.10),

and asserts each process's local shard of the result equals the
single-process reference computed independently from the same seed.

Parent mode (no args): spawns the two workers, waits, prints
``MULTIHOST OK`` on success.  Worker mode: ``--proc I --port P``.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NPROCS = 2
DEVS_PER_PROC = 2
POSES = 64
FOOTHOLDS = 256


def _pose_data(seed: int = 11):
    import numpy as np

    rng = np.random.default_rng(seed)
    body = rng.uniform(-300, 300, (POSES, 3)).astype(np.float32)
    body[:, 2] = rng.uniform(100, 250, POSES)
    fh = rng.uniform(-600, 600, (FOOTHOLDS, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-50, 50, FOOTHOLDS)
    return body, fh


def worker(proc: int, port: int) -> None:
    from legmov_tpu.parallel.multihost import (
        gather_to_host,
        global_pose_batch,
        initialize_distributed,
    )

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NPROCS,
        process_id=proc,
    )
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == NPROCS, jax.process_count()
    assert len(jax.devices()) == NPROCS * DEVS_PER_PROC

    from legmov_tpu.models.robot import get_m2_robot
    from legmov_tpu.ops.positionability import positionable
    from legmov_tpu.parallel.sharding import make_mesh, sharded_positionable

    mesh = make_mesh(points_axis=DEVS_PER_PROC)  # poses axis = processes
    body, fh = _pose_data()
    robot = get_m2_robot()

    # per-process local pose shard -> global sharded batch (no host gather)
    shard = POSES // NPROCS
    local = body[proc * shard : (proc + 1) * shard]
    gbody = global_pose_batch(local, mesh)
    assert gbody.shape == (POSES, 3)

    def replicated(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, P()), lambda idx: x[idx]
        )

    gq = global_pose_batch(
        np.tile(np.asarray([1, 0, 0, 0], np.float32), (shard, 1)), mesh
    )
    gfh = replicated(fh)
    grobot = jax.tree.map(replicated, robot)

    out = sharded_positionable(mesh, k=3)(gbody, gq, gfh, grobot)

    # single-process oracle on the local default device
    want = np.asarray(positionable(body, None, fh, robot, k=3))
    for s in out.addressable_shards:
        lo = s.index[0].start or 0
        got = gather_to_host(s.data)
        np.testing.assert_array_equal(got, want[lo : lo + got.shape[0]])
    print(f"proc {proc}: local shards match single-process oracle",
          flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()

    if args.proc is not None:
        worker(args.proc, args.port)
        return

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS=(
            f"--xla_force_host_platform_device_count={DEVS_PER_PROC}"
        ),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--proc", str(i), "--port", str(port)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(NPROCS)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        if p.returncode != 0:
            ok = False
            print(f"--- proc {i} rc={p.returncode} ---\n{out}")
        else:
            print(out.strip())
    if not ok:
        sys.exit(1)
    print("MULTIHOST OK")


if __name__ == "__main__":
    main()
