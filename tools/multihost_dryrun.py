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

``--scale`` runs BASELINE config 5 at its stated scale — 100k candidate
body poses x a 6-leg hexapod, per-pose feasibility reduced with a psum
that crosses the process boundary — and timestamps the solve.  Exactness
is asserted on a random pose subsample against the single-process oracle
(the full oracle at this scale would dominate the run).  Real multi-host
THROUGHPUT cannot be measured here (both processes share one CPU); this
validates the communication structure and the 100k-pose batch shapes.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NPROCS = 2
DEVS_PER_PROC = 2
POSES = 64
FOOTHOLDS = 256


def _pose_data(n_poses: int, n_footholds: int, seed: int = 11):
    import numpy as np

    rng = np.random.default_rng(seed)
    body = rng.uniform(-300, 300, (n_poses, 3)).astype(np.float32)
    body[:, 2] = rng.uniform(100, 250, n_poses)
    fh = rng.uniform(-600, 600, (n_footholds, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-50, 50, n_footholds)
    return body, fh


def worker(proc: int, port: int, args) -> None:
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

    from legmov_tpu.models.robot import HEX_MOUNTS, get_m2_robot, make_robot
    from legmov_tpu.ops.positionability import positionable
    from legmov_tpu.parallel.sharding import make_mesh, sharded_positionable

    n_poses = args.poses
    n_fh = args.footholds
    k = args.k
    robot = make_robot(HEX_MOUNTS) if args.hex else get_m2_robot()

    mesh = make_mesh(points_axis=DEVS_PER_PROC)  # poses axis = processes
    body, fh = _pose_data(n_poses, n_fh)

    # per-process local pose shard -> global sharded batch (no host gather)
    shard = n_poses // NPROCS
    local = body[proc * shard : (proc + 1) * shard]
    gbody = global_pose_batch(local, mesh)
    assert gbody.shape == (n_poses, 3)

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

    # chunk the local pose shard: the unchunked [P_local, F_local, L]
    # intermediate at 100k-pose scale would thrash a CPU host
    solver = sharded_positionable(
        mesh, k=k, chunk=4096 if n_poses * n_fh > 1 << 24 else 0
    )
    t0 = time.perf_counter()
    out = solver(gbody, gq, gfh, grobot)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    if args.check_poses and args.check_poses < n_poses:
        # subsample oracle (full single-process oracle would dominate)
        rng = np.random.default_rng(7)
        sel = np.sort(rng.choice(n_poses, args.check_poses, replace=False))
        want = np.asarray(
            positionable(body[sel], None, fh, robot, k=k)
        )
        got_global = np.asarray(jax.device_get(
            jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(out)
        ))[sel]
        np.testing.assert_array_equal(got_global, want)
        print(
            f"proc {proc}: {args.check_poses}-pose subsample matches "
            f"single-process oracle; {n_poses} poses x {n_fh} footholds "
            f"x {len(np.asarray(robot.body_angle))} legs solved in "
            f"{dt:.2f}s (incl. compile)",
            flush=True,
        )
        return

    # small mode: exact check of every local shard
    want = np.asarray(positionable(body, None, fh, robot, k=k))
    for s in out.addressable_shards:
        lo = s.index[0].start or 0
        got = gather_to_host(s.data)
        np.testing.assert_array_equal(got, want[lo : lo + got.shape[0]])
    print(f"proc {proc}: local shards match single-process oracle",
          flush=True)

    # flagship solver across the process boundary: the in-kernel-DMA CSR
    # streaming solver (interpret mode on CPU) under the same global mesh
    # — poses globally sharded, CSR tables replicated per process
    from legmov_tpu.ops.csr_grid import (
        ball_columns,
        build_csr_grid,
        make_csr_dma_solver,
    )
    from legmov_tpu.ops.grid import cell_size_for, neighbor_offsets
    from legmov_tpu.parallel.sharding import sharded_csr_positionable

    reach = cell_size_for(robot)
    csr = build_csr_grid(fh, reach / 2)
    cols = np.asarray(ball_columns(neighbor_offsets(reach / 2, reach)))
    dma = make_csr_dma_solver(
        robot, window=256, interpret=True,
        rounds=((2, 1.0), (0, 0.5)), super_step=4,
    )
    csr_host = (np.asarray(csr.xs), np.asarray(csr.ys), np.asarray(csr.zs),
                np.asarray(csr.starts), np.asarray(csr.origin))
    out_dma = sharded_csr_positionable(
        mesh, dma, jax.numpy.asarray(cols), csr.cell_size, csr.dims, k=k
    )(gbody, gq, *(replicated(a) for a in csr_host))
    jax.block_until_ready(out_dma)
    _, want_dma, _ = dma(
        jax.numpy.asarray(body),
        jax.numpy.asarray(np.tile(np.asarray([1, 0, 0, 0], np.float32),
                                  (n_poses, 1))),
        *(jax.numpy.asarray(a) for a in csr_host),
        jax.numpy.asarray(cols), cell_size=csr.cell_size, k=k,
        dims=csr.dims,
    )
    want_dma = np.asarray(want_dma)
    for s in out_dma.addressable_shards:
        lo = s.index[0].start or 0
        got = gather_to_host(s.data)
        np.testing.assert_array_equal(got, want_dma[lo : lo + got.shape[0]])
    print(f"proc {proc}: DMA-solver local shards match single-process run",
          flush=True)

    # hierarchical deep solver across the process boundary: both
    # processes run the SPMD host loop in lockstep, cells shard over the
    # 4-device global mesh (sharded_{cell,csr_cell}_eval), inputs staged
    # as global arrays (parallel.sharding.stage_for_mesh), flags
    # all_gathered so each host fetches the full level — the CellRecord
    # must equal the single-process (mesh=None) solve exactly
    from legmov_tpu.config import SolverConfig
    from legmov_tpu.models.hier_solver import solve_positionability

    cfg = SolverConfig(
        box_center=(0.0, 0.0, 0.0), box_size=(600.0, 600.0, 150.0),
        min_box=(80.0, 80.0, 80.0), max_depth=1, legs_for_stability=2,
        enable_rot_below=200.0, angle_samples=(2, 1, 1),
    )
    fh_h = fh.copy()
    fh_h[:, 2] = np.random.default_rng(3).uniform(
        -180, -100, fh_h.shape[0]
    ).astype(np.float32)
    rec_local = solve_positionability(
        fh_h, robot, cfg, chunk=128, cell_batch=64, shared_foothold=True,
        candidates="csr", use_pallas="off", csr_window=128,
        csr_cell_chunk=64,
    )
    rec_mesh = solve_positionability(
        fh_h, robot, cfg, chunk=128, cell_batch=64, shared_foothold=True,
        candidates="csr", use_pallas="off", csr_window=128,
        csr_cell_chunk=64, mesh=mesh,
    )
    np.testing.assert_array_equal(rec_local.centers, rec_mesh.centers)
    np.testing.assert_array_equal(rec_local.valid, rec_mesh.valid)
    np.testing.assert_array_equal(rec_local.edge, rec_mesh.edge)
    print(f"proc {proc}: hier-solver CellRecord matches single-process "
          "solve across the process boundary", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--scale", action="store_true",
                    help="BASELINE config-5 scale: 100k poses x hexapod")
    ap.add_argument("--poses", type=int, default=POSES)
    ap.add_argument("--footholds", type=int, default=FOOTHOLDS)
    ap.add_argument("--hex", action="store_true",
                    help="6-leg hexapod instead of the M2 quad")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--check-poses", type=int, default=0,
                    help="verify only a random pose subsample (0 = all)")
    args = ap.parse_args()
    if args.scale:
        args.poses = max(args.poses, 100_000)
        args.footholds = max(args.footholds, 4096)
        args.hex = True
        args.k = 6
        args.check_poses = args.check_poses or 2048

    if args.proc is not None:
        worker(args.proc, args.port, args)
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
    fwd = ["--poses", str(args.poses), "--footholds", str(args.footholds),
           "--k", str(args.k), "--check-poses", str(args.check_poses)]
    if args.hex:
        fwd.append("--hex")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--proc", str(i), "--port", str(port)] + fwd,
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(NPROCS)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1800)
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
