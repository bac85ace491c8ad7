"""Real-Mosaic (interpret=False) exactness spot check for the
CSR-streaming hierarchical cell evaluator.

The class of bug that round-2's window-8192 fault exposed (a kernel
family lowering fine in CI but misbehaving on the actual Mosaic target)
is only ever caught ON-CHIP — interpret-mode parity (the default suite)
and Mosaic-lowering CI cannot see it.  This tool runs
``ops.csr_cell_eval.make_csr_cell_eval`` with ``interpret=False`` on the
real TPU and asserts flag equality against the dense XLA evaluator
``hier_solver._eval_cells`` (also executed on-chip), over:

* both foothold rules (``shared`` True/False),
* both shared-kernel forms (chunk-major default + the quat-major
  fallback, LEGMOV_CSR_QUAT_MAJOR),
* quorums k in {3, L} (partial-quorum role masks + the strict all-legs
  benchmark case).

The robot is the HEXAPOD moonbot (L = 6): that exercises the maximum
leg-bit packing regime — 6 infl bits per role byte, and the per-leg
chunk-major kernel's 3 x 6 = 18-bit run2 words (the L <= 6 cap) — and
makes k = L a real all-legs quorum.  (The unit tests and the deep-solve
workloads cover the quad regime.)  Shapes are kept small (16 cells, 5
quats, ~4k footholds) so each of the distinct kernels compiles quickly;
the configuration otherwise mirrors tests/test_csr_cell_eval.py so an
on-chip mismatch pinpoints a Mosaic lowering divergence, not a logic
difference.

Run (TPU): ``python tools/csr_cell_onchip_check.py``
Reference anchor: several_leg_octree.cu:19-151 (validity_child item
semantics the flags encode).
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

from legmov_tpu.models.hier_solver import _eval_cells
from legmov_tpu.models.robot import get_moonbot_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.csr_cell_eval import (
    _ALIGN,
    ball_mask_params,
    level_tables,
    make_csr_cell_eval,
    pad_csr_soa,
    slab_queue_host_max,
)
from legmov_tpu.ops.csr_grid import build_csr_grid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--interpret", action="store_true",
                    help="interpret mode (CI smoke run of this tool)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    from legmov_tpu.models.robot import HEX_MOUNTS

    robot = get_moonbot_robot(HEX_MOUNTS)  # L = 6: max packing regime
    L = 6
    reach = 711.0
    fh = rng.uniform(-1500, 1500, (4000, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-200, -100, 4000)
    csr = build_csr_grid(fh, 400.0)

    S = 5
    rpy = rng.uniform(-0.3, 0.3, (S, 3)).astype(np.float32)
    quats = np.array(
        quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]), np.float32
    )
    quats[0] = [1, 0, 0, 0]

    C = 16
    centers = rng.uniform(-1200, 1200, (C, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(50, 150, C)
    pv = rng.random(C) < 0.3
    half = np.asarray([40.0, 40.0, 40.0], np.float32)
    parent_half = np.asarray([80.0, 80.0, 80.0], np.float32)
    margin = 16.0
    elong = parent_half + np.float32(reach)

    window = 256
    w_fetch = (-(-window // _ALIGN) + 1) * _ALIGN
    xs2, ys2, zs2, dead = pad_csr_soa(csr.xs, csr.ys, csr.zs, w_fetch)
    maxch = slab_queue_host_max(
        centers, elong, np.asarray(csr.starts), np.asarray(csr.origin),
        csr.cell_size, csr.dims, window,
    )

    legtab = level_tables(
        jnp.asarray(quats), jnp.asarray(half), jnp.asarray(parent_half),
        robot, margin, reach,
    )
    rmounts, reach_l, r_cell = ball_mask_params(
        jnp.asarray(quats), robot, half, margin
    )
    ok_all = True
    for k in (3, L):
        # dense XLA reference flags, computed on the same device
        vw, ew, lw = _eval_cells(
            jnp.asarray(centers), jnp.asarray(pv), jnp.asarray(half),
            jnp.asarray(parent_half), jnp.asarray(fh), jnp.asarray(quats),
            robot, k=k, margin=margin, reach=reach, chunk=500,
            use_rot=True, shared=True,
        )
        vw2, ew2, lw2 = _eval_cells(
            jnp.asarray(centers), jnp.asarray(pv), jnp.asarray(half),
            jnp.asarray(parent_half), jnp.asarray(fh), jnp.asarray(quats),
            robot, k=k, margin=margin, reach=reach, chunk=500,
            use_rot=True, shared=False,
        )
        want = {True: (vw, ew, lw), False: (vw2, ew2, lw2)}
        for shared, chunk_major in (
            (True, True), (True, False), (False, True), (False, False)
        ):
            q_base = maxch if chunk_major else S * maxch
            q_steps = 1 << (q_base - 1).bit_length()
            t0 = time.perf_counter()
            ev = make_csr_cell_eval(
                robot, k=k, n_quats=S, cells=C, q_steps=q_steps,
                shared=shared, window=window, interpret=args.interpret,
                chunk_major=chunk_major,
            )
            v, e, lf, over = ev(
                jnp.asarray(centers), jnp.asarray(pv), legtab,
                jnp.asarray(elong), rmounts, reach_l, r_cell,
                xs2, ys2, zs2, csr.starts, csr.origin,
                cell_size=csr.cell_size, dims=csr.dims, dead_elem=dead,
            )
            v, e, lf = np.asarray(v), np.asarray(e), np.asarray(lf)
            wv, we, wl = (np.asarray(x) for x in want[shared])
            same = (
                not bool(np.asarray(over))
                and (v == wv).all() and (e == we).all()
                and (lf == wl).all()
            )
            ok_all &= same
            print(
                f"{'OK ' if same else 'FAIL'} k={k} shared={shared} "
                f"chunk_major={chunk_major} q_steps={q_steps} "
                f"valid={int(v.sum())} edge={int(e.sum())} "
                f"leaf={int(lf.sum())} "
                f"wall={time.perf_counter() - t0:.1f}s "
                f"backend={jax.devices()[0].platform}",
                flush=True,
            )
            if not same:
                print(f"  mismatch cells v:{np.nonzero(v != wv)[0]} "
                      f"e:{np.nonzero(e != we)[0]} "
                      f"lf:{np.nonzero(lf != wl)[0]}")
    print("ALL EXACT" if ok_all else "MISMATCH — see above")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
