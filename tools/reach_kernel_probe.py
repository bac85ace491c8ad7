"""Reachability-kernel configuration probe (profiling only).

The headline reach kernel runs at ~0.057 ns/pt — 27% of the 13 B/pt HBM
roofline (bench.py fields).  This probe times the product kernel under
grid/block variants plus cost-attribution ablations to find where the
remaining 3.6x goes:

* ``block{256,512,1024}`` — grid-step tile height vs the default 128
* ``parallel``            — Mosaic ``dimension_semantics=("parallel",)``
* ``io_only``             — copy-through kernel on the same tiles: the
  achievable memory-bound floor for this pipeline shape (results WRONG —
  attribution only)

Run on the real TPU: ``python tools/reach_kernel_probe.py``.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import chained_timer, make_grid  # noqa: E402
from legmov_tpu.models.leg import get_m2_leg  # noqa: E402
from legmov_tpu.ops.pallas_kernels import make_reachability_kernel  # noqa: E402


def make_io_only(block_rows: int = 256, interpret: bool = False):
    """Same tiling/IO as the reach kernel, no math: the memory floor."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lanes = 128

    def kernel(x_ref, y_ref, z_ref, o_ref):
        o_ref[...] = (x_ref[...] + y_ref[...] + z_ref[...] > 0).astype(
            jnp.uint8
        )

    block = block_rows * lanes

    @jax.jit
    def fn_soa(x, y, z):
        n = x.shape[0]
        pad = (-n) % block
        if pad:
            x, y, z = (jnp.pad(a, (0, pad)) for a in (x, y, z))
        rows = x.shape[0] // lanes
        comps = tuple(a.reshape(rows, lanes) for a in (x, y, z))
        spec = pl.BlockSpec((block_rows, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.uint8),
            grid=(rows // block_rows,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(*comps)
        return out.reshape(-1)[:n].astype(bool)

    class K:
        soa = staticmethod(fn_soa)

    return K


def run_attribution(args) -> None:
    """VERDICT r4 item 2: settle the reach-kernel roof question.

    Interleaves, in ONE TPU session, chained-timer rounds of
    {production kernel (interval-collapsed circle validity, r5 default),
    the r4 full-form kernel, io-only floor}.  Reading the result:

    * io floor ~0.0123 ns/pt (its quiet-day value) while production sits
      well above its ~0.033 VPU bound -> the gap is kernel-side;
    * io floor inflated proportionally with production in the same
      rounds -> the gap is relay/chip contention and the roofline memo
      stands (~35% of headline perf is contention, not kernel headroom);
    * interval kernel below full-form by ~the 24% op cut -> ship it
      (it is the default; this run is the measurement of record).
    """
    import numpy as np

    leg = get_m2_leg()
    pts = make_grid(args.points)
    n = pts.shape[0]
    comps = tuple(
        jnp.asarray(np.ascontiguousarray(np.asarray(pts)[:, i]))
        for i in range(3)
    )

    k_int = make_reachability_kernel(leg, interpret=args.interpret)
    k_full = make_reachability_kernel(leg, interpret=args.interpret,
                                      interval_valid=False)
    io = make_io_only(interpret=args.interpret)

    def f_int(c, _leg):
        return jnp.sum(k_int.soa(*c).astype(jnp.float32))

    def f_full(c, _leg):
        return jnp.sum(k_full.soa(*c).astype(jnp.float32))

    def f_io(c, _leg):
        return jnp.sum(io.soa(*c).astype(jnp.float32))

    cases = [("interval(r5)", f_int), ("full(r4)", f_full),
             ("io_only", f_io)]
    history = {name: [] for name, _ in cases}
    for rnd in range(args.rounds):
        for name, fn in cases:
            t = chained_timer(fn, comps, leg, args.iters, args.reps)
            ns = t / n * 1e9
            history[name].append(ns)
            print(f"round {rnd} {name:<14} {ns:.4f} ns/pt", flush=True)
    print("--- summary (min / median over rounds) ---", flush=True)
    for name, _ in cases:
        h = history[name]
        print(f"{name:<14} min={min(h):.4f} med={float(np.median(h)):.4f} "
              f"all={[round(v, 4) for v in h]}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1 << 24)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=4,
                    help="--attribution: interleaved A/B/C rounds")
    ap.add_argument("--attribution", action="store_true",
                    help="interleaved {interval, full, io-floor} session "
                    "(VERDICT r4 item 2)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke (timings meaningless)")
    args = ap.parse_args()
    if args.attribution:
        run_attribution(args)
        return

    leg = get_m2_leg()
    pts = make_grid(args.points)
    n = pts.shape[0]
    import numpy as np

    comps = tuple(
        jnp.asarray(np.ascontiguousarray(np.asarray(pts)[:, i]))
        for i in range(3)
    )

    cases = [
        ("default(128)", dict()),
        ("block64", dict(block_rows=64)),
        ("block256", dict(block_rows=256)),
        ("block512", dict(block_rows=512)),
        ("block1024", dict(block_rows=1024)),
        ("parallel", dict(parallel=True)),
        ("par_block128", dict(block_rows=128, parallel=True)),
        ("par_block512", dict(block_rows=512, parallel=True)),
    ]
    base = None
    for name, kw in cases:
        kr = make_reachability_kernel(leg, interpret=args.interpret, **kw)

        def fn(c, _leg):
            return jnp.sum(kr.soa(*c).astype(jnp.float32))

        t = chained_timer(fn, comps, leg, args.iters, args.reps)
        ns = t / n * 1e9
        if base is None:
            base = ns
        print(f"{name:<14} {ns:.4f} ns/pt  delta={base - ns:+.4f}",
              flush=True)

    io = make_io_only(interpret=args.interpret)

    def fn_io(c, _leg):
        return jnp.sum(io.soa(*c).astype(jnp.float32))

    t = chained_timer(fn_io, comps, leg, args.iters, args.reps)
    print(f"{'io_only':<14} {t / n * 1e9:.4f} ns/pt  (memory floor; "
          "results WRONG)", flush=True)


if __name__ == "__main__":
    main()
