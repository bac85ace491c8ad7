"""Benchmark harness: single-chip reachability/distance throughput.

Reproduces the reference benchmark protocol (bench.cpp:52-181 /
setting_bench.h): dense 3-D grids of query points around the M2 leg
(settings.h:58 ``RobotNumb=1``), kernel-only timing.

Timing methodology: the TPU in this environment sits behind a relay whose
``block_until_ready`` can return before device work completes and whose
host round-trip costs ~30 ms, so naive per-call timing is meaningless.
Instead we run K dependent evaluations inside ONE jitted ``fori_loop``
(each iteration's input depends on the previous result, so nothing can be
elided or overlapped), force completion with a scalar host fetch, and take
the slope between K=1 and K=K_MAX — this cancels both the fetch latency
and the loop overhead, giving pure per-evaluation device time (the analogue
of the reference's cudaEvent kernel-only brackets, cross_compiled.cu:52-65).

Baselines (BASELINE.md, from the reference's committed bdata CSVs):
GTX 1080 Ti reachability 0.403 ns/point, distance 1.437 ns/point.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}``
where the headline metric is reachability throughput (points/s/chip) and
``vs_baseline`` is the speedup over the GTX 1080 Ti reference GPU.
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Reference GPU baselines, ns/point (BASELINE.md, bdata/pc/{r,d}gpu.csv).
BASE_REACH_NS = 0.403
BASE_DIST_NS = 1.437

# Chip roofline model (v5e HBM ~819 GB/s).  Minimum HBM traffic per point:
# reachability reads 3 f32 coords and writes 1 bool (13 B); distance reads
# 3 f32 and writes 1 bool + 3 f32 (25 B).  Both kernels are far above the
# VPU compute bound only for reachability; distance is compute-bound, so
# the % figures report how close each kernel is to the *memory* ceiling.
HBM_GBPS = 819.0
REACH_BYTES_PER_PT = 13.0
DIST_BYTES_PER_PT = 25.0


def make_grid(n: int) -> jnp.ndarray:
    """Device-resident 3-D grid covering the leg's surroundings.

    Same spatial envelope as the reference bench grids
    (setting_bench.h:13-18: x in [-100, 601], z in [-350, 51]) extended in
    y, with the point count swept like bench.cpp:109-120.
    """
    side = max(2, round(n ** (1.0 / 3.0)))
    nx = ny = side
    nz = max(2, n // (side * side))
    x = jnp.linspace(-100.0, 601.0, nx, dtype=jnp.float32)
    y = jnp.linspace(-400.0, 401.0, ny, dtype=jnp.float32)
    z = jnp.linspace(-350.0, 51.0, nz, dtype=jnp.float32)
    g = jnp.stack(jnp.meshgrid(x, y, z, indexing="ij"), axis=-1)
    return g.reshape(-1, 3)


def chained_timer_samples(eval_fn, pts, leg, k: int, reps: int) -> list:
    """Per-rep seconds-per-evaluation samples via the K-iterations slope.

    ``eval_fn(points, leg) -> scalar float32`` must reduce its full output
    to a scalar (so each iteration really computes everything).  ``pts``
    may be any pytree of arrays (e.g. an SoA component tuple) — it is
    passed as a jit *argument*, never closed over, so large point arrays
    are not baked into the compiled program as constants.

    The chain length is a traced operand (``fori_loop`` with a dynamic
    trip count), so one compiled program serves both the K=1 baseline and
    the K=k run — one compile per (eval_fn, shapes) instead of two.
    """

    @jax.jit
    def chain(pts, leg, iters):
        leaves, treedef = jax.tree.flatten(pts)

        def body(_, acc):
            # perturb ONLY the first leaf: enough to serialize the chain
            # (every iteration depends on the previous scalar), while the
            # extra HBM traffic stays at one read+write per point instead
            # of one per component
            p = jax.tree.unflatten(
                treedef, [leaves[0] + acc] + leaves[1:]
            )
            s = eval_fn(p, leg)
            return acc + jnp.float32(1e-9) * s

        return jax.lax.fori_loop(
            0, iters, body, jnp.float32(0.0), unroll=False
        )

    def timed(iters: int, n: int) -> list:
        float(chain(pts, leg, iters))  # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(chain(pts, leg, iters))  # scalar fetch forces completion
            ts.append(time.perf_counter() - t0)
        return ts

    # relay noise is one-sided (delays only — the scalar fetch cannot
    # return before the chain is computed), so min is the baseline
    # estimator.  The slope is taken between chains of K and 5K (not 1
    # and K): with a K=1 baseline, baseline inflation of j seconds
    # biases the slope DOWNWARD by j/(K-1) — a single 5 ms fetch-jitter
    # draw on the short side fabricates a too-fast kernel (observed
    # once in r4: a distance reading 40% below the kernel's own VPU
    # compute bound).  Between K and 5K the same jitter divides by 4K,
    # and escalation (4x K when the slope collapses) shrinks it
    # further.
    kk = k
    for _ in range(3):
        t_lo = min(timed(kk, reps))
        t_his = timed(5 * kk, reps)
        slopes = [(th - t_lo) / (4 * kk) for th in t_his]
        if float(np.median(slopes)) > 0:
            return slopes
        kk *= 4
    return [max(s, 1e-12) for s in slopes]


def chained_timer(eval_fn, pts, leg, k: int, reps: int,
                  min_batches: int = 1) -> float:
    """Best (min) seconds per evaluation, contention-robust.

    Relay noise is strictly one-sided (a sample can only be inflated, the
    scalar fetch cannot return before the chain completes), so the min is
    the estimator — but on contended days a single ``reps``-draw batch
    can have EVERY sample inflated, which is exactly how BENCH_r01->r03
    drifted upward (VERDICT r3 weak #1).  Detection: a large
    median-to-min spread within a batch means the draws straddled
    contention windows, i.e. the min may still be inflated.  Escalation:
    keep drawing batches (longer chains after the first two — a longer
    chain amortizes per-fetch jitter over more evaluations) until either
    a batch is tight (spread <= 8%: it hit a quiet window and its min is
    trustworthy) or the global min stops improving for two consecutive
    batches (converged despite the noise).  Bounded at 6 batches; worst
    case costs ~50 s of inter-batch sleeps plus the longer chains,
    typical contended case 2-3 batches (~30 s).

    ``min_batches=2`` (the bench.py PROTOCOL runs) refuses to accept a
    single batch: a whole batch can sit inside one contention burst
    with a deceptively tight spread, so two time-spaced draws must
    agree.  The default (1) keeps config-sweeping probe tools fast —
    they compare many cases within one session, where per-case
    absolute calibration matters less than total wall time."""
    best = float("inf")
    stale = 0
    for batch in range(6):
        if batch >= 1:
            # contention on this relay arrives in bursts of seconds to
            # tens of seconds; spacing the batches samples independent
            # windows instead of re-drawing inside one burst
            time.sleep(10.0)
        kk = k if batch < 2 else k * 4
        slopes = chained_timer_samples(eval_fn, pts, leg, kk, reps)
        b = float(np.min(slopes))
        spread = float(np.median(slopes)) / max(b, 1e-12)
        improved = b < best * 0.98
        best = min(best, b)
        if spread <= 1.08 and batch + 1 >= min_batches:
            break
        stale = 0 if improved else stale + 1
        if stale >= 2 and batch + 1 >= min_batches:
            break
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1 << 24,
                    help="grid points for the reachability sweep")
    ap.add_argument("--dist-points", type=int, default=1 << 22,
                    help="grid points for the distance sweep")
    ap.add_argument("--iters", type=int, default=8,
                    help="chained evaluations per timing sample")
    # the reference takes 100 GPU subsamples per size (setting_bench.h:10)
    # and percentile-filters; with the one-sided relay noise here the min
    # estimator needs enough draws to hit an uncontended window — 11 reps
    # cost < 1 s extra (the scalar fetch dominates a rep) and on
    # contended days tighten the headline by ~10%
    ap.add_argument("--reps", type=int, default=11)
    ap.add_argument("--impl", choices=("auto", "pallas", "xla"), default="auto",
                    help="auto tries the fused Pallas kernels, falling back "
                    "to the XLA path on any compile/lowering failure")
    args = ap.parse_args()

    from legmov_tpu import get_m2_leg
    from legmov_tpu.ops.distance import distance
    from legmov_tpu.ops.reachability import reachability

    dev = jax.devices()[0]
    leg = jax.device_put(get_m2_leg(), dev)

    def reach_scalar(p, leg):
        return jnp.sum(reachability(p, leg).astype(jnp.float32))

    def dist_scalar(p, leg):
        ok, vec = distance(p, leg)
        return jnp.sum(vec[:, 0]) + jnp.sum(ok.astype(jnp.float32))

    pts = jax.device_put(make_grid(args.points), dev)
    n_reach = pts.shape[0]
    pts_d = jax.device_put(make_grid(args.dist_points), dev)
    n_dist = pts_d.shape[0]

    impl = args.impl
    reach_ns = dist_ns = None
    if impl in ("auto", "pallas"):
        try:
            from legmov_tpu.ops.pallas_kernels import (
                make_distance_kernel,
                make_reachability_kernel,
            )

            kr = make_reachability_kernel(get_m2_leg())
            kd = make_distance_kernel(get_m2_leg())

            # SoA component arrays — the kernels' native layout, and the
            # layout of the reference's own .bin file protocol.  The
            # reference likewise times its kernel on ITS native layout
            # (float3 AoS for CUDA) with the host-side SoA->AoS conversion
            # outside the cudaEvent brackets (several_leg.cpp:126-133 ->
            # cross_compiled.cu:58-65), so this is the symmetric
            # methodology.
            import numpy as _np

            def to_soa(p):
                a = _np.asarray(p)
                return tuple(
                    jax.device_put(_np.ascontiguousarray(a[:, i]), dev)
                    for i in range(3)
                )

            # SoA components are threaded through chained_timer as jit
            # arguments — closing a jitted fn over ~64 MB device arrays
            # would bake them in as constants (remote-compile HTTP 413).
            comps_r = to_soa(pts)
            comps_d = to_soa(pts_d)

            def reach_scalar_p(c, _leg):
                return jnp.sum(kr.soa(*c).astype(jnp.float32))

            def dist_scalar_p(c, _leg):
                ok, vx, vy, vz = kd.soa(*c)
                return jnp.sum(vx) + jnp.sum(ok.astype(jnp.float32))

            t_reach = chained_timer(reach_scalar_p, comps_r, leg, args.iters,
                                    args.reps, min_batches=2)
            reach_ns = t_reach / n_reach * 1e9
            t_dist = chained_timer(dist_scalar_p, comps_d, leg, args.iters,
                                   args.reps, min_batches=2)
            dist_ns = t_dist / n_dist * 1e9
            impl = "pallas-soa"
        except Exception as e:
            if args.impl == "pallas":
                raise
            print(f"# pallas path failed ({type(e).__name__}), "
                  "falling back to XLA", flush=True)
            impl = "xla"
            reach_ns = dist_ns = None

    if reach_ns is None:
        t_reach = chained_timer(reach_scalar, pts, leg, args.iters,
                                args.reps, min_batches=2)
        reach_ns = t_reach / n_reach * 1e9
        t_dist = chained_timer(dist_scalar, pts_d, leg, args.iters,
                               args.reps, min_batches=2)
        dist_ns = t_dist / n_dist * 1e9
        impl = "xla"

    result = {
        "metric": "reachability_throughput",
        "value": round(1e9 / reach_ns, 1),
        "unit": "points/s/chip",
        "vs_baseline": round(BASE_REACH_NS / reach_ns, 4),
        "reachability_ns_per_point": round(reach_ns, 4),
        "distance_ns_per_point": round(dist_ns, 4),
        "distance_throughput": round(1e9 / dist_ns, 1),
        "distance_vs_baseline": round(BASE_DIST_NS / dist_ns, 4),
        "points_reach": n_reach,
        "points_dist": n_dist,
        # roofline: minimum-HBM-traffic bound per point and what fraction
        # of that ceiling each kernel achieves (100% = memory-bound SOL)
        "reach_hbm_bound_ns": round(REACH_BYTES_PER_PT / HBM_GBPS, 4),
        "reach_pct_of_hbm_roofline": round(
            100.0 * (REACH_BYTES_PER_PT / HBM_GBPS) / reach_ns, 1),
        "dist_hbm_bound_ns": round(DIST_BYTES_PER_PT / HBM_GBPS, 4),
        "dist_pct_of_hbm_roofline": round(
            100.0 * (DIST_BYTES_PER_PT / HBM_GBPS) / dist_ns, 1),
        "impl": impl,
        "device": str(dev.platform),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
