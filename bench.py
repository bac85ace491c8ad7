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


def chained_timer(eval_fn, pts, leg, k: int, reps: int) -> float:
    """Median seconds per evaluation via the K-dependent-iterations slope.

    ``eval_fn(points, leg) -> scalar float32`` must reduce its full output
    to a scalar (so each iteration really computes everything).
    """

    @partial(jax.jit, static_argnames="iters")
    def chain(pts, leg, iters):
        def body(_, acc):
            s = eval_fn(pts + acc, leg)
            return acc + jnp.float32(1e-9) * s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def timed(iters: int) -> float:
        float(chain(pts, leg, iters))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(pts, leg, iters))  # scalar fetch forces completion
            ts.append(time.perf_counter() - t0)
        # relay noise is one-sided (delays only — the scalar fetch cannot
        # return before the chain is computed), so min is the estimator
        return float(np.min(ts))

    # retry with longer chains if contention noise swamps the slope
    kk = k
    for _ in range(3):
        t1 = timed(1)
        tk = timed(kk)
        slope = (tk - t1) / (kk - 1)
        if slope > 0:
            return slope
        kk *= 4
    return max(slope, 1e-12)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1 << 24,
                    help="grid points for the reachability sweep")
    ap.add_argument("--dist-points", type=int, default=1 << 22,
                    help="grid points for the distance sweep")
    ap.add_argument("--iters", type=int, default=8,
                    help="chained evaluations per timing sample")
    ap.add_argument("--reps", type=int, default=5)
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

            rx, ry, rz = to_soa(pts)
            dx_, dy_, dz_ = to_soa(pts_d)

            def reach_scalar_p(x, _leg):
                return jnp.sum(kr.soa(x, ry, rz).astype(jnp.float32))

            def dist_scalar_p(x, _leg):
                ok, vx, vy, vz = kd.soa(x, dy_, dz_)
                return jnp.sum(vx) + jnp.sum(ok.astype(jnp.float32))

            t_reach = chained_timer(reach_scalar_p, rx, leg, args.iters,
                                    args.reps)
            reach_ns = t_reach / n_reach * 1e9
            t_dist = chained_timer(dist_scalar_p, dx_, leg, args.iters,
                                   args.reps)
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
        t_reach = chained_timer(reach_scalar, pts, leg, args.iters, args.reps)
        reach_ns = t_reach / n_reach * 1e9
        t_dist = chained_timer(dist_scalar, pts_d, leg, args.iters, args.reps)
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
        "impl": impl,
        "device": str(dev.platform),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
