"""Pallas TPU kernels for single-leg reachability and distance.

The XLA paths (ops/reachability.py, ops/distance.py) are already dense and
branch-free, but XLA's fusion still materializes [N, k] intermediates in
HBM.  These kernels fuse the entire per-point pipeline into one VMEM-
resident pass: read 12 B/point, compute in registers, write 1 B (or 13 B)
per point — the HBM-bound speed-of-light layout.

Design: a **factory specialized to one concrete leg** — every workspace
table entry (models/workspace.py) becomes a Python float baked into the
kernel as an immediate, exactly like the reference bakes its geometry into
compile-time ``constexpr`` (settings.h) — and all per-point data stays in
``[block_rows, 128]`` float32 tiles (the VPU-native layout).  The region
select logic is restructured so no tile ever grows a trailing slot axis:
reachability evaluates all four (region x extended) circle tables densely
and picks the result with three selects; distance builds per-slot scalars
with three-way select chains.

Numerics match the XLA path bit-for-bit except where noted (same squared
threshold compares, same fold order).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.models.workspace import build_workspace

_LANES = 128
_PI = np.float32(math.pi)


def _concrete_ws(leg: LegDimensions):
    """Workspace with every field as a concrete numpy array."""
    ws = build_workspace(leg)
    return type(ws)(*[np.asarray(f) for f in ws])


def _sel3(upper, ext, t):
    """3-select pick of scalar table ``t[region][ext]`` per-point."""
    hi = jnp.where(ext, t[1][1], t[1][0])
    lo = jnp.where(ext, t[0][1], t[0][0])
    return jnp.where(upper, hi, lo)


def _bsel(c, a, b):
    """Boolean select on bool tiles (Mosaic cannot lower jnp.where to i1)."""
    return (c & a) | (~c & b)


def _sel3b(upper, ext, t):
    """_sel3 for boolean tables, via pure boolean algebra."""
    return _bsel(upper, _bsel(ext, t[1][1], t[1][0]),
                 _bsel(ext, t[0][1], t[0][0]))


def _angle_gt_const(xp, yp, cos_t, sin_t, theta_neg: bool):
    """Trig-free raw ``atan2(yp, xp) > theta`` with constant threshold.

    Same identity as ops/plane.py ``_angle_gt``.
    """
    pos = (yp * cos_t - xp * sin_t) > 0
    nn = yp >= 0
    return (nn | pos) if theta_neg else (nn & pos)


def _region_bits(xp, yp, ws):
    """(upper, ext) tiles from constant workspace tables."""
    mid_neg = bool(ws.mid_neg)
    upper = _angle_gt_const(
        xp, yp, float(ws.mid_dir[0]), float(ws.mid_dir[1]), mid_neg
    )
    gt_lo = _angle_gt_const(
        xp, yp, float(ws.sat_dir[0, 0]), float(ws.sat_dir[0, 1]),
        bool(ws.sat_neg[0]),
    )
    gt_up = _angle_gt_const(
        xp, yp, float(ws.sat_dir[1, 0]), float(ws.sat_dir[1, 1]),
        bool(ws.sat_neg[1]),
    )
    ext = upper ^ _bsel(upper, gt_up, gt_lo)
    return upper, ext


def _coxa_frame(x_ref, y_ref, z_ref, ws):
    """place_over_coxa + mirrored half-plane bits, all from constants."""
    body = float(ws.body)
    pitch = float(ws.coxa_pitch)
    cp = np.float32(np.cos(np.float32(-pitch)))
    sp = np.float32(np.sin(np.float32(-pitch)))
    px = x_ref[...] - body
    py = y_ref[...]
    pz = z_ref[...]
    x = px * cp - pz * sp
    z = px * sp + pz * cp
    return x, py, z


def make_reachability_kernel(leg: LegDimensions, block_rows: int = 128,
                             interpret: bool = False,
                             parallel: bool = False,
                             interval_valid: bool = True):
    """Jitted ``[N, 3] float32 -> [N] bool`` Pallas evaluator for ``leg``.

    Semantics of ops/reachability.py ``reachability_xyz`` with the leg's
    workspace baked in as immediates.  ``parallel=True`` marks the grid
    dimension ``parallel`` for Mosaic (tools/reach_kernel_probe.py
    measures whether that helps on the target chip).  The 128-row
    default block won the on-chip config probe twice (0.055/0.062 ns/pt
    vs 0.071 for the previous 256-row default at 16.7M points).

    ``interval_valid`` (default on, r5): because each circle's squared
    thresholds satisfy ``lo2 < r2 < hi2`` strictly (the CIRCLE_MARGIN
    band brackets the radius), the validity polarities collapse to
    single interval compares —
    ``inside | near  ==  t < hi2`` and ``~inside | near  ==  t > lo2``
    — one compare each instead of 3 compares + 3 boolean folds, a ~24%
    VPU-op cut on this compute-bound kernel.  The identity is exact for
    every f32 ``t`` (the unions are contiguous intervals), so results
    stay BIT-EXACT; circles whose baked constants violate the strict
    ordering (fp32-collapsed margins) fall back to the full form
    per-circle.  Parity: tests/test_pallas.py.
    """
    ws = _concrete_ws(leg)
    coxa_length = float(ws.coxa_length)
    cmax = (float(ws.coxa_max_dir[0]), float(ws.coxa_max_dir[1]))
    cmin = (float(ws.coxa_min_dir[0]), float(ws.coxa_min_dir[1]))
    gt_possible = bool(ws.coxa_gt_possible)
    lt_possible = bool(ws.coxa_lt_possible)
    # circle tables as python floats [region][ext][slot]
    tab = {
        name: [
            [[float(getattr(ws, name)[r, e, s]) for s in range(4)]
             for e in range(2)]
            for r in range(2)
        ]
        for name in ("circle_x", "circle_y", "circle_r2", "circle_hi2",
                     "circle_lo2")
    }
    att = [
        [[bool(ws.circle_attract[r, e, s]) for s in range(4)]
         for e in range(2)]
        for r in range(2)
    ]

    # The 16 (region, ext, slot) table entries reference only ~6 distinct
    # circles (inner/outer/fromabove+-/winglet+-); deduplicate them and
    # evaluate each once via the expanded linear form
    #   d2 = (q - 2 cx xp - 2 cy yp) + (cx^2 + cy^2),  q = xp^2 + yp^2
    # so each unique circle costs 2 FMAs + 3 compares against thresholds
    # with the center norm pre-folded in (within ~1 ulp of the direct
    # (x-cx)^2 + (y-cy)^2 form — same decision-boundary shell as fp32
    # rounding itself, far inside CIRCLE_MARGIN).
    uniq: dict[tuple, int] = {}
    uniq_params: list[tuple] = []
    slot_map = [[[None] * 4 for _ in range(2)] for _ in range(2)]
    for r in range(2):
        for e in range(2):
            for s in range(4):
                key = (tab["circle_x"][r][e][s], tab["circle_y"][r][e][s],
                       tab["circle_r2"][r][e][s])
                if key not in uniq:
                    cx, cy, _ = key
                    k = np.float32(
                        np.float32(cx) * np.float32(cx)
                        + np.float32(cy) * np.float32(cy)
                    )
                    uniq[key] = len(uniq_params)
                    uniq_params.append(
                        (
                            np.float32(-2.0 * cx),
                            np.float32(-2.0 * cy),
                            np.float32(np.float32(tab["circle_r2"][r][e][s]) - k),
                            np.float32(np.float32(tab["circle_hi2"][r][e][s]) - k),
                            np.float32(np.float32(tab["circle_lo2"][r][e][s]) - k),
                        )
                    )
                slot_map[r][e][s] = (uniq[key], att[r][e][s])

    def kernel(x_ref, y_ref, z_ref, o_ref):
        x, y, z = _coxa_frame(x_ref, y_ref, z_ref, ws)
        flip = jnp.signbit(x)
        fx = jnp.where(flip, -x, x)
        fy = jnp.where(flip, -y, y)
        coxa_invalid = None
        if gt_possible:
            coxa_invalid = (fy * cmax[0] - fx * cmax[1]) > 0
        if lt_possible:
            lt = (fy * cmin[0] - fx * cmin[1]) < 0
            coxa_invalid = lt if coxa_invalid is None else coxa_invalid | lt
        rho = jnp.sqrt(x * x + y * y)
        xp = jnp.where(flip, -rho, rho) - coxa_length
        yp = z
        upper, ext = _region_bits(xp, yp, ws)
        # each unique circle once, both validity polarities
        q = xp * xp + yp * yp
        val_pos, val_neg = [], []
        for (ax, ay, r2k, hi2k, lo2k) in uniq_params:
            t = q + ax * xp + ay * yp
            if interval_valid and lo2k < r2k < hi2k:
                # contiguous-interval collapse (see factory docstring):
                # bit-exact single compares per polarity.  val_neg is
                # ~(t <= lo2) rather than (t > lo2) so NaN t keeps the
                # original ``~inside | near`` truth value (True).
                val_pos.append(t < hi2k)
                val_neg.append(~(t <= lo2k))
            else:
                inside = t <= r2k
                near = (t < hi2k) & (t > lo2k)
                val_pos.append(inside | near)
                val_neg.append(~inside | near)
        # per-(region, ext) config: AND its 4 slot lookups, then 3 selects
        v = [[None, None], [None, None]]
        for r in range(2):
            for e in range(2):
                ok = None
                for s in range(4):
                    ci, attract = slot_map[r][e][s]
                    good = val_pos[ci] if attract else val_neg[ci]
                    ok = good if ok is None else ok & good
                v[r][e] = ok
        plane_ok = _sel3b(upper, ext, v)
        reach = plane_ok if coxa_invalid is None else (
            ~coxa_invalid & plane_ok
        )
        o_ref[...] = reach.astype(jnp.uint8)

    block = block_rows * _LANES

    def run(xs, ys, zs, n):
        rows = xs.shape[0] // _LANES
        comps = (xs.reshape(rows, _LANES), ys.reshape(rows, _LANES),
                 zs.reshape(rows, _LANES))
        grid = rows // block_rows
        spec = pl.BlockSpec(
            (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.uint8),
            grid=(grid,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            interpret=interpret,
            compiler_params=(
                pltpu.CompilerParams(dimension_semantics=("parallel",))
                if parallel else None
            ),
        )(*comps)
        return out.reshape(-1)[:n].astype(bool)

    @jax.jit
    def fn(points: jnp.ndarray) -> jnp.ndarray:
        n = points.shape[0]
        pad = (-n) % block
        soa = jnp.pad(points, ((0, pad), (0, 0))).T  # [3, n+pad]
        return run(soa[0], soa[1], soa[2], n)

    @jax.jit
    def fn_soa(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        """SoA entry point — the layout the .bin terrain protocol already
        uses (no transpose pass; N must not require padding for peak)."""
        n = x.shape[0]
        pad = (-n) % block
        if pad:
            x = jnp.pad(x, (0, pad))
            y = jnp.pad(y, (0, pad))
            z = jnp.pad(z, (0, pad))
        return run(x, y, z, n)

    fn.soa = fn_soa
    return fn


# Hardware probe history (tools/dist_kernel_probe.py, v5e, 4.2M pts):
# the 2026-08-17 5-rep probe ranked plain first (0.3136 < rsqrt-only
# 0.3239 < both 0.3377) and the default was reverted to plain; the
# 2026-08-19 11-rep re-probe (min estimator with enough draws to beat
# the relay's one-sided contention noise, see bench.py) flipped it
# decisively the other way within one session: both 0.3312 < rsqrt-only
# 0.3342 < corner-linear-only 0.3453 < plain 0.3536.  The tolerance
# contract is identical (both variants parity-tested in
# tests/test_pallas.py), so the default is both opts on.
DIST_DEFAULT_OPTS = frozenset({"opt_rsqrt", "opt_corner_linear"})


def make_distance_kernel(leg: LegDimensions, block_rows: int = 128,
                         interpret: bool = False,
                         ablate: frozenset = DIST_DEFAULT_OPTS,
                         parallel: bool = False):
    """Jitted ``[N, 3] -> ([N] bool, [N, 3])`` Pallas distance evaluator.

    Semantics of ops/distance.py ``distance_xyz`` (incl. the pi-flip dual
    evaluation, coxa saturation and the limit-plane alternative) with the
    leg workspace baked in.

    ``ablate`` is a feature set: the tolerance-preserving variants
    ``opt_rsqrt`` (one rsqrt + two muls instead of sqrt + divide per
    clamp) and ``opt_corner_linear`` (expanded-linear-form corner
    tournament) are parity-tested in tests/test_pallas.py and ON by
    default (see the DIST_DEFAULT_OPTS probe history).  The remaining
    members
    {"no_corners", "no_validate", "single_branch"} are for PROFILING ONLY
    (tools/dist_kernel_probe.py): they disable kernel sections to
    attribute device time — results are WRONG with any of them active.
    """
    ws = _concrete_ws(leg)
    coxa_length = float(ws.coxa_length)
    max_a = float(ws.max_angle_coxa)
    min_a = float(ws.min_angle_coxa)
    cmax = (float(ws.coxa_max_dir[0]), float(ws.coxa_max_dir[1]))
    cmin = (float(ws.coxa_min_dir[0]), float(ws.coxa_min_dir[1]))
    half_pi = float(_PI) / 2.0
    mid_coxa = (max_a + min_a) / 2.0
    pitch = float(ws.coxa_pitch)
    cp_inv = np.float32(np.cos(np.float32(pitch)))
    sp_inv = np.float32(np.sin(np.float32(pitch)))
    margin = np.float32(0.001)
    big = np.float32(3.4e38)

    tabs = {
        name: [
            [[float(getattr(ws, name)[r, e, s]) for s in range(4)]
             for e in range(2)]
            for r in range(2)
        ]
        for name in ("circle_x", "circle_y", "circle_r", "circle_r2",
                     "circle_hi2", "circle_lo2")
    }
    att = [
        [[bool(ws.circle_attract[r, e, s]) for s in range(4)]
         for e in range(2)]
        for r in range(2)
    ]
    corners = [
        (float(ws.corner_xy[j, 0]), float(ws.corner_xy[j, 1]),
         bool(ws.corner_valid[j]))
        for j in range(ws.corner_xy.shape[0])
    ]

    def plane_clamp_tiles(xp, yp):
        """ops/plane.py plane_clamp with select-chain scalar tables."""
        upper, ext = _region_bits(xp, yp, ws)

        def pick(name, s):
            t = tabs[name]
            return _sel3(upper, ext, [[t[0][0][s], t[0][1][s]],
                                      [t[1][0][s], t[1][1][s]]])

        def pick_att(s):
            # constant-bool table select as boolean algebra on the bits
            ones = xp == xp
            zeros = ~ones
            a = [[ones if att[r][e][s] else zeros for e in range(2)]
                 for r in range(2)]
            return _sel3b(upper, ext, a)

        cxs = [pick("circle_x", s) for s in range(4)]
        cys = [pick("circle_y", s) for s in range(4)]
        rs = [pick("circle_r", s) for s in range(4)]
        r2s = [pick("circle_r2", s) for s in range(4)]
        hi2s = [pick("circle_hi2", s) for s in range(4)]
        lo2s = [pick("circle_lo2", s) for s in range(4)]
        atts = [pick_att(s) for s in range(4)]

        def circ_valid(px, py, s):
            dx = px - cxs[s]
            dy = py - cys[s]
            d2 = dx * dx + dy * dy
            inside = d2 <= r2s[s]
            near = (d2 < hi2s[s]) & (d2 > lo2s[s])
            return (inside == atts[s]) | near

        overall = None
        clamps = []
        scores = []
        for s in range(4):
            dx = xp - cxs[s]
            dy = yp - cys[s]
            d2 = dx * dx + dy * dy
            inside = d2 <= r2s[s]
            near = (d2 < hi2s[s]) & (d2 > lo2s[s])
            valid = (inside == atts[s]) | near
            overall = valid if overall is None else overall & valid
            if "opt_rsqrt" in ablate:
                # one rsqrt + two muls instead of sqrt + divide; the
                # degenerate-center guard moves to the (equivalent)
                # squared test d2 < margin^2, after which the original's
                # where(deg, 1, mag) divisor is literally rsqrt(1)
                deg = d2 < margin * margin
                rinv = jax.lax.rsqrt(
                    jnp.where(deg, np.float32(1.0), d2)
                )
                mag = d2 * rinv
                scale = rs[s] * rinv
            else:
                mag = jnp.sqrt(d2)
                deg = mag < margin
                scale = rs[s] / jnp.where(deg, np.float32(1.0), mag)
            clamps.append(
                (cxs[s] + jnp.where(deg, np.float32(1.0), dx) * scale,
                 cys[s] + jnp.where(deg, np.float32(0.0), dy) * scale)
            )
            scores.append((rs[s] - mag) * (rs[s] - mag))
        best_s2 = jnp.full_like(xp, big)
        best_x = jnp.zeros_like(xp)
        best_y = jnp.zeros_like(xp)
        for s in range(4):
            cx, cy = clamps[s]
            ok = None
            for t in range(4):
                if t == s or "no_validate" in ablate:
                    # a clamp lies on its own circumference (inside the
                    # CIRCLE_MARGIN band) — self-validation is always true
                    continue
                good = circ_valid(cx, cy, t)
                ok = good if ok is None else ok & good
            if ok is None:
                ok = xp == xp
            s2 = jnp.where(ok, scores[s], big)
            take = s2 < best_s2
            best_s2 = jnp.where(take, s2, best_s2)
            best_x = jnp.where(take, cx, best_x)
            best_y = jnp.where(take, cy, best_y)
        invalid = ~overall
        live_corners = [
            c for c in corners if c[2] and "no_corners" not in ablate
        ]
        if "opt_corner_linear" in ablate and live_corners:
            # expanded linear form (2 FMA + add per corner, centers as
            # immediates) + a corner-only tournament, merged with the
            # circle winner once; first-wins strict < ordering matches
            # the sequential original
            q = xp * xp + yp * yp
            c_s2 = c_x = c_y = None
            for (pcx, pcy, _) in live_corners:
                ax = np.float32(-2.0 * pcx)
                ay = np.float32(-2.0 * pcy)
                kc = np.float32(
                    np.float32(pcx) * np.float32(pcx)
                    + np.float32(pcy) * np.float32(pcy)
                )
                s2 = q + ax * xp + ay * yp + kc
                if c_s2 is None:
                    c_s2 = s2
                    c_x = jnp.full_like(xp, pcx)
                    c_y = jnp.full_like(xp, pcy)
                else:
                    take = s2 < c_s2
                    c_s2 = jnp.where(take, s2, c_s2)
                    c_x = jnp.where(take, np.float32(pcx), c_x)
                    c_y = jnp.where(take, np.float32(pcy), c_y)
            take = invalid & (c_s2 < best_s2)
            best_s2 = jnp.where(take, c_s2, best_s2)
            best_x = jnp.where(take, c_x, best_x)
            best_y = jnp.where(take, c_y, best_y)
        else:
            for (pcx, pcy, _) in live_corners:
                cdx = xp - pcx
                cdy = yp - pcy
                s2 = jnp.where(invalid, cdx * cdx + cdy * cdy, big)
                take = s2 < best_s2
                best_s2 = jnp.where(take, s2, best_s2)
                best_x = jnp.where(take, jnp.full_like(xp, pcx), best_x)
                best_y = jnp.where(take, jnp.full_like(xp, pcy), best_y)
        found = best_s2 < big
        out_x = xp - jnp.where(found, best_x, np.float32(0.0))
        out_y = yp - jnp.where(found, best_y, np.float32(0.0))
        return overall, out_x, out_y

    # threshold directions for the trig-free angle comparisons: Pallas TPU
    # has no atan2 lowering, so every "raw angle vs constant" comparison of
    # ops/distance.py becomes a cross-product sign test against these.
    def _dir(theta):
        t = np.float32(theta)
        return (float(np.cos(t)), float(np.sin(t)), bool(t < 0))

    # the trig-free comparisons below are wrap-free only for thresholds in
    # (-pi, pi); the mega thresholds exceed that iff a coxa limit passes
    # +-pi/2, where this kernel would silently diverge from the XLA path's
    # raw-atan2 compares — fail loudly instead (M2/moonbot are well inside)
    if abs(max_a + half_pi) >= float(_PI) or abs(min_a - half_pi) >= float(_PI):
        raise ValueError(
            f"coxa limits ({min_a:.3f}, {max_a:.3f}) rad put the mega-clamp "
            "thresholds outside (-pi, pi); the trig-free Pallas distance "
            "kernel does not support such legs — use the XLA path"
        )
    d_mega_hi = _dir(max_a + half_pi)
    d_mega_lo = _dir(min_a - half_pi)
    d_max = _dir(max_a)
    d_min = _dir(min_a)
    d_mid = _dir(mid_coxa)

    def _agt(ax, ay, d):
        return _angle_gt_const(ax, ay, d[0], d[1], d[2])

    def _alt(ax, ay, d):
        """Raw ``atan2(ay, ax) < theta`` (strict); mirror of _angle_gt_const:
        theta < 0 -> only y < 0 can satisfy it, cross test safe there;
        theta >= 0 -> y < 0 always satisfies, else cross test."""
        neg = (ay * d[0] - ax * d[1]) < 0
        below = ay < 0
        return (below & neg) if d[2] else (below | neg)

    def finish(x, y, z, cos_a, sin_a, flipped):
        """ops/distance.py _finish_finding_closest with constants.

        ``flipped`` selects the pi-flip branch: its raw angle is the angle
        of direction (-x, -y) (identical to the reference's a -+ pi away
        from the y = +-0 branch cut).
        """
        ax, ay = (-x, -y) if flipped else (x, y)
        mega = _agt(ax, ay, d_mega_hi) | _alt(ax, ay, d_mega_lo)
        over = _agt(ax, ay, d_max)
        under = _alt(ax, ay, d_min)
        saturated = mega | over | under
        c1 = jnp.where(
            mega, -cos_a,
            jnp.where(over, cmax[0], jnp.where(under, cmin[0], cos_a)),
        )
        s1 = jnp.where(
            mega, -sin_a,
            jnp.where(over, cmax[1], jnp.where(under, cmin[1], sin_a)),
        )
        xr = x * c1 + y * s1
        yr = -x * s1 + y * c1
        was_valid, dxp, dzp = plane_clamp_tiles(xr - coxa_length, z)
        use_max = _agt(ax, ay, d_mid)
        cl = jnp.where(use_max, cmax[0], cmin[0])
        sl = jnp.where(use_max, cmax[1], cmin[1])
        c2 = cl * c1 + sl * s1
        s2 = sl * c1 - cl * s1
        ys = -xr * s2 + yr * c2
        d2c = dxp * dxp + yr * yr + dzp * dzp
        better = was_valid & ~mega & (d2c > ys * ys)
        rx = -ys * s2
        ry = ys * c2
        fx = jnp.where(better, rx, dxp)
        fy = jnp.where(better, ry, yr)
        fz = jnp.where(better, np.float32(0.0), dzp)
        gx = fx * c1 - fy * s1
        gy = fx * s1 + fy * c1
        return was_valid & ~saturated, gx, gy, fz

    def kernel(x_ref, y_ref, z_ref, ok_ref, dx_ref, dy_ref, dz_ref):
        x, y, z = _coxa_frame(x_ref, y_ref, z_ref, ws)
        rho = jnp.sqrt(x * x + y * y)
        on_axis = rho == 0
        inv = jnp.where(on_axis, np.float32(1.0), rho)
        cos_a = jnp.where(on_axis, np.float32(1.0), x / inv)
        sin_a = jnp.where(on_axis, np.float32(0.0), y / inv)
        res, dx, dy, dz = finish(x, y, z, cos_a, sin_a, False)
        if "single_branch" in ablate:
            resf, fx, fy, fz = res, dx, dy, dz
        else:
            resf, fx, fy, fz = finish(x, y, z, -cos_a, -sin_a, True)
        d2d = dx * dx + dy * dy + dz * dz
        d2f = fx * fx + fy * fy + fz * fz
        use_d = _bsel(res == resf, d2d < d2f, res)
        ox = jnp.where(use_d, dx, fx)
        oy = jnp.where(use_d, dy, fy)
        oz = jnp.where(use_d, dz, fz)
        wx = ox * cp_inv - oz * sp_inv
        wz = ox * sp_inv + oz * cp_inv
        ok_ref[...] = (res | resf).astype(jnp.uint8)
        dx_ref[...] = wx
        dy_ref[...] = oy
        dz_ref[...] = wz

    block = block_rows * _LANES

    def run(xs, ys, zs):
        rows = xs.shape[0] // _LANES
        comps = (xs.reshape(rows, _LANES), ys.reshape(rows, _LANES),
                 zs.reshape(rows, _LANES))
        grid = rows // block_rows
        spec = pl.BlockSpec(
            (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        f32s = jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((rows, _LANES), jnp.uint8),
                f32s, f32s, f32s,
            ),
            grid=(grid,),
            in_specs=[spec, spec, spec],
            out_specs=(spec, spec, spec, spec),
            interpret=interpret,
            compiler_params=(
                pltpu.CompilerParams(dimension_semantics=("parallel",))
                if parallel else None
            ),
        )(*comps)

    @jax.jit
    def fn(points: jnp.ndarray):
        n = points.shape[0]
        pad = (-n) % block
        soa = jnp.pad(points, ((0, pad), (0, 0))).T
        ok, dx, dy, dz = run(soa[0], soa[1], soa[2])
        ok = ok.reshape(-1)[:n].astype(bool)
        vec = jnp.stack(
            [dx.reshape(-1)[:n], dy.reshape(-1)[:n], dz.reshape(-1)[:n]],
            axis=-1,
        )
        return ok, vec

    @jax.jit
    def fn_soa(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray):
        """SoA in, SoA out — the layout of the .bin file protocol
        (dist_input_t{x,y,z}.bin -> out_dist_x{x,y,z}.bin), skipping both
        the input transpose and the output vector stack."""
        n = x.shape[0]
        pad = (-n) % block
        if pad:
            x = jnp.pad(x, (0, pad))
            y = jnp.pad(y, (0, pad))
            z = jnp.pad(z, (0, pad))
        ok, dx, dy, dz = run(x, y, z)
        return (
            ok.reshape(-1)[:n].astype(bool),
            dx.reshape(-1)[:n],
            dy.reshape(-1)[:n],
            dz.reshape(-1)[:n],
        )

    fn.soa = fn_soa
    return fn
