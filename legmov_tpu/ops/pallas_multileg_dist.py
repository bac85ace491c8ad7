"""Fused multi-leg oriented-DISTANCE Pallas kernel (validity_child twin).

The reference's active positionability path evaluates, per (octree cell,
foothold, orientation, leg), the full distance function and aggregates
reachable-leg counts and boundary-box-crossing counts
(several_leg_octree.cu:19-151 ``validity_child`` calling distance() ->
one_leg_global.cu:253 -> one_leg.cu:321-341).  This kernel fuses that
entire per-item pipeline — quaternion un-rotation, per-leg azimuth/coxa
frames, the dual pi-branch plane clamp with corners, the coxa-limit-plane
alternative, the elongated-box prefilter, the cell-crossing test, and ALL
the reductions — into one VMEM pass per (pose-row, candidate) tile.

Layout follows ops/pallas_multileg.py: rows = pose items (a pose item is
one (cell, orientation) pair for the hierarchical solver), lanes =
candidates; orientation-dependent workspace tables ride in a packed
``[P, W]`` table as ``[8, 1]`` column slices, orientation-independent leg
constants (mount azimuth, coxa pitch/length, coxa yaw limits, the
saturation threshold directions) are baked as Python-float immediates.

Outputs (both ``[P, 128]`` int32, lanes as documented in
:func:`make_multileg_distance_kernel`) are whole-row reductions over the
candidate axis, accumulated across grid steps — the XLA caller only
combines rows.
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
from legmov_tpu.ops.orientation import rotate_leg_data

POSE_ROWS = 8
_LANES = 128
_PI = np.float32(math.pi)

#: per-leg slice layout (offsets relative to the leg block start)
_CX, _CY, _CR, _CR2, _CHI2, _CLO2, _ATT = 0, 16, 32, 48, 64, 80, 96
_CORX, _CORY, _CORV = 112, 122, 132
_MID_DIR, _MID_NEG, _SAT_DIR, _SAT_NEG = 142, 144, 145, 149
LEG_BLOCK = 151
#: header: quat(4) body(3) parent_valid(1) hm(3 = half+margin)
#: h2m(1 = h2+margin) big_cell(1) elong(3 = parent_half+reach)
_HDR = 16


def table_width(n_legs: int) -> int:
    w = _HDR + n_legs * LEG_BLOCK
    return ((w + _LANES - 1) // _LANES) * _LANES


def oriented_dist_tables(
    body_pos: jnp.ndarray,  # [P, 3] pose-item positions (cell centers)
    quats: jnp.ndarray,  # [P, 4]
    parent_valid: jnp.ndarray,  # [P] bool
    half: jnp.ndarray,  # [3] cell half-extent (level constant)
    parent_half: jnp.ndarray,  # [3]
    robot: LegDimensions,
    margin: float,
    reach: float,
) -> jnp.ndarray:
    """``[P, table_width(L)]`` packed per-item scalars."""

    def per_pose(q):
        def per_leg(leg):
            ws = build_workspace(rotate_leg_data(q, leg))
            parts = [
                ws.circle_x.reshape(-1),
                ws.circle_y.reshape(-1),
                ws.circle_r.reshape(-1),
                ws.circle_r2.reshape(-1),
                ws.circle_hi2.reshape(-1),
                ws.circle_lo2.reshape(-1),
                ws.circle_attract.reshape(-1).astype(jnp.float32),
                ws.corner_xy[:, 0],
                ws.corner_xy[:, 1],
                ws.corner_valid.astype(jnp.float32),
                ws.mid_dir.reshape(-1),
                ws.mid_neg.reshape(-1).astype(jnp.float32),
                ws.sat_dir.reshape(-1),
                ws.sat_neg.reshape(-1).astype(jnp.float32),
            ]
            return jnp.concatenate(parts)

        return jax.vmap(per_leg)(robot).reshape(-1)

    L = int(jax.tree.leaves(robot)[0].shape[0])
    blocks = jax.vmap(per_pose)(quats)  # [P, L*LEG_BLOCK]
    P = body_pos.shape[0]
    hm = (half + jnp.float32(margin))[None, :].repeat(P, 0)
    h2m = jnp.full(
        (P, 1), jnp.sum(half * half) + jnp.float32(margin), jnp.float32
    )
    bigc = jnp.full(
        (P, 1),
        (jnp.sum(half * half) > jnp.float32(100.0 * 100.0))
        .astype(jnp.float32),
    )
    elong = (parent_half + jnp.float32(reach))[None, :].repeat(P, 0)
    hdr = jnp.concatenate(
        [quats, body_pos, parent_valid[:, None].astype(jnp.float32),
         hm, h2m, bigc, elong],
        axis=-1,
    )
    tab = jnp.concatenate([hdr, blocks], axis=-1)
    pad = table_width(L) - tab.shape[-1]
    return jnp.pad(tab, ((0, 0), (0, pad))).astype(jnp.float32)


def _bsel(c, a, b):
    return (c & a) | (~c & b)


def dist_leg_constants(robot: LegDimensions) -> list[dict]:
    """Orientation-independent per-leg immediates for the fused
    distance item pipeline (baked as Python floats into kernels)."""
    L = int(jax.tree.leaves(robot)[0].shape[0])
    half_pi = float(_PI) / 2.0
    legs_const = []
    for i in range(L):
        leg = jax.tree.map(lambda x: np.asarray(x)[i], robot)
        ws = build_workspace(jax.tree.map(jnp.asarray, leg))
        ws = type(ws)(*[np.asarray(f) for f in ws])
        ba = float(leg.body_angle)
        pitch = float(leg.coxa_pitch)
        max_a = float(ws.max_angle_coxa)
        min_a = float(ws.min_angle_coxa)
        if (abs(max_a + half_pi) >= float(_PI)
                or abs(min_a - half_pi) >= float(_PI)):
            raise ValueError("coxa limits beyond +-pi/2 unsupported")

        def _dir(theta):
            t = np.float32(theta)
            return (float(np.cos(t)), float(np.sin(t)), bool(t < 0))

        legs_const.append(
            dict(
                ca=float(np.float32(np.cos(np.float32(-ba)))),
                sa=float(np.float32(np.sin(np.float32(-ba)))),
                body=float(leg.body),
                cp=float(np.float32(np.cos(np.float32(-pitch)))),
                sp=float(np.float32(np.sin(np.float32(-pitch)))),
                cpi=float(np.float32(np.cos(np.float32(pitch)))),
                spi=float(np.float32(np.sin(np.float32(pitch)))),
                coxa_len=float(ws.coxa_length),
                cmax=(float(ws.coxa_max_dir[0]), float(ws.coxa_max_dir[1])),
                cmin=(float(ws.coxa_min_dir[0]), float(ws.coxa_min_dir[1])),
                d_mega_hi=_dir(max_a + half_pi),
                d_mega_lo=_dir(min_a - half_pi),
                d_max=_dir(max_a),
                d_min=_dir(min_a),
                d_mid=_dir((max_a + min_a) / 2.0),
            )
        )

    return legs_const


def make_item_parts(legs_const: list[dict]):
    """Split form of :func:`make_item_math`: ``(head, leg_evals)``.

    ``head(s, x, y, z) -> (pre, vx, vy, vz)`` computes the shared
    elongated-box prefilter and the body-frame candidate vector;
    ``leg_evals[l](s, pre, vx, vy, vz) -> (okp, crossed)`` runs leg
    ``l``'s full distance/crossing pipeline.  ``make_item_math`` is the
    composition of these parts, so per-leg callers (the CSR cell
    evaluator's ball-mask gating) evaluate the EXACT same fp32 ops."""
    margin_c = np.float32(0.001)
    big = np.float32(3.4e38)

    def _agt_dyn(ax, ay, cos_t, sin_t, neg: bool):
        pos = (ay * cos_t - ax * sin_t) > 0
        nn = ay >= 0
        return (nn | pos) if neg else (nn & pos)

    def _alt_dyn(ax, ay, cos_t, sin_t, neg: bool):
        below = ay < 0
        ng = (ay * cos_t - ax * sin_t) < 0
        return (below & ng) if neg else (below | ng)

    def head(s, x_in, y_in, z_in):
        # candidate relative position, body frame
        rx = x_in - s(4)
        ry = y_in - s(5)
        rz = z_in - s(6)
        w = s(0)
        ux, uy, uz = -s(1), -s(2), -s(3)
        tx = 2.0 * (uy * rz - uz * ry)
        ty = 2.0 * (uz * rx - ux * rz)
        tz = 2.0 * (ux * ry - uy * rx)
        vx = rx + w * tx + (uy * tz - uz * ty)
        vy = ry + w * ty + (uz * tx - ux * tz)
        vz = rz + w * tz + (ux * ty - uy * tx)
        # elongated-box prefilter on the UNROTATED relative vector
        # (isInBox on foothold - cell center, several_leg_octree.cu:76-82)
        pre = (
            (rx > -s(13)) & (rx <= s(13))
            & (ry > -s(14)) & (ry <= s(14))
            & (rz > -s(15)) & (rz <= s(15))
        )
        return pre, vx, vy, vz

    def make_leg(l, c):
        off = _HDR + l * LEG_BLOCK

        def leg_eval(s, pre, vx, vy, vz):
            hmx, hmy, hmz = s(8), s(9), s(10)
            h2m = s(11)
            bigc = s(12) > 0.5

            def ls(i, _off=off):
                return s(_off + i)

            # yaw to "as if leg 0", then coxa frame
            x0 = vx * c["ca"] - vy * c["sa"]
            y0 = vx * c["sa"] + vy * c["ca"]
            px = x0 - c["body"]
            x = px * c["cp"] - vz * c["sp"]
            z = px * c["sp"] + vz * c["cp"]
            y = y0
            rho = jnp.sqrt(x * x + y * y)
            on_axis = rho == 0
            inv = jnp.where(on_axis, np.float32(1.0), rho)
            cos_a = jnp.where(on_axis, np.float32(1.0), x / inv)
            sin_a = jnp.where(on_axis, np.float32(0.0), y / inv)

            def region_bits(xp, yp):
                nn = yp >= 0
                mid_neg = ls(_MID_NEG) > 0.5
                crossm = (
                    yp * ls(_MID_DIR) - xp * ls(_MID_DIR + 1)
                ) > 0
                upper = _bsel(nn, mid_neg | crossm, mid_neg & crossm)
                lo_neg = ls(_SAT_NEG) > 0.5
                hi_neg = ls(_SAT_NEG + 1) > 0.5
                c_lo = (
                    yp * ls(_SAT_DIR) - xp * ls(_SAT_DIR + 1)
                ) > 0
                c_hi = (
                    yp * ls(_SAT_DIR + 2) - xp * ls(_SAT_DIR + 3)
                ) > 0
                gt_lo = _bsel(nn, lo_neg | c_lo, lo_neg & c_lo)
                gt_hi = _bsel(nn, hi_neg | c_hi, hi_neg & c_hi)
                ext = upper ^ _bsel(upper, gt_hi, gt_lo)
                return upper, ext

            def plane_clamp(xp, yp):
                upper, ext = region_bits(xp, yp)

                def pick(base, slot):
                    t = lambda r, e: ls(base + r * 8 + e * 4 + slot)
                    hi = jnp.where(ext, t(1, 1), t(1, 0))
                    lo = jnp.where(ext, t(0, 1), t(0, 0))
                    return jnp.where(upper, hi, lo)

                overall = None
                best_s2 = jnp.full_like(xp, big)
                best_x = jnp.zeros_like(xp)
                best_y = jnp.zeros_like(xp)
                cxs, cys, r2s, hi2s, lo2s, atts = [], [], [], [], [], []
                clamps, scores = [], []
                for slot in range(4):
                    cx = pick(_CX, slot)
                    cy = pick(_CY, slot)
                    r = pick(_CR, slot)
                    r2 = pick(_CR2, slot)
                    hi2 = pick(_CHI2, slot)
                    lo2 = pick(_CLO2, slot)
                    att = pick(_ATT, slot) > 0.5
                    dx = xp - cx
                    dy = yp - cy
                    d2 = dx * dx + dy * dy
                    inside = d2 <= r2
                    near = (d2 < hi2) & (d2 > lo2)
                    valid = _bsel(att, inside, ~inside) | near
                    overall = valid if overall is None else overall & valid
                    deg = d2 < margin_c * margin_c
                    rinv = jax.lax.rsqrt(
                        jnp.where(deg, np.float32(1.0), d2)
                    )
                    mag = d2 * rinv
                    scale = r * rinv
                    clamps.append(
                        (cx + jnp.where(deg, np.float32(1.0), dx) * scale,
                         cy + jnp.where(deg, np.float32(0.0), dy) * scale)
                    )
                    scores.append((r - mag) * (r - mag))
                    cxs.append(cx); cys.append(cy); r2s.append(r2)
                    hi2s.append(hi2); lo2s.append(lo2); atts.append(att)
                for sl in range(4):
                    cx, cy = clamps[sl]
                    okc = None
                    for t in range(4):
                        if t == sl:
                            continue
                        dx = cx - cxs[t]
                        dy = cy - cys[t]
                        d2 = dx * dx + dy * dy
                        inside = d2 <= r2s[t]
                        near = (d2 < hi2s[t]) & (d2 > lo2s[t])
                        good = _bsel(atts[t], inside, ~inside) | near
                        okc = good if okc is None else okc & good
                    s2 = jnp.where(okc, scores[sl], big)
                    take = s2 < best_s2
                    best_s2 = jnp.where(take, s2, best_s2)
                    best_x = jnp.where(take, cx, best_x)
                    best_y = jnp.where(take, cy, best_y)
                invalid = ~overall
                q = xp * xp + yp * yp
                c_s2 = None
                c_x = c_y = None
                for j in range(10):
                    pcx = ls(_CORX + j)
                    pcy = ls(_CORY + j)
                    pok = ls(_CORV + j) > 0.5
                    s2 = q - 2.0 * pcx * xp - 2.0 * pcy * yp \
                        + pcx * pcx + pcy * pcy
                    s2 = jnp.where(pok, s2, big)
                    if c_s2 is None:
                        c_s2, c_x, c_y = s2, pcx + 0.0 * xp, pcy + 0.0 * xp
                    else:
                        take = s2 < c_s2
                        c_s2 = jnp.where(take, s2, c_s2)
                        c_x = jnp.where(take, pcx, c_x)
                        c_y = jnp.where(take, pcy, c_y)
                take = invalid & (c_s2 < best_s2)
                best_s2 = jnp.where(take, c_s2, best_s2)
                best_x = jnp.where(take, c_x, best_x)
                best_y = jnp.where(take, c_y, best_y)
                found = best_s2 < big
                out_x = xp - jnp.where(found, best_x, np.float32(0.0))
                out_y = yp - jnp.where(found, best_y, np.float32(0.0))
                return overall, out_x, out_y

            def finish(ca_, sa_, flipped):
                ax = -x if flipped else x
                ay = -y if flipped else y
                mega = _agt_dyn(ax, ay, *c["d_mega_hi"]) | _alt_dyn(
                    ax, ay, *c["d_mega_lo"]
                )
                over = _agt_dyn(ax, ay, *c["d_max"])
                under = _alt_dyn(ax, ay, *c["d_min"])
                saturated = mega | over | under
                c1 = jnp.where(
                    mega, -ca_,
                    jnp.where(over, c["cmax"][0],
                              jnp.where(under, c["cmin"][0], ca_)),
                )
                s1 = jnp.where(
                    mega, -sa_,
                    jnp.where(over, c["cmax"][1],
                              jnp.where(under, c["cmin"][1], sa_)),
                )
                xr = x * c1 + y * s1
                yr = -x * s1 + y * c1
                was_valid, dxp, dzp = plane_clamp(
                    xr - c["coxa_len"], z
                )
                use_max = _agt_dyn(ax, ay, *c["d_mid"])
                cl = jnp.where(use_max, c["cmax"][0], c["cmin"][0])
                sl_ = jnp.where(use_max, c["cmax"][1], c["cmin"][1])
                c2 = cl * c1 + sl_ * s1
                s2_ = sl_ * c1 - cl * s1
                ys = -xr * s2_ + yr * c2
                d2c = dxp * dxp + yr * yr + dzp * dzp
                better = was_valid & ~mega & (d2c > ys * ys)
                fx = jnp.where(better, -ys * s2_, dxp)
                fy = jnp.where(better, ys * c2, yr)
                fz = jnp.where(better, np.float32(0.0), dzp)
                gx = fx * c1 - fy * s1
                gy = fx * s1 + fy * c1
                return was_valid & ~saturated, gx, gy, fz

            res, dx, dy, dz = finish(cos_a, sin_a, False)
            resf, fx, fy, fz = finish(-cos_a, -sin_a, True)
            d2d = dx * dx + dy * dy + dz * dz
            d2f = fx * fx + fy * fy + fz * fz
            use_d = _bsel(res == resf, d2d < d2f, res)
            ox = jnp.where(use_d, dx, fx)
            oy = jnp.where(use_d, dy, fy)
            oz = jnp.where(use_d, dz, fz)
            ok = res | resf
            # vector back: coxa pitch inverse, yaw +azimuth, then the
            # body quaternion (dv is compared against the AXIS-ALIGNED
            # cell box in the world frame)
            wx0 = ox * c["cpi"] - oz * c["spi"]
            wz0 = ox * c["spi"] + oz * c["cpi"]
            wx1 = wx0 * c["ca"] + oy * c["sa"]
            wy1 = -wx0 * c["sa"] + oy * c["ca"]
            # rotate by q (not conjugate): v_world = q (v_body) q^-1
            qw, qx, qy, qz = s(0), s(1), s(2), s(3)
            t2x = 2.0 * (qy * wz0 - qz * wy1)
            t2y = 2.0 * (qz * wx1 - qx * wz0)
            t2z = 2.0 * (qx * wy1 - qy * wx1)
            wvx = wx1 + qw * t2x + (qy * t2z - qz * t2y)
            wvy = wy1 + qw * t2y + (qz * t2x - qx * t2z)
            wvz = wz0 + qw * t2z + (qx * t2y - qy * t2x)
            cross_big = (
                (wvx > -hmx) & (wvx <= hmx)
                & (wvy > -hmy) & (wvy <= hmy)
                & (wvz > -hmz) & (wvz <= hmz)
            )
            dv2 = wvx * wvx + wvy * wvy + wvz * wvz
            cross_small = dv2 < h2m
            crossed = _bsel(bigc, cross_big, cross_small) & pre
            okp = ok & pre
            return okp, crossed

        return leg_eval

    leg_evals = [make_leg(l, c) for l, c in enumerate(legs_const)]
    return head, leg_evals


def make_item_math(legs_const: list[dict]):
    """Build the getter-based fused ``validity_child`` item pipeline
    for baked per-leg constants.

    ``item_math(s, x, y, z) -> (pre, outs)`` where ``s(i)`` returns the
    per-item scalar at index ``i`` of the :func:`oriented_dist_tables`
    layout (broadcastable against the candidate tile), ``x/y/z`` are
    candidate WORLD coordinates, and ``outs[l] = (okp, crossed)`` per
    leg — shared by the dense-tile kernel below and the CSR streaming
    cell evaluator (ops/csr_cell_eval.py).  Thin composition of
    :func:`make_item_parts` so gated per-leg callers are bit-identical."""
    head, leg_evals = make_item_parts(legs_const)

    def item_math(s, x_in, y_in, z_in):
        pre, vx, vy, vz = head(s, x_in, y_in, z_in)
        outs = [leg(s, pre, vx, vy, vz) for leg in leg_evals]
        return pre, outs

    return item_math


def make_multileg_distance_kernel(
    robot: LegDimensions, cand_cols: int, k: int,
    interpret: bool = False,
):
    """Kernel factory: full fused ``validity_child`` item evaluation.

    Returns jitted ``fn(tab [P, W], gx, gy, gz [P, C]) -> out [P, 128]
    int32`` where (gx, gy, gz) are candidate foothold WORLD coordinates
    per pose item (sentinel-padded) and lanes of ``out`` hold accumulated
    whole-row reductions:

    * lane ``l``            (l < L): leg l has some candidate with
      ``ok & pre`` (the per-leg "any reachable foothold" bit);
    * lane ``L + l``:  leg l has some candidate ``ok & ~cross & pre``
      (certainly-valid across the cell, per-leg-rule edge bands);
    * lane ``2L + l``: leg l has some candidate ``(ok | cross) & pre``;
    * lane ``3L``: some candidate item is valid
      (``(reach_count >= k) | parent_valid``) under ``pre``;
    * lane ``3L + 1``: some item is on-edge
      (``cross_count > L - k``) under ``pre``;
    * lane ``3L + 2``: some item is a valid non-edge leaf.

    Semantics: ops/distance.py ``distance_xyz`` + the orientation layer +
    hier_solver._eval_cells item logic, with per-pose tables from
    :func:`oriented_dist_tables`.
    """
    L = int(jax.tree.leaves(robot)[0].shape[0])
    W = table_width(L)
    if cand_cols % _LANES:
        raise ValueError(f"cand_cols {cand_cols} not a multiple of {_LANES}")
    legs_const = dist_leg_constants(robot)
    item_math = make_item_math(legs_const)

    def kernel(tab_ref, x_ref, y_ref, z_ref, o_ref):
        def s(i):
            return tab_ref[:, i : i + 1]  # [8, 1]

        pre, outs = item_math(s, x_ref[...], y_ref[...], z_ref[...])
        pvalid = s(7) > 0.5
        reach_cnt = None
        cross_cnt = None
        for okp, crossed in outs:
            okf = okp.astype(jnp.float32)
            crf = crossed.astype(jnp.float32)
            reach_cnt = okf if reach_cnt is None else reach_cnt + okf
            cross_cnt = crf if cross_cnt is None else cross_cnt + crf

        # reach_cnt is already pre-gated; parent_valid must not leak
        # through pre-rejected items either
        item_valid = ((reach_cnt >= np.float32(k)) | pvalid) & pre
        item_edge = (cross_cnt > np.float32(L - k)) & pre

        def any_lane(v):
            return jnp.max(v.astype(jnp.float32), axis=1, keepdims=True) > 0

        for l, (okp, crossed) in enumerate(outs):
            o_ref[:, l : l + 1] = any_lane(okp).astype(jnp.int32)
            o_ref[:, L + l : L + l + 1] = any_lane(
                okp & ~crossed
            ).astype(jnp.int32)
            o_ref[:, 2 * L + l : 2 * L + l + 1] = any_lane(
                okp | crossed
            ).astype(jnp.int32)
        o_ref[:, 3 * L : 3 * L + 1] = any_lane(item_valid).astype(jnp.int32)
        o_ref[:, 3 * L + 1 : 3 * L + 2] = any_lane(
            item_edge
        ).astype(jnp.int32)
        o_ref[:, 3 * L + 2 : 3 * L + 3] = any_lane(
            item_valid & ~item_edge
        ).astype(jnp.int32)

    @jax.jit
    def fn(tab, gx, gy, gz):
        P = tab.shape[0]
        grid = (P // POSE_ROWS,)
        tab_spec = pl.BlockSpec(
            (POSE_ROWS, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        # candidates may be shared by every pose item ([1, C] input —
        # e.g. all (cell, orientation) items of one hier-solver batch
        # evaluate the same foothold subset) or per-item ([P, C])
        shared_cands = gx.shape[0] == 1
        cand_spec = pl.BlockSpec(
            (1 if shared_cands else POSE_ROWS, cand_cols),
            (lambda i: (0, 0)) if shared_cands else (lambda i: (i, 0)),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (POSE_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, _LANES), jnp.int32),
            grid=grid,
            in_specs=[tab_spec, cand_spec, cand_spec, cand_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(tab, gx, gy, gz)
        return out > 0

    return fn


def make_cell_eval_rot(
    robot: LegDimensions, k: int, cand_chunk: int = 2048,
    interpret: bool = False,
):
    """Orientation-active `_eval_cells` twin running the fused multi-leg
    distance kernel over (cell, orientation) pose items.

    Same contract as hier_solver._eval_cells; the candidate (foothold)
    axis is scanned in ``cand_chunk`` windows shared by all items of the
    batch, and the kernel's whole-row reductions are combined over the
    orientation axis here.
    """
    from functools import partial

    kernel_fn = make_multileg_distance_kernel(
        robot, cand_chunk, k=k, interpret=interpret
    )
    L = int(jax.tree.leaves(robot)[0].shape[0])

    quorum_k = k

    @partial(
        jax.jit,
        static_argnames=("k", "margin", "reach", "chunk", "use_rot",
                         "shared"),
    )
    def eval_cells(
        centers, parent_valid, half, parent_half, footholds, quats, robot_,
        k: int, margin: float, reach: float, chunk: int,
        use_rot: bool = True, shared: bool = True,
    ):
        del robot_, chunk, use_rot
        assert k == quorum_k, "kernel was built for a different quorum"
        C = centers.shape[0]
        S = quats.shape[0]
        P = C * S
        # (cell, quat) items, cell-major so reshape recovers [C, S];
        # padded to a POSE_ROWS multiple (pad rows are far-away cells
        # whose prefilter rejects everything)
        pad_rows = (-P) % POSE_ROWS
        items_pos = jnp.repeat(centers, S, axis=0)
        items_q = jnp.tile(quats, (C, 1))
        items_pv = jnp.repeat(parent_valid, S)
        if pad_rows:
            items_pos = jnp.concatenate(
                [items_pos, jnp.full((pad_rows, 3), jnp.float32(1e9))]
            )
            items_q = jnp.concatenate(
                [items_q,
                 jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
                          (pad_rows, 1))]
            )
            items_pv = jnp.concatenate(
                [items_pv, jnp.zeros(pad_rows, bool)]
            )
        tab = oriented_dist_tables(
            items_pos, items_q, items_pv, half, parent_half, robot,
            margin, reach,
        )
        F = footholds.shape[0]
        pad = (-F) % cand_chunk
        if pad:
            footholds = jnp.concatenate(
                [footholds,
                 jnp.full((pad, 3), jnp.float32(1e9))]
            )  # sentinels fail the elongated-box prefilter
        n_chunks = footholds.shape[0] // cand_chunk
        fh = footholds.reshape(n_chunks, cand_chunk, 3)

        def per_chunk(acc, fh_c):
            got = kernel_fn(
                tab,
                fh_c[None, :, 0], fh_c[None, :, 1], fh_c[None, :, 2],
            )
            return acc | got, None

        acc0 = jnp.zeros((P + pad_rows, _LANES), bool)
        lanes, _ = jax.lax.scan(per_chunk, acc0, fh)
        lanes = lanes[:P].reshape(C, S, _LANES)
        # per-leg bits [C, S, L]
        leg_any = lanes[:, :, :L]
        leg_cert = lanes[:, :, L : 2 * L]
        leg_poss = lanes[:, :, 2 * L : 3 * L]
        any_valid = jnp.any(lanes[:, :, 3 * L], axis=1)
        any_edge = jnp.any(lanes[:, :, 3 * L + 1], axis=1)
        any_leaf = jnp.any(lanes[:, :, 3 * L + 2], axis=1)
        if not shared:
            counts = jnp.sum(leg_any, axis=-1)  # [C, S]
            n_min = jnp.sum(leg_cert, axis=-1)
            n_max = jnp.sum(leg_poss, axis=-1)
            any_valid = jnp.any(counts >= k, axis=1) | parent_valid
            any_edge = jnp.any((n_min < k) & (n_max >= k), axis=1)
            any_leaf = any_valid & jnp.logical_not(any_edge)
        return any_valid, any_edge, any_leaf

    return eval_cells
