"""Precomputed circle-decomposition workspace for one leg.

This is the TPU-first re-derivation of the reference's workspace geometry
core (reference circles.cu.h, leg_geometry.cu.h).  The reference rebuilds a
small per-point stack of "circles" inside every CUDA thread
(circles.cu.h:337-383 ``insert_circles``); here we precompute, once per
(leg, orientation), a dense table of every circle variant the stack could
ever contain, so the per-point work collapses to masked selects + a handful
of fused multiply-adds — pure VPU element-wise math with no divergence.

Geometry recap (in the coxa-rotated vertical plane, origin at femur joint,
x = radial, y = vertical):

* ``inner``    — circle at origin, radius = min femur->tip distance; the tip
  can never be closer than this (repulsive: point must be outside).
* ``outer``    — radius = femur + tibia; fully-extended reach (attractive).
* ``fromabove_pos/neg`` — centers at tibia_length * (cos, sin)(tibia_absolute
  limit): the loci of femur joints when the tibia saturates its *absolute*
  orientation limit; radius = femur_length.
* ``winglet_pos/neg``   — centers at femur_length * (cos, sin)(femur joint
  limit): tip circles when the femur joint saturates; radius = tibia_length.
* 10 corner points: closed-form (femur, tibia) configurations where two
  constraints intersect (circles.cu.h:417-476 ``insert_intersecv2``),
  emitted as radius-0 circles used only by the distance clamp.

Which 4 of these circles constrain a query point, and with which polarity
("attractivity": True = valid inside, False = valid outside), depends only
on two per-point bits — ``upper`` (above/below the workspace mid-angle) and
``fully_extended`` — plus per-leg constants.  So the full decision table is
a [2 regions, 2 extended, 4 slots] tensor of (cx, cy, r, attractivity),
precomputed here with `jnp.where` (never Python branches) so it stays valid
under jit/vmap when leg parameters are traced (e.g. orientation-shifted
absolute-tibia limits, one_leg_global.cu:48-60).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from legmov_tpu.config import EPS
from legmov_tpu.models.leg import LegDimensions

_f32 = jnp.float32


class LegWorkspace(NamedTuple):
    """Dense workspace decision tables for one leg (all float32).

    ``circle_*[region, extended, slot]`` with region 0 = lower, 1 = upper,
    extended 0/1 = FullyExtended bit, slots ordered [inner, neg, pos,
    winglet] — the exact stack order of the reference (circles.cu.h:337-383)
    so that distance-clamp tie-breaking matches.

    ``corner_xy[10, 2]`` / ``corner_valid[10]`` are the candidate workspace
    corner points with their joint-limit feasibility mask.

    Scalars: ``middle_angle`` splits upper/lower; ``sat_limit[region]`` is
    the angle beyond which the leg is fully extended.
    """

    circle_x: jnp.ndarray  # [2, 2, 4]
    circle_y: jnp.ndarray  # [2, 2, 4]
    circle_r: jnp.ndarray  # [2, 2, 4]
    circle_attract: jnp.ndarray  # [2, 2, 4] bool
    corner_xy: jnp.ndarray  # [10, 2]
    corner_valid: jnp.ndarray  # [10] bool
    middle_angle: jnp.ndarray  # scalar
    sat_limit: jnp.ndarray  # [2] (lower, upper)
    # leg fields needed downstream of the plane evaluation
    body: jnp.ndarray
    coxa_pitch: jnp.ndarray
    coxa_length: jnp.ndarray
    max_angle_coxa: jnp.ndarray
    min_angle_coxa: jnp.ndarray
    # --- precomputed fast-path tables (all derived from the above) --------
    # Squared circle-test thresholds: d2 <= r2 means "inside";
    # lo2 < d2 < hi2 means "within CIRCLE_MARGIN of the circumference"
    # (lo2 = -1 when r < margin so the lower bound never fires).
    circle_r2: jnp.ndarray  # [2, 2, 4]
    circle_hi2: jnp.ndarray  # [2, 2, 4]  (r + margin)^2
    circle_lo2: jnp.ndarray  # [2, 2, 4]  (r - margin)^2 or -1
    # Unit direction of each angular threshold, for trig-free half-plane
    # comparisons sign(sin(angle - theta)) = sign(y cos(theta) - x sin(theta)).
    coxa_max_dir: jnp.ndarray  # [2] (cos, sin) of max_angle_coxa
    coxa_min_dir: jnp.ndarray  # [2]
    coxa_gt_possible: jnp.ndarray  # bool: max_angle_coxa < pi/2
    coxa_lt_possible: jnp.ndarray  # bool: min_angle_coxa > -pi/2
    mid_dir: jnp.ndarray  # [2] (cos, sin) of middle_angle
    mid_neg: jnp.ndarray  # bool: middle_angle < 0
    sat_dir: jnp.ndarray  # [2, 2] per region (cos, sin) of sat_limit
    sat_neg: jnp.ndarray  # [2] bool: sat_limit < 0


def _circle(cx, cy, r, attract):
    return (
        jnp.asarray(cx, _f32),
        jnp.asarray(cy, _f32),
        jnp.asarray(r, _f32),
        jnp.asarray(attract, bool),
    )


def build_workspace(leg: LegDimensions) -> LegWorkspace:
    """Precompute the full circle/corner decision table for ``leg``.

    This plays the role of the reference's ``LegDim2LegComp``
    (circles.cu.h:507-530) but bakes in the *entire* region logic of
    ``find_region`` + ``insert_circles`` (circles.cu.h:48-78, :337-383),
    not just the six base circles.
    """
    fem, tib = leg.femur_length, leg.tibia_length
    min_fem, max_fem = leg.min_angle_femur, leg.max_angle_femur
    min_tib, max_tib = leg.min_angle_tibia, leg.max_angle_tibia
    abs_pos, abs_neg = leg.tibia_absolute_pos, leg.tibia_absolute_neg

    # --- the six base circles (circles.cu.h:80-135, leg_geometry.cu.h) ----
    # min femur->tip distance: |femur + tibia * e^{i*min_tibia}|
    mx = fem + tib * jnp.cos(min_tib)
    my = tib * jnp.sin(min_tib)
    inner = _circle(0.0, 0.0, jnp.sqrt(mx * mx + my * my), False)
    outer = _circle(0.0, 0.0, fem + tib, True)
    fa_pos = _circle(tib * jnp.cos(abs_pos), tib * jnp.sin(abs_pos), fem, True)
    fa_neg = _circle(tib * jnp.cos(abs_neg), tib * jnp.sin(abs_neg), fem, True)
    wing_pos = _circle(fem * jnp.cos(max_fem), fem * jnp.sin(max_fem), tib, True)
    wing_neg = _circle(fem * jnp.cos(min_fem), fem * jnp.sin(min_fem), tib, True)

    # --- region constants (find_region, circles.cu.h:48-78) --------------
    middle_angle = (
        jnp.maximum(abs_neg, min_fem) + jnp.minimum(abs_pos, max_fem)
    ) / _f32(2.0)
    # "Femur angle limitation" bit: does the femur joint saturate before the
    # absolute-tibia limit?  Upper region compares the + limits, lower the -.
    fal_up = max_fem < abs_pos
    fal_low = jnp.logical_not(min_fem < abs_neg)
    # The same bit for the *other* side of the region we are in.
    falo_up = min_fem < abs_neg
    falo_low = jnp.logical_not(max_fem < abs_pos)
    # Angle past which the leg is fully extended, per region.
    sat_up = jnp.where(fal_up, max_fem, abs_pos)
    sat_low = jnp.where(fal_low, min_fem, abs_neg)

    def select(cond, a, b):
        """Per-field select between two circles."""
        return tuple(
            jnp.where(cond, fa, fb) for fa, fb in zip(a, b)
        )

    def with_attract(c, attract):
        return (c[0], c[1], c[2], jnp.asarray(attract, bool))

    # --- slot tables, mirroring insert_circles exactly --------------------
    # Slot order [inner, neg, pos, winglet].  Per region:
    #   * the opposite side's slot is always repulsive; it holds the opposite
    #     winglet when the *other* side is femur-limited, else the opposite
    #     fromabove circle.
    #   * the same side's fromabove slot is attractive iff the femur does NOT
    #     saturate first; the same-side winglet iff it does.
    #   * when fully extended, whichever of those two is attractive is
    #     replaced by the outer circle.
    def region_slots(upper: bool):
        if upper:
            fal, falo = fal_up, falo_up
            excl = select(falo, wing_neg, fa_neg)  # neg side repulsive
            excl = with_attract(excl, False)
            other = with_attract(fa_pos, jnp.logical_not(fal))  # pos side
            wing = with_attract(wing_pos, fal)
            slots = [inner, excl, other, wing]
            other_slot, wing_slot = 2, 3
        else:
            fal, falo = fal_low, falo_low
            excl = select(falo, wing_pos, fa_pos)  # pos side repulsive
            excl = with_attract(excl, False)
            other = with_attract(fa_neg, jnp.logical_not(fal))  # neg side
            wing = with_attract(wing_neg, fal)
            slots = [inner, other, excl, wing]
            other_slot, wing_slot = 1, 3
        # fully-extended variant: replace the attractive of {other, wing}
        # (exactly one is attractive: attractivities are !fal and fal)
        ext = list(slots)
        outer_a = with_attract(outer, True)
        ext[other_slot] = select(jnp.logical_not(fal), outer_a, ext[other_slot])
        ext[wing_slot] = select(fal, outer_a, ext[wing_slot])
        return slots, ext

    low, low_ext = region_slots(False)
    up, up_ext = region_slots(True)

    def stack(field_idx):
        # -> [region, extended, slot]
        return jnp.stack(
            [
                jnp.stack(
                    [jnp.stack([c[field_idx] for c in low]),
                     jnp.stack([c[field_idx] for c in low_ext])]
                ),
                jnp.stack(
                    [jnp.stack([c[field_idx] for c in up]),
                     jnp.stack([c[field_idx] for c in up_ext])]
                ),
            ]
        )

    circle_x, circle_y, circle_r, circle_attract = (stack(i) for i in range(4))

    # --- corner points (insert_intersecv2, circles.cu.h:417-476) ---------
    # 10 candidate (femur, tibia) configurations where two constraints meet;
    # keep those inside all three joint-limit boxes (within EPS).
    fem_list = jnp.stack(
        [
            min_fem,
            min_fem,
            min_fem,
            abs_neg - min_tib,
            abs_neg - max_tib,
            max_fem,
            max_fem,
            max_fem,
            abs_pos - min_tib,
            abs_pos - min_tib,
        ]
    )
    tib_list = jnp.stack(
        [
            max_tib,
            min_tib,
            abs_neg - min_fem,
            min_tib,
            max_tib,
            min_tib,
            max_tib,
            abs_pos - max_fem,
            abs_pos - (abs_pos - min_tib),
            abs_pos - (abs_pos - min_tib),
        ]
    )
    eps = _f32(EPS)
    abs_ang = fem_list + tib_list
    corner_valid = (
        (fem_list < max_fem + eps)
        & (fem_list > min_fem - eps)
        & (tib_list < max_tib + eps)
        & (tib_list > min_tib - eps)
        & (abs_ang < abs_pos + eps)
        & (abs_ang > abs_neg - eps)
    )
    corner_x = fem * jnp.cos(fem_list) + tib * jnp.cos(abs_ang)
    corner_y = fem * jnp.sin(fem_list) + tib * jnp.sin(abs_ang)
    corner_xy = jnp.stack([corner_x, corner_y], axis=-1)

    # --- fast-path tables --------------------------------------------------
    from legmov_tpu.config import CIRCLE_MARGIN  # local: avoid import cycle

    margin = _f32(CIRCLE_MARGIN)
    r_tab = circle_r
    r2 = r_tab * r_tab
    hi2 = (r_tab + margin) * (r_tab + margin)
    lo = r_tab - margin
    lo2 = jnp.where(lo < 0, _f32(-1.0), lo * lo)

    def unit_dir(theta):
        return jnp.stack([jnp.cos(theta), jnp.sin(theta)]).astype(_f32)

    half_pi = _f32(jnp.pi / 2)
    sat_angles = jnp.stack([sat_low, sat_up]).astype(_f32)

    return LegWorkspace(
        circle_x=circle_x.astype(_f32),
        circle_y=circle_y.astype(_f32),
        circle_r=circle_r.astype(_f32),
        circle_attract=circle_attract,
        corner_xy=corner_xy.astype(_f32),
        corner_valid=corner_valid,
        middle_angle=jnp.asarray(middle_angle, _f32),
        sat_limit=jnp.stack([sat_low, sat_up]).astype(_f32),
        body=leg.body,
        coxa_pitch=leg.coxa_pitch,
        coxa_length=leg.coxa_length,
        max_angle_coxa=leg.max_angle_coxa,
        min_angle_coxa=leg.min_angle_coxa,
        circle_r2=r2.astype(_f32),
        circle_hi2=hi2.astype(_f32),
        circle_lo2=lo2.astype(_f32),
        coxa_max_dir=unit_dir(leg.max_angle_coxa),
        coxa_min_dir=unit_dir(leg.min_angle_coxa),
        coxa_gt_possible=leg.max_angle_coxa < half_pi,
        coxa_lt_possible=leg.min_angle_coxa > -half_pi,
        mid_dir=unit_dir(middle_angle),
        mid_neg=jnp.asarray(middle_angle, _f32) < 0,
        sat_dir=jnp.stack(
            [unit_dir(sat_low), unit_dir(sat_up)]
        ).astype(_f32),
        sat_neg=sat_angles < 0,
    )


def select_circles(ws: LegWorkspace, upper, extended):
    """Gather the 4 active circles for per-point bits ``upper``/``extended``.

    ``upper``/``extended`` are broadcastable bool arrays ``[...]``; returns
    (cx, cy, r, attract) each shaped ``[..., 4]``.  Pure selects — the TPU
    equivalent of the reference's per-thread stack construction.
    """
    u = upper[..., None]
    e = extended[..., None]

    def pick(t):
        low = jnp.where(e, t[0, 1], t[0, 0])
        up = jnp.where(e, t[1, 1], t[1, 0])
        return jnp.where(u, up, low)

    return (
        pick(ws.circle_x),
        pick(ws.circle_y),
        pick(ws.circle_r),
        pick(ws.circle_attract),
    )


def select_validate_tables(ws: LegWorkspace, upper, extended):
    """Like :func:`select_circles` but with the squared fast-path thresholds.

    Returns ``(cx, cy, r2, hi2, lo2, attract)`` each ``[..., 4]`` — all a
    reachability test needs, with no square roots downstream.
    """
    u = upper[..., None]
    e = extended[..., None]

    def pick(t):
        low = jnp.where(e, t[0, 1], t[0, 0])
        up = jnp.where(e, t[1, 1], t[1, 0])
        return jnp.where(u, up, low)

    return (
        pick(ws.circle_x),
        pick(ws.circle_y),
        pick(ws.circle_r2),
        pick(ws.circle_hi2),
        pick(ws.circle_lo2),
        pick(ws.circle_attract),
    )
