"""Strict-fp32 scalar NumPy oracle for reachability and distance.

This is the framework's "CPU twin" (the role played by
``reachability_kernel_cpu`` / ``distance_kernel_cpu`` in the reference,
one_leg_global.cu:132-147): an independent, deliberately *unvectorized*
re-implementation of the circle-decomposition algorithm
(one_leg.cu:31-341, circles.cu.h:48-476), one point at a time, building the
per-point circle stack exactly like the reference does.  The production JAX
path (dense precomputed tables + masked selects) is validated against this
bit-for-bit on reachability booleans and to fp32 tolerance on distances.

Every arithmetic step stays in ``np.float32``.  Python floats never leak in.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from legmov_tpu.config import CIRCLE_MARGIN, EPS

f32 = np.float32
PI = f32(math.pi)
MARGIN = f32(CIRCLE_MARGIN)


@dataclass
class _Circle:
    x: np.float32
    y: np.float32
    radius: np.float32
    attract: bool


def _leg_scalars(leg) -> dict:
    """Pull LegDimensions fields out as np.float32 scalars."""
    return {k: f32(np.asarray(v)) for k, v in leg._asdict().items()}


def oracle_forward_kinematics(coxa, femur, tibia, leg) -> np.ndarray:
    d = _leg_scalars(leg)
    coxa, femur, tibia = f32(coxa), f32(femur), f32(tibia)
    ch, sh = f32(np.cos(coxa)), f32(np.sin(coxa))
    x = d["body"] + ch * d["coxa_length"]
    y = sh * d["coxa_length"]
    z = f32(0.0)
    cf, sf = f32(np.cos(femur)), f32(np.sin(femur))
    x += ch * (cf * d["femur_length"])
    y += sh * (cf * d["femur_length"])
    z += sf * d["femur_length"]
    ct, st = f32(np.cos(tibia + femur)), f32(np.sin(tibia + femur))
    x += ch * (ct * d["tibia_length"])
    y += sh * (ct * d["tibia_length"])
    z += st * d["tibia_length"]
    return np.array([x, y, z], f32)


# --------------------------------------------------------------------------
# circle stack construction (circles.cu.h semantics)
# --------------------------------------------------------------------------

def _min_femur_to_gripper(d) -> np.float32:
    x = d["femur_length"] + d["tibia_length"] * f32(np.cos(d["min_angle_tibia"]))
    y = d["tibia_length"] * f32(np.sin(d["min_angle_tibia"]))
    return f32(np.sqrt(x * x + y * y))


def _inner(d):
    return _Circle(f32(0), f32(0), _min_femur_to_gripper(d), False)


def _outer(d):
    return _Circle(f32(0), f32(0), d["femur_length"] + d["tibia_length"], True)


def _fromabove(d, pos: bool):
    a = d["tibia_absolute_pos"] if pos else d["tibia_absolute_neg"]
    return _Circle(
        d["tibia_length"] * f32(np.cos(a)),
        d["tibia_length"] * f32(np.sin(a)),
        d["femur_length"],
        True,
    )


def _winglet(d, lower_side: bool):
    a = d["min_angle_femur"] if lower_side else d["max_angle_femur"]
    return _Circle(
        d["femur_length"] * f32(np.cos(a)),
        d["femur_length"] * f32(np.sin(a)),
        d["tibia_length"],
        True,
    )


def _find_region(x, y, d):
    angle = f32(np.arctan2(y, x))
    middle = (
        max(d["tibia_absolute_neg"], d["min_angle_femur"])
        + min(d["tibia_absolute_pos"], d["max_angle_femur"])
    ) / f32(2)
    upper = bool(angle > middle)
    femur_limit = d["max_angle_femur"] if upper else d["min_angle_femur"]
    abs_limit = d["tibia_absolute_pos"] if upper else d["tibia_absolute_neg"]
    femur_limit_o = d["min_angle_femur"] if upper else d["max_angle_femur"]
    abs_limit_o = d["tibia_absolute_neg"] if upper else d["tibia_absolute_pos"]
    fal = (not upper) ^ bool(femur_limit < abs_limit)
    fal_o = (not upper) ^ bool(femur_limit_o < abs_limit_o)
    sat = femur_limit if fal else abs_limit
    fully_extended = upper ^ bool(angle > sat)
    return upper, fal, fal_o, fully_extended


def _insert_circles(d, upper, fal, fal_o, fully_extended):
    lower_side = not upper
    circles = [_inner(d), _fromabove(d, pos=False), _fromabove(d, pos=True), None]
    excl = 1 if upper else 2  # neg slot when upper, pos slot when lower
    other = 2 if upper else 1
    if fal_o:
        circles[excl] = _winglet(d, lower_side=not lower_side)
    circles[excl].attract = False
    circles[3] = _winglet(d, lower_side=lower_side)
    circles[other].attract = not fal
    circles[3].attract = fal
    if fully_extended:
        idx = other if circles[other].attract else 3
        circles[idx] = _outer(d)
    return circles


def _insert_circles_v2(d, upper, fal, fal_o, fully_extended):
    """Re-derivation of the reference's DEAD ``insert_circles_v2``
    variant (circles.cu.h:304-335) — all four limit circles inserted
    unconditionally, attractivity decided per side from the region bits,
    ``FullyExtended`` APPENDING the outer circle instead of replacing.

    The committed reference code is unreachable from every active kernel
    AND defective: it assigns the four attractivities AFTER ``tail += 4``,
    so the writes land 4 slots past the inserted circles (the inserted
    ones keep their constructor defaults).  This twin applies the
    assignments to the slots they name.  Even so corrected, the variant's
    far-side logic does not reproduce the active workspace: on the side
    away from the query's region it demands the *attractive* winglet/
    fromabove combination where the active path (``_insert_circles``)
    tests a single repulsive circle, which wrongly excludes ~9-11% of the
    reachable plane (measured in tests/test_workspace_v2.py) — the
    plausible reason the variant was abandoned.  Kept for parity
    archaeology only; nothing in this package calls it on a product path.
    """
    circles = [
        _inner(d),
        _fromabove(d, pos=False),  # negAbs
        _fromabove(d, pos=True),  # posAbs
        _winglet(d, lower_side=True),  # negWinglet (min femur)
        _winglet(d, lower_side=False),  # posWinglet (max femur)
    ]
    neg_w = fal_o if upper else fal
    pos_w = fal if upper else fal_o
    circles[3].attract = bool(neg_w)
    circles[1].attract = not bool(neg_w)
    circles[4].attract = bool(pos_w)
    circles[2].attract = not bool(pos_w)
    if fully_extended:
        circles.append(_outer(d))
    return circles


def _eval_plane_v2(x, y, d):
    """Reachability through the v2 circle stack (validate only; the
    variant predates the corner/clamp machinery)."""
    x = x - d["coxa_length"]
    upper, fal, fal_o, ext = _find_region(x, y, d)
    return _multi_validate(x, y, _insert_circles_v2(d, upper, fal, fal_o, ext))


def _insert_intersects(d):
    mnf, mxf = d["min_angle_femur"], d["max_angle_femur"]
    mnt, mxt = d["min_angle_tibia"], d["max_angle_tibia"]
    an, ap = d["tibia_absolute_neg"], d["tibia_absolute_pos"]
    cand = [
        (mnf, mxt),
        (mnf, mnt),
        (mnf, an - mnf),
        (an - mnt, mnt),
        (an - mxt, mxt),
        (mxf, mnt),
        (mxf, mxt),
        (mxf, ap - mxf),
        (ap - mnt, ap - (ap - mnt)),
        (ap - mnt, ap - (ap - mnt)),
    ]
    eps = f32(EPS)
    out = []
    for fem, tib in cand:
        fem, tib = f32(fem), f32(tib)
        ok = (
            fem < mxf + eps
            and fem > mnf - eps
            and tib < mxt + eps
            and tib > mnt - eps
            and (fem + tib) < ap + eps
            and (fem + tib) > an - eps
        )
        if ok:
            a = fem + tib
            out.append(
                _Circle(
                    d["femur_length"] * f32(np.cos(fem))
                    + d["tibia_length"] * f32(np.cos(a)),
                    d["femur_length"] * f32(np.sin(fem))
                    + d["tibia_length"] * f32(np.sin(a)),
                    f32(0),
                    True,
                )
            )
    return out


# --------------------------------------------------------------------------
# plane evaluation (one_leg.cu:31-208 semantics)
# --------------------------------------------------------------------------

def _dist_to_circumf(c: _Circle, x, y):
    dx = x - c.x
    dy = y - c.y
    mag = f32(np.sqrt(dx * dx + dy * dy))
    dist = c.radius - mag
    inside = not bool(np.signbit(dist))
    valid = (inside == c.attract) or bool(abs(dist) < MARGIN)
    return dist, valid


def _clamp_on_circle(c: _Circle, x, y):
    dx = x - c.x
    dy = y - c.y
    mag = f32(np.sqrt(dx * dx + dy * dy))
    dist = c.radius - mag
    inside = not bool(np.signbit(dist))
    valid = (inside == c.attract) or bool(abs(dist) < MARGIN)
    if mag < MARGIN:
        dx, dy, mag = f32(1), f32(0), f32(1)
    scale = c.radius / mag
    return c.x + dx * scale, c.y + dy * scale, dist, valid


def _multi_validate(x, y, circles):
    for c in circles:
        if abs(c.radius) < MARGIN:
            return True  # ordered array: points terminate the circle run
        _, valid = _dist_to_circumf(c, x, y)
        if not valid:
            return False
    return True


def _multi_clamp(x, y, circles):
    overall = True
    px, py = f32(0), f32(0)
    prev = f32(np.inf)
    n_circ = min(4, len(circles))
    for c in circles:
        cx, cy, dist, valid = _clamp_on_circle(c, x, y)
        is_point = abs(c.radius) < MARGIN
        if is_point:
            if overall:
                break
            clamp_ok = True
        else:
            clamp_ok = _multi_validate(cx, cy, circles[:n_circ])
            overall = overall and valid
        if clamp_ok and abs(prev) > abs(dist):
            prev = dist
            px, py = cx, cy
    return overall, x - px, y - py


def _eval_plane(x, y, d, dist_mode: bool):
    x = x - d["coxa_length"]
    upper, fal, fal_o, ext = _find_region(x, y, d)
    circles = _insert_circles(d, upper, fal, fal_o, ext)
    if not dist_mode:
        return _multi_validate(x, y, circles), None, None
    circles = circles + _insert_intersects(d)
    return _multi_clamp(x, y, circles)


# --------------------------------------------------------------------------
# full evaluators
# --------------------------------------------------------------------------

def _place_over_coxa(p, d, reverse=False):
    x, y, z = f32(p[0]), f32(p[1]), f32(p[2])
    if not reverse:
        x = x - d["body"]
    ang = d["coxa_pitch"] if reverse else -d["coxa_pitch"]
    s, c = f32(np.sin(ang)), f32(np.cos(ang))
    x, z = x * c - z * s, x * s + z * c
    return x, y, z


def _cancel_coxa(x, y, angle):
    s, c = f32(np.sin(-angle)), f32(np.cos(-angle))
    return x * c - y * s, x * s + y * c, c, s


def _restore_coxa(x, y, c, s):
    return x * c + y * s, -x * s + y * c


def _reach_point(p, d) -> bool:
    x, y, z = _place_over_coxa(p, d)
    flip = bool(np.signbit(x))
    fx, fy = (-x, -y) if flip else (x, y)
    angle = f32(np.arctan2(fy, fx))
    if angle > d["max_angle_coxa"] or angle < d["min_angle_coxa"]:
        return False
    xr, _, _, _ = _cancel_coxa(x, y, angle)
    ok, _, _ = _eval_plane(xr, z, d, dist_mode=False)
    return bool(ok)


def _finish_closest(x, y, z, d, coxa_angle):
    half_pi = PI / f32(2)
    mega = bool(
        coxa_angle > d["max_angle_coxa"] + half_pi
        or coxa_angle < d["min_angle_coxa"] - half_pi
    )
    if mega:
        sat = coxa_angle - PI if coxa_angle > 0 else coxa_angle + PI
    else:
        sat = f32(max(min(coxa_angle, d["max_angle_coxa"]), d["min_angle_coxa"]))
    saturated = bool(sat != coxa_angle)
    limit = (
        d["max_angle_coxa"]
        if coxa_angle > (d["max_angle_coxa"] + d["min_angle_coxa"]) / f32(2)
        else d["min_angle_coxa"]
    )
    xr, yr, c1, s1 = _cancel_coxa(x, y, sat)
    sx, sy, sz = xr, yr, z
    was_valid, dxp, dzp = _eval_plane(xr, z, d, dist_mode=True)
    ox, oy, oz = dxp, yr, dzp
    if was_valid and not mega:
        sx2, sy2, c2, s2 = _cancel_coxa(sx, sy, limit - sat)
        dist_clamped = f32(np.sqrt(ox * ox + oy * oy + oz * oz))
        if dist_clamped > abs(sy2):
            rx, ry = _restore_coxa(f32(0), sy2, c2, s2)
            ox, oy, oz = rx, ry, f32(0)
    ox, oy = _restore_coxa(ox, oy, c1, s1)
    return bool(was_valid and not saturated), ox, oy, oz


def _dist_point(p, d):
    x, y, z = _place_over_coxa(p, d)
    coxangle = f32(np.arctan2(y, x))
    coxflip = coxangle - PI if coxangle > 0 else coxangle + PI
    res, ax, ay, az = _finish_closest(x, y, z, d, coxangle)
    resf, bx, by, bz = _finish_closest(x, y, z, d, coxflip)
    if res == resf:
        use_direct = bool(
            np.sqrt(ax * ax + ay * ay + az * az)
            < np.sqrt(bx * bx + by * by + bz * bz)
        )
    else:
        use_direct = res
    ox, oy, oz = (ax, ay, az) if use_direct else (bx, by, bz)
    # undo the coxa pitch only (displacement, not position)
    s, c = f32(np.sin(d["coxa_pitch"])), f32(np.cos(d["coxa_pitch"]))
    ox, oz = ox * c - oz * s, ox * s + oz * c
    return bool(res or resf), np.array([ox, oy, oz], f32)


def oracle_reachability(points: np.ndarray, leg) -> np.ndarray:
    """Reachability booleans, one scalar evaluation per point."""
    d = _leg_scalars(leg)
    pts = np.asarray(points, f32)
    return np.array([_reach_point(p, d) for p in pts], bool)


def oracle_distance(points: np.ndarray, leg):
    """(reachable, displacement[N,3]) one scalar evaluation per point."""
    d = _leg_scalars(leg)
    pts = np.asarray(points, f32)
    ok = np.zeros(len(pts), bool)
    vec = np.zeros((len(pts), 3), f32)
    for i, p in enumerate(pts):
        ok[i], vec[i] = _dist_point(p, d)
    return ok, vec
