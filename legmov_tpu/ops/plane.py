"""In-plane workspace evaluation: validity test and boundary clamp.

TPU re-derivation of the reference's hot loops (one_leg.cu:31-145,
:167-208): instead of a per-thread loop over a divergent circle stack, every
point evaluates a fixed [4]-circle table (selected by its region bits) and,
for the distance path, a fixed [10]-corner table — dense fp32 element-wise
math, branch-free, O(4^2 + 10) per point.

Conventions: the plane is the coxa-rotated vertical plane; ``x`` is the
radial coordinate *in the femur frame* (the caller subtracts coxa_length)
and ``y`` is world z.  ``attract=True`` means the point must be inside the
circle to be valid; False means outside.  A ``CIRCLE_MARGIN`` band around
every circumference is always valid.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from legmov_tpu.config import CIRCLE_MARGIN
from legmov_tpu.models.workspace import LegWorkspace, select_circles

_f32 = jnp.float32
_MARGIN = np.float32(CIRCLE_MARGIN)
_BIG = np.float32(3.4e38)


def find_region(x, y, ws: LegWorkspace):
    """Classify plane points: (upper, fully_extended) bits.

    Semantics of reference circles.cu.h:48-78 with all leg-dependent terms
    precomputed into ``ws`` (middle_angle, sat_limit).
    """
    angle = jnp.arctan2(y, x)
    upper = angle > ws.middle_angle
    sat = jnp.where(upper, ws.sat_limit[1], ws.sat_limit[0])
    fully_extended = upper ^ (angle > sat)
    return upper, fully_extended


def _circumference(x, y, cx, cy, r, attract):
    """Signed distance to circumference + validity (one_leg.cu:31-41).

    Returns (signed, valid): ``signed = r - |p - c|`` (positive inside) and
    ``valid = (inside == attract) or |signed| < margin``.
    """
    dx = x - cx
    dy = y - cy
    mag = jnp.sqrt(dx * dx + dy * dy)
    signed = r - mag
    inside = jnp.logical_not(jnp.signbit(signed))
    valid = (inside == attract) | (jnp.abs(signed) < _MARGIN)
    return signed, valid, dx, dy, mag


def plane_validate(x, y, ws: LegWorkspace):
    """Reachability in the plane: point valid against all 4 region circles.

    Semantics of ``eval_plane_circles<REACH>`` -> ``multi_circle_validate``
    (one_leg.cu:65-89, :167-208).  ``x``/``y`` are femur-frame coordinates
    (coxa_length already subtracted by the caller).  Shape ``[...] -> [...]``
    bool.
    """
    upper, ext = find_region(x, y, ws)
    cx, cy, r, attract = select_circles(ws, upper, ext)
    _, valid, _, _, _ = _circumference(x[..., None], y[..., None], cx, cy, r, attract)
    return jnp.all(valid, axis=-1)


def plane_clamp(x, y, ws: LegWorkspace):
    """Distance-to-boundary in the plane.

    Semantics of ``eval_plane_circles<DIST>`` -> ``multi_circle_clamp``
    (one_leg.cu:91-145, :167-208):

    * clamp the query onto each of the 4 region circles; a clamp is a
      candidate iff the clamped point is valid against *all* 4 circles;
    * the query is valid iff it is valid against all 4 circles;
    * workspace corner points become candidates only when the query is
      invalid;
    * keep the candidate whose boundary is closest (first wins ties, same
      iteration order as the reference: circles then corners);
    * if no candidate exists the displacement degenerates to the query
      itself (reference leaves potential=(0,0)).

    Returns ``(valid, out_x, out_y)`` where (out_x, out_y) is the
    displacement from the chosen boundary point to the query.
    """
    upper, ext = find_region(x, y, ws)
    cx, cy, r, attract = select_circles(ws, upper, ext)
    xq = x[..., None]
    yq = y[..., None]

    signed, valid, dx, dy, mag = _circumference(xq, yq, cx, cy, r, attract)
    overall_valid = jnp.all(valid, axis=-1)

    # clamp the query onto each circle (one_leg.cu:42-63), guarding the
    # degenerate point-at-center case
    deg = mag < _MARGIN
    ux = jnp.where(deg, _f32(1.0), dx)
    uy = jnp.where(deg, _f32(0.0), dy)
    um = jnp.where(deg, _f32(1.0), mag)
    scale = r / um
    clamp_x = cx + ux * scale  # [..., 4]
    clamp_y = cy + uy * scale

    # validate each clamped point against all 4 circles: [..., 4 clamps, 4]
    _, cvalid, _, _, _ = _circumference(
        clamp_x[..., None], clamp_y[..., None],
        cx[..., None, :], cy[..., None, :], r[..., None, :], attract[..., None, :],
    )
    clamp_ok = jnp.all(cvalid, axis=-1)  # [..., 4]
    circle_score = jnp.where(clamp_ok, jnp.abs(signed), _BIG)

    # corner points: candidates only when the query is invalid
    pcx = ws.corner_xy[..., :, 0]
    pcy = ws.corner_xy[..., :, 1]
    cdx = xq - pcx
    cdy = yq - pcy
    corner_score = jnp.sqrt(cdx * cdx + cdy * cdy)
    corner_on = ws.corner_valid & jnp.logical_not(overall_valid)[..., None]
    corner_score = jnp.where(corner_on, corner_score, _BIG)

    scores = jnp.concatenate([circle_score, corner_score], axis=-1)  # [..., 14]
    best = jnp.argmin(scores, axis=-1)  # first min wins ties, like the ref
    bx_all = jnp.concatenate([clamp_x, jnp.broadcast_to(pcx, corner_score.shape)],
                             axis=-1)
    by_all = jnp.concatenate([clamp_y, jnp.broadcast_to(pcy, corner_score.shape)],
                             axis=-1)
    found = jnp.take_along_axis(scores, best[..., None], axis=-1)[..., 0] < _BIG
    bx = jnp.take_along_axis(bx_all, best[..., None], axis=-1)[..., 0]
    by = jnp.take_along_axis(by_all, best[..., None], axis=-1)[..., 0]
    out_x = x - jnp.where(found, bx, _f32(0.0))
    out_y = y - jnp.where(found, by, _f32(0.0))
    return overall_valid, out_x, out_y
