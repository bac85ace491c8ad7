"""Fused multi-leg oriented-reachability Pallas kernel.

The positionability hot loop evaluates, for every (pose, candidate
foothold), all L legs' reachability under the pose's body orientation
(ops/grid.py -> ops/orientation.py).  The XLA path materializes [P, C]
intermediates between fusions; this kernel does the entire chain —
quaternion un-rotation, per-leg azimuth/coxa frames, region bits, circle
tests, per-leg any-candidate OR — in one VMEM pass.

Layout: tiles are ``[POSE_ROWS=8, 128]`` (sublanes = poses, lanes =
candidates).  Per-pose quantities (quaternion, body position, and the
orientation-dependent workspace tables of every leg) ride in one packed
``[P, W]`` table whose ``[8, 1]`` column slices broadcast against the
candidate lanes.  Tables are precomputed by XLA (:func:`oriented_tables`)
as the 6 UNIQUE circles (inner/outer/fromabove+-/winglet+-) in the
expanded linear form of ops/pallas_kernels.py (2 FMA + 3 compares per
circle, each evaluated ONCE) plus the 4 region-construction bits
(fal/falo); the kernel re-derives the four (region, ext) slot
configurations as boolean algebra on those bits instead of storing 16
pre-selected slots.  Leg-static scalars (mount azimuth, coxa pitch frame,
coxa yaw-limit directions) are baked as Python-float immediates.

The whole candidate block is evaluated per grid step with the per-leg
any-candidate OR reduced in-kernel into a ``[P, 128]`` output (lane l =
leg l's bit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.models.workspace import build_workspace
from legmov_tpu.ops.orientation import rotate_leg_data
from legmov_tpu.ops.solve_schedule import (
    POSE_ROWS,
    make_undecided,
    robot_geometry,
    run_schedule,
    wanted,
)

_LANES = 128

#: per-leg slice layout inside the packed table (offsets relative to the
#: leg block start): linear-form params for the 6 UNIQUE circles
#: [inner, outer, fa_neg, fa_pos, wing_neg, wing_pos] (x 5 params), the
#: 4 region-construction bits (fal_low, fal_up, falo_low, falo_up), and
#: the region threshold directions.
_AX, _AY, _R2K, _HI2K, _LO2K = 0, 6, 12, 18, 24
_FAL = 30  # fal_low, fal_up, falo_low, falo_up
_MID_DIR, _MID_NEG, _SAT_DIR, _SAT_NEG = 34, 36, 37, 41
LEG_BLOCK = 43
_HDR = 7  # quat (4) + body position (3)
#: unique-circle indices
_INNER, _OUTER, _FAN, _FAP, _WN, _WP = range(6)


def table_width(n_legs: int) -> int:
    w = _HDR + n_legs * LEG_BLOCK
    return ((w + _LANES - 1) // _LANES) * _LANES


def oriented_tables(
    body_pos: jnp.ndarray, quats: jnp.ndarray, robot: LegDimensions
) -> jnp.ndarray:
    """``[P, table_width(L)]`` packed per-pose scalars.

    XLA-side precompute (O(P x L) scalar trig — negligible next to the
    candidate axis): per (pose, leg), rotate the absolute-tibia limits by
    the pose pitch (one_leg_global.cu:48-60), rebuild the circle tables,
    extract the 6 UNIQUE circles (the [2,2,4] slot table references only
    inner/outer/fromabove+-/winglet+-; which circle sits in which slot is
    the region-construction logic, which the kernel re-evaluates from the
    fal/falo bits), and fold each into the expanded linear form
    ``t = q - 2 cx xp - 2 cy yp`` vs thresholds with the center norm
    pre-subtracted.
    """

    def per_pose(q):
        def per_leg(leg):
            oriented = rotate_leg_data(q, leg)
            ws = build_workspace(oriented)
            # unique circles out of the slot tables (identity positions
            # fixed by workspace.region_slots): slot1 of r0 = fa_neg,
            # slot2 of r1 = fa_pos, slot3 of r0/r1 = wing_neg/wing_pos,
            # slot0 = inner; outer occupies the attractive slot of the
            # ext variants (fal decides which one)
            fal_low = jnp.logical_not(
                oriented.min_angle_femur < oriented.tibia_absolute_neg
            )
            fal_up = oriented.max_angle_femur < oriented.tibia_absolute_pos
            falo_low = jnp.logical_not(
                oriented.max_angle_femur < oriented.tibia_absolute_pos
            )
            falo_up = oriented.min_angle_femur < oriented.tibia_absolute_neg

            def tabsel(t):
                # -> [6] unique values ordered
                # [inner, outer, fa_neg, fa_pos, wing_neg, wing_pos]
                outer = jnp.where(fal_low, t[0, 1, 3], t[0, 1, 1])
                fa_pos = t[1, 0, 2]
                return jnp.stack([
                    t[0, 0, 0], outer, t[0, 0, 1], fa_pos,
                    t[0, 0, 3], t[1, 0, 3],
                ])

            cx = tabsel(ws.circle_x)
            cy = tabsel(ws.circle_y)
            k = cx * cx + cy * cy
            parts = [
                -2.0 * cx,
                -2.0 * cy,
                tabsel(ws.circle_r2) - k,
                tabsel(ws.circle_hi2) - k,
                tabsel(ws.circle_lo2) - k,
                jnp.stack([fal_low, fal_up, falo_low, falo_up]).astype(
                    jnp.float32
                ),
                ws.mid_dir.reshape(-1),
                ws.mid_neg.reshape(-1).astype(jnp.float32),
                ws.sat_dir.reshape(-1),
                ws.sat_neg.reshape(-1).astype(jnp.float32),
            ]
            return jnp.concatenate(parts)

        blocks = jax.vmap(per_leg)(robot).reshape(-1)  # [L * LEG_BLOCK]
        return blocks

    L = int(jax.tree.leaves(robot)[0].shape[0])
    blocks = jax.vmap(per_pose)(quats)  # [P, L*LEG_BLOCK]
    hdr = jnp.concatenate([quats, body_pos], axis=-1)  # [P, 7]
    tab = jnp.concatenate([hdr, blocks], axis=-1)
    pad = table_width(L) - tab.shape[-1]
    return jnp.pad(tab, ((0, 0), (0, pad))).astype(jnp.float32)


def _bsel(c, a, b):
    return (c & a) | (~c & b)


def leg_constants(robot: LegDimensions) -> list[dict]:
    """Leg-static scalars baked as Python-float kernel immediates
    (orientation does not shift these)."""
    L = int(jax.tree.leaves(robot)[0].shape[0])
    legs_const = []
    for i in range(L):
        leg = jax.tree.map(lambda x: np.asarray(x)[i], robot)
        ws = build_workspace(
            jax.tree.map(lambda x: jnp.asarray(x), leg)
        )
        ws = type(ws)(*[np.asarray(f) for f in ws])
        ba = float(leg.body_angle)
        pitch = float(leg.coxa_pitch)
        legs_const.append(
            dict(
                ca=float(np.float32(np.cos(np.float32(-ba)))),
                sa=float(np.float32(np.sin(np.float32(-ba)))),
                body=float(leg.body),
                cp=float(np.float32(np.cos(np.float32(-pitch)))),
                sp=float(np.float32(np.sin(np.float32(-pitch)))),
                coxa_len=float(leg.coxa_length),
                cmax=(float(ws.coxa_max_dir[0]), float(ws.coxa_max_dir[1])),
                cmin=(float(ws.coxa_min_dir[0]), float(ws.coxa_min_dir[1])),
                gt_possible=bool(ws.coxa_gt_possible),
                lt_possible=bool(ws.coxa_lt_possible),
            )
        )
    return legs_const


def tile_unrotate(s, x, y, z):
    """Body-frame candidate coordinates, shared across legs: subtract
    the body position and un-rotate by the body quaternion (conjugate
    rotation).  ``s(i)`` is the per-pose scalar getter."""
    rx = x - s(4)
    ry = y - s(5)
    rz = z - s(6)
    w = s(0)
    ux = -s(1)
    uy = -s(2)
    uz = -s(3)
    tx = 2.0 * (uy * rz - uz * ry)
    ty = 2.0 * (uz * rx - ux * rz)
    tz = 2.0 * (ux * ry - uy * rx)
    vx = rx + w * tx + (uy * tz - uz * ty)
    vy = ry + w * ty + (uz * tx - ux * tz)
    vz = rz + w * tz + (ux * ty - uy * tx)
    return vx, vy, vz


def tile_leg_bits(tab_ref, x, y, z, legs_const, s_fn=None):
    """Shared kernel body: per-leg any-candidate reachability bits for
    one pose tile.

    ``tab_ref`` is a ``[rows, W]`` ref of :func:`oriented_tables` rows;
    ``x/y/z`` are ``[rows, C]`` candidate world-coordinate VALUES (not
    refs).  Returns a list of ``[rows, 1]`` bool arrays, one per leg —
    leg l's "any candidate reachable" bit per pose row.

    ``s_fn`` overrides the per-pose scalar getter: a single-pose caller
    (e.g. the DMA streaming solver, whose candidate tile is
    ``[sub, 128]`` for ONE pose) passes ``s_fn=lambda i: tab_ref[r, i]``
    (rank-0 scalars broadcast against the tile); the reduction then
    yields per-sublane bits the caller folds further.
    """

    def s(i):
        if s_fn is not None:
            return s_fn(i)
        return tab_ref[:, i : i + 1]  # [rows, 1] broadcastable scalar

    vx, vy, vz = tile_unrotate(s, x, y, z)
    return [
        tile_one_leg_bit(s, l, c, vx, vy, vz)
        for l, c in enumerate(legs_const)
    ]


def tile_one_leg_bit(s, l, c, vx, vy, vz):
    """``[rows, 1]`` any-candidate reachability bit for leg ``l`` over
    body-frame candidates (``tile_unrotate`` output).  ``c`` is the
    leg's :func:`leg_constants` entry; ``s`` the per-pose scalar
    getter."""
    off = _HDR + l * LEG_BLOCK
    # yaw by -body_angle ("as if leg 0")
    x0 = vx * c["ca"] - vy * c["sa"]
    y0 = vx * c["sa"] + vy * c["ca"]
    # coxa frame
    px = x0 - c["body"]
    x1 = px * c["cp"] - vz * c["sp"]
    z1 = px * c["sp"] + vz * c["cp"]
    y1 = y0
    flip = jnp.signbit(x1)
    fx = jnp.where(flip, -x1, x1)
    fy = jnp.where(flip, -y1, y1)
    coxa_invalid = None
    if c["gt_possible"]:
        coxa_invalid = (fy * c["cmax"][0] - fx * c["cmax"][1]) > 0
    if c["lt_possible"]:
        lt = (fy * c["cmin"][0] - fx * c["cmin"][1]) < 0
        coxa_invalid = (
            lt if coxa_invalid is None else coxa_invalid | lt
        )
    rho = jnp.sqrt(x1 * x1 + y1 * y1)
    xp = jnp.where(flip, -rho, rho) - c["coxa_len"]
    yp = z1

    # region bits from per-pose scalars
    nn = yp >= 0
    mid_neg = s(off + _MID_NEG) > 0.5
    crossm = (yp * s(off + _MID_DIR) - xp * s(off + _MID_DIR + 1)) > 0
    upper = _bsel(nn, mid_neg | crossm, mid_neg & crossm)
    sat_lo_neg = s(off + _SAT_NEG) > 0.5
    sat_hi_neg = s(off + _SAT_NEG + 1) > 0.5
    cross_lo = (
        yp * s(off + _SAT_DIR) - xp * s(off + _SAT_DIR + 1)
    ) > 0
    cross_hi = (
        yp * s(off + _SAT_DIR + 2) - xp * s(off + _SAT_DIR + 3)
    ) > 0
    gt_lo = _bsel(nn, sat_lo_neg | cross_lo, sat_lo_neg & cross_lo)
    gt_hi = _bsel(nn, sat_hi_neg | cross_hi, sat_hi_neg & cross_hi)
    ext = upper ^ _bsel(upper, gt_hi, gt_lo)

    # 6 unique circles once each (both validity polarities), then
    # the four (region, ext) configurations as boolean algebra on
    # the per-pose fal/falo construction bits — the slot tables'
    # region logic (workspace.region_slots) re-evaluated per
    # point-tile instead of storing 16 pre-selected slots
    q2 = xp * xp + yp * yp
    pos, neg = [], []
    for u in range(6):
        t = (
            q2
            + s(off + _AX + u) * xp
            + s(off + _AY + u) * yp
        )
        inside = t <= s(off + _R2K + u)
        near = (t < s(off + _HI2K + u)) & (
            t > s(off + _LO2K + u)
        )
        pos.append(inside | near)
        neg.append((~inside) | near)
    b_fal_low = s(off + _FAL) > 0.5
    b_fal_up = s(off + _FAL + 1) > 0.5
    b_falo_low = s(off + _FAL + 2) > 0.5
    b_falo_up = s(off + _FAL + 3) > 0.5
    # lower region: [inner, fa_neg(att=!fal), excl(rep), wing]
    excl0 = _bsel(b_falo_low, neg[_WP], neg[_FAP])
    other0 = _bsel(b_fal_low, neg[_FAN], pos[_FAN])
    wing0 = _bsel(b_fal_low, pos[_WN], neg[_WN])
    base0 = neg[_INNER] & excl0
    v00 = base0 & other0 & wing0
    other0e = _bsel(b_fal_low, other0, pos[_OUTER])
    wing0e = _bsel(b_fal_low, pos[_OUTER], wing0)
    v01 = base0 & other0e & wing0e
    # upper region: [inner, excl(rep), fa_pos(att=!fal), wing]
    excl1 = _bsel(b_falo_up, neg[_WN], neg[_FAN])
    other1 = _bsel(b_fal_up, neg[_FAP], pos[_FAP])
    wing1 = _bsel(b_fal_up, pos[_WP], neg[_WP])
    base1 = neg[_INNER] & excl1
    v10 = base1 & other1 & wing1
    other1e = _bsel(b_fal_up, other1, pos[_OUTER])
    wing1e = _bsel(b_fal_up, pos[_OUTER], wing1)
    v11 = base1 & other1e & wing1e
    plane_ok = _bsel(
        upper,
        _bsel(ext, v11, v10),
        _bsel(ext, v01, v00),
    )
    reach = (
        plane_ok
        if coxa_invalid is None
        else ~coxa_invalid & plane_ok
    )
    # lane reduction in f32 (no i1 reductions / u8 casts on this
    # Mosaic target)
    return (
        jnp.max(reach.astype(jnp.float32), axis=1, keepdims=True)
        > 0
    )


def make_multileg_kernel(
    robot: LegDimensions, cand_cols: int, interpret: bool = False
):
    """Kernel factory for a fixed robot + candidate-axis width.

    Returns jitted ``fn(tab [P, W], gx, gy, gz [P, C]) -> [P, L] bool``
    where (gx, gy, gz) are candidate foothold world coordinates per pose
    (sentinel-padded; ``C == cand_cols`` must be a multiple of 128) and
    ``tab`` comes from :func:`oriented_tables` for the same poses.
    """
    L = int(jax.tree.leaves(robot)[0].shape[0])
    W = table_width(L)
    if cand_cols % _LANES:
        raise ValueError(f"cand_cols {cand_cols} not a multiple of {_LANES}")
    if cand_cols > 8192:
        # [POSE_ROWS, cand_cols] f32 tiles x the kernel's live values
        # approach the 16 MB VMEM budget and the Mosaic compile becomes
        # pathological (observed: a cap_pad=21120 dense-table kernel
        # wedging the remote compile service). Dense terrain should go
        # through ops/csr_grid.make_csr_solver, which streams fixed
        # windows of real candidates instead of max-cell-capacity rows.
        raise ValueError(
            f"cand_cols {cand_cols} > 8192: this dense-table kernel is "
            "not VMEM-viable at that width — use the CSR windowed solver"
        )

    legs_const = leg_constants(robot)

    def kernel(tab_ref, x_ref, y_ref, z_ref, o_ref):
        # one grid step per pose tile; the whole candidate axis lives in
        # one [POSE_ROWS, cand_cols] block (a [8, 128]-tile grid over the
        # candidate axis costs millions of tiny grid steps and is
        # overhead-bound)
        bits = tile_leg_bits(
            tab_ref, x_ref[...], y_ref[...], z_ref[...], legs_const
        )
        for l, any_l in enumerate(bits):
            o_ref[:, l : l + 1] = any_l.astype(jnp.int32)

    @jax.jit
    def fn(tab, gx, gy, gz):
        P = tab.shape[0]
        pad = (-P) % POSE_ROWS
        if pad:
            # grid below covers whole POSE_ROWS tiles only: pad the pose
            # axis (sentinel candidates -> padded rows compute no bits)
            # and slice the pad back off at the end
            tab = jnp.pad(tab, ((0, pad), (0, 0)))
            gx = jnp.pad(gx, ((0, pad), (0, 0)), constant_values=1e9)
            gy = jnp.pad(gy, ((0, pad), (0, 0)), constant_values=1e9)
            gz = jnp.pad(gz, ((0, pad), (0, 0)), constant_values=1e9)
        grid = ((P + pad) // POSE_ROWS,)
        tab_spec = pl.BlockSpec(
            (POSE_ROWS, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        cand_spec = pl.BlockSpec(
            (POSE_ROWS, cand_cols), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (POSE_ROWS, _LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P + pad, _LANES), jnp.int32),
            grid=grid,
            in_specs=[tab_spec, cand_spec, cand_spec, cand_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(tab, gx, gy, gz)
        return out[:P, :L] > 0

    return fn


def pad_grid_soa(grid, sentinel: float = 1e9):
    """Split a FootholdGrid table into lane-padded SoA component tables.

    One-time prep for the fused solver: ``[n_cells, cap, 3] ->``
    three ``[n_cells, cap_pad]`` arrays with ``cap_pad`` a multiple of 128
    (padding = far sentinel, never reachable).
    """
    cap = grid.points.shape[1]
    cap_pad = ((cap + _LANES - 1) // _LANES) * _LANES
    comps = []
    for i in range(3):
        c = grid.points[:, :, i]
        comps.append(
            jnp.pad(c, ((0, 0), (0, cap_pad - cap)),
                    constant_values=np.float32(sentinel))
        )
    return tuple(comps), cap_pad


def make_adaptive_grid_solver(
    robot: LegDimensions, cand_cols: int, interpret: bool = False,
    rounds: tuple = ((8, 1.0), (16, 0.5), (32, 0.25), (64, 0.125),
                     (0, 0.0625)),
    decide: str = "legs",
):
    """Early-exit fused grid solver: per-leg-relevant cells nearest-first,
    with pose compaction between rounds.

    The plain fused solver (:func:`make_fused_grid_solver`) scans every
    pose through every candidate cell even though a pose's ``legs`` bits
    are monotone.  This solver exploits three structural facts:

    * **a cell can only matter to leg l if it intersects leg l's reach
      ball** (center = the pose's rotated mount point, radius = coxa +
      femur + tibia) — computed exactly per (pose, offset, leg) from the
      cell AABB, so cells outside every *missing* leg's ball are never
      scanned and a missing leg is *proven* infeasible once its relevant
      occupied cells are exhausted (the dense analogue of the reference
      octree's elongated-box early-out, several_leg_octree.cu:76-82);
    * **nearest cells first**: feasible poses on continuous terrain find
      all legs within a handful of nearby cells;
    * **static-shape stream compaction** between rounds (the TPU analogue
      of the thrust pipeline's ``remove_if``, several_leg.cu:427-434):
      each round ``(n_cells, frac)`` keeps the ``frac * P`` poses whose
      result can still change and scans their next ``n_cells``
      highest-priority cells (``n_cells = 0`` = every cell, last round).

    ``legs``/``quorum`` are EXACT (identical to the plain solver) unless
    the returned ``overflow`` is True — more poses stayed undecided than
    a round's quota, in which case the extras' missing-leg bits may be
    under-reported (re-run those through the exhaustive path or widen
    ``rounds``).

    ``decide="quorum"`` relaxes the per-leg contract to stop a pose as
    soon as its quorum is decided (achieved, or impossible because
    ``found + still-open legs < k``): the returned ``quorum`` stays
    exact, but a decided-infeasible pose's other leg bits may be
    under-reported.  See ops/csr_grid.make_csr_solver for the full
    semantics; with ``k == L`` one proven-infeasible leg kills the pose
    immediately (the octree early-out of several_leg_octree.cu:117-131).
    """
    make_undecided(decide, 0)  # validate ``decide`` eagerly
    kernel_fn = make_multileg_kernel(robot, cand_cols, interpret)
    L = int(jax.tree.leaves(robot)[0].shape[0])
    # per-leg mount point + reach radius for the relevance test
    mount_vec, reach_l = robot_geometry(robot)

    @partial(jax.jit, static_argnames=("top_k", "k", "dims"))
    def solve(
        body, quats, gx, gy, gz, counts, origin, cell_size, offsets,
        top_k: int, k: int, dims: tuple,
    ):
        del top_k  # kept for signature parity with the plain solver
        P = body.shape[0]
        K = offsets.shape[0]
        nx, ny, nz = dims
        cs = jnp.float32(cell_size)
        base = jnp.floor((body - origin) / cs).astype(jnp.int32)
        cell = base[:, None, :] + offsets[None, :, :]
        in_range = jnp.all(
            (cell >= 0) & (cell < jnp.asarray([nx, ny, nz], jnp.int32)),
            axis=-1,
        )
        cellc = jnp.clip(cell, 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
        flat = (cellc[..., 0] * ny + cellc[..., 1]) * nz + cellc[..., 2]
        occupied = in_range & (counts[flat] > 0)  # [P, K]

        # exact conservative relevance: leg l's reach ball (center =
        # rotated mount point, radius = leg reach) vs each candidate
        # cell's AABB, all relative to the body position
        from legmov_tpu.ops import quaternion as _quat

        centers = jax.vmap(
            lambda q: jax.vmap(lambda m: _quat.rotate(q, m))(
                jnp.asarray(mount_vec)
            )
        )(quats)  # [P, L, 3]
        cell_lo = (
            cellc.astype(jnp.float32) * cs + origin - body[:, None, :]
        )  # [P, K, 3]
        nearest = jnp.clip(
            centers[:, None, :, :], cell_lo[:, :, None, :],
            cell_lo[:, :, None, :] + cs,
        )
        d2 = jnp.sum(
            (nearest - centers[:, None, :, :]) ** 2, axis=-1
        )  # [P, K, L]
        rel = d2 <= jnp.asarray(reach_l, jnp.float32)[None, None, :] ** 2
        rel &= occupied[:, :, None]

        # static nearest-first priority of the offsets (ties by index)
        off_d2 = jnp.sum(
            (offsets.astype(jnp.float32) + 0.5) ** 2, axis=-1
        )  # [K]
        near_rank = jnp.argsort(jnp.argsort(off_d2))  # [K] 0 = nearest

        tab = oriented_tables(body, quats, robot)
        sentinel = jnp.float32(1e9)

        k_eff = jnp.int32(k if k else L)
        undecided = make_undecided(decide, k_eff)

        def order_cells(rel_, legs_, scanned_, n_steps):
            """[A, n_steps] cell priority order: unscanned cells relevant
            to a missing leg, nearest first; zero-score slots are dead."""
            want = wanted(rel_, legs_, scanned_, undecided)
            score = jnp.where(want, jnp.int32(2 * K) - near_rank, 0)
            val, order = jax.lax.top_k(score, n_steps)
            return order, val > 0

        def run_round(per_pose, rel_, legs_, scanned_, n_steps):
            tab_, flat_ = per_pose
            order, live = order_cells(rel_, legs_, scanned_, n_steps)
            # liveness is a per-pose prefix of the score-sorted order, so
            # the loop can stop at the longest live prefix — trailing
            # all-dead steps cost nothing
            max_live = jnp.max(jnp.sum(live, axis=1))

            def cond(c):
                return c[0] < max_live

            def step(c):
                i, legs_c = c
                fl = jnp.take_along_axis(flat_, order[:, i][:, None], 1)
                lv = live[:, i][:, None, None]

                def take(tab3):
                    g = tab3[fl]
                    g = jnp.where(lv, g, sentinel)
                    return g.reshape(fl.shape[0], -1)

                got = kernel_fn(tab_, take(gx), take(gy), take(gz))
                return i + 1, legs_c | got

            _, legs_ = jax.lax.while_loop(
                cond, step, (jnp.int32(0), legs_)
            )
            A = scanned_.shape[0]
            scanned_ = scanned_.at[
                jnp.arange(A)[:, None], order
            ].set(True)
            return legs_, scanned_

        # normalize quotas (0 = "all cells", clamp to K) and append the
        # full-width safety round: it runs zero kernel steps when the
        # schedule already decided every pose (the live-prefix loop
        # bound is 0) and finishes stragglers otherwise, making results
        # unconditionally exact; ``overflow`` reports whether it had to
        # do real work
        rounds_eff = tuple(
            (min(n, K) if n else K, f) for n, f in rounds
        ) + ((K, 1.0),)
        legs, scanned, over_quota = run_schedule(
            rounds_eff, (tab, flat), rel,
            jnp.zeros((P, L), bool), jnp.zeros((P, K), bool),
            undecided, run_round,
        )
        quorum = jnp.sum(legs, axis=-1) >= k_eff
        return legs, quorum, over_quota

    return solve


def make_fused_grid_solver(
    robot: LegDimensions, cand_cols: int, interpret: bool = False,
    group: int = 1,
):
    # NOTE on `group`: wider candidate blocks amortize launches, but the
    # kernel's live tiles scale with block width x legs — at cap_pad ~5k
    # and 6 legs, group=4 overflows the 16 MB VMEM scoped stack. group=1
    # is safe for hexapods at large cap; raise it for small caps/robots.
    """Fused-topk grid positionability solver.

    Returns jitted
    ``solve(body, quats, gx, gy, gz, counts, origin, cell_size, offsets,
    top_k=, k=, dims=) -> (legs [P, L], quorum [P], overflow [P])``
    with identical semantics to ops/grid.py ``grid_reachable_legs_topk``
    but per-leg evaluation running through :func:`make_multileg_kernel`.
    Grid component tables come from :func:`pad_grid_soa` and MUST be
    passed as arguments (a closed-over table would be baked into the
    program as a constant).  ``P`` must be a multiple of ``POSE_ROWS``.

    ``group`` cells are gathered per kernel call (fewer, wider launches);
    dead/out-of-range cells are neutralized by overwriting their gathered
    coordinates with the far sentinel before the kernel sees them.
    """
    kernel_fn = make_multileg_kernel(robot, cand_cols * group, interpret)
    L = int(jax.tree.leaves(robot)[0].shape[0])

    @partial(jax.jit, static_argnames=("top_k", "k", "dims"))
    def solve(
        body, quats, gx, gy, gz, counts, origin, cell_size, offsets,
        top_k: int, k: int, dims: tuple,
    ):
        P = body.shape[0]
        nx, ny, nz = dims
        base = jnp.floor(
            (body - origin) / jnp.float32(cell_size)
        ).astype(jnp.int32)
        cell = base[:, None, :] + offsets[None, :, :]
        in_range = jnp.all(
            (cell >= 0) & (cell < jnp.asarray([nx, ny, nz], jnp.int32)),
            axis=-1,
        )
        cellc = jnp.clip(cell, 0, jnp.asarray([nx - 1, ny - 1, nz - 1]))
        flat = (cellc[..., 0] * ny + cellc[..., 1]) * nz + cellc[..., 2]
        cnts = jnp.where(in_range, counts[flat], 0)
        occupied = cnts > 0
        overflow = jnp.sum(occupied, axis=-1) > top_k
        # round the step count up to a group multiple (extra slots select
        # the least-occupied cells, masked dead below); pad the candidate
        # columns if the offset ball is smaller than the rounded count
        tk = ((top_k + group - 1) // group) * group
        short = tk - cnts.shape[1]
        if short > 0:
            cnts = jnp.pad(cnts, ((0, 0), (0, short)))
            flat = jnp.pad(flat, ((0, 0), (0, short)))
            occupied = jnp.pad(occupied, ((0, 0), (0, short)))
        _, sel = jax.lax.top_k(cnts, tk)
        sel_flat = jnp.take_along_axis(flat, sel, axis=-1)
        sel_occ = jnp.take_along_axis(occupied, sel, axis=-1)

        tab = oriented_tables(body, quats, robot)
        sentinel = jnp.float32(1e9)

        def step(acc, idx):
            # gather `group` cells per call -> [P, group * cand_cols]
            fl = jax.lax.dynamic_slice_in_dim(sel_flat, idx * group, group, 1)
            live = jax.lax.dynamic_slice_in_dim(
                sel_occ, idx * group, group, 1
            )  # [P, group]
            mask = live[:, :, None]

            def take(tab3):
                g = tab3[fl]  # [P, group, cand_cols]
                g = jnp.where(mask, g, sentinel)
                return g.reshape(P, -1)

            legs = kernel_fn(tab, take(gx), take(gy), take(gz))
            return acc | legs, None

        acc0 = jnp.zeros((P, L), bool)
        legs, _ = jax.lax.scan(step, acc0, jnp.arange(tk // group))
        quorum = jnp.sum(legs, axis=-1) >= jnp.int32(k if k else L)
        return legs, quorum, overflow

    return solve
