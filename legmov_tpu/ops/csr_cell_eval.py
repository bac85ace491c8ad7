"""CSR-streaming hierarchical cell evaluator with role-masked early exit.

The hierarchical solver's deep (orientation-active) levels dominate its
wall time.  The dense evaluators (models/hier_solver._eval_cells and the
fused ops/pallas_multileg_dist twins) evaluate EVERY (cell, orientation)
item against a per-batch foothold subset that must be re-uploaded through
the relay per batch and is as wide as the batch's bounding box.  This
evaluator replaces that with the CSR machinery of ops/csr_grid.py, shaped
for cells instead of poses:

* footholds live device-resident in cell-sorted CSR form (12 B/point,
  uploaded once per solve);
* each cell's candidate set is its own elongated box (the exact ``pre``
  prefilter bound, several_leg_octree.cu:76-82) decomposed into x-SLABS —
  for a fixed x-cell, the (y-range x full z) block is ONE contiguous CSR
  range, so a deep cell's box is ~3-5 contiguous slices instead of
  dozens of short (x, y) columns (window-granularity waste);
* ONE ``pallas_call`` evaluates a whole level chunk: grid =
  (cell tiles, queue steps), the queue quat-major per cell; candidate
  windows stream HBM->VMEM with ``pltpu.make_async_copy`` per row;
* every (slab, quat) chunk carries ROLE MASKS derived from exact
  reach-ball geometry: a candidate can be *reachable* by leg ``l`` only
  inside the ball of radius ``reach_l`` around the quat-rotated mount
  point, and *boundary-crossing* only inside that ball inflated by the
  cell circumradius (the workspace is bounded by arm's length; the
  crossing test bounds the candidate's distance to the workspace
  boundary by the cell radius).  From ball-vs-slab-box tests the queue
  packs per-chunk bits: which legs can cross (``infl``), whether a
  SHARED-valid item is possible (``V``: >= k legs' reach balls hit the
  box), whether an edge item is possible (``E``: > L-k inflated balls
  hit);
* the kernel SKIPS chunks that cannot change the cell's remaining
  undecided flags and skips masked-out legs inside evaluated chunks.
  In shared mode an infeasible-but-edge cell (the dominant population
  of a deep solve) stops after its first crossing candidate: its valid/
  leaf flags can only come from ``V`` chunks — the tiny multi-ball
  intersection region — instead of the whole elongated box.  Exact by
  monotonicity + the superset property of the ball masks (verified
  against the oracle pipeline: reachable candidates sit >= 0.07 mm
  inside ``reach_l``, crossing candidates >= 0.5 mm inside
  ``reach_l + r_cell``; masks add a +2 mm slack on top);
* per-quat finalization runs IN-KERNEL (SMEM running state) regardless
  of chunk skips, and a cell whose output flags are DECIDED skips every
  remaining (quat, chunk) step;
* the per-quat workspace tables ride in SMEM ONCE per level
  (``[S, W]``): they depend only on the orientation, not the cell — the
  dense path re-materializes them per (cell, quat) row.

Exactness: the slab set covers the elongated box (superset); every
streamed candidate is a real foothold or the far sentinel; the in-kernel
``pre`` test is the same exact box test the dense path applies per item;
the ball masks are supersets of where ok/crossed can hold, so skipped
chunks and masked-out legs contribute exactly nothing.  Flags match the
dense evaluators bit-for-bit (tests/test_csr_cell_eval.py).

Reference anchor: several_leg_octree.cu:19-151 ``validity_child`` item
semantics (via the shared ops/pallas_multileg_dist.make_item_parts);
octree_util.cu.h:153-159 ``isInBox`` prefilter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legmov_tpu.models.leg import LegDimensions
from legmov_tpu.ops.pallas_multileg_dist import (
    dist_leg_constants,
    make_item_parts,
    oriented_dist_tables,
    table_width,
)

_LANES = 128
_ROWS = 8  # cells per tile (f32 sublane count)
_ALIGN = 8 * _LANES  # DMA start/shape quantum for [rows, 128] f32 (ops/csr_grid.py)

#: static x-slab offset cap: levels whose elongated box spans more than
#: 2*R_CAP+1 grid cells per axis fall back to the dense evaluators
R_CAP = 6

#: ball-mask slack (mm) absorbing fp32 rounding of the mask tests and of
#: the distance pipeline whose outputs they bound (measured headroom
#: without slack: >= 0.07 mm; see module docstring)
_BALL_EPS = np.float32(2.0)


def fetch_width(window: int) -> int:
    """Fetched elements per candidate window.

    When ``window`` is a multiple of the DMA start quantum (``_ALIGN``),
    chunks anchor ON the quantum grid (r5): every fetch starts exactly at
    its chunk and spans exactly ``window`` elements — no alignment slack.
    Otherwise (small test windows) the legacy layout fetches
    ``window + _ALIGN`` so the rounded-down aligned start still covers
    the chunk.  The slack elements are real neighboring footholds; they
    re-evaluate harmlessly (monotone ORs + the exact in-kernel ``pre``
    box test), but at window 2048 the legacy slack was +50% VPU work on
    every evaluated chunk — the motivation for the aligned layout."""
    if window % _ALIGN == 0:
        return window
    return (-(-window // _ALIGN) + 1) * _ALIGN


def pad_csr_soa(xs, ys, zs, w_fetch: int):
    """Sentinel-pad CSR component arrays for in-kernel DMA streaming.

    Returns ``(xs2, ys2, zs2, dead_elem)``: ``[rows, 128]`` layouts whose
    tail holds >= ``w_fetch`` far sentinels starting at the align-rounded
    ``dead_elem`` (dead-chunk fetch target; same scheme as
    ops/csr_grid.make_csr_dma_solver)."""
    F = int(xs.shape[0])
    dead_elem = ((F + _ALIGN - 1) // _ALIGN) * _ALIGN
    pad_n = dead_elem + w_fetch - F

    def pad2d(comp):
        sent = jnp.full((pad_n,), 1e9, jnp.float32)
        return jnp.concatenate([jnp.asarray(comp), sent]).reshape(-1, _LANES)

    return pad2d(xs), pad2d(ys), pad2d(zs), dead_elem


def slab_queue_host_max(
    centers: np.ndarray, elong: np.ndarray, starts: np.ndarray,
    origin: np.ndarray, cell_size: float, dims, window: int,
) -> int:
    """Host-side max total chunk count over ``centers`` (sizes the static
    queue width before the device call).  Mirrors the device queue build
    below (same slab decomposition, same ceil-div)."""
    nx, ny, nz = dims
    c32 = np.asarray(centers, np.float32)
    e32 = np.asarray(elong, np.float32)
    o32 = np.asarray(origin, np.float32)
    cs32 = np.float32(cell_size)
    # f32 arithmetic in the SAME operation order as the device build, so
    # the floors agree bit-for-bit; +1 chunk/cell slack and the device
    # over-flag guard any residual divergence
    base = np.floor((c32 - o32) / cs32).astype(np.int64)
    dx_lo = np.floor((c32[:, 0] - e32[0] - o32[0]) / cs32)
    dx_hi = np.floor((c32[:, 0] + e32[0] - o32[0]) / cs32)
    cy_lo = np.clip(
        np.floor((c32[:, 1] - e32[1] - o32[1]) / cs32), 0, ny - 1
    ).astype(np.int64)
    cy_hi = np.clip(
        np.floor((c32[:, 1] + e32[1] - o32[1]) / cs32), 0, ny - 1
    ).astype(np.int64)
    tot = np.zeros(centers.shape[0], np.int64)
    aligned = window % _ALIGN == 0  # mirror of the device layout rule
    for dx in range(-R_CAP, R_CAP + 1):
        cxc = base[:, 0] + dx
        ok = (
            (cxc >= 0) & (cxc < nx)
            & (cxc >= dx_lo) & (cxc <= dx_hi)
            & (cy_hi >= cy_lo)
        )
        cxs = np.clip(cxc, 0, nx - 1)
        st = starts[(cxs * ny + cy_lo) * nz]
        en = starts[(cxs * ny + cy_hi) * nz + nz]
        ln = np.where(ok, en - st, 0)
        mis = (st.astype(np.int64) % _ALIGN) if aligned else 0
        tot += np.where(ln > 0, -(-(ln + mis) // window), 0)
    return int(tot.max()) + 1 if tot.size else 0


@jax.jit
def _rotated_mounts(quats, mount_vec):
    """[S, L, 3] quat-rotated mount vectors (jitted: the eager vmap was
    ~a hundred relay round-trips per rot level on the remote TPU)."""
    from legmov_tpu.ops import quaternion as _quat

    return jax.vmap(
        lambda qq: jax.vmap(lambda m: _quat.rotate(qq, m))(mount_vec)
    )(quats)


def ball_mask_params(quats, robot: LegDimensions, half, margin: float):
    """Role-mask geometry for :func:`make_csr_cell_eval`'s ``eval``.

    Returns ``(rmounts [S, L, 3], reach_l [L], r_cell scalar)``: the
    quat-rotated leg mount vectors, per-leg reach-ball radii (coxa +
    femur + tibia — every workspace point is within arm's length of the
    mount), and the crossing inflation radius (cell circumradius under
    BOTH crossing branches: the sphere test ``dv2 < h2 + margin`` and
    the box test ``|dv| <= half + margin``) plus the fp32 slack."""
    from legmov_tpu.ops.solve_schedule import robot_geometry

    mount_vec, reach_l = robot_geometry(robot)
    rmounts = _rotated_mounts(
        jnp.asarray(quats), jnp.asarray(mount_vec)
    )  # [S, L, 3]
    h = np.asarray(half, np.float32)
    hm = h + np.float32(margin)
    h2m = float(np.sum(h * h) + np.float32(margin))
    r_cell = np.float32(
        np.sqrt(max(h2m, float(np.sum(hm * hm)))) + _BALL_EPS
    )
    return rmounts, jnp.asarray(reach_l, jnp.float32), r_cell


def make_csr_cell_eval(
    robot: LegDimensions,
    k: int,
    n_quats: int,
    cells: int,
    q_steps: int,
    shared: bool = True,
    window: int = 2048,
    interpret: bool = False,
    chunk_major: bool | None = None,
    audit: bool = False,
    chunk_masks: bool = True,
):
    """Factory: CSR-streaming cell evaluator for one level shape.

    Static shape knobs (one compiled program per distinct tuple):
    ``n_quats`` (orientation samples, e.g. 27 or 1), ``cells`` (padded
    level-chunk size, multiple of 8), ``q_steps`` (padded queue width —
    NOTE the per-mode rule: in chunk-major mode the queue holds CHUNKS
    only, so ``q_steps`` must be a pow2 >= max chunks per cell; in
    quat-major mode (``chunk_major=False``) the queue is
    (quat, chunk)-unrolled, pow2 >= ``n_quats`` * max chunks per cell).

    ``chunk_major=None`` (default) picks the measured per-rule
    production optimum: chunk-major for the SHARED rule (streams every
    window once across all orientations — depth-7 moon solve 324 s vs
    564 s quat-major), quat-major for the PER-LEG rule (the chunk-major
    per-leg form ``kernel_cm_perleg`` carries per-(row, quat) run state
    through an in-kernel fori with dynamic SMEM writes, defeating
    Mosaic's static-grid pipelining — measured 260-271 s vs the
    quat-major 198.5 s, see RESULTS.md r4).  Pass an explicit bool to
    override; quat-major is also the Mosaic-simpler fallback if a
    chunk-major kernel misbehaves on a target (env
    ``LEGMOV_CSR_QUAT_MAJOR=1`` in the hier solver).  Flags are
    identical across the forms.

    Returns ``eval(centers [C,3], parent_valid [C], legtab [S, W],
    elong [3], rmounts [S, L, 3], reach_l [L], r_cell, xs2, ys2, zs2
    (pad_csr_soa), starts, origin, cell_size=, dims=, dead_elem=) ->
    (valid, edge, leaf, over)`` with hier_solver._eval_cells flag
    semantics for the given ``shared`` mode.  ``legtab`` comes from
    :func:`level_tables`; the ball-mask args from
    :func:`ball_mask_params`.

    ``audit=True`` (production kernels unchanged when False) adds
    in-kernel work counters — per cell: [0] chunks DMA'd+evaluated,
    [1] (chunk, quat) item evaluations, [2] per-leg pipeline
    evaluations — and extends the return to ``(valid, edge, leaf,
    over, counts [C, 3] int32)``.  This is the budget attribution the
    r4 verdict asked for on the deep rot level: counters x the known
    per-eval costs say whether wall time is mask-admitted eval work or
    skipped-step overhead.  Supported for the production forms
    (chunk-major shared, quat-major); the non-production chunk-major
    per-leg kernel rejects it.

    ``chunk_masks`` (default on, r5): role bytes computed per CHUNK
    from its own covered cell range (see ``ball_bits`` below) instead
    of inherited from the whole slab; ``False`` restores the r4
    per-slab masks (env ``LEGMOV_CSR_CHUNK_MASKS=0`` in the hier
    solver).  Flags identical either way.
    """
    if window % _LANES:
        raise ValueError(f"window {window} not a multiple of {_LANES}")
    if cells % _ROWS:
        raise ValueError(f"cells {cells} not a multiple of {_ROWS}")
    L = int(jax.tree.leaves(robot)[0].shape[0])
    if L > 6:
        raise ValueError("qinfo packs at most 6 leg bits")
    W = table_width(L)
    S = n_quats
    legs_const = dist_leg_constants(robot)
    head_fn, leg_evals = make_item_parts(legs_const)
    w_fetch = fetch_width(window)
    w_rows = w_fetch // _LANES
    #: aligned chunk layout (r5): see fetch_width
    aligned = window % _ALIGN == 0
    kf = np.float32(k)
    Lk = np.float32(L - k)
    #: chunk-major modes pack each (step, quat) role byte 4-per-word
    WPS = (S + 3) // 4
    #: queue/kernel layout: per-rule optimum unless overridden (per-leg
    #: chunk-major packs 3 L-bit groups per int32 — fine up to the
    #: L <= 6 cap above)
    use_cm = shared if chunk_major is None else chunk_major
    if audit and use_cm and not shared:
        raise ValueError("audit counters: use the quat-major per-leg "
                         "form (chunk_major=False)")
    #: audit counters live in acc slots 4..6 (see docstring)
    ACC_W = 8 if audit else 4

    def kernel(starts_ref, qinfo_ref, cellinfo_ref, legtab_ref,
               xs_ref, ys_ref, zs_ref, o_ref, sx, sy, sz, rc_ref, cc_ref,
               run_ref, acc_ref, sems):
        s = pl.program_id(1)
        n_steps = pl.num_programs(1)

        @pl.when(s == 0)
        def _init():
            # SMEM accepts scalar stores only
            for row in range(_ROWS):
                for j in range(3 * L):
                    run_ref[row, j] = jnp.int32(0)
                for j in range(ACC_W):
                    acc_ref[row, j] = jnp.int32(0)

        def step_flags(row):
            info = qinfo_ref[row, s]
            return (
                (info >> 9) & 1,   # live
                (info >> 8) & 1,   # endq (last chunk of this quat)
                info & 0xFF,       # quat index
                (info >> 10) & 0x3F,  # inflated-ball leg bits
                (info >> 16) & 1,  # V: shared-valid item possible
                (info >> 17) & 1,  # E: edge item possible
            )

        def useful_mask(row, live, infl, vbit, ebit):
            """Scalar: can this chunk still change row's flags, and the
            per-leg evaluation mask.  Skips are exact: V/E/infl are
            supersets of where valid/edge items and per-leg ok/crossed
            candidates can exist, and all accumulators are monotone."""
            if shared:
                pv_i = (cellinfo_ref[row, 3] > 0.5).astype(jnp.int32)
                need_v = (acc_ref[row, 0] & acc_ref[row, 2]) ^ 1
                u = ((vbit | pv_i) & need_v) | (
                    ebit & (acc_ref[row, 1] ^ 1)
                )
                return live & u, infl
            need = jnp.int32(0)
            for l in range(L):
                # leg settled once any-reach AND certain are both seen
                # (possible is implied by certain)
                settled = run_ref[row, l] & run_ref[row, L + l]
                need = need | ((settled ^ 1) << l)
            m = infl & need
            dec = acc_ref[row, 3]
            return live & (dec ^ 1) & (m != 0).astype(jnp.int32), m

        comps = ((xs_ref, sx, 0), (ys_ref, sy, 1), (zs_ref, sz, 2))
        for row in range(_ROWS):
            live, endq, q, infl, vbit, ebit = step_flags(row)
            useful, _ = useful_mask(row, live, infl, vbit, ebit)

            @pl.when(useful != 0)
            def _start(row=row):
                st = starts_ref[row, s]
                for src, dst, ci in comps:
                    pltpu.make_async_copy(
                        src.at[pl.ds(st, w_rows), :], dst.at[row],
                        sems.at[ci, row],
                    ).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        for row in range(_ROWS):
            live, endq, q, infl, vbit, ebit = step_flags(row)
            # identical state to the start loop: each row only mutates
            # its own refs, and only in its own _eval below
            useful, m = useful_mask(row, live, infl, vbit, ebit)

            def anyb(v):
                return (
                    jnp.max(v.astype(jnp.float32)) > 0
                ).astype(jnp.int32)

            @pl.when(useful != 0)
            def _eval(row=row, q=q, m=m):
                st = starts_ref[row, s]
                for src, dst, ci in comps:
                    pltpu.make_async_copy(
                        src.at[pl.ds(st, w_rows), :], dst.at[row],
                        sems.at[ci, row],
                    ).wait()
                if audit:
                    # quat-major: a step IS one (chunk, quat) item
                    acc_ref[row, 4] = acc_ref[row, 4] + 1
                    acc_ref[row, 5] = acc_ref[row, 5] + 1
                pv = cellinfo_ref[row, 3] > 0.5

                def sH(i, _row=row, _q=q):
                    if i in (4, 5, 6):  # cell center = item position
                        return cellinfo_ref[_row, i - 4]
                    if i == 7:  # parent_valid (shared-mode item term)
                        return jnp.where(pv, np.float32(1.0),
                                         np.float32(0.0))
                    return legtab_ref[_q, i]

                pre, vx_, vy_, vz_ = head_fn(
                    sH, sx[row], sy[row], sz[row]
                )

                if shared:
                    rc_ref[row] = jnp.zeros(
                        (w_rows, _LANES), jnp.float32
                    )
                    cc_ref[row] = jnp.zeros(
                        (w_rows, _LANES), jnp.float32
                    )
                    for l, leg_fn in enumerate(leg_evals):
                        # masked-out legs contribute exactly 0: ok
                        # candidates lie in the reach ball (subset of
                        # the inflated ball), crossed in the inflated
                        @pl.when(((m >> l) & 1) != 0)
                        def _leg(l=l, leg_fn=leg_fn):
                            okp, crossed = leg_fn(
                                sH, pre, vx_, vy_, vz_
                            )
                            if audit:
                                acc_ref[row, 6] = acc_ref[row, 6] + 1
                            rc_ref[row] = rc_ref[row] + okp.astype(
                                jnp.float32
                            )
                            cc_ref[row] = cc_ref[row] + crossed.astype(
                                jnp.float32
                            )
                    rc = rc_ref[row]
                    cc = cc_ref[row]
                    iv = ((rc >= kf) | pv) & pre
                    ie = (cc > Lk) & pre
                    acc_ref[row, 0] = acc_ref[row, 0] | anyb(iv)
                    acc_ref[row, 1] = acc_ref[row, 1] | anyb(ie)
                    acc_ref[row, 2] = acc_ref[row, 2] | anyb(iv & ~ie)
                else:
                    for l, leg_fn in enumerate(leg_evals):
                        @pl.when(((m >> l) & 1) != 0)
                        def _leg(l=l, leg_fn=leg_fn):
                            okp, crossed = leg_fn(
                                sH, pre, vx_, vy_, vz_
                            )
                            if audit:
                                acc_ref[row, 6] = acc_ref[row, 6] + 1
                            run_ref[row, l] = run_ref[row, l] | anyb(okp)
                            run_ref[row, L + l] = run_ref[
                                row, L + l
                            ] | anyb(okp & ~crossed)
                            run_ref[row, 2 * L + l] = run_ref[
                                row, 2 * L + l
                            ] | anyb(okp | crossed)

            if not shared:
                # per-quat fold MUST run at quat end even when the
                # chunk itself was skipped (run-bit state is complete:
                # skipped chunks had nothing left to contribute)
                @pl.when(
                    (live != 0) & (endq != 0) & (acc_ref[row, 3] == 0)
                )
                def _finalize(row=row):
                    cnt = nmin = nmax = jnp.int32(0)
                    for l in range(L):
                        cnt = cnt + run_ref[row, l]
                        nmin = nmin + run_ref[row, L + l]
                        nmax = nmax + run_ref[row, 2 * L + l]
                    valid_q = (cnt >= k).astype(jnp.int32)
                    edge_q = ((nmin < k) & (nmax >= k)).astype(
                        jnp.int32
                    )
                    acc_ref[row, 0] = acc_ref[row, 0] | valid_q
                    acc_ref[row, 1] = acc_ref[row, 1] | edge_q
                    # decided: final valid (incl. parent_valid, an
                    # XLA-side OR) and edge both settled -> leaf is
                    # forced false; later quats cannot change flags
                    pv_i = (cellinfo_ref[row, 3] > 0.5).astype(
                        jnp.int32
                    )
                    acc_ref[row, 3] = (
                        acc_ref[row, 0] | pv_i
                    ) & acc_ref[row, 1]
                    for l in range(3 * L):
                        run_ref[row, l] = jnp.int32(0)

        @pl.when(s == n_steps - 1)
        def _emit():
            for row in range(_ROWS):
                out = (
                    (lane == 0).astype(jnp.int32) * acc_ref[row, 0]
                    + (lane == 1).astype(jnp.int32) * acc_ref[row, 1]
                    + (lane == 2).astype(jnp.int32) * acc_ref[row, 2]
                )
                if audit:
                    out = (
                        out
                        + (lane == 3).astype(jnp.int32) * acc_ref[row, 4]
                        + (lane == 4).astype(jnp.int32) * acc_ref[row, 5]
                        + (lane == 5).astype(jnp.int32) * acc_ref[row, 6]
                    )
                o_ref[row : row + 1, :] = out

    def kernel_shared(starts_ref, qinfo_ref, qbits_ref, cellinfo_ref,
                      legtab_ref, xs_ref, ys_ref, zs_ref, o_ref,
                      sx, sy, sz, rc_ref, cc_ref, acc_ref, sems):
        """CHUNK-major shared-mode evaluator: each queue step is one
        candidate window streamed ONCE, with an in-kernel ``fori_loop``
        over the orientation samples — the quat-major form re-DMAs and
        re-steps every window per orientation (S x the steps and S x
        the HBM traffic; measured 172 s of depth-7 fetch at S = 27 on
        the 256x256 moon solve).  Shared mode has no per-quat
        finalization state, so accumulation order across (chunk, quat)
        is free and all early exits survive: a chunk is skipped once
        valid+leaf and edge are settled, a quat inside a chunk is
        skipped unless its build-time role bits (V/E/per-leg balls) say
        it can still change a flag."""
        s = pl.program_id(1)
        n_steps = pl.num_programs(1)

        @pl.when(s == 0)
        def _init():
            for row in range(_ROWS):
                for j in range(ACC_W):
                    acc_ref[row, j] = jnp.int32(0)

        def chunk_useful(row):
            info = qinfo_ref[row, s]
            live = info & 1
            vany = (info >> 1) & 1
            eany = (info >> 2) & 1
            pv_i = (cellinfo_ref[row, 3] > 0.5).astype(jnp.int32)
            need_v = (acc_ref[row, 0] & acc_ref[row, 2]) ^ 1
            need_e = acc_ref[row, 1] ^ 1
            return live & (
                ((vany | pv_i) & need_v) | (eany & need_e)
            )

        comps = ((xs_ref, sx, 0), (ys_ref, sy, 1), (zs_ref, sz, 2))
        for row in range(_ROWS):
            @pl.when(chunk_useful(row) != 0)
            def _start(row=row):
                st = starts_ref[row, s]
                for src, dst, ci in comps:
                    pltpu.make_async_copy(
                        src.at[pl.ds(st, w_rows), :], dst.at[row],
                        sems.at[ci, row],
                    ).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        for row in range(_ROWS):
            def anyb(v):
                return (
                    jnp.max(v.astype(jnp.float32)) > 0
                ).astype(jnp.int32)

            @pl.when(chunk_useful(row) != 0)
            def _eval(row=row, anyb=anyb):
                st = starts_ref[row, s]
                for src, dst, ci in comps:
                    pltpu.make_async_copy(
                        src.at[pl.ds(st, w_rows), :], dst.at[row],
                        sems.at[ci, row],
                    ).wait()
                if audit:
                    acc_ref[row, 4] = acc_ref[row, 4] + 1
                pv = cellinfo_ref[row, 3] > 0.5
                pv_i = (cellinfo_ref[row, 3] > 0.5).astype(jnp.int32)

                def qbody(q, carry, _row=row):
                    word = qbits_ref[_row, s * WPS + q // 4]
                    bits = (word >> (8 * (q % 4))) & 0xFF
                    vbit = (bits >> 6) & 1
                    ebit = (bits >> 7) & 1
                    m = bits & 0x3F
                    need_v = (acc_ref[_row, 0] & acc_ref[_row, 2]) ^ 1
                    uq = ((vbit | pv_i) & need_v) | (
                        ebit & (acc_ref[_row, 1] ^ 1)
                    )

                    @pl.when(uq != 0)
                    def _q(q=q, m=m):
                        if audit:
                            acc_ref[_row, 5] = acc_ref[_row, 5] + 1

                        def sH(i, _q=q):
                            if i in (4, 5, 6):
                                return cellinfo_ref[_row, i - 4]
                            if i == 7:
                                return jnp.where(pv, np.float32(1.0),
                                                 np.float32(0.0))
                            return legtab_ref[_q, i]

                        pre, vx_, vy_, vz_ = head_fn(
                            sH, sx[_row], sy[_row], sz[_row]
                        )
                        rc_ref[_row] = jnp.zeros(
                            (w_rows, _LANES), jnp.float32
                        )
                        cc_ref[_row] = jnp.zeros(
                            (w_rows, _LANES), jnp.float32
                        )
                        # leg-chain early exit (r5, exact): once edge is
                        # settled a chunk is scanned for VALID/LEAF only,
                        # so legs after l are pointless unless some
                        # candidate can still reach k with every unmasked
                        # leg left (anyb(rc >= k - popcount(m >> l+1))).
                        # A partially chained chunk contributes nothing:
                        # rc is understated so iv is false everywhere (pv
                        # rows never chain — their leaf flag needs full
                        # crossing counts), and acc[1] is already set in
                        # this mode.  Edge-seeking chunks never chain.
                        chain_off = (acc_ref[_row, 1] ^ 1) | pv_i
                        viable = jnp.int32(1)
                        for l, leg_fn in enumerate(leg_evals):
                            @pl.when(
                                (((m >> l) & 1) != 0)
                                & ((chain_off | viable) != 0)
                            )
                            def _leg(l=l, leg_fn=leg_fn):
                                okp, crossed = leg_fn(
                                    sH, pre, vx_, vy_, vz_
                                )
                                if audit:
                                    acc_ref[_row, 6] = (
                                        acc_ref[_row, 6] + 1
                                    )
                                rc_ref[_row] = rc_ref[_row] + okp.astype(
                                    jnp.float32
                                )
                                cc_ref[_row] = cc_ref[_row] + (
                                    crossed.astype(jnp.float32)
                                )
                            if l < L - 1:
                                rem = jnp.int32(0)
                                for j in range(l + 1, L):
                                    rem = rem + ((m >> j) & 1)
                                viable = (
                                    jnp.max(rc_ref[_row])
                                    >= kf - rem.astype(jnp.float32)
                                ).astype(jnp.int32)
                        rc = rc_ref[_row]
                        cc = cc_ref[_row]
                        iv = ((rc >= kf) | pv) & pre
                        ie = (cc > Lk) & pre
                        acc_ref[_row, 0] = acc_ref[_row, 0] | anyb(iv)
                        acc_ref[_row, 1] = acc_ref[_row, 1] | anyb(ie)
                        acc_ref[_row, 2] = acc_ref[_row, 2] | anyb(
                            iv & ~ie
                        )
                    return carry

                jax.lax.fori_loop(0, S, qbody, jnp.int32(0))

        @pl.when(s == n_steps - 1)
        def _emit():
            for row in range(_ROWS):
                out = (
                    (lane == 0).astype(jnp.int32) * acc_ref[row, 0]
                    + (lane == 1).astype(jnp.int32) * acc_ref[row, 1]
                    + (lane == 2).astype(jnp.int32) * acc_ref[row, 2]
                )
                if audit:
                    out = (
                        out
                        + (lane == 3).astype(jnp.int32) * acc_ref[row, 4]
                        + (lane == 4).astype(jnp.int32) * acc_ref[row, 5]
                        + (lane == 5).astype(jnp.int32) * acc_ref[row, 6]
                    )
                o_ref[row : row + 1, :] = out

    def kernel_cm_perleg(starts_ref, qinfo_ref, qbits_ref, cellinfo_ref,
                         legtab_ref, xs_ref, ys_ref, zs_ref, o_ref,
                         sx, sy, sz, run2_ref, acc_ref, sems):
        """CHUNK-major PER-LEG evaluator: each queue step streams one
        candidate window ONCE and folds it into per-(row, quat) run
        bits held in SMEM — the quat-major form re-DMAs every window
        per orientation (S x the HBM traffic, exactly what the shared
        chunk-major kernel eliminated; measured r4: per-leg w1024 only
        reached 198.5 s because of that re-streaming).

        State: ``run2_ref[row, q]`` packs 3 bit-groups of L bits
        (any-ok | certain | possible) per orientation.  ``valid``
        accumulates INCREMENTALLY (any-ok counts are monotone over
        chunks); ``edge`` needs each quat's final nmin/nmax, so it
        folds once at the row's LAST live chunk over all quats.  A
        (chunk, quat, leg) evaluation is skipped when the leg's ball
        misses the slab (build-time infl bits) or the leg is already
        settled for that quat (any-ok AND certain seen — ``possible``
        is implied by certain)."""
        s = pl.program_id(1)
        n_steps = pl.num_programs(1)

        @pl.when(s == 0)
        def _init():
            for row in range(_ROWS):
                for j in range(4):
                    acc_ref[row, j] = jnp.int32(0)
                for q in range(S):
                    run2_ref[row, q] = jnp.int32(0)

        def flags(row):
            info = qinfo_ref[row, s]
            return info & 1, (info >> 1) & 1  # live, last

        comps = ((xs_ref, sx, 0), (ys_ref, sy, 1), (zs_ref, sz, 2))
        for row in range(_ROWS):
            live, _last = flags(row)

            @pl.when(live != 0)
            def _start(row=row):
                st = starts_ref[row, s]
                for src, dst, ci in comps:
                    pltpu.make_async_copy(
                        src.at[pl.ds(st, w_rows), :], dst.at[row],
                        sems.at[ci, row],
                    ).start()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        for row in range(_ROWS):
            live, last = flags(row)

            def anyb(v):
                return (
                    jnp.max(v.astype(jnp.float32)) > 0
                ).astype(jnp.int32)

            @pl.when(live != 0)
            def _eval(row=row, last=last, anyb=anyb):
                st = starts_ref[row, s]
                for src, dst, ci in comps:
                    pltpu.make_async_copy(
                        src.at[pl.ds(st, w_rows), :], dst.at[row],
                        sems.at[ci, row],
                    ).wait()

                def qbody(q, carry, _row=row):
                    word = qbits_ref[_row, s * WPS + q // 4]
                    bits = (word >> (8 * (q % 4))) & 0xFF
                    st8 = run2_ref[_row, q]
                    need = jnp.int32(0)
                    for l in range(L):
                        settled = ((st8 >> l) & 1) & (
                            (st8 >> (L + l)) & 1
                        )
                        need = need | ((settled ^ 1) << l)
                    m = bits & 0x3F & need

                    @pl.when(m != 0)
                    def _q(q=q, m=m):
                        def sH(i, _q=q):
                            if i in (4, 5, 6):
                                return cellinfo_ref[_row, i - 4]
                            if i == 7:  # parent_valid: shared-rule
                                return np.float32(0.0)  # term, unused
                            return legtab_ref[_q, i]

                        pre, vx_, vy_, vz_ = head_fn(
                            sH, sx[_row], sy[_row], sz[_row]
                        )
                        for l, leg_fn in enumerate(leg_evals):
                            @pl.when(((m >> l) & 1) != 0)
                            def _leg(l=l, leg_fn=leg_fn):
                                okp, crossed = leg_fn(
                                    sH, pre, vx_, vy_, vz_
                                )
                                run2_ref[_row, q] = run2_ref[_row, q] | (
                                    (anyb(okp) << l)
                                    | (anyb(okp & ~crossed) << (L + l))
                                    | (anyb(okp | crossed) << (2 * L + l))
                                )
                        # incremental valid: any-ok bits are monotone
                        st2 = run2_ref[_row, q]
                        cnt = jnp.int32(0)
                        for l in range(L):
                            cnt = cnt + ((st2 >> l) & 1)
                        acc_ref[_row, 0] = acc_ref[_row, 0] | (
                            cnt >= k
                        ).astype(jnp.int32)
                    return carry

                jax.lax.fori_loop(0, S, qbody, jnp.int32(0))

                @pl.when(last != 0)
                def _fin(row=row):
                    def fin_q(q, carry):
                        st8 = run2_ref[row, q]
                        cnt = nmin = nmax = jnp.int32(0)
                        for l in range(L):
                            cnt = cnt + ((st8 >> l) & 1)
                            nmin = nmin + ((st8 >> (L + l)) & 1)
                            nmax = nmax + ((st8 >> (2 * L + l)) & 1)
                        acc_ref[row, 0] = acc_ref[row, 0] | (
                            cnt >= k
                        ).astype(jnp.int32)
                        acc_ref[row, 1] = acc_ref[row, 1] | (
                            (nmin < k) & (nmax >= k)
                        ).astype(jnp.int32)
                        return carry

                    jax.lax.fori_loop(0, S, fin_q, jnp.int32(0))

        @pl.when(s == n_steps - 1)
        def _emit():
            for row in range(_ROWS):
                o_ref[row : row + 1, :] = (
                    (lane == 0).astype(jnp.int32) * acc_ref[row, 0]
                    + (lane == 1).astype(jnp.int32) * acc_ref[row, 1]
                )

    @partial(jax.jit, static_argnames=("cell_size", "dims", "dead_elem"))
    def eval_fn(
        centers, parent_valid, legtab, elong, rmounts, reach_l, r_cell,
        xs2, ys2, zs2, starts, origin, cell_size: float, dims: tuple,
        dead_elem: int,
    ):
        C = cells
        nx, ny, nz = dims
        cs = jnp.float32(cell_size)
        base = jnp.floor((centers - origin) / cs).astype(jnp.int32)
        starts_i = jnp.asarray(starts, jnp.int32)  # ball_bits searchsorted

        # per-cell x-slab CSR ranges: for fixed x-cell, (y-range x all z)
        # is one contiguous CSR slice (z-fastest sort)
        dx_lo = jnp.floor(
            (centers[:, 0] - elong[0] - origin[0]) / cs
        ).astype(jnp.int32)
        dx_hi = jnp.floor(
            (centers[:, 0] + elong[0] - origin[0]) / cs
        ).astype(jnp.int32)
        cy_lo = jnp.clip(
            jnp.floor(
                (centers[:, 1] - elong[1] - origin[1]) / cs
            ).astype(jnp.int32), 0, ny - 1,
        )
        cy_hi = jnp.clip(
            jnp.floor(
                (centers[:, 1] + elong[1] - origin[1]) / cs
            ).astype(jnp.int32), 0, ny - 1,
        )

        # role masks per (cell, slab, quat): ball-vs-slab-box tests.
        # ball centers = cell center + quat-rotated mounts [C, S, L, 3];
        # the slab box is the slab's x-cell column over its clamped
        # y-range and the grid's full z-extent (conservative superset
        # of every chunk cut from the slab)
        bc = centers[:, None, None, :] + rmounts[None, :, :, :]
        r_ok2 = (reach_l + _BALL_EPS) ** 2  # [L]
        r_in2 = (reach_l + r_cell) ** 2
        by_lo = origin[1] + cy_lo.astype(jnp.float32) * cs  # [C]
        by_hi = origin[1] + (cy_hi + 1).astype(jnp.float32) * cs
        bz_lo = origin[2]
        bz_hi = origin[2] + jnp.float32(nz) * cs
        cdy = jnp.clip(
            bc[..., 1], by_lo[:, None, None], by_hi[:, None, None]
        ) - bc[..., 1]
        cdz = jnp.clip(bc[..., 2], bz_lo, bz_hi) - bc[..., 2]
        dyz2 = cdy * cdy + cdz * cdz  # [C, S, L]

        sts, lens, bits, bxs = [], [], [], []
        for dx in range(-R_CAP, R_CAP + 1):
            cxc = base[:, 0] + dx
            ok = (
                (cxc >= 0) & (cxc < nx)
                & (cxc >= dx_lo) & (cxc <= dx_hi)
                & (cy_hi >= cy_lo)
            )
            cxs = jnp.clip(cxc, 0, nx - 1)
            st = starts[(cxs * ny + cy_lo) * nz]
            en = starts[(cxs * ny + cy_hi) * nz + nz]
            sts.append(st)
            lens.append(jnp.where(ok, en - st, 0))
            bx_lo = origin[0] + cxs.astype(jnp.float32) * cs  # [C]
            cdx = jnp.clip(
                bc[..., 0], bx_lo[:, None, None],
                (bx_lo + cs)[:, None, None],
            ) - bc[..., 0]
            d2 = cdx * cdx + dyz2  # [C, S, L]
            okhit = d2 <= r_ok2[None, None, :]
            inhit = d2 <= r_in2[None, None, :]
            inflb = jnp.sum(
                inhit.astype(jnp.int32)
                * (1 << jnp.arange(L, dtype=jnp.int32))[None, None, :],
                axis=-1,
            )  # [C, S]
            vb = (
                jnp.sum(okhit.astype(jnp.int32), axis=-1) >= k
            ).astype(jnp.int32)
            eb = (
                jnp.sum(inhit.astype(jnp.int32), axis=-1) > (L - k)
            ).astype(jnp.int32)
            bits.append(inflb | (vb << 6) | (eb << 7))
            bxs.append(bx_lo)
        slab_st = jnp.stack(sts, axis=1)  # [C, 2R+1]
        slab_len = jnp.stack(lens, axis=1)
        slab_bits = jnp.stack(bits, axis=1)  # [C, 2R+1, S]
        slab_bx = jnp.stack(bxs, axis=1)  # [C, 2R+1]
        w32 = jnp.int32(window)
        if aligned:
            # r5 aligned layout: chunks anchor on the DMA start quantum
            # (slab start rounded down to _ALIGN), so every fetch is
            # exactly `window` elements (fetch_width docstring); the
            # anchor misalignment joins the slab length in the count
            mis = slab_st % jnp.int32(_ALIGN)
        else:
            mis = jnp.zeros_like(slab_st)
        chunks = jnp.where(
            slab_len > 0, (slab_len + mis + (w32 - 1)) // w32, 0
        )
        cum = jnp.cumsum(chunks, axis=1)
        tot = cum[:, -1:]  # [C, 1]
        totc = jnp.maximum(tot, 1)

        def inter_bounds(r, m):
            """[C, S, 3] per-axis bounds on any point lying in >= ``m``
            of the L balls ``B(bc_l, r_l)`` at once.

            If x is in >= m balls then per axis at least m intervals
            [c_l - r_l, c_l + r_l] contain x_d, so x_d >= the m-th
            smallest lower endpoint and x_d <= the m-th largest upper
            endpoint.  Exact refutation: a chunk box disjoint from
            these bounds on any axis cannot hold such a point."""
            lo = jnp.sort(bc - r[None, None, :, None], axis=2)
            hi = jnp.sort(bc + r[None, None, :, None], axis=2)
            return lo[:, :, m - 1, :], hi[:, :, L - m, :]

        if shared:
            # shared-valid items need a candidate in >= k reach balls
            # AT ONCE (several_leg_octree.cu:91-116) — the per-ball hit
            # count can't see that; the order-statistics bounds can.
            # Edge items analogously need > L-k crossing legs on ONE
            # candidate (inflated radii) — only binding when k < L.
            v_lo, v_hi = inter_bounds(reach_l + _BALL_EPS, k)
            e_m = L - k + 1
            e_lo, e_hi = (
                inter_bounds(reach_l + r_cell, e_m) if e_m > 1
                else (None, None)
            )

        def ball_bits(slabc_k, within_k, live_k):
            """Per-CHUNK role bytes [C, K, S] (r5, ``chunk_masks``).

            The slab-level masks test balls against the slab's WHOLE
            y-range over the grid's FULL z-extent; every chunk of the
            slab inherits them.  Here each chunk's own covered cell
            range is recovered from its CSR element range (searchsorted
            on the level's starts — z-fastest sort means a chunk's
            covered flat-cell range is contiguous), giving a box as
            narrow as the chunk actually is: y at cell granularity,
            z too when the chunk sits inside one y-column.  Supersets
            shrink, skips grow, flags unchanged (the home-range
            argument in the module docstring is untouched — masks
            bound each chunk's HOME elements; fetch-slack elements are
            neighbors' homes and re-evaluate there)."""
            st_k = jnp.take_along_axis(slab_st, slabc_k, 1)
            ln_k = jnp.take_along_axis(slab_len, slabc_k, 1)
            mis_k = jnp.take_along_axis(mis, slabc_k, 1)
            raw_k = st_k - mis_k + within_k * w32
            e0 = jnp.maximum(raw_k, st_k)
            e1 = jnp.maximum(
                jnp.minimum(raw_k + w32, st_k + ln_k), e0 + 1
            )
            ncell = nx * ny * nz
            f0 = jnp.clip(
                jnp.searchsorted(starts_i, e0, side="right") - 1,
                0, ncell - 1,
            )
            f1 = jnp.clip(
                jnp.searchsorted(starts_i, e1 - 1, side="right") - 1,
                0, ncell - 1,
            )
            y0 = (f0 // nz) % ny
            y1 = (f1 // nz) % ny
            byl = origin[1] + y0.astype(jnp.float32) * cs
            byh = origin[1] + (y1 + 1).astype(jnp.float32) * cs
            same = y0 == y1
            bzl = jnp.where(
                same, origin[2] + (f0 % nz).astype(jnp.float32) * cs,
                bz_lo,
            )
            bzh = jnp.where(
                same,
                origin[2] + ((f1 % nz) + 1).astype(jnp.float32) * cs,
                bz_hi,
            )
            bxl = jnp.take_along_axis(slab_bx, slabc_k, 1)

            def clipd(v, lo, hi):
                # [C, S, L] ball coords vs [C, K] box bounds
                return jnp.clip(
                    v[:, None, :, :], lo[:, :, None, None],
                    hi[:, :, None, None],
                ) - v[:, None, :, :]

            cdx_c = clipd(bc[..., 0], bxl, bxl + cs)
            cdy_c = clipd(bc[..., 1], byl, byh)
            cdz_c = clipd(bc[..., 2], bzl, bzh)
            d2c = cdx_c * cdx_c + cdy_c * cdy_c + cdz_c * cdz_c
            okh = d2c <= r_ok2[None, None, None, :]
            inh = d2c <= r_in2[None, None, None, :]
            iflb = jnp.sum(
                inh.astype(jnp.int32)
                * (1 << jnp.arange(L, dtype=jnp.int32)), axis=-1,
            )  # [C, K, S]
            vbc = (
                jnp.sum(okh.astype(jnp.int32), axis=-1) >= k
            ).astype(jnp.int32)
            ebc = (
                jnp.sum(inh.astype(jnp.int32), axis=-1) > (L - k)
            ).astype(jnp.int32)
            if shared:
                def box_meets(lo_b, hi_b):
                    # [C, S, 3] bounds vs [C, K] chunk box -> [C, K, S]
                    return (
                        ((bxl + cs)[:, :, None] >= lo_b[:, None, :, 0])
                        & (bxl[:, :, None] <= hi_b[:, None, :, 0])
                        & (byh[:, :, None] >= lo_b[:, None, :, 1])
                        & (byl[:, :, None] <= hi_b[:, None, :, 1])
                        & (bzh[:, :, None] >= lo_b[:, None, :, 2])
                        & (bzl[:, :, None] <= hi_b[:, None, :, 2])
                    )

                vbc = vbc * box_meets(v_lo, v_hi).astype(jnp.int32)
                if e_lo is not None:
                    ebc = ebc * box_meets(e_lo, e_hi).astype(jnp.int32)
            return (iflb | (vbc << 6) | (ebc << 7)) * live_k[:, :, None]

        t = jnp.arange(q_steps, dtype=jnp.int32)[None, :]  # [1, Q]
        if use_cm:
            # chunk-major: step == chunk; quats iterate in-kernel
            cidx = jnp.broadcast_to(t, (C, q_steps))
            live = (cidx < tot).astype(jnp.int32)
        else:
            qidx = t // totc  # [C, Q]
            cidx = t - qidx * totc
            live = (t < tot * jnp.int32(S)).astype(jnp.int32)
        slab = jnp.sum(
            (cum[:, None, :] <= cidx[:, :, None]).astype(jnp.int32), -1
        )
        slabc = jnp.minimum(slab, 2 * R_CAP)
        prev = jnp.where(
            slabc > 0,
            jnp.take_along_axis(cum, jnp.maximum(slabc - 1, 0), 1), 0,
        )
        within = cidx - prev
        raw = (
            jnp.take_along_axis(slab_st, slabc, 1)
            - jnp.take_along_axis(mis, slabc, 1)
            + within * w32
        )
        dead = jnp.int32(dead_elem)
        start_rows = (
            jnp.where(live != 0, jnp.clip(raw, 0, dead), dead)
            // _ALIGN
        ) * (_ALIGN // _LANES)
        if use_cm:
            # per-(step, quat) role bytes, 4 packed per int32 word
            if chunk_masks:
                sb = ball_bits(slabc, within, live)  # [C, Q, S]
            else:
                sb = jnp.take_along_axis(
                    slab_bits, slabc[:, :, None], axis=1
                ) * live[:, :, None]  # [C, Q, S]
            vany = jnp.any((sb >> 6) & 1 > 0, axis=-1).astype(jnp.int32)
            eany = jnp.any((sb >> 7) & 1 > 0, axis=-1).astype(jnp.int32)
            sb = jnp.pad(sb, ((0, 0), (0, 0), (0, 4 * WPS - S)))
            sb = sb.reshape(C, q_steps, WPS, 4)
            qbits = (
                sb[..., 0]
                | (sb[..., 1] << 8)
                | (sb[..., 2] << 16)
                | (sb[..., 3] << 24)
            ).reshape(C, q_steps * WPS).astype(jnp.int32)
            if shared:
                qinfo = (
                    live | (vany << 1) | (eany << 2)
                ).astype(jnp.int32)
            else:
                lastb = (
                    (cidx == tot - 1).astype(jnp.int32) * live
                )
                qinfo = (live | (lastb << 1)).astype(jnp.int32)
        else:
            endq = (cidx == tot - 1).astype(jnp.int32)
            qclamp = jnp.minimum(qidx, S - 1)
            if chunk_masks:
                # distinct chunks live on a [C, CH] grid (the quat-major
                # queue unrolls them S-fold); compute per-chunk bytes
                # once, then gather each step's own quat's byte
                CH = max(8, 1 << (max(-(-q_steps // S), 1) - 1)
                         .bit_length())
                tch = jnp.arange(CH, dtype=jnp.int32)[None, :]
                live_ch = (tch < tot).astype(jnp.int32)
                slab_ch = jnp.sum(
                    (cum[:, None, :] <= tch[:, :, None])
                    .astype(jnp.int32), -1,
                )
                slabc_ch = jnp.minimum(slab_ch, 2 * R_CAP)
                prev_ch = jnp.where(
                    slabc_ch > 0,
                    jnp.take_along_axis(
                        cum, jnp.maximum(slabc_ch - 1, 0), 1
                    ), 0,
                )
                bits_ch = ball_bits(
                    slabc_ch, tch - prev_ch, live_ch
                )  # [C, CH, S]
                step_bits = jnp.take_along_axis(
                    bits_ch.reshape(C, CH * S),
                    jnp.clip(cidx, 0, CH - 1) * jnp.int32(S) + qclamp,
                    1,
                )  # [C, Q]
            else:
                step_bits = jnp.take_along_axis(
                    slab_bits.reshape(C, (2 * R_CAP + 1) * S),
                    slabc * jnp.int32(S) + qclamp, 1,
                )  # [C, Q]
            qinfo = (
                qclamp
                | (endq << 8)
                | (live << 9)
                | (live * step_bits) << 10
            ).astype(jnp.int32)

        cellinfo = jnp.concatenate(
            [centers.astype(jnp.float32),
             parent_valid[:, None].astype(jnp.float32)], axis=1,
        )  # [C, 4]

        smem_q = pl.BlockSpec((_ROWS, q_steps), lambda i, s: (i, 0),
                              memory_space=pltpu.SMEM)
        cell_spec = pl.BlockSpec((_ROWS, 4), lambda i, s: (i, 0),
                                 memory_space=pltpu.SMEM)
        tab_spec = pl.BlockSpec((S, W), lambda i, s: (0, 0),
                                memory_space=pltpu.SMEM)
        any_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        win_scratch = [
            pltpu.VMEM((_ROWS, w_rows, _LANES), jnp.float32)
            for _ in range(5)
        ]
        if use_cm:
            cm_in_specs = [
                smem_q,
                smem_q,
                pl.BlockSpec((_ROWS, q_steps * WPS),
                             lambda i, s: (i, 0),
                             memory_space=pltpu.SMEM),
                cell_spec,
                tab_spec,
                *any_specs,
            ]
            if shared:
                cm_kernel = kernel_shared
                cm_scratch = [
                    *win_scratch,  # sx, sy, sz, rc, cc
                    pltpu.SMEM((_ROWS, ACC_W), jnp.int32),
                    pltpu.SemaphoreType.DMA((3, _ROWS)),
                ]
            else:
                cm_kernel = kernel_cm_perleg
                cm_scratch = [
                    *win_scratch[:3],  # sx, sy, sz
                    pltpu.SMEM((_ROWS, S), jnp.int32),  # run2
                    pltpu.SMEM((_ROWS, 4), jnp.int32),
                    pltpu.SemaphoreType.DMA((3, _ROWS)),
                ]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(C // _ROWS, q_steps),
                in_specs=cm_in_specs,
                out_specs=pl.BlockSpec((_ROWS, _LANES),
                                       lambda i, s: (i, 0)),
                scratch_shapes=cm_scratch,
            )
            lanes = pl.pallas_call(
                cm_kernel,
                out_shape=jax.ShapeDtypeStruct((C, _LANES), jnp.int32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(start_rows, qinfo, qbits, cellinfo, legtab, xs2, ys2, zs2)
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(C // _ROWS, q_steps),
                in_specs=[
                    smem_q,
                    smem_q,
                    cell_spec,
                    tab_spec,
                    *any_specs,
                ],
                out_specs=pl.BlockSpec((_ROWS, _LANES),
                                       lambda i, s: (i, 0)),
                scratch_shapes=[
                    *win_scratch,
                    pltpu.SMEM((_ROWS, 3 * L), jnp.int32),
                    pltpu.SMEM((_ROWS, ACC_W), jnp.int32),
                    pltpu.SemaphoreType.DMA((3, _ROWS)),
                ],
            )
            lanes = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((C, _LANES), jnp.int32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(start_rows, qinfo, cellinfo, legtab, xs2, ys2, zs2)

        valid = lanes[:, 0] > 0
        edge = lanes[:, 1] > 0
        if shared:
            leaf = lanes[:, 2] > 0
        else:
            valid = valid | parent_valid
            leaf = valid & jnp.logical_not(edge)
        # queue truncation guard: q_steps must cover the per-cell queue
        # (chunks in chunk-major shared mode, S * chunks quat-major; sized
        # host-side via slab_queue_host_max; this flag catches any
        # residual host/device floor divergence)
        q_need = tot if use_cm else tot * jnp.int32(S)
        over = jnp.any(q_need > jnp.int32(q_steps))
        if audit:
            return valid, edge, leaf, over, lanes[:, 3:6]
        return valid, edge, leaf, over

    return eval_fn


def level_tables(
    quats, half, parent_half, robot: LegDimensions, margin: float,
    reach: float,
):
    """``[S, W]`` per-orientation tables for :func:`make_csr_cell_eval`.

    The leg workspace blocks depend only on the orientation — not the
    cell — so one row per quat serves every cell of the level; the
    kernel reads the cell position/parent-valid from its own SMEM
    operand instead of the table's body/pv lanes (zeroed here).

    Jitted end-to-end (r5): the eager per-quat ``build_workspace``
    trace was hundreds of tiny dispatches, ~75 s of pure relay latency
    per rot level on the remote TPU (the instrumented depth-7 runs'
    unaccounted tail)."""
    S = quats.shape[0]
    return _oriented_tables_jit(
        jnp.zeros((S, 3), jnp.float32), jnp.asarray(quats),
        jnp.zeros((S,), bool), jnp.asarray(half),
        jnp.asarray(parent_half), robot,
        jnp.float32(margin), jnp.float32(reach),
    )


_oriented_tables_jit = jax.jit(oriented_dist_tables)
