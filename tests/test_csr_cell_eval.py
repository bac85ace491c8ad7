"""CSR-streaming hierarchical cell evaluator exactness (interpret mode).

The streaming evaluator (ops/csr_cell_eval.py) must reproduce the dense
reference evaluator hier_solver._eval_cells bit-for-bit: same ``pre``
box, same fused validity_child item math (shared via
pallas_multileg_dist.make_item_math), per-quat in-kernel finalization
and the early-exit skip must be invisible in the flags.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from legmov_tpu.config import SolverConfig
from legmov_tpu.models.hier_solver import _eval_cells, solve_positionability
from legmov_tpu.models.robot import get_moonbot_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.csr_cell_eval import (
    _ALIGN,
    ball_mask_params,
    level_tables,
    make_csr_cell_eval,
    pad_csr_soa,
    slab_queue_host_max,
)
from legmov_tpu.ops.csr_grid import build_csr_grid


@pytest.mark.parametrize(
    "shared,chunk_major,k",
    (
        # default pair = the two production paths at their production
        # queue widths (chunk-major shared; QUAT-major per-leg — the r4
        # on-chip ladder kept quat-major as the per-leg default).  Each
        # combo is its own ~90 s XLA-CPU compile of the interpret-mode
        # kernel (execution is ~50 ms), so the mirror quorums and the
        # non-default kernel forms ride the slow marker — they re-run
        # once per round via `-m slow`.
        (True, True, 4),
        (False, False, 3),
        pytest.param(True, False, 3, marks=pytest.mark.slow),
        pytest.param(False, True, 3, marks=pytest.mark.slow),
        pytest.param(True, True, 3, marks=pytest.mark.slow),
        pytest.param(True, False, 4, marks=pytest.mark.slow),
        pytest.param(False, True, 4, marks=pytest.mark.slow),
        pytest.param(False, False, 4, marks=pytest.mark.slow),
    ),
)
def test_csr_cell_eval_matches_dense(shared, chunk_major, k):
    """k=3 exercises partial-quorum V/E role masks; k=4 (= leg count)
    is the benchmark case where valid items only exist in the all-ball
    intersection and edge needs any crossing leg."""
    rng = np.random.default_rng(0)
    robot = get_moonbot_robot()  # QUAD_MOUNTS default: L = 4
    reach = 711.0
    # sizes tuned for interpret mode: the cost is (cells/8) * q_steps
    # Python-interpreted grid steps, and q_steps tracks column density —
    # 1,200 footholds + 3 quats + 8 cells keep each combo ~20 s while
    # still covering multi-chunk queues, role-mask skips and both rules
    # (this foursome was 1,142 s of the default suite at the round-3
    # sizes, VERDICT r3 weak #5)
    fh = rng.uniform(-1500, 1500, (1200, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-200, -100, 1200)
    csr = build_csr_grid(fh, 400.0)

    S = 3
    rpy = rng.uniform(-0.3, 0.3, (S, 3)).astype(np.float32)
    quats = np.array(
        quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]), np.float32
    )
    quats[0] = [1, 0, 0, 0]

    C = 8
    centers = rng.uniform(-1200, 1200, (C, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(50, 150, C)
    pv = rng.random(C) < 0.3
    half = np.asarray([40.0, 40.0, 40.0], np.float32)
    parent_half = np.asarray([80.0, 80.0, 80.0], np.float32)
    margin = 16.0
    elong = parent_half + np.float32(reach)

    window = 256
    w_fetch = (-(-window // _ALIGN) + 1) * _ALIGN
    xs2, ys2, zs2, dead = pad_csr_soa(csr.xs, csr.ys, csr.zs, w_fetch)
    maxch = slab_queue_host_max(
        centers, elong, np.asarray(csr.starts), np.asarray(csr.origin),
        csr.cell_size, csr.dims, window,
    )
    # production queue sizing (hier_solver): the shared chunk-major
    # kernel's queue holds chunks only; quat-major queues are
    # (quat, chunk)-unrolled — the default suite must cover the tight
    # width hier_solver actually uses (ADVICE r3)
    q_base = maxch if chunk_major else S * maxch
    q_steps = 1 << (q_base - 1).bit_length()

    ev = make_csr_cell_eval(
        robot, k=k, n_quats=S, cells=C, q_steps=q_steps, shared=shared,
        window=window, interpret=True, chunk_major=chunk_major,
    )
    legtab = level_tables(
        jnp.asarray(quats), jnp.asarray(half), jnp.asarray(parent_half),
        robot, margin, reach,
    )
    rmounts, reach_l, r_cell = ball_mask_params(
        jnp.asarray(quats), robot, half, margin
    )
    v, e, lf, over = ev(
        jnp.asarray(centers), jnp.asarray(pv), legtab, jnp.asarray(elong),
        rmounts, reach_l, r_cell,
        xs2, ys2, zs2, csr.starts, csr.origin, cell_size=csr.cell_size,
        dims=csr.dims, dead_elem=dead,
    )
    vw, ew, lw = _eval_cells(
        jnp.asarray(centers), jnp.asarray(pv), jnp.asarray(half),
        jnp.asarray(parent_half), jnp.asarray(fh), jnp.asarray(quats),
        robot, k=k, margin=margin, reach=reach, chunk=500, use_rot=True,
        shared=shared,
    )
    assert not bool(np.asarray(over))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vw))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(ew))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lw))
    # sanity: the k=3 draw must set some flags (the exactness contract
    # is the dense-path equality above; the k=L draw legitimately has
    # sparse flags — valid needs every leg on one foothold)
    if k == 3:
        assert np.asarray(vw).sum() > 0
        assert np.asarray(ew).sum() > 0


@pytest.mark.parametrize(
    "shared,chunk_major,chunk_masks",
    (
        # the r5 production layout: ALIGN-multiple window -> aligned
        # chunk anchoring (fetch == window, no slack) + per-chunk role
        # masks.  One default case; the per-leg production form and the
        # legacy-mask A/B ride the slow marker.
        (True, True, True),
        pytest.param(False, False, True, marks=pytest.mark.slow),
        pytest.param(True, True, False, marks=pytest.mark.slow),
    ),
)
def test_csr_cell_eval_aligned_window_matches_dense(
    shared, chunk_major, chunk_masks
):
    """window % _ALIGN == 0 switches to the r5 aligned chunk layout
    (anchored starts, misalignment folded into the chunk count, exact
    `window`-element fetches); flags must stay bit-identical to the
    dense path, with multi-chunk slabs actually present."""
    rng = np.random.default_rng(4)
    robot = get_moonbot_robot()
    reach = 711.0
    k = 3
    fh = rng.uniform(-1500, 1500, (12000, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-200, -100, 12000)
    csr = build_csr_grid(fh, 400.0)

    S = 3
    rpy = rng.uniform(-0.3, 0.3, (S, 3)).astype(np.float32)
    quats = np.array(
        quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]), np.float32
    )
    quats[0] = [1, 0, 0, 0]

    C = 8
    centers = rng.uniform(-1200, 1200, (C, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(50, 150, C)
    pv = rng.random(C) < 0.3
    half = np.asarray([40.0, 40.0, 40.0], np.float32)
    parent_half = np.asarray([80.0, 80.0, 80.0], np.float32)
    margin = 16.0
    elong = parent_half + np.float32(reach)

    window = 1024
    assert window % _ALIGN == 0  # the aligned layout under test
    from legmov_tpu.ops.csr_cell_eval import fetch_width

    w_fetch = fetch_width(window)
    assert w_fetch == window
    xs2, ys2, zs2, dead = pad_csr_soa(csr.xs, csr.ys, csr.zs, w_fetch)
    maxch = slab_queue_host_max(
        centers, elong, np.asarray(csr.starts), np.asarray(csr.origin),
        csr.cell_size, csr.dims, window,
    )
    assert maxch > 3  # multi-chunk slabs present (else the draw is weak)
    q_base = maxch if chunk_major else S * maxch
    q_steps = 1 << (q_base - 1).bit_length()

    ev = make_csr_cell_eval(
        robot, k=k, n_quats=S, cells=C, q_steps=q_steps, shared=shared,
        window=window, interpret=True, chunk_major=chunk_major,
        chunk_masks=chunk_masks,
    )
    legtab = level_tables(
        jnp.asarray(quats), jnp.asarray(half), jnp.asarray(parent_half),
        robot, margin, reach,
    )
    rmounts, reach_l, r_cell = ball_mask_params(
        jnp.asarray(quats), robot, half, margin
    )
    v, e, lf, over = ev(
        jnp.asarray(centers), jnp.asarray(pv), legtab, jnp.asarray(elong),
        rmounts, reach_l, r_cell,
        xs2, ys2, zs2, csr.starts, csr.origin, cell_size=csr.cell_size,
        dims=csr.dims, dead_elem=dead,
    )
    vw, ew, lw = _eval_cells(
        jnp.asarray(centers), jnp.asarray(pv), jnp.asarray(half),
        jnp.asarray(parent_half), jnp.asarray(fh), jnp.asarray(quats),
        robot, k=k, margin=margin, reach=reach, chunk=500, use_rot=True,
        shared=shared,
    )
    assert not bool(np.asarray(over))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vw))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(ew))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lw))
    assert np.asarray(vw).sum() > 0
    assert np.asarray(ew).sum() > 0


@pytest.mark.slow
def test_csr_cell_eval_audit_counters_flags_invariant():
    """audit=True must return identical flags plus plausible counters
    (chunks >= 1 evaluated, leg evals >= chunk-quat evals for k=L)."""
    rng = np.random.default_rng(9)
    robot = get_moonbot_robot()
    reach = 711.0
    fh = rng.uniform(-1500, 1500, (1200, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-200, -100, 1200)
    csr = build_csr_grid(fh, 400.0)
    S = 3
    rpy = rng.uniform(-0.3, 0.3, (S, 3)).astype(np.float32)
    quats = np.array(
        quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]), np.float32
    )
    C = 8
    centers = rng.uniform(-1200, 1200, (C, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(50, 150, C)
    pv = np.zeros(C, bool)
    half = np.asarray([40.0, 40.0, 40.0], np.float32)
    parent_half = np.asarray([80.0, 80.0, 80.0], np.float32)
    margin, k = 16.0, 3
    elong = parent_half + np.float32(reach)
    window = 256
    w_fetch = (-(-window // _ALIGN) + 1) * _ALIGN
    xs2, ys2, zs2, dead = pad_csr_soa(csr.xs, csr.ys, csr.zs, w_fetch)
    maxch = slab_queue_host_max(
        centers, elong, np.asarray(csr.starts), np.asarray(csr.origin),
        csr.cell_size, csr.dims, window,
    )
    q_steps = 1 << (maxch - 1).bit_length()
    legtab = level_tables(
        jnp.asarray(quats), jnp.asarray(half), jnp.asarray(parent_half),
        robot, margin, reach,
    )
    rmounts, reach_l, r_cell = ball_mask_params(
        jnp.asarray(quats), robot, half, margin
    )

    def run(audit):
        ev = make_csr_cell_eval(
            robot, k=k, n_quats=S, cells=C, q_steps=q_steps, shared=True,
            window=window, interpret=True, audit=audit,
        )
        return ev(
            jnp.asarray(centers), jnp.asarray(pv), legtab,
            jnp.asarray(elong), rmounts, reach_l, r_cell,
            xs2, ys2, zs2, csr.starts, csr.origin,
            cell_size=csr.cell_size, dims=csr.dims, dead_elem=dead,
        )

    v0, e0, l0, _ = run(False)
    v1, e1, l1, _, counts = run(True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    c = np.asarray(counts)
    assert c.shape == (C, 3)
    assert c.sum(axis=0)[0] > 0  # chunks were evaluated
    assert c.sum(axis=0)[2] >= c.sum(axis=0)[1]  # >=1 leg per item


@pytest.mark.slow
@pytest.mark.parametrize("shared,chunk_major", ((True, True), (False, True)))
def test_csr_cell_eval_hex_matches_dense(shared, chunk_major):
    """L = 6 (hexapod): the maximum leg-bit packing regime — 6 infl
    bits per role byte and the per-leg chunk-major kernel's 3 x 6 =
    18-bit run2 words (the L <= 6 cap).  The default quad tests cannot
    reach those bit positions."""
    from legmov_tpu.models.robot import HEX_MOUNTS

    rng = np.random.default_rng(2)
    robot = get_moonbot_robot(HEX_MOUNTS)
    reach = 711.0
    k = 6
    fh = rng.uniform(-1500, 1500, (1200, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-200, -100, 1200)
    csr = build_csr_grid(fh, 400.0)
    S = 3
    rpy = rng.uniform(-0.3, 0.3, (S, 3)).astype(np.float32)
    quats = np.array(
        quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2]), np.float32
    )
    quats[0] = [1, 0, 0, 0]
    C = 8
    centers = rng.uniform(-1200, 1200, (C, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(50, 150, C)
    pv = rng.random(C) < 0.3
    half = np.asarray([40.0, 40.0, 40.0], np.float32)
    parent_half = np.asarray([80.0, 80.0, 80.0], np.float32)
    margin = 16.0
    elong = parent_half + np.float32(reach)
    window = 256
    w_fetch = (-(-window // _ALIGN) + 1) * _ALIGN
    xs2, ys2, zs2, dead = pad_csr_soa(csr.xs, csr.ys, csr.zs, w_fetch)
    maxch = slab_queue_host_max(
        centers, elong, np.asarray(csr.starts), np.asarray(csr.origin),
        csr.cell_size, csr.dims, window,
    )
    q_base = maxch if chunk_major else S * maxch
    q_steps = 1 << (q_base - 1).bit_length()
    ev = make_csr_cell_eval(
        robot, k=k, n_quats=S, cells=C, q_steps=q_steps, shared=shared,
        window=window, interpret=True, chunk_major=chunk_major,
    )
    legtab = level_tables(
        jnp.asarray(quats), jnp.asarray(half), jnp.asarray(parent_half),
        robot, margin, reach,
    )
    rmounts, reach_l, r_cell = ball_mask_params(
        jnp.asarray(quats), robot, half, margin
    )
    v, e, lf, over = ev(
        jnp.asarray(centers), jnp.asarray(pv), legtab, jnp.asarray(elong),
        rmounts, reach_l, r_cell,
        xs2, ys2, zs2, csr.starts, csr.origin, cell_size=csr.cell_size,
        dims=csr.dims, dead_elem=dead,
    )
    vw, ew, lw = _eval_cells(
        jnp.asarray(centers), jnp.asarray(pv), jnp.asarray(half),
        jnp.asarray(parent_half), jnp.asarray(fh), jnp.asarray(quats),
        robot, k=k, margin=margin, reach=reach, chunk=400, use_rot=True,
        shared=shared,
    )
    assert not bool(np.asarray(over))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vw))
    np.testing.assert_array_equal(np.asarray(e), np.asarray(ew))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lw))


@pytest.mark.slow
@pytest.mark.parametrize("shared", (True, False))
def test_solve_positionability_csr_matches_dense(shared):
    """End-to-end: the whole breadth-first solve with CSR-streaming
    rot levels returns the identical CellRecord as the dense path."""
    rng = np.random.default_rng(7)
    fh = rng.uniform(-700, 700, (800, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-180, -100, 800)
    robot = get_moonbot_robot()
    cfg = SolverConfig(
        box_center=(0.0, 0.0, 0.0), box_size=(600.0, 600.0, 150.0),
        min_box=(80.0, 80.0, 80.0), max_depth=2, legs_for_stability=2,
        enable_rot_below=200.0, angle_samples=(2, 1, 1),
    )
    a = solve_positionability(
        fh, robot, cfg, chunk=128, cell_batch=64, shared_foothold=shared,
        candidates="dense", use_pallas="off",
    )
    b = solve_positionability(
        fh, robot, cfg, chunk=128, cell_batch=64, shared_foothold=shared,
        candidates="csr", use_pallas="off", csr_window=128,
        csr_cell_chunk=32,
    )
    np.testing.assert_array_equal(a.centers, b.centers)
    np.testing.assert_array_equal(a.valid, b.valid)
    np.testing.assert_array_equal(a.edge, b.edge)
    np.testing.assert_array_equal(a.depth, b.depth)
