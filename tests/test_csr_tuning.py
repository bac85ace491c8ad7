"""Density-aware CSR solver auto-tuning (suggest_window/rounds/zclip).

These helpers pick the product defaults for the CSR solvers
(tools/map_solve_bench.py, cli map); their contracts — power-of-two
window inside the measured clamp range, a schedule ladder whose
cumulative quota covers the estimated worst-case queue, occupancy-gated
z-clipping — are what the on-chip tuning curves in RESULTS.md encode.
"""

import numpy as np
import pytest

from legmov_tpu.ops.csr_grid import (
    _column_occupancy,
    ball_columns,
    build_csr_grid,
    suggest_rounds,
    suggest_window,
    suggest_zclip,
)
from legmov_tpu.ops.grid import neighbor_offsets


def _grid_with_column_depth(depth: int, nx: int = 4, ny: int = 4):
    """CSR grid whose every (x, y) column holds ``depth`` points."""
    cs = 10.0
    pts = []
    for i in range(nx):
        for j in range(ny):
            for k in range(depth):
                pts.append(
                    (i * cs + 1.0, j * cs + 1.0, (k % 3) * cs + 1.0)
                )
    return build_csr_grid(np.asarray(pts, np.float32), cs)


def test_column_occupancy_counts_full_z_extent():
    csr = _grid_with_column_depth(12)
    # every occupied column holds exactly 12 points across its z cells
    assert _column_occupancy(csr, 0.5) == 12.0
    assert _column_occupancy(csr, 0.99) == 12.0


def test_suggest_window_pow2_clamped():
    sparse = _grid_with_column_depth(3)
    dense = _grid_with_column_depth(40)
    lo, hi = 256, 1024
    w_sparse = suggest_window(sparse, lo=lo, hi=hi)
    w_dense = suggest_window(dense, lo=lo, hi=hi)
    for w in (w_sparse, w_dense):
        assert lo <= w <= hi
        assert w & (w - 1) == 0, "window must be a power of two"
    assert w_sparse == lo  # occupancy 3 -> clamped up to lo
    # occupancy scales with density but stays inside the clamp
    big = suggest_window(_grid_with_column_depth(5000), lo=lo, hi=hi)
    assert big == hi


def test_suggest_rounds_ladder_covers_queue():
    csr = _grid_with_column_depth(60)
    cols = ball_columns(neighbor_offsets(10.0, 25.0))
    window = 128
    rounds = suggest_rounds(csr, cols, window)
    # doubling-quota / halving-fraction ladder, then a WIDENING ladder
    # of unbounded tails (r4: a single fixed-fraction tail starved the
    # 65M straggler population into the uncompacted safety round)
    ladder = [(q, f) for q, f in rounds if q > 0]
    tails = [(q, f) for q, f in rounds if q == 0]
    assert tails, "must end with unbounded tail rounds"
    assert len(ladder) + len(tails) == len(rounds)
    quotas = [q for q, _ in ladder]
    fracs = [f for _, f in ladder] + [tails[0][1]]
    for a, b in zip(quotas[:-1], quotas[1:]):
        assert b == 2 * a
    for a, b in zip(fracs[:-1], fracs[1:]):
        assert b == pytest.approx(a / 2)
    assert min(fracs) >= 1.0 / 256.0 - 1e-12
    # tails widen (monotone non-decreasing fractions) and the last
    # covers half the pose batch
    tail_fracs = [f for _, f in tails]
    for a, b in zip(tail_fracs[:-1], tail_fracs[1:]):
        assert b > a
    assert tail_fracs[-1] == pytest.approx(0.5)
    # cumulative scheduled quota + the tail covers the estimated queue:
    # occupancy chunks x ball columns, quantized to the next pow2
    chunks = int(np.ceil(_column_occupancy(csr, 0.90) / window))
    q_est = max(2 * 8, len(cols) * chunks)
    q_est = 1 << int(np.ceil(np.log2(q_est)))
    assert sum(quotas[:-1]) <= q_est  # ladder never over-schedules


def test_suggest_zclip_gates_on_occupancy_vs_window():
    shallow = _grid_with_column_depth(8)
    deep = _grid_with_column_depth(600)
    assert not suggest_zclip(shallow, window=256)
    assert suggest_zclip(deep, window=256)
    # the same deep grid with a window wider than its columns: clip off
    assert not suggest_zclip(deep, window=1024)


def test_device_csr_build_matches_host():
    """build_csr_grid_device (z-only upload + on-device assembly, r5)
    must produce the same grid as the host build: identical dims and
    offsets, identical per-cell point SETS (within-cell order may
    differ from the native counting sort — the solvers' OR/count
    semantics are order-independent), and identical solver results."""
    import jax.numpy as jnp

    from legmov_tpu.models.robot import QUAD_MOUNTS, make_robot
    from legmov_tpu.ops.csr_grid import build_csr_grid_device, make_csr_solver
    from legmov_tpu.ops.grid import cell_size_for
    from legmov_tpu.terrain import moon_ground

    t = moon_ground(shape=(128, 128)).astype(np.float32)
    ny = 128
    xa, ya = t[::ny, 0].copy(), t[:ny, 1].copy()
    cell = 355.0
    a = build_csr_grid(t, cell)
    b = build_csr_grid_device(t[:, 2].copy(), xa, ya, cell)
    assert a.dims == b.dims
    np.testing.assert_array_equal(np.asarray(a.starts), np.asarray(b.starts))
    s = np.asarray(a.starts)
    ax = np.stack([np.asarray(a.xs), np.asarray(a.ys), np.asarray(a.zs)], -1)
    bx = np.stack([np.asarray(b.xs), np.asarray(b.ys), np.asarray(b.zs)], -1)
    for c in range(len(s) - 1):
        assert (sorted(map(tuple, ax[s[c]:s[c + 1]]))
                == sorted(map(tuple, bx[s[c]:s[c + 1]])))

    robot = make_robot(QUAD_MOUNTS)
    reach = cell_size_for(robot)
    cols = jnp.asarray(ball_columns(neighbor_offsets(cell, reach)))
    sv = make_csr_solver(robot, window=256, interpret=True,
                         rounds=((4, 1.0), (0, 0.5)))
    rng = np.random.default_rng(3)
    P = 16
    body = np.stack(
        [rng.uniform(-1500, 1500, P), rng.uniform(-4000, 1000, P),
         rng.uniform(-100, 200, P)], -1,
    ).astype(np.float32)
    quats = np.tile(np.asarray([1, 0, 0, 0], np.float32), (P, 1))

    def run(g):
        legs, quorum, over = sv(
            jnp.asarray(body), jnp.asarray(quats), g.xs, g.ys, g.zs,
            g.starts, g.origin, cols, cell_size=g.cell_size, k=3,
            dims=g.dims,
        )
        return np.asarray(legs), np.asarray(quorum)

    la, qa = run(a)
    lb, qb = run(b)
    np.testing.assert_array_equal(la, lb)
    np.testing.assert_array_equal(qa, qb)
