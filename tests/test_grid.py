"""Bucket-grid foothold pruning: must match the dense evaluator exactly."""

import numpy as np
import jax.numpy as jnp

from legmov_tpu.models.robot import get_moonbot_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.grid import build_grid, cell_size_for, grid_reachable_legs
from legmov_tpu.ops.positionability import reachable_legs
from legmov_tpu.ops.quaternion import IDENTITY
from legmov_tpu.terrain import flat_grid


def test_cell_size_covers_reach():
    robot = get_moonbot_robot()
    # moonbot total reach: 181 + 65.5 + 129 + 160
    assert cell_size_for(robot) == np.float32(535.5)


def test_grid_matches_dense_identity(rng):
    robot = get_moonbot_robot()
    fh = flat_grid((-2000, 2001), (-2000, 2001), 80.0, z=-120.0)
    g = build_grid(fh, cell_size_for(robot))
    body = jnp.asarray(
        (rng.uniform(-1500, 1500, (64, 3)) * [1, 1, 0.1]).astype(np.float32)
    )
    quats = jnp.broadcast_to(jnp.asarray(IDENTITY), (64, 4))
    legs_g, quorum = grid_reachable_legs(body, quats, g, robot)
    legs_d = reachable_legs(body, quats, jnp.asarray(fh), robot)
    np.testing.assert_array_equal(np.asarray(legs_g), np.asarray(legs_d))
    np.testing.assert_array_equal(
        np.asarray(quorum),
        np.asarray(legs_d).sum(axis=1) >= 4,
    )


def test_grid_matches_dense_oriented(rng):
    robot = get_moonbot_robot()
    fh = flat_grid((-1200, 1201), (-1200, 1201), 100.0, z=-130.0)
    g = build_grid(fh, cell_size_for(robot))
    P = 32
    body = jnp.asarray(
        (rng.uniform(-800, 800, (P, 3)) * [1, 1, 0.1]).astype(np.float32)
    )
    rpy = rng.uniform(-0.2, 0.2, (P, 3)).astype(np.float32)
    quats = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    legs_g, _ = grid_reachable_legs(body, quats, g, robot)
    legs_d = reachable_legs(body, quats, jnp.asarray(fh), robot)
    np.testing.assert_array_equal(np.asarray(legs_g), np.asarray(legs_d))


def test_poses_outside_grid(rng):
    robot = get_moonbot_robot()
    fh = flat_grid((-500, 501), (-500, 501), 100.0, z=-120.0)
    g = build_grid(fh, cell_size_for(robot))
    body = jnp.asarray([[4000.0, 4000.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    quats = jnp.broadcast_to(jnp.asarray(IDENTITY), (2, 4))
    legs_g, quorum = grid_reachable_legs(body, quats, g, robot)
    assert not np.asarray(legs_g)[0].any()  # far pose: nothing reachable
    assert np.asarray(quorum)[1]  # centered pose: full stance


def test_empty_footholds():
    robot = get_moonbot_robot()
    g = build_grid(np.zeros((0, 3), np.float32), cell_size_for(robot))
    body = jnp.zeros((4, 3), jnp.float32)
    quats = jnp.broadcast_to(jnp.asarray(IDENTITY), (4, 4))
    legs_g, quorum = grid_reachable_legs(body, quats, g, robot)
    assert not np.asarray(legs_g).any()
    assert not np.asarray(quorum).any()


def test_native_bucketing_matches_numpy(rng):
    """Native OpenMP scatter and the NumPy fallback bin identically
    (same counts, same per-cell point multisets)."""
    from legmov_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    pts = rng.uniform(-2000, 2000, (50000, 3)).astype(np.float32)
    origin = pts.min(axis=0)
    cell = 500.0
    dims = tuple(int(d) + 1 for d in np.floor((pts.max(0) - origin) / cell).astype(int))
    tab_n, cnt_n = native.bucket_grid(pts, origin, cell, dims, 1e9)
    lib, tried = native._lib, native._tried
    native._lib, native._tried = None, True  # force the NumPy path
    try:
        tab_p, cnt_p = native.bucket_grid(pts, origin, cell, dims, 1e9)
    finally:
        native._lib, native._tried = lib, tried
    np.testing.assert_array_equal(cnt_n, cnt_p)
    for c in np.nonzero(cnt_n)[0][:50]:
        np.testing.assert_array_equal(
            np.sort(tab_n[c][: cnt_n[c]], axis=0),
            np.sort(tab_p[c][: cnt_p[c]], axis=0),
        )


def test_native_layout_roundtrip(rng):
    from legmov_tpu import native

    pts = rng.uniform(-10, 10, (1000, 3)).astype(np.float32)
    x, y, z = native.aos_to_soa(pts)
    np.testing.assert_array_equal(native.soa_to_aos(x, y, z), pts)


def test_subdivided_grid_matches_dense(rng):
    """Finer cells + sphere-pruned offset ball must still find every
    reachable foothold (completeness of neighbor_offsets)."""
    from legmov_tpu.ops.grid import neighbor_offsets

    robot = get_moonbot_robot()
    reach = cell_size_for(robot)
    fh = flat_grid((-1200, 1201), (-1200, 1201), 90.0, z=-130.0)
    P = 24
    body = jnp.asarray(
        (rng.uniform(-800, 800, (P, 3)) * [1, 1, 0.1]).astype(np.float32)
    )
    quats = jnp.broadcast_to(jnp.asarray(IDENTITY), (P, 4))
    legs_d = reachable_legs(body, quats, jnp.asarray(fh), robot)
    for subdiv in (2, 3):
        cell = reach / subdiv
        g = build_grid(fh, cell)
        offs = jnp.asarray(neighbor_offsets(cell, reach))
        legs_g, _ = grid_reachable_legs(
            body, quats, g, robot, offsets=offs
        )
        np.testing.assert_array_equal(
            np.asarray(legs_g), np.asarray(legs_d), err_msg=f"subdiv={subdiv}"
        )


def test_topk_matches_exhaustive(rng):
    """Top-K nonempty-cell compaction equals the exhaustive offset scan
    when K covers every pose's occupied neighborhood."""
    from legmov_tpu.ops.grid import grid_reachable_legs_topk, neighbor_offsets

    robot = get_moonbot_robot()
    reach = cell_size_for(robot)
    cell = reach / 2
    fh = flat_grid((-1200, 1201), (-1200, 1201), 90.0, z=-130.0)
    g = build_grid(fh, cell)
    offs = jnp.asarray(neighbor_offsets(cell, reach))
    P = 16
    body = jnp.asarray(
        (rng.uniform(-800, 800, (P, 3)) * [1, 1, 0.1]).astype(np.float32)
    )
    quats = jnp.broadcast_to(jnp.asarray(IDENTITY), (P, 4))
    legs_full, quorum_full = grid_reachable_legs(
        body, quats, g, robot, offsets=offs
    )
    legs_tk, quorum_tk, overflow = grid_reachable_legs_topk(
        body, quats, g, robot, offs, top_k=int(offs.shape[0]), k=0
    )
    assert not np.asarray(overflow).any()
    np.testing.assert_array_equal(np.asarray(legs_tk), np.asarray(legs_full))
    np.testing.assert_array_equal(
        np.asarray(quorum_tk), np.asarray(quorum_full)
    )
    # small K on a flat map: overflow must be reported when truncating
    _, _, overflow_small = grid_reachable_legs_topk(
        body, quats, g, robot, offs, top_k=4, k=0
    )
    assert np.asarray(overflow_small).any()


def test_native_csr_grid_matches_fallback():
    """Native OpenMP CSR counting sort vs the NumPy fallback: identical
    prefix offsets and per-cell membership (order within a cell is
    explicitly nondeterministic in the native path)."""
    import legmov_tpu.native as nat

    rng = np.random.default_rng(21)
    pts = rng.uniform(-500, 500, (20000, 3)).astype(np.float32)
    origin = pts.min(axis=0)
    cell = 111.0
    dims = tuple(
        int(d) + 1
        for d in np.floor((pts - origin) / cell).astype(np.int64).max(0)
    )

    def canon(xs, ys, zs, starts):
        segs = []
        for c in range(starts.size - 1):
            seg = np.stack(
                [xs[starts[c]:starts[c + 1]], ys[starts[c]:starts[c + 1]],
                 zs[starts[c]:starts[c + 1]]], -1,
            )
            segs.append(seg[np.lexsort(seg.T)])
        return np.concatenate(segs)

    a = nat.csr_grid(pts, origin, cell, dims)
    lib, tried = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        b = nat.csr_grid(pts, origin, cell, dims)
    finally:
        nat._lib, nat._tried = lib, tried
    np.testing.assert_array_equal(a[3], b[3])
    np.testing.assert_array_equal(canon(*a), canon(*b))


def test_ball_columns_cover_offsets_nearest_first():
    """Column decomposition must cover exactly the offset ball with
    contiguous z-ranges, ordered nearest-first by horizontal distance."""
    from legmov_tpu.ops.csr_grid import ball_columns
    from legmov_tpu.ops.grid import neighbor_offsets

    offs = neighbor_offsets(250.0, 510.0)
    cols = ball_columns(offs)
    covered = {
        (int(i), int(j), int(k))
        for i, j, zlo, zhi in cols
        for k in range(int(zlo), int(zhi) + 1)
    }
    assert covered == {tuple(map(int, o)) for o in offs}
    d2 = [int(i) * int(i) + int(j) * int(j) for i, j, _, _ in cols]
    assert d2 == sorted(d2)
    assert d2[0] == 0  # the pose's own column first
