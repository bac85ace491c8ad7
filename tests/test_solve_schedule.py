"""Direct unit tests for the shared early-exit scheduling skeleton
(ops/solve_schedule.py) — the machinery the adaptive dense solver and
both CSR streaming solvers delegate to."""

import jax.numpy as jnp
import numpy as np

from legmov_tpu.ops.solve_schedule import (
    POSE_ROWS,
    make_undecided,
    robot_geometry,
    run_schedule,
    wanted,
)
from legmov_tpu.models.robot import get_m2_robot


def test_undecided_legs_mode():
    und = make_undecided("legs", jnp.int32(2))
    legs = jnp.asarray([[True, False], [True, True], [False, False]])
    # columns: pose 0 has unscanned relevant work for its missing leg,
    # pose 1 is fully found, pose 2's remaining relevance is scanned out
    rel = jnp.asarray(
        [[[False, True]], [[True, True]], [[True, True]]]
    )  # [3, 1, 2]
    scanned = jnp.asarray([[False], [False], [True]])
    out = np.asarray(und(legs, scanned, rel))
    assert out.tolist() == [True, False, False]


def test_undecided_quorum_mode():
    und = make_undecided("quorum", jnp.int32(2))
    legs = jnp.asarray([[True, False, False], [True, False, False],
                        [True, True, False]])
    rel = jnp.zeros((3, 1, 3), bool)
    # pose 0: one more leg possible -> quorum 2 still open
    rel = rel.at[0, 0, 1].set(True)
    # pose 1: nothing left -> quorum impossible, decided
    # pose 2: already at quorum -> decided
    scanned = jnp.zeros((3, 1), bool)
    out = np.asarray(und(legs, scanned, rel))
    assert out.tolist() == [True, False, False]


def test_wanted_masks_scanned_found_and_decided():
    und = make_undecided("legs", jnp.int32(1))
    legs = jnp.asarray([[False], [True]])
    rel = jnp.asarray([[[True], [True]], [[True], [True]]])  # [2, 2, 1]
    scanned = jnp.asarray([[True, False], [False, False]])
    w = np.asarray(wanted(rel, legs, scanned, und))
    # pose 0: column 0 scanned, column 1 wanted; pose 1: found -> nothing
    assert w.tolist() == [[False, True], [False, False]]


def test_run_schedule_compaction_and_overflow():
    """A quota-starved schedule must engage the safety round (overflow
    True) and still converge; an ample schedule reports overflow False."""
    P, C, L = 2 * POSE_ROWS, 4, 1
    rel = jnp.ones((P, C, L), bool)
    per_pose = (jnp.arange(P, dtype=jnp.int32),)

    def make_run_round(budget_log):
        def run_round(pp, rel_, legs_, scanned_, quota):
            (ids,) = pp
            budget_log.append((int(ids.shape[0]), quota))
            # scan `quota` columns per call; a pose finds its leg only
            # once every column is scanned
            A = legs_.shape[0]
            n_scanned = jnp.sum(scanned_, 1)
            newly = jnp.minimum(n_scanned + quota, C)
            scanned_ = (
                jnp.arange(C)[None, :] < newly[:, None]
            )
            legs_ = legs_ | (newly == C)[:, None]
            return legs_, scanned_

        return run_round

    und = make_undecided("legs", jnp.int32(1))

    # ample: one full round covers all C columns -> no safety work
    log = []
    legs, scanned, over = run_schedule(
        ((C, 1.0), (C, 1.0)), per_pose, rel,
        jnp.zeros((P, L), bool), jnp.zeros((P, C), bool),
        und, make_run_round(log),
    )
    assert bool(np.asarray(legs).all()) and not bool(over)

    # starved: round 1 scans 1 column for everyone, round 2 compacts to
    # half the poses (rounded to POSE_ROWS) -> the rest starve until the
    # safety round
    log = []
    legs, scanned, over = run_schedule(
        ((1, 1.0), (1, 0.5), (C, 1.0)), per_pose, rel,
        jnp.zeros((P, L), bool), jnp.zeros((P, C), bool),
        und, make_run_round(log),
    )
    assert bool(np.asarray(legs).all())
    assert bool(over)
    # compacted round saw POSE_ROWS poses, not P
    assert log[1][0] == POSE_ROWS


def test_robot_geometry_shapes():
    mv, rl = robot_geometry(get_m2_robot())
    L = mv.shape[0]
    assert mv.shape == (L, 3) and rl.shape == (L,)
    # mount radius equals the body parameter
    r = np.linalg.norm(mv[:, :2], axis=1)
    body = np.asarray(get_m2_robot().body)
    np.testing.assert_allclose(r, body, rtol=1e-6)


def test_suggest_rounds_scales_with_density():
    from legmov_tpu.ops.csr_grid import (ball_columns, build_csr_grid,
                                         suggest_rounds)

    rng = np.random.default_rng(0)
    cols = ball_columns(
        np.stack(np.meshgrid(*( [np.arange(-1, 2)] * 3 ),
                             indexing="ij"), -1).reshape(-1, 3)
    )
    C = cols.shape[0]

    def grid_at(n):
        pts = rng.uniform(0, 1000, (n, 3)).astype(np.float32)
        return build_csr_grid(pts, 250.0)

    sparse = suggest_rounds(grid_at(2_000), cols, window=256)
    dense = suggest_rounds(grid_at(200_000), cols, window=256)
    # 100x the points in the same extent -> a longer compaction ladder
    assert len(dense) > len(sparse)
    # ladder shape: doubling quotas over halving fractions, small first
    # full-pose round, then a WIDENING ladder of unbounded straggler
    # tails (r4)
    for r in (sparse, dense):
        ladder = [(q, f) for q, f in r if q > 0]
        tails = [(q, f) for q, f in r if q == 0]
        assert tails, "must end with unbounded tail rounds"
        assert r[0][1] == 1.0 and r[0][0] <= 16
        assert all(
            b == 2 * a for (a, _), (b, _) in zip(ladder[:-1], ladder[1:])
        )
        fr = [f for _, f in ladder] + [tails[0][1]]
        assert all(fb == fa / 2 for fa, fb in zip(fr[:-1], fr[1:]))
        assert tails[-1][1] == 0.5
        tail_fr = [f for _, f in tails]
        assert all(fb > fa for fa, fb in zip(tail_fr[:-1], tail_fr[1:]))


def test_suggest_window_tracks_density():
    from legmov_tpu.ops.csr_grid import build_csr_grid, suggest_window

    rng = np.random.default_rng(1)

    def grid_at(n):
        pts = rng.uniform(0, 1000, (n, 3)).astype(np.float32)
        return build_csr_grid(pts, 250.0)

    lo = suggest_window(grid_at(2_000))
    hi = suggest_window(grid_at(500_000))
    assert lo < hi
    for w in (lo, hi):
        assert w % 128 == 0 and 1024 <= w <= 16384
    # clamps apply at the extremes
    assert suggest_window(grid_at(100)) == 1024
