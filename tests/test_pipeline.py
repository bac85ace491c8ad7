"""Dense body x orientation pipeline tests (multi_rot_estimator semantics)."""

import numpy as np
import jax.numpy as jnp

from legmov_tpu.models.pipeline import (
    full_positionability,
    reach_cylinder_params,
    sweep_orientations,
)
from legmov_tpu.models.robot import get_moonbot_robot
from legmov_tpu.terrain import flat_grid


def test_sweep_shape_and_identity():
    q = sweep_orientations((0, 0, 1), (0, 0, 1), (0, 0, 1))
    assert q.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(q)[0], [1, 0, 0, 0], atol=1e-7)
    q = sweep_orientations()
    assert q.shape == (45, 4)  # 3 x 3 x 5 like several_leg.cu:814-857


def test_reach_cylinder_params():
    import jax

    robot = get_moonbot_robot()
    leg0 = jax.tree.map(lambda x: x[0], robot)
    r, plus, minus = reach_cylinder_params(leg0)
    # moonbot: body 181 + coxa 65.5 + femur 129 + tibia 160 (coxa_pitch 0)
    assert float(r) == np.float32(181 + 65.5 + 129 + 160)
    assert float(minus) == np.float32(-289.0)  # -femur - tibia
    assert float(plus) < float(r)


def test_flat_grid_stance():
    robot = get_moonbot_robot()
    fh = flat_grid((-600, 601), (-600, 601), 100.0, z=-120.0)
    body = np.zeros((1, 3), np.float32)
    res = full_positionability(
        body, fh, robot,
        orientations=sweep_orientations((0, 0, 1), (0, 0, 1), (0, 0, 1)),
        k=4,
    )
    assert res.valid[0, 0]
    assert res.alive[0]


def test_colliding_body_pruned():
    robot = get_moonbot_robot()
    # a foothold right at the body center -> always-colliding sphere fires
    fh = np.array([[10.0, 0.0, 0.0], [400.0, 0.0, -120.0]], np.float32)
    body = np.zeros((1, 3), np.float32)
    res = full_positionability(body, fh, robot, k=1)
    assert not res.alive[0]
    assert not res.valid.any()


def test_far_body_pruned():
    robot = get_moonbot_robot()
    fh = flat_grid((-600, 601), (-600, 601), 100.0, z=-120.0)
    body = np.array([[5000.0, 0.0, 0.0]], np.float32)
    res = full_positionability(body, fh, robot, k=4)
    assert not res.alive[0]
    assert not res.valid.any()


def test_orientation_sweep_superset():
    """A pose valid at identity stays valid for some orientation in the
    sweep (identity-adjacent samples exist)."""
    robot = get_moonbot_robot()
    fh = flat_grid((-600, 601), (-600, 601), 100.0, z=-120.0)
    body = np.zeros((1, 3), np.float32)
    ident = full_positionability(
        body, fh, robot,
        orientations=sweep_orientations((0, 0, 1), (0, 0, 1), (0, 0, 1)),
        k=4,
    )
    sweep = full_positionability(body, fh, robot, k=4)
    if ident.valid.any():
        assert sweep.any_orientation()[0]


def test_multirot_positionable_matches_bruteforce():
    """The far-sentinel early-exit multirot driver must equal a plain OR
    over per-orientation solves (no pose lost or double-counted)."""
    import numpy as np
    import jax.numpy as jnp

    from legmov_tpu.models.pipeline import (multirot_positionable,
                                            sweep_orientations)
    from legmov_tpu.models.robot import QUAD_MOUNTS, make_robot
    from legmov_tpu.ops.csr_grid import (ball_columns, build_csr_grid,
                                         make_csr_solver)
    from legmov_tpu.ops.grid import cell_size_for, neighbor_offsets
    from legmov_tpu.terrain import flat_grid

    robot = make_robot(QUAD_MOUNTS)
    reach = cell_size_for(robot)
    cell = reach / 2
    fh = flat_grid((-900, 901), (-900, 901), 140.0, z=-130.0)
    csr = build_csr_grid(fh, cell)
    cols = jnp.asarray(ball_columns(neighbor_offsets(cell, reach)))
    solver = make_csr_solver(robot, window=256, interpret=True,
                             rounds=((4, 1.0), (0, 0.5)))
    rng = np.random.default_rng(21)
    P = 24
    body = np.stack(
        [rng.uniform(-500, 500, P), rng.uniform(-500, 500, P),
         rng.uniform(-40, 120, P)], -1,
    ).astype(np.float32)

    def solve_fn(b, q):
        _, quorum, _ = solver(
            b, q, csr.xs, csr.ys, csr.zs, csr.starts, csr.origin, cols,
            cell_size=csr.cell_size, k=3, dims=csr.dims,
        )
        return quorum

    # small sweep to keep interpret-mode time down
    ors = sweep_orientations((-0.3, 0.3, 2), (-0.3, 0.3, 2), (0.0, 0.5, 2))
    got, per_round = multirot_positionable(solve_fn, body, ors)

    want = np.zeros(P, bool)
    for r in range(np.asarray(ors).shape[0]):
        q = jnp.asarray(np.tile(np.asarray(ors)[r], (P, 1)))
        want |= np.asarray(solve_fn(jnp.asarray(body), q))

    np.testing.assert_array_equal(got, want)
    assert sum(per_round) == int(want.sum())

    # the packed (orientation-batched) driver must agree too, in fewer
    # rounds than orientations once stragglers batch up
    from legmov_tpu.models.pipeline import multirot_positionable_packed

    got_p, per_round_p = multirot_positionable_packed(solve_fn, body, ors)
    np.testing.assert_array_equal(got_p, want)
    assert sum(per_round_p) == int(want.sum())
    assert len(per_round_p) <= len(per_round)
