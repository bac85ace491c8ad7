"""Multi-device sharding tests on the 8-way virtual CPU mesh.

Validates that the sharded solvers (legmov_tpu.parallel) produce results
identical to the single-device path — the communication layout (pose axis
data-parallel, foothold axis split + psum OR-reduction) must be a pure
refactoring of the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legmov_tpu import get_m2_leg
from legmov_tpu.models.robot import get_m2_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.distance import distance_batch
from legmov_tpu.ops.positionability import positionable
from legmov_tpu.ops.reachability import reachability_batch
from legmov_tpu.parallel import (
    make_mesh,
    sharded_distance,
    sharded_positionable,
    sharded_reachability,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, points_axis=2)


def test_mesh_shape(mesh):
    assert dict(mesh.shape) == {"poses": 4, "points": 2}


def test_sharded_reachability_matches(mesh, rng=np.random.default_rng(7)):
    leg = get_m2_leg()
    pts = jnp.asarray(rng.uniform(-400, 400, (1024, 3)).astype(np.float32))
    got = sharded_reachability(mesh)(pts, leg)
    want = reachability_batch(pts, leg)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_distance_matches(mesh, rng=np.random.default_rng(8)):
    leg = get_m2_leg()
    pts = jnp.asarray(rng.uniform(-400, 400, (1024, 3)).astype(np.float32))
    ok_g, vec_g = sharded_distance(mesh)(pts, leg)
    ok_w, vec_w = distance_batch(pts, leg)
    np.testing.assert_array_equal(np.asarray(ok_g), np.asarray(ok_w))
    np.testing.assert_allclose(
        np.asarray(vec_g), np.asarray(vec_w), rtol=0, atol=0
    )


def test_sharded_positionable_matches(mesh, rng=np.random.default_rng(9)):
    robot = get_m2_robot()
    P, F = 16, 128  # divisible by the mesh axes
    body_pos = jnp.asarray(rng.uniform(-150, 150, (P, 3)).astype(np.float32))
    rpy = rng.uniform(-0.3, 0.3, (P, 3)).astype(np.float32)
    body_quat = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    footholds = jnp.asarray(rng.uniform(-450, 450, (F, 3)).astype(np.float32))

    got = sharded_positionable(mesh, k=3)(body_pos, body_quat, footholds, robot)
    want = positionable(body_pos, body_quat, footholds, robot, k=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_grid_positionable_matches(mesh):
    from legmov_tpu.models.robot import get_moonbot_robot
    from legmov_tpu.ops.grid import (
        build_grid,
        cell_size_for,
        grid_reachable_legs,
        neighbor_offsets,
    )
    from legmov_tpu.parallel.sharding import sharded_grid_positionable
    from legmov_tpu.terrain import flat_grid

    rng = np.random.default_rng(12)
    robot = get_moonbot_robot()
    reach = cell_size_for(robot)
    fh = flat_grid((-1500, 1501), (-1500, 1501), 90.0, z=-130.0)
    g = build_grid(fh, reach / 2)
    offs = jnp.asarray(neighbor_offsets(reach / 2, reach))
    Pn = 64
    body = jnp.asarray(
        (rng.uniform(-1000, 1000, (Pn, 3)) * [1, 1, 0.1]).astype(np.float32)
    )
    rpy = rng.uniform(-0.2, 0.2, (Pn, 3)).astype(np.float32)
    quats = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])

    got = sharded_grid_positionable(mesh, k=3)(body, quats, g, robot, offs)
    _, want = grid_reachable_legs(body, quats, g, robot, k=3, offsets=offs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sharded_csr_positionable_matches(mesh, rng=np.random.default_rng(12)):
    """CSR windowed solver under shard_map (poses sharded, CSR arrays
    replicated) must equal the single-device result."""
    from legmov_tpu.ops.csr_grid import (
        ball_columns,
        build_csr_grid,
        make_csr_solver,
    )
    from legmov_tpu.ops.grid import cell_size_for, neighbor_offsets
    from legmov_tpu.parallel import sharded_csr_positionable
    from legmov_tpu.terrain import flat_grid

    robot = get_m2_robot()
    reach = cell_size_for(robot)
    cell = reach / 2
    fh = flat_grid((-1200, 1201), (-1200, 1201), 90.0, z=-130.0)
    csr = build_csr_grid(fh, cell)
    cols = jnp.asarray(ball_columns(neighbor_offsets(cell, reach)))
    P = 64  # 8 per shard on the (4, 2) mesh
    body = jnp.asarray(
        (rng.uniform(-300, 300, (P, 3)) * [1, 1, 0.3]).astype(np.float32)
    )
    rpy = rng.uniform(-0.2, 0.2, (P, 3)).astype(np.float32)
    quats = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])

    solver = make_csr_solver(robot, window=256, interpret=True)
    args = (csr.xs, csr.ys, csr.zs, csr.starts, csr.origin)
    _, want, _ = solver(
        body, quats, *args, cols, cell_size=csr.cell_size, k=3,
        dims=csr.dims,
    )
    got = sharded_csr_positionable(
        mesh, solver, cols, csr.cell_size, csr.dims, k=3
    )(body, quats, *args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize(
    "shared",
    (True, pytest.param(False, marks=pytest.mark.slow)),
)
def test_sharded_hier_solver_matches(mesh, shared):
    """The hierarchical solver with a mesh (cells data-parallel over all
    8 virtual devices, CSR tables + footholds replicated) must return the
    bit-identical CellRecord as the single-device solve — covering the
    dense XLA evaluator (identity levels) and the CSR-streaming Pallas
    evaluator in interpret mode (rot levels).  One rot level and one
    foothold rule by default: every extra level/rule is another ~90 s
    XLA-CPU compile of the interpret kernel (x2: meshed + single); the
    per-leg rule rides the slow marker.  The fused Pallas fast paths use
    the same sharded_cell_eval wrapper (same specs); their on-mesh
    equality is exercised by the driver dryrun."""
    from legmov_tpu.config import SolverConfig
    from legmov_tpu.models.hier_solver import solve_positionability
    from legmov_tpu.models.robot import get_moonbot_robot

    rng = np.random.default_rng(21)
    fh = rng.uniform(-700, 700, (600, 3)).astype(np.float32)
    fh[:, 2] = rng.uniform(-180, -100, 600)
    robot = get_moonbot_robot()
    cfg = SolverConfig(
        box_center=(0.0, 0.0, 0.0), box_size=(600.0, 600.0, 150.0),
        min_box=(80.0, 80.0, 80.0), max_depth=1, legs_for_stability=2,
        enable_rot_below=200.0, angle_samples=(2, 1, 1),
    )
    a = solve_positionability(
        fh, robot, cfg, chunk=128, cell_batch=64,
        shared_foothold=shared, candidates="csr", use_pallas="off",
        csr_window=128, csr_cell_chunk=64,
    )
    b = solve_positionability(
        fh, robot, cfg, chunk=128, cell_batch=64,
        shared_foothold=shared, candidates="csr", use_pallas="off",
        csr_window=128, csr_cell_chunk=64, mesh=mesh,
    )
    np.testing.assert_array_equal(a.centers, b.centers)
    np.testing.assert_array_equal(a.valid, b.valid)
    np.testing.assert_array_equal(a.edge, b.edge)
    np.testing.assert_array_equal(a.depth, b.depth)


@pytest.mark.slow
def test_sharded_csr_dma_positionable_matches(
    mesh, rng=np.random.default_rng(13)
):
    """The in-kernel DMA streaming solver under shard_map must also be a
    pure refactoring of the single-device result (interpret mode)."""
    from legmov_tpu.ops.csr_grid import (
        ball_columns,
        build_csr_grid,
        make_csr_dma_solver,
    )
    from legmov_tpu.ops.grid import cell_size_for, neighbor_offsets
    from legmov_tpu.parallel import sharded_csr_positionable
    from legmov_tpu.terrain import flat_grid

    robot = get_m2_robot()
    reach = cell_size_for(robot)
    cell = reach / 2
    fh = flat_grid((-1200, 1201), (-1200, 1201), 120.0, z=-130.0)
    csr = build_csr_grid(fh, cell)
    cols = jnp.asarray(ball_columns(neighbor_offsets(cell, reach)))
    P = 64
    body = jnp.asarray(
        (rng.uniform(-300, 300, (P, 3)) * [1, 1, 0.3]).astype(np.float32)
    )
    rpy = rng.uniform(-0.2, 0.2, (P, 3)).astype(np.float32)
    quats = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])

    solver = make_csr_dma_solver(
        robot, window=256, interpret=True, rounds=((2, 1.0), (0, 0.25)),
        super_step=4,
    )
    args = (csr.xs, csr.ys, csr.zs, csr.starts, csr.origin)
    _, want, _ = solver(
        body, quats, *args, cols, cell_size=csr.cell_size, k=3,
        dims=csr.dims,
    )
    got = sharded_csr_positionable(
        mesh, solver, cols, csr.cell_size, csr.dims, k=3
    )(body, quats, *args)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
