"""Hierarchical positionability solver + terrain generator tests."""

import numpy as np
import pytest

from legmov_tpu.config import SolverConfig
from legmov_tpu.models.hier_solver import (
    orientation_samples,
    solve_positionability,
)
from legmov_tpu.models.robot import get_moonbot_robot
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.positionability import reachable_leg_counts
from legmov_tpu.terrain import (
    fractal_noise_2d,
    moon_ground,
    perlin_noise_2d,
    step_map,
)


def ring_footholds(radius=330.0, n=24, z=-120.0):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack(
        [radius * np.cos(ang), radius * np.sin(ang), np.full(n, z)], -1
    ).astype(np.float32)


SMALL_CFG = SolverConfig(
    box_center=(0.0, 0.0, 0.0),
    box_size=(800.0, 800.0, 400.0),
    min_box=(50.0, 50.0, 50.0),
    max_depth=3,
    legs_for_stability=1,
)


class TestOrientationSamples:
    def test_identity_first(self):
        q = orientation_samples(SMALL_CFG)
        assert q.shape == (27, 4)
        np.testing.assert_allclose(q[0], [1, 0, 0, 0], atol=1e-7)

    def test_covers_extremes(self):
        q = orientation_samples(SMALL_CFG)
        rpy = np.asarray(quat.to_rpy(q))
        assert rpy[:, 0].min() == pytest.approx(-np.pi / 4, abs=1e-5)
        assert rpy[:, 0].max() == pytest.approx(np.pi / 4, abs=1e-5)
        assert rpy[:, 1].max() == pytest.approx(np.pi / 8, abs=1e-5)


class TestHierSolver:
    def test_ring_has_valid_cells_near_origin(self):
        robot = get_moonbot_robot()
        fh = ring_footholds()
        res = solve_positionability(fh, robot, SMALL_CFG, chunk=32, cell_batch=64)
        assert res.valid.any()
        # every valid cell center must actually satisfy the quorum at some
        # sampled orientation; spot-check the identity orientation against
        # the dense op for cells valid at depth >= 1
        vc = res.centers[res.valid]
        counts = np.asarray(
            reachable_leg_counts(vc, None, fh, robot)
        )
        # at least one valid cell confirmed by the dense evaluator
        assert (counts >= 1).any()

    def test_empty_footholds_all_invalid(self):
        robot = get_moonbot_robot()
        fh = np.zeros((0, 3), np.float32)
        res = solve_positionability(fh, robot, SMALL_CFG, chunk=32, cell_batch=64)
        assert not res.valid.any()

    def test_per_leg_mode_is_weaker_criterion(self):
        """per-leg foothold mode must accept at least every cell the
        shared-foothold mode accepts (any shared foothold satisfying k legs
        also gives each of those k legs its own foothold)."""
        robot = get_moonbot_robot()
        fh = ring_footholds()
        cfg = SMALL_CFG
        shared = solve_positionability(
            fh, robot, cfg, chunk=32, cell_batch=64, shared_foothold=True
        )
        per_leg = solve_positionability(
            fh, robot, cfg, chunk=32, cell_batch=64, shared_foothold=False
        )
        assert per_leg.valid.sum() >= shared.valid.sum()

    def test_per_leg_quorum_full_quad(self):
        """With k=4 and a surrounding ring, per-leg mode finds stances the
        shared mode cannot (no single foothold is reachable by 4 legs)."""
        robot = get_moonbot_robot()
        fh = ring_footholds(radius=300.0, n=48, z=-100.0)
        cfg = SolverConfig(
            box_center=(0.0, 0.0, 0.0),
            box_size=(400.0, 400.0, 200.0),
            min_box=(50.0, 50.0, 50.0),
            max_depth=2,
            legs_for_stability=4,
        )
        per_leg = solve_positionability(
            fh, robot, cfg, chunk=32, cell_batch=64, shared_foothold=False
        )
        assert per_leg.valid.any()

    def test_per_leg_edge_semantics(self):
        """shared=False must derive its edge flag from the per-leg rule's
        own certainty bands: a cell whose only foothold sits a few mm from
        the leg workspace boundary (boundary crosses the cell) is edge; a
        cell whose foothold is deep inside the workspace is a clean leaf."""
        import jax.numpy as jnp

        from legmov_tpu.models.hier_solver import _eval_cells
        from legmov_tpu.models.leg import forward_kinematics, get_m2_leg
        from legmov_tpu.models.robot import stack_legs
        from legmov_tpu.ops.distance import distance

        leg = get_m2_leg(0.0)
        robot = stack_legs([leg])
        # deep-interior point: the FK sample with the largest distance to
        # the workspace boundary (joint-space midpoints are NOT task-space
        # interior for this leg's absolute-tibia limits)
        rng = np.random.default_rng(3)
        n = 64
        angles = np.stack(
            [
                np.zeros(n, np.float32),
                rng.uniform(float(leg.min_angle_femur),
                            float(leg.max_angle_femur), n),
                rng.uniform(float(leg.min_angle_tibia),
                            float(leg.max_angle_tibia), n),
            ],
            -1,
        ).astype(np.float32)
        pts = np.asarray(forward_kinematics(jnp.asarray(angles), leg))
        ok, vec = distance(jnp.asarray(pts), leg)
        ok = np.asarray(ok)
        dists = np.linalg.norm(np.asarray(vec), axis=-1)
        best = int(np.argmax(np.where(ok, dists, -1.0)))
        p0, v, d = pts[best], np.asarray(vec)[best], float(dists[best])
        assert ok[best] and d > 40.0  # genuinely interior
        # a point 6 mm inside the nearest boundary along the same ray
        p_near = p0 + v * (1.0 - 6.0 / d)

        chunk = 8

        def eval_one(fh_point):
            fh = np.full((chunk, 3), 1e9, np.float32)
            fh[0] = fh_point
            valid, edge, leaf = _eval_cells(
                jnp.zeros((1, 3), jnp.float32),  # cell at the body origin
                jnp.zeros(1, bool),
                jnp.asarray([20.0, 20.0, 20.0], jnp.float32),
                jnp.asarray([40.0, 40.0, 40.0], jnp.float32),
                jnp.asarray(fh),
                jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
                robot,
                k=1,
                margin=0.0,
                reach=2000.0,
                chunk=chunk,
                use_rot=False,
                shared=False,
            )
            return (bool(np.asarray(valid)[0]), bool(np.asarray(edge)[0]),
                    bool(np.asarray(leaf)[0]))

        v_in, e_in, l_in = eval_one(p0)
        assert v_in and not e_in and l_in  # interior: certain valid leaf
        v_nb, e_nb, l_nb = eval_one(p_near)
        # near-boundary: still valid at the center, but the boundary
        # crosses the 20 mm cell so the per-leg quorum is uncertain
        assert v_nb and e_nb and not l_nb

    def test_pallas_fast_path_matches_xla(self):
        """Identity-orientation levels may run the fused Pallas distance
        kernel (make_fast_cell_eval); terminal cells must match the XLA
        path in both foothold modes."""
        robot = get_moonbot_robot()
        fh = ring_footholds()
        cfg = SolverConfig(
            box_center=(0.0, 0.0, 0.0),
            box_size=(800.0, 800.0, 400.0),
            min_box=(100.0, 100.0, 100.0),
            max_depth=2,
            legs_for_stability=1,
        )
        for shared in (True, False):
            a = solve_positionability(
                fh, robot, cfg, chunk=32, cell_batch=64,
                shared_foothold=shared, use_pallas="off",
            )
            b = solve_positionability(
                fh, robot, cfg, chunk=32, cell_batch=64,
                shared_foothold=shared, use_pallas="on",
            )
            np.testing.assert_array_equal(a.centers, b.centers)
            np.testing.assert_array_equal(a.valid, b.valid)
            np.testing.assert_array_equal(a.edge, b.edge)

    def test_refinement_increases_resolution(self):
        robot = get_moonbot_robot()
        fh = ring_footholds()
        res = solve_positionability(fh, robot, SMALL_CFG, chunk=32, cell_batch=64)
        assert res.depth.max() >= 1
        # deeper cells are smaller
        h0 = res.halves[res.depth == 0]
        hd = res.halves[res.depth == res.depth.max()]
        assert hd[:, 0].max() < h0[:, 0].max()


class TestTerrain:
    def test_perlin_shape_and_range(self):
        rng = np.random.default_rng(0)
        n = perlin_noise_2d((64, 64), (8, 8), rng)
        assert n.shape == (64, 64)
        assert np.abs(n).max() <= np.sqrt(2) + 1e-9
        assert n.std() > 0.05

    def test_fractal_octaves(self):
        rng = np.random.default_rng(0)
        n = fractal_noise_2d((64, 64), (4, 4), rng, octaves=3)
        assert n.shape == (64, 64)

    def test_perlin_res_mismatch_raises(self):
        rng = np.random.default_rng(0)
        with pytest.raises(ValueError):
            perlin_noise_2d((65, 64), (8, 8), rng)

    def test_moon_ground(self):
        g = moon_ground()  # default 256x256 (the octaves need 128-divisible)
        assert g.shape == (65536, 3)
        assert g.dtype == np.float32
        # craters dig down, cliff reaches up, saturation bounds z
        assert g[:, 2].min() < -500
        assert g[:, 2].max() <= 1000 + 100  # fine noise can exceed SAT a bit

    def test_step_map_levels(self):
        s = step_map()
        assert set(np.unique(s[:, 2])) == {0.0, 300.0, 600.0, 900.0}

    def test_deterministic(self):
        a = moon_ground(seed=7)
        b = moon_ground(seed=7)
        np.testing.assert_array_equal(a, b)


class TestBatchSubsetPadding:
    def test_non_power_of_two_chunk_drops_no_footholds(self):
        """Batch-local foothold subsetting pads to a power-of-two
        bucket; that bucket must be rounded UP to a chunk multiple or
        the evaluators' n_chunks * chunk truncation silently drops real
        candidates (regression).

        Construction: the batch-local subset is exactly 50 points (48
        unreachable decoys followed by the 2 only-valid footholds) and
        111 far-away points force the subset path (sub < F/2).  With
        chunk=48 the old pad gave next_pow2(50) = 64 -> 64 // 48 = 1
        chunk -> only the 48 decoys evaluated, silently erasing every
        valid cell."""
        decoys = np.stack(
            [np.linspace(-300, 300, 48), np.full(48, 10.0),
             np.full(48, -560.0)], -1,  # inside batch bbox, unreachable
        ).astype(np.float32)
        good = ring_footholds(n=2)  # the only reachable footholds
        far = np.stack(
            [np.full(111, 1e5), np.zeros(111), np.full(111, -120.0)], -1,
        ).astype(np.float32)
        fh = np.concatenate([decoys, good, far])
        robot = get_moonbot_robot()
        a = solve_positionability(fh, robot, SMALL_CFG, chunk=48,
                                  cell_batch=64)
        b = solve_positionability(fh[:50], robot, SMALL_CFG, chunk=48,
                                  cell_batch=64)
        assert a.valid.any()
        np.testing.assert_array_equal(a.valid, b.valid)
        np.testing.assert_array_equal(a.centers, b.centers)
