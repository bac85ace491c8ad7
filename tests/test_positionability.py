"""Multi-leg positionability + collision-pruning tests.

Mirrors the reference's positionability semantics: per (pose, leg) "any
foothold reachable" (several_leg.cu:707-741), quorum count
(several_leg_octree.cu:115-129), and the sphere/cylinder pruning predicates
(collision.cu.h:5-23).
"""

import jax
import jax.numpy as jnp
import numpy as np

from legmov_tpu import forward_kinematics, get_moonbot_leg
from legmov_tpu.models.robot import (
    HEX_MOUNTS,
    QUAD_MOUNTS,
    get_moonbot_robot,
    leg_count,
    make_robot,
)
from legmov_tpu.ops import quaternion as quat
from legmov_tpu.ops.collision import (
    any_in_cylinder,
    any_in_sphere,
    in_cylinder,
    in_sphere,
)
from legmov_tpu.ops.orientation import reachability_oriented
from legmov_tpu.ops.positionability import (
    positionable,
    positionable_batch,
    reachable_leg_counts,
    reachable_legs,
)


def fk_footholds_all_legs(robot, pose=np.zeros(3), n=5):
    """Footholds every leg can reach: FK at joint-box interior per leg."""
    L = leg_count(robot)
    pts = []
    for i in range(L):
        leg = jax.tree.map(lambda x: x[i], robot)
        a = np.float32(0.3)
        tip = forward_kinematics(jnp.array([0.0, -a, a], jnp.float32), leg)
        # FK here is in the azimuth-aligned frame; rotate to world by mount
        ang = float(np.asarray(leg.body_angle))
        c, s = np.cos(ang), np.sin(ang)
        t = np.asarray(tip)
        world = np.array([t[0] * c - t[1] * s, t[0] * s + t[1] * c, t[2]])
        pts.append(world + pose)
    return jnp.asarray(np.stack(pts), jnp.float32)


class TestCollision:
    def test_in_sphere_hand_values(self):
        centers = jnp.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0]], jnp.float32)
        targets = jnp.array([[5.0, 0.0, 0.0], [95.0, 0.0, 3.0]], jnp.float32)
        m = in_sphere(centers, targets, 10.0)
        np.testing.assert_array_equal(
            np.asarray(m), [[True, False], [False, True]]
        )
        np.testing.assert_array_equal(
            np.asarray(any_in_sphere(centers, targets, 10.0)), [True, True]
        )
        # strict < on the squared distance, like the reference
        edge = jnp.array([[10.0, 0.0, 0.0]], jnp.float32)
        assert not bool(any_in_sphere(jnp.zeros((1, 3)), edge, 10.0)[0])

    def test_in_cylinder_hand_values(self):
        centers = jnp.zeros((1, 3), jnp.float32)
        targets = jnp.array(
            [
                [5.0, 0.0, 100.0],   # inside radially, inside z band
                [5.0, 0.0, 300.0],   # above the band
                [5.0, 0.0, -200.0],  # below the band
                [50.0, 50.0, 0.0],   # outside radially
            ],
            jnp.float32,
        )
        m = in_cylinder(centers, targets, 10.0, 250.0, -110.0)
        np.testing.assert_array_equal(
            np.asarray(m)[0], [True, False, False, False]
        )
        assert bool(any_in_cylinder(centers, targets, 10.0, 250.0, -110.0)[0])


class TestRobot:
    def test_stacking(self):
        robot = get_moonbot_robot()
        assert leg_count(robot) == 4
        assert robot.body_angle.shape == (4,)
        np.testing.assert_allclose(
            np.asarray(robot.body_angle), np.float32(QUAD_MOUNTS)
        )

    def test_hexapod(self):
        robot = make_robot(HEX_MOUNTS, get_moonbot_leg)
        assert leg_count(robot) == 6


class TestPositionability:
    def test_all_legs_reachable_at_origin(self):
        robot = get_moonbot_robot()
        footholds = fk_footholds_all_legs(robot)
        pos = jnp.zeros((1, 3), jnp.float32)
        legs = reachable_legs(pos, None, footholds, robot)
        assert legs.shape == (1, 4)
        assert bool(jnp.all(legs))
        assert int(reachable_leg_counts(pos, None, footholds, robot)[0]) == 4
        assert bool(positionable(pos, None, footholds, robot)[0])

    def test_far_pose_unreachable(self):
        robot = get_moonbot_robot()
        footholds = fk_footholds_all_legs(robot)
        pos = jnp.array([[10000.0, 0.0, 0.0]], jnp.float32)
        assert int(reachable_leg_counts(pos, None, footholds, robot)[0]) == 0
        assert not bool(positionable(pos, None, footholds, robot, k=1)[0])

    def test_quorum(self):
        robot = get_moonbot_robot()
        # only the first leg's foothold present
        footholds = fk_footholds_all_legs(robot)[:1]
        pos = jnp.zeros((1, 3), jnp.float32)
        counts = reachable_leg_counts(pos, None, footholds, robot)
        assert int(counts[0]) >= 1
        k = int(counts[0])
        assert bool(positionable(pos, None, footholds, robot, k=k)[0])
        assert not bool(positionable(pos, None, footholds, robot, k=k + 1)[0])

    def test_matches_bruteforce_loop(self, rng):
        """Dense op == per-(pose,leg) python loop over the oriented kernel."""
        robot = get_moonbot_robot()
        P, F = 6, 40
        body_pos = jnp.asarray(
            rng.uniform(-150, 150, (P, 3)).astype(np.float32)
        )
        rpy = rng.uniform(-0.3, 0.3, (P, 3)).astype(np.float32)
        body_quat = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
        footholds = jnp.asarray(
            rng.uniform(-450, 450, (F, 3)).astype(np.float32)
        )

        got = np.asarray(reachable_legs(body_pos, body_quat, footholds, robot))
        L = leg_count(robot)
        want = np.zeros((P, L), bool)
        for p in range(P):
            for l in range(L):
                leg = jax.tree.map(lambda x: x[l], robot)
                r = reachability_oriented(
                    footholds - body_pos[p], leg, body_quat[p]
                )
                want[p, l] = bool(jnp.any(r))
        np.testing.assert_array_equal(got, want)

    def test_chunked_matches_unchunked(self, rng):
        robot = get_moonbot_robot()
        P, F = 10, 30
        body_pos = jnp.asarray(
            rng.uniform(-150, 150, (P, 3)).astype(np.float32)
        )
        rpy = rng.uniform(-0.2, 0.2, (P, 3)).astype(np.float32)
        body_quat = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
        footholds = jnp.asarray(
            rng.uniform(-450, 450, (F, 3)).astype(np.float32)
        )
        a = positionable_batch(body_pos, body_quat, footholds, robot, k=2)
        b = positionable_batch(
            body_pos, body_quat, footholds, robot, k=2, chunk=4
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGravityHeuristic:
    def test_outward_valid_inward_invalid(self):
        """A target outward of the coxa passes; the mirrored inward target
        fails and yields the plane-projection displacement
        (one_leg_global.cu:9-23)."""
        import jax.numpy as jnp
        from legmov_tpu import get_moonbot_leg
        from legmov_tpu.ops.orientation import gravity_check
        from legmov_tpu.ops.quaternion import IDENTITY

        leg = get_moonbot_leg()
        q = jnp.asarray(IDENTITY)
        out_pt = jnp.array([[400.0, 0.0, -100.0]], jnp.float32)
        in_pt = jnp.array([[-400.0, 0.0, -100.0]], jnp.float32)
        v_out, _ = gravity_check(out_pt, leg, q)
        v_in, disp = gravity_check(in_pt, leg, q)
        assert bool(v_out[0]) and not bool(v_in[0])
        # displacement is along the coxa's horizontal outward direction
        d = np.asarray(disp)[0]
        assert d[0] < 0 and abs(d[1]) < 1e-3 and abs(d[2]) < 1e-3

    def test_grav_distance_masks(self):
        import jax.numpy as jnp
        from legmov_tpu import get_moonbot_leg
        from legmov_tpu.ops.orientation import (
            distance_oriented,
            distance_oriented_grav,
        )
        from legmov_tpu.ops.quaternion import IDENTITY

        leg = get_moonbot_leg()
        q = jnp.asarray(IDENTITY)
        pts = jnp.array(
            [[350.0, 0.0, -120.0], [-350.0, 0.0, -120.0]], jnp.float32
        )
        ok_plain, _ = distance_oriented(pts, leg, q)
        ok_grav, vec = distance_oriented_grav(pts, leg, q)
        # outward point unchanged; inward point forced unreachable
        assert bool(ok_grav[0]) == bool(ok_plain[0])
        assert not bool(ok_grav[1])
