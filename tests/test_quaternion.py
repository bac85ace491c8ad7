"""Quaternion algebra geometric checks."""

import numpy as np
import jax.numpy as jnp

from legmov_tpu.ops import quaternion as quat

f32 = np.float32


def _rotmat(q):
    w, x, y, z = np.asarray(q, np.float64)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_axis_angle_z90():
    q = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.float32(np.pi / 2))
    v = quat.rotate(q, jnp.array([1.0, 0.0, 0.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_rotate_matches_matrix(rng):
    axes = rng.normal(size=(32, 3)).astype(f32)
    angles = rng.uniform(-np.pi, np.pi, 32).astype(f32)
    vs = rng.normal(size=(32, 3)).astype(f32)
    q = quat.from_axis_angle(jnp.asarray(axes), jnp.asarray(angles))
    got = np.asarray(quat.rotate(q, jnp.asarray(vs)))
    for i in range(32):
        want = _rotmat(np.asarray(q)[i]) @ vs[i]
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_multiply_compose(rng):
    a = quat.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.float32(0.7))
    b = quat.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.float32(-0.4))
    v = jnp.array([1.0, 2.0, 3.0], jnp.float32)
    lhs = quat.rotate(quat.multiply(a, b), v)
    rhs = quat.rotate(a, quat.rotate(b, v))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_invert_roundtrip(rng):
    axes = rng.normal(size=(8, 3)).astype(f32)
    angles = rng.uniform(-np.pi, np.pi, 8).astype(f32)
    q = quat.from_axis_angle(jnp.asarray(axes), jnp.asarray(angles))
    v = rng.normal(size=(8, 3)).astype(f32)
    back = quat.inv_rotate(q, quat.rotate(q, jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(back), v, atol=1e-4)


def test_rpy_roundtrip(rng):
    rpy = rng.uniform(-0.8, 0.8, size=(16, 3)).astype(f32)
    q = quat.from_rpy(rpy[:, 0], rpy[:, 1], rpy[:, 2])
    back = np.asarray(quat.to_rpy(q))
    np.testing.assert_allclose(back, rpy, atol=1e-4)


def test_pitch_in_frame_identity_frame():
    q = quat.from_rpy(f32(0.0), f32(0.3), f32(0.0))
    p = quat.pitch_in_frame(q, jnp.float32(0.0))
    np.testing.assert_allclose(float(p), 0.3, atol=1e-5)


def test_pitch_in_frame_rotated_leg():
    """A pure world-pitch seen from a leg yawed 90deg is a roll: pitch
    component ~0; a leg yawed 180deg sees it inverted."""
    q = quat.from_rpy(f32(0.0), f32(0.3), f32(0.0))
    p90 = quat.pitch_in_frame(q, jnp.float32(np.pi / 2))
    p180 = quat.pitch_in_frame(q, jnp.float32(np.pi))
    np.testing.assert_allclose(float(p90), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(p180), -0.3, atol=1e-5)
