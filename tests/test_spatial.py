"""Unit tests for ops/spatial.py: quaternion & SE(3) algebra invariants."""
import numpy as np
import jax.numpy as jnp

from roboticsplayroompybullet_tpu.ops import spatial as sp
import pytest

pytestmark = pytest.mark.smoke


def _rand_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return np.asarray(sp.quat_normalize(jnp.asarray(q)))


def test_quat_multiply_identity():
    rng = np.random.default_rng(0)
    q = _rand_quat(rng)
    e = np.asarray(sp.quat_identity())
    np.testing.assert_allclose(np.asarray(sp.quat_multiply(q, e)), q, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.quat_multiply(e, q)), q, atol=1e-6)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = _rand_quat(rng, (8,))
    v = rng.normal(size=(8, 3)).astype(np.float32)
    r1 = np.asarray(sp.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    R = np.asarray(sp.quat_to_matrix(jnp.asarray(q)))
    r2 = np.einsum("bij,bj->bi", R, v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_quat_conjugate_inverts_rotation():
    rng = np.random.default_rng(2)
    q = _rand_quat(rng, (5,))
    v = rng.normal(size=(5, 3)).astype(np.float32)
    out = sp.quat_rotate(sp.quat_conjugate(jnp.asarray(q)),
                         sp.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-5)


def test_matrix_quat_roundtrip():
    rng = np.random.default_rng(3)
    q = _rand_quat(rng, (16,))
    q2 = np.asarray(sp.matrix_to_quat(sp.quat_to_matrix(jnp.asarray(q))))
    # up to global sign
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_euler_roundtrip_pybullet_convention():
    rng = np.random.default_rng(4)
    rpy = rng.uniform(-1.2, 1.2, size=(32, 3)).astype(np.float32)
    q = sp.quat_from_euler(jnp.asarray(rpy))
    rpy2 = np.asarray(sp.quat_to_euler(q))
    np.testing.assert_allclose(rpy2, rpy, atol=1e-5)


def test_euler_known_values():
    # extrinsic-XYZ oracle values (match pybullet.getQuaternionFromEuler)
    q = np.asarray(sp.quat_from_euler(jnp.array([np.pi / 2, 0.0, 0.0])))
    np.testing.assert_allclose(q, [np.sqrt(0.5), 0, 0, np.sqrt(0.5)], atol=1e-6)
    q = np.asarray(sp.quat_from_euler(jnp.array([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(q, [0, 0, np.sqrt(0.5), np.sqrt(0.5)], atol=1e-6)
    # roll then yaw composed in extrinsic order: R = Rz @ Rx
    q = np.asarray(sp.quat_from_euler(jnp.array([np.pi / 2, 0.0, np.pi / 2])))
    np.testing.assert_allclose(q, [0.5, 0.5, 0.5, 0.5], atol=1e-6)


def test_transform_compose_inverse():
    rng = np.random.default_rng(5)
    p = rng.normal(size=3).astype(np.float32)
    q = _rand_quat(rng)
    pi, qi = sp.transform_inverse(jnp.asarray(p), jnp.asarray(q))
    p0, q0 = sp.transform_compose(jnp.asarray(p), jnp.asarray(q), pi, qi)
    np.testing.assert_allclose(np.asarray(p0), np.zeros(3), atol=1e-6)
    np.testing.assert_allclose(abs(np.asarray(q0)[3]), 1.0, atol=1e-6)


def test_quat_integrate_constant_omega():
    q = sp.quat_identity()
    omega = jnp.array([0.0, 0.0, np.pi])  # half-turn/s about z
    for _ in range(10):
        q = sp.quat_integrate(q, omega, 0.1)
    # after 1s: rotation by pi about z
    np.testing.assert_allclose(abs(np.asarray(q)[2]), 1.0, atol=1e-4)


def test_spatial_inertia_point_mass():
    I = np.asarray(sp.spatial_inertia(jnp.float32(2.0), jnp.zeros(3),
                                      jnp.zeros((3, 3))))
    np.testing.assert_allclose(I[3:, 3:], 2.0 * np.eye(3), atol=1e-6)
    np.testing.assert_allclose(I[:3, :3], np.zeros((3, 3)), atol=1e-6)
