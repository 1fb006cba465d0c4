"""Unit tests for quaternion / SE(3) math against closed-form references."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_bundle_adjustment_tpu.ops import lie


def _random_unit_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 3] < 0] *= -1
    return q


def _rotmat_np(q):
    """Reference rotation matrix built from the standard formula."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def test_quat_rotate_matches_matrix():
    q = _random_unit_quats(64)
    v = np.random.default_rng(1).normal(size=(64, 3))
    got = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = np.einsum("nij,nj->ni", _rotmat_np(q), v)
    np.testing.assert_allclose(got, want, atol=1e-13)


def test_quat_mul_associates_with_rotation():
    qa = _random_unit_quats(32, seed=2)
    qb = _random_unit_quats(32, seed=3)
    v = np.random.default_rng(4).normal(size=(32, 3))
    ab = lie.quat_mul(jnp.asarray(qa), jnp.asarray(qb))
    got = np.asarray(lie.quat_rotate(ab, jnp.asarray(v)))
    want = np.asarray(
        lie.quat_rotate(jnp.asarray(qa), lie.quat_rotate(jnp.asarray(qb), jnp.asarray(v)))
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_rotmat_roundtrip():
    q = _random_unit_quats(128, seed=5)
    R = lie.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(lie.rotmat_to_quat(R))
    np.testing.assert_allclose(np.abs(np.sum(q2 * q, axis=-1)), 1.0, atol=1e-12)


def test_rotmat_to_quat_covers_all_branches():
    # rotations near pi about each axis exercise the non-trace branches
    for axis in range(3):
        v = np.zeros(3)
        v[axis] = 1.0
        angle = np.pi - 1e-3
        q = np.concatenate([v * np.sin(angle / 2), [np.cos(angle / 2)]])
        R = _rotmat_np(q)
        q2 = np.asarray(lie.rotmat_to_quat(jnp.asarray(R)[None]))[0]
        assert abs(abs(np.dot(q2, q)) - 1.0) < 1e-10


def test_se3_exp_zero_is_identity():
    q, t = lie.se3_exp(jnp.zeros((4, 6)))
    np.testing.assert_allclose(np.asarray(q), np.tile([0, 0, 0, 1.0], (4, 1)), atol=1e-15)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-15)


def test_se3_exp_pure_rotation():
    # exp of [theta, 0, 0, 0, 0, 0] rotates about x by theta
    theta = 0.3
    xi = jnp.asarray([[theta, 0, 0, 0, 0, 0.0]])
    q, t = lie.se3_exp(xi)
    want = np.array([np.sin(theta / 2), 0, 0, np.cos(theta / 2)])
    np.testing.assert_allclose(np.asarray(q)[0], want, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t)[0], 0.0, atol=1e-15)


def test_se3_exp_matches_matrix_exponential():
    from scipy.linalg import expm

    rng = np.random.default_rng(7)
    xi = rng.normal(size=(8, 6)) * 0.5
    q, t = lie.se3_exp(jnp.asarray(xi))
    R = np.asarray(lie.quat_to_rotmat(q))
    for i in range(8):
        A = np.zeros((4, 4))
        w = xi[i, :3]
        A[:3, :3] = np.array(
            [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
        )
        A[:3, 3] = xi[i, 3:]
        T = expm(A)
        np.testing.assert_allclose(R[i], T[:3, :3], atol=1e-10)
        np.testing.assert_allclose(np.asarray(t)[i], T[:3, 3], atol=1e-10)


def test_se3_exp_taylor_branch_continuity():
    # values just above/below the 1e-5 switch should be nearly identical
    for scale in (0.999e-5, 1.001e-5):
        xi = jnp.asarray([[scale, 0, 0, 1.0, 2.0, 3.0]])
        q, t = lie.se3_exp(xi)
        assert np.all(np.isfinite(np.asarray(q)))
        np.testing.assert_allclose(np.asarray(t)[0], [1, 2, 3], rtol=1e-5)


def test_se3_update_left_composition():
    rng = np.random.default_rng(8)
    q = jnp.asarray(_random_unit_quats(16, seed=9))
    t = jnp.asarray(rng.normal(size=(16, 3)))
    xi = jnp.asarray(rng.normal(size=(16, 6)) * 0.1)
    dq, dt = lie.se3_exp(xi)
    q2, t2 = lie.se3_update_left(dq, dt, q, t)
    # action on a point must equal exp(xi) applied after (q, t)
    v = jnp.asarray(rng.normal(size=(16, 3)))
    got = lie.quat_rotate(q2, v) + t2
    want = lie.quat_rotate(dq, lie.quat_rotate(q, v) + t) + dt
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    # quaternions stay unit with non-negative w
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q2), axis=-1), 1.0, atol=1e-12)
    assert np.all(np.asarray(q2)[:, 3] >= 0)


def test_se3_inverse():
    rng = np.random.default_rng(10)
    q = jnp.asarray(_random_unit_quats(8, seed=11))
    t = jnp.asarray(rng.normal(size=(8, 3)))
    qi, ti = lie.se3_inverse(q, t)
    v = jnp.asarray(rng.normal(size=(8, 3)))
    roundtrip = lie.quat_rotate(qi, lie.quat_rotate(q, v) + t) + ti
    np.testing.assert_allclose(np.asarray(roundtrip), np.asarray(v), atol=1e-12)
