"""Finite-difference validation of the analytic measurement Jacobians.

The mono/stereo Jacobians follow the g2o convention ``J = -d(e)/d(x)`` for the
stored residual ``e = proj - meas`` (see ops/jacobians.py); the ICP Jacobians
are the true derivatives of their residuals.  Both are checked against central
differences through the actual residual + update-rule composition, which also
pins the twist ordering ``[omega, upsilon]`` to the SE3 update.
"""

import jax.numpy as jnp
import numpy as np

from cuda_bundle_adjustment_tpu.ops import jacobians as J
from cuda_bundle_adjustment_tpu.ops import lie, projection as proj

EPS = 1e-6


def _setup(n=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 3] < 0] *= -1
    t = rng.normal(size=(n, 3))
    Xw = rng.normal(size=(n, 3)) * 2.0
    # make sure points are in front of the camera
    Xc = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(Xw))) + t
    t[:, 2] += np.maximum(0.0, 3.0 - Xc[:, 2])
    cam = np.tile([520.0, 520.0, 320.0, 240.0, 80.0], (n, 1))
    return map(jnp.asarray, (q, t, Xw, cam))


def _perturb_pose(q, t, xi):
    dq, dt = lie.se3_exp(xi)
    return lie.se3_update_left(dq, dt, q, t)


def _fd_pose_jacobian(residual, q, t, mdim):
    """Central differences of residual(pose) w.r.t. the 6 twist coordinates."""
    n = q.shape[0]
    Jn = np.zeros((n, mdim, 6))
    for k in range(6):
        xi = np.zeros((n, 6))
        xi[:, k] = EPS
        qp, tp = _perturb_pose(q, t, jnp.asarray(xi))
        qm, tm = _perturb_pose(q, t, jnp.asarray(-xi))
        ep = np.asarray(residual(qp, tp)).reshape(n, mdim)
        em = np.asarray(residual(qm, tm)).reshape(n, mdim)
        Jn[:, :, k] = (ep - em) / (2 * EPS)
    return Jn


def _fd_landmark_jacobian(residual, Xw, mdim):
    n = Xw.shape[0]
    Jn = np.zeros((n, mdim, 3))
    for k in range(3):
        d = np.zeros((n, 3))
        d[:, k] = EPS
        ep = np.asarray(residual(Xw + d)).reshape(n, mdim)
        em = np.asarray(residual(Xw - d)).reshape(n, mdim)
        Jn[:, :, k] = (ep - em) / (2 * EPS)
    return Jn


def test_mono_jacobians():
    q, t, Xw, cam = _setup()
    meas = jnp.zeros((q.shape[0], 2))
    e, Xc = proj.residual_mono(q, t, Xw, meas, cam)
    JP, JL = J.jacobians_mono(Xc, q, cam)
    fd_p = _fd_pose_jacobian(
        lambda qq, tt: proj.residual_mono(qq, tt, Xw, meas, cam)[0], q, t, 2
    )
    fd_l = _fd_landmark_jacobian(
        lambda X: proj.residual_mono(q, t, X, meas, cam)[0], Xw, 2
    )
    # g2o convention: analytic J = -d(e)/d(x)
    np.testing.assert_allclose(np.asarray(JP), -fd_p, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(JL), -fd_l, rtol=1e-5, atol=1e-4)


def test_stereo_jacobians():
    q, t, Xw, cam = _setup(seed=1)
    meas = jnp.zeros((q.shape[0], 3))
    e, Xc = proj.residual_stereo(q, t, Xw, meas, cam)
    JP, JL = J.jacobians_stereo(Xc, q, cam)
    fd_p = _fd_pose_jacobian(
        lambda qq, tt: proj.residual_stereo(qq, tt, Xw, meas, cam)[0], q, t, 3
    )
    fd_l = _fd_landmark_jacobian(
        lambda X: proj.residual_stereo(q, t, X, meas, cam)[0], Xw, 3
    )
    np.testing.assert_allclose(np.asarray(JP), -fd_p, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(JL), -fd_l, rtol=1e-5, atol=1e-4)


def test_plane_jacobian():
    rng = np.random.default_rng(3)
    n = 16
    q, t, Xw, _ = _setup(seed=3)
    point = jnp.asarray(rng.normal(size=(n, 3)))
    normal = rng.normal(size=(n, 3))
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    normal = jnp.asarray(normal)
    d = jnp.asarray(rng.normal(size=n))
    JP = J.jacobians_point_to_plane(q, t, point, normal)
    fd = _fd_pose_jacobian(
        lambda qq, tt: proj.residual_point_to_plane(qq, tt, point, normal, d)[0],
        q,
        t,
        1,
    )
    np.testing.assert_allclose(np.asarray(JP), fd, rtol=1e-5, atol=1e-6)


def test_line_jacobian():
    rng = np.random.default_rng(4)
    n = 16
    q, t, _, _ = _setup(seed=4)
    point = jnp.asarray(rng.normal(size=(n, 3)))
    a = jnp.asarray(rng.normal(size=(n, 3)))
    b = jnp.asarray(rng.normal(size=(n, 3)) + 2.0)
    length = jnp.linalg.norm(a - b, axis=-1)
    JP = J.jacobians_point_to_line(q, t, point, a, b, length)
    fd = _fd_pose_jacobian(
        lambda qq, tt: proj.residual_point_to_line(qq, tt, point, a, b, length)[0],
        q,
        t,
        1,
    )
    np.testing.assert_allclose(np.asarray(JP), fd, rtol=1e-4, atol=1e-5)
