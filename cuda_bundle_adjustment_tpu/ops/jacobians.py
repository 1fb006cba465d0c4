"""Analytic Jacobians of the measurement models, batched over edges.

The pose parameterisation is the left-multiplicative SE(3) twist
``xi = [omega(3), upsilon(3)]`` (rotation first), matching the update rule in
:mod:`..ops.lie` and g2o's ``VertexSE3Expmap``.

The mono/stereo Jacobian formulas reproduce the reference/g2o convention where
the returned ``JP``/``JL`` equal ``-d(proj)/d(state)``, i.e. the derivative of
the *g2o* residual ``meas - proj``, while the stored residual is
``proj - meas`` (/root/reference/src/cuda/cuda_block_solver.cu:490-578,1100).
The two sign flips cancel everywhere that matters: ``H = J^T J`` is unchanged
and ``b = J^T e`` equals the *negative* gradient, so the solved increment is
applied with ``+``.

The point-to-plane/line Jacobians are the true derivatives of the residual in
the ``[omega, upsilon]`` ordering.  (The reference's ICP Jacobians,
cuda_block_solver.cu:2192-2296, interleave rotation/translation columns and the
line variant reads uninitialised memory; we implement the mathematically
correct versions and verify them against finite differences.)
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import quat_to_rotmat, se3_apply


def jacobians_mono(
    Xc: jnp.ndarray, q: jnp.ndarray, cam: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mono Jacobians: ``JP [..., 2, 6]`` (pose), ``JL [..., 2, 3]`` (landmark)."""
    X, Y, Z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    inv_z = 1.0 / Z
    x = inv_z * X
    y = inv_z * Y
    fu, fv = cam[..., 0], cam[..., 1]
    fu_iz = fu * inv_z
    fv_iz = fv * inv_z

    R = quat_to_rotmat(q)
    zero = jnp.zeros_like(x)

    jl0 = -fu_iz[..., None] * (R[..., 0, :] - x[..., None] * R[..., 2, :])
    jl1 = -fv_iz[..., None] * (R[..., 1, :] - y[..., None] * R[..., 2, :])
    JL = jnp.stack([jl0, jl1], axis=-2)

    jp0 = jnp.stack([fu * x * y, -fu * (1 + x * x), fu * y, -fu_iz, zero, fu_iz * x], axis=-1)
    jp1 = jnp.stack([fv * (1 + y * y), -fv * x * y, -fv * x, zero, -fv_iz, fv_iz * y], axis=-1)
    JP = jnp.stack([jp0, jp1], axis=-2)
    return JP, JL


def jacobians_stereo(
    Xc: jnp.ndarray, q: jnp.ndarray, cam: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stereo Jacobians: ``JP [..., 3, 6]``, ``JL [..., 3, 3]``."""
    X, Y, Z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    inv_z = 1.0 / Z
    inv_zz = inv_z * inv_z
    fu, fv, bf = cam[..., 0], cam[..., 1], cam[..., 4]

    R = quat_to_rotmat(q)
    zero = jnp.zeros_like(X)

    jl0 = (-fu * inv_z)[..., None] * R[..., 0, :] + (fu * X * inv_zz)[..., None] * R[..., 2, :]
    jl1 = (-fv * inv_z)[..., None] * R[..., 1, :] + (fv * Y * inv_zz)[..., None] * R[..., 2, :]
    jl2 = jl0 - (bf * inv_zz)[..., None] * R[..., 2, :]
    JL = jnp.stack([jl0, jl1, jl2], axis=-2)

    jp0 = jnp.stack(
        [
            X * Y * inv_zz * fu,
            -(1 + X * X * inv_zz) * fu,
            Y * inv_z * fu,
            -inv_z * fu,
            zero,
            X * inv_zz * fu,
        ],
        axis=-1,
    )
    jp1 = jnp.stack(
        [
            (1 + Y * Y * inv_zz) * fv,
            -X * Y * inv_zz * fv,
            -X * inv_z * fv,
            zero,
            -inv_z * fv,
            Y * inv_zz * fv,
        ],
        axis=-1,
    )
    jp2 = jnp.stack(
        [
            jp0[..., 0] - bf * Y * inv_zz,
            jp0[..., 1] + bf * X * inv_zz,
            jp0[..., 2],
            jp0[..., 3],
            zero,
            jp0[..., 5] - bf * inv_zz,
        ],
        axis=-1,
    )
    JP = jnp.stack([jp0, jp1, jp2], axis=-2)
    return JP, JL


def jacobians_point_to_plane(
    q: jnp.ndarray, t: jnp.ndarray, point: jnp.ndarray, normal: jnp.ndarray
) -> jnp.ndarray:
    """Point-to-plane pose Jacobian ``[..., 1, 6]``.

    ``e = n . (exp(xi) T p) - d``; at ``xi = 0``:
    ``de/domega = (Pw x n)``, ``de/dupsilon = n`` with ``Pw = T p``.
    """
    Pw = se3_apply(q, t, point)
    j_omega = jnp.cross(Pw, normal)
    return jnp.concatenate([j_omega, normal], axis=-1)[..., None, :]


def jacobians_point_to_line(
    q: jnp.ndarray,
    t: jnp.ndarray,
    point: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    length: jnp.ndarray,
) -> jnp.ndarray:
    """Point-to-line pose Jacobian ``[..., 1, 6]``.

    ``e = |(Pw-a) x (Pw-b)| / L``.  With ``c = (Pw-a) x (Pw-b)`` and
    ``u = c / |c|``: ``dc = dPw x (a - b)``, hence
    ``de/dPw = ((a - b) x u) / L``.  For the left-multiplicative twist
    ``Pw' = Pw + omega x Pw + upsilon``:
    ``de/domega = de_dPw . (omega x Pw)/domega = Pw x de_dPw`` and
    ``de/dupsilon = de_dPw``.
    """
    Pw = se3_apply(q, t, point)
    c = jnp.cross(Pw - a, Pw - b)
    cn = jnp.linalg.norm(c, axis=-1, keepdims=True)
    u = c / jnp.maximum(cn, 1e-12)
    de_dPw = jnp.cross(a - b, u) / length[..., None]
    # e'(omega) = de_dPw . (omega x Pw) = omega . (Pw x de_dPw)
    j_omega = jnp.cross(Pw, de_dPw)
    return jnp.concatenate([j_omega, de_dPw], axis=-1)[..., None, :]
