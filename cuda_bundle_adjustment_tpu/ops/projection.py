"""Camera projection models and per-edge residuals, batched over edges.

Camera intrinsics travel as a ``[..., 5]`` vector ``[fx, fy, cx, cy, bf]``
(``bf`` = stereo baseline times fx), mirroring the reference's ``Vec5d`` device
layout (/root/reference/src/optimisable_graph.hpp:463-472).

Residual sign conventions follow the reference kernels exactly:

* mono/stereo:  ``e = proj - measurement``
  (/root/reference/src/cuda/cuda_block_solver.cu:1100-1105)
* depth BA:     ``e = measurement - proj``
  (/root/reference/src/cuda/cuda_block_solver.cu:2340-2343)
* point-to-line / point-to-plane: distance residuals
  (/root/reference/src/cuda/cuda_block_solver.cu:353-377, 2403-2445)
"""

from __future__ import annotations

import jax.numpy as jnp

from .lie import quat_rotate, se3_apply


def project_w2c(q: jnp.ndarray, t: jnp.ndarray, Xw: jnp.ndarray) -> jnp.ndarray:
    """World points -> camera frame: ``Xc = R(q) Xw + t``."""
    return quat_rotate(q, Xw) + t


def project_mono(Xc: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection to pixel coordinates ``[..., 2]``."""
    inv_z = 1.0 / Xc[..., 2]
    u = cam[..., 0] * inv_z * Xc[..., 0] + cam[..., 2]
    v = cam[..., 1] * inv_z * Xc[..., 1] + cam[..., 3]
    return jnp.stack([u, v], axis=-1)


def project_stereo(Xc: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """Stereo projection ``[u_left, v, u_right] [..., 3]`` with ``u_r = u - bf/z``."""
    inv_z = 1.0 / Xc[..., 2]
    u = cam[..., 0] * inv_z * Xc[..., 0] + cam[..., 2]
    v = cam[..., 1] * inv_z * Xc[..., 1] + cam[..., 3]
    ur = u - cam[..., 4] * inv_z
    return jnp.stack([u, v, ur], axis=-1)


def project_depth(Xc: jnp.ndarray, cam: jnp.ndarray) -> jnp.ndarray:
    """Inverse-depth projection ``[u, v, 1/z] [..., 3]``."""
    inv_z = 1.0 / Xc[..., 2]
    u = cam[..., 0] * inv_z * Xc[..., 0] + cam[..., 2]
    v = cam[..., 1] * inv_z * Xc[..., 1] + cam[..., 3]
    return jnp.stack([u, v, inv_z], axis=-1)


def residual_mono(
    q: jnp.ndarray, t: jnp.ndarray, Xw: jnp.ndarray, meas: jnp.ndarray, cam: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Monocular residual ``proj(Xc) - meas``; also returns cached ``Xc``."""
    Xc = project_w2c(q, t, Xw)
    return project_mono(Xc, cam) - meas, Xc


def residual_stereo(
    q: jnp.ndarray, t: jnp.ndarray, Xw: jnp.ndarray, meas: jnp.ndarray, cam: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Stereo residual ``proj(Xc) - meas``; also returns cached ``Xc``."""
    Xc = project_w2c(q, t, Xw)
    return project_stereo(Xc, cam) - meas, Xc


def residual_depth(
    q: jnp.ndarray, t: jnp.ndarray, Xw: jnp.ndarray, meas: jnp.ndarray, cam: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Depth-BA residual ``meas - proj(Xc)`` (note the flipped sign vs mono)."""
    Xc = project_w2c(q, t, Xw)
    return meas - project_depth(Xc, cam), Xc


def residual_point_to_plane(
    q: jnp.ndarray,
    t: jnp.ndarray,
    point: jnp.ndarray,
    normal: jnp.ndarray,
    origin_distance: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Point-to-plane signed distance ``n . (T p) - d``; returns ``(e, Pw)``."""
    Pw = se3_apply(q, t, point)
    e = jnp.sum(normal * Pw, axis=-1) - origin_distance
    return e, Pw


def residual_point_to_line(
    q: jnp.ndarray,
    t: jnp.ndarray,
    point: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    length: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Point-to-line distance ``|(Pw-a) x (Pw-b)| / |a-b|`` (LOAM form)."""
    Pw = se3_apply(q, t, point)
    cr = jnp.cross(Pw - a, Pw - b)
    e = jnp.linalg.norm(cr, axis=-1) / length
    return e, Pw
