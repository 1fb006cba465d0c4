"""Robust M-estimator kernels as pure functions of the squared error.

``rho(x)`` rescales the per-edge chi2 value and ``rho'(x)`` rescales the
information weight in the quadratic form, exactly as the reference's device
virtual-function objects do
(/root/reference/src/cuda/cuda_block_solver.cu:972-1027, robust_kernel.h:12-17).
``Huber`` is an addition over the reference (listed in BASELINE.json configs).

Kernels are identified by small ints so a jitted stage can be specialised
per edge set without retracing on the delta value.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class RobustKernelType(enum.IntEnum):
    NONE = 0
    TUKEY = 1
    CAUCHY = 2
    HUBER = 3


def robustify(kind: int, delta: float, x: jnp.ndarray) -> jnp.ndarray:
    """``rho(x)`` applied to squared errors ``x = omega * ||e||^2``."""
    if kind == RobustKernelType.NONE:
        return x
    d2 = delta * delta
    if kind == RobustKernelType.TUKEY:
        maxv = d2 / 3.0
        r = 1.0 - x / d2
        return jnp.where(x <= d2, maxv * (1.0 - r * r * r), maxv)
    if kind == RobustKernelType.CAUCHY:
        return d2 * jnp.log(x / d2 + 1.0)
    if kind == RobustKernelType.HUBER:
        # g2o-style Huber on the squared error: x if |e| <= delta else
        # 2*delta*sqrt(x) - delta^2
        sq = jnp.sqrt(jnp.maximum(x, 0.0))
        return jnp.where(x <= d2, x, 2.0 * delta * sq - d2)
    raise ValueError(f"unknown robust kernel kind {kind}")


def robust_derivative(kind: int, delta: float, x: jnp.ndarray) -> jnp.ndarray:
    """``rho'(x)`` used to scale omega in the quadratic form."""
    if kind == RobustKernelType.NONE:
        return jnp.ones_like(x)
    d2 = delta * delta
    if kind == RobustKernelType.TUKEY:
        r = 1.0 - x / d2
        return jnp.where(x <= d2, r * r, 0.0)
    if kind == RobustKernelType.CAUCHY:
        return 1.0 / (x / d2 + 1.0)
    if kind == RobustKernelType.HUBER:
        sq = jnp.sqrt(jnp.maximum(x, 1e-300))
        return jnp.where(x <= d2, jnp.ones_like(x), delta / sq)
    raise ValueError(f"unknown robust kernel kind {kind}")
