"""Robust-kernel value and derivative checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from cuda_bundle_adjustment_tpu.ops.robust import (
    RobustKernelType,
    robust_derivative,
    robustify,
)

KINDS = [
    RobustKernelType.NONE,
    RobustKernelType.TUKEY,
    RobustKernelType.CAUCHY,
    RobustKernelType.HUBER,
]


@pytest.mark.parametrize("kind", KINDS)
def test_derivative_matches_finite_difference(kind):
    delta = 2.5
    x = jnp.linspace(0.05, 30.0, 200, dtype=jnp.float64)
    eps = 1e-6
    fd = (robustify(kind, delta, x + eps) - robustify(kind, delta, x - eps)) / (2 * eps)
    got = robust_derivative(kind, delta, x)
    # skip the non-smooth switch points
    d2 = delta * delta
    mask = np.abs(np.asarray(x) - d2) > 1e-3
    np.testing.assert_allclose(
        np.asarray(got)[mask], np.asarray(fd)[mask], rtol=1e-5, atol=1e-7
    )


def test_tukey_values():
    # matches the reference formulas (cuda_block_solver.cu:985-1002)
    delta = 3.0
    d2 = 9.0
    x = jnp.asarray([0.0, 4.5, 9.0, 20.0])
    got = np.asarray(robustify(RobustKernelType.TUKEY, delta, x))
    maxv = d2 / 3
    want = np.array(
        [0.0, maxv * (1 - (1 - 4.5 / d2) ** 3), maxv, maxv]
    )
    np.testing.assert_allclose(got, want, rtol=1e-14)
    got_d = np.asarray(robust_derivative(RobustKernelType.TUKEY, delta, x))
    want_d = np.array([1.0, (1 - 4.5 / d2) ** 2, 0.0, 0.0])
    np.testing.assert_allclose(got_d, want_d, rtol=1e-14)


def test_cauchy_values():
    delta = 2.0
    d2 = 4.0
    x = jnp.asarray([0.0, 1.0, 10.0])
    got = np.asarray(robustify(RobustKernelType.CAUCHY, delta, x))
    want = d2 * np.log(np.asarray(x) / d2 + 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-14)


def test_none_is_identity():
    x = jnp.asarray([0.0, 3.0, 100.0])
    np.testing.assert_array_equal(np.asarray(robustify(0, 1.0, x)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(robust_derivative(0, 1.0, x)), np.ones(3)
    )


def test_huber_continuity():
    delta = 1.5
    d2 = delta * delta
    lo = robustify(RobustKernelType.HUBER, delta, jnp.asarray(d2 - 1e-12))
    hi = robustify(RobustKernelType.HUBER, delta, jnp.asarray(d2 + 1e-12))
    assert abs(float(lo) - float(hi)) < 1e-9
