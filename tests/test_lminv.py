"""Interpret-mode checks of the landmark-inversion kernels (pallas/lminv.py)
against the XLA adjugate oracle (ops/components.py flat_sym3x3_inv /
flat_mv_3x3) they replace on the trial hot path."""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from cuda_bundle_adjustment_tpu.ops.components import (  # noqa: E402
    flat_mv_3x3,
    flat_sym3x3_inv,
)
from cuda_bundle_adjustment_tpu.pallas.lminv import (  # noqa: E402
    lminv_call,
    sym3x3_mv_call,
)
from cuda_bundle_adjustment_tpu.pallas.terms import split_ff  # noqa: E402

DIAG9 = np.zeros(9)
DIAG9[[0, 4, 8]] = 1.0


@pytest.mark.parametrize("lam", [1e-6, 0.37, 1e4])
def test_lminv_matches_adjugate_oracle(lam):
    rng = np.random.default_rng(3)
    La = 512
    G = rng.normal(size=(La, 3, 3))
    H = np.einsum("nij,nkj->nik", G, G) + np.eye(3) * 1e-3
    H9 = H.reshape(La, 9)
    bl = rng.normal(size=(La, 3))
    # padding slots: ZERO blocks (the layout's dummy landmark slots) — the
    # damping must keep them invertible (lam * I)
    H9[::17] = 0.0
    bl[::17] = 0.0
    lm_cm = jnp.asarray(np.concatenate([H9, bl], axis=1).T)

    inv_h, inv_l, y_h, y_l = lminv_call(
        lm_cm, jnp.asarray(lam, jnp.float64), interpret=True
    )
    inv = (np.asarray(inv_h, np.float64) + np.asarray(inv_l, np.float64)).T
    y = (np.asarray(y_h, np.float64) + np.asarray(y_l, np.float64)).T

    ref_inv = np.asarray(flat_sym3x3_inv(jnp.asarray(H9 + lam * DIAG9)))
    ref_y = np.asarray(flat_mv_3x3(jnp.asarray(ref_inv), jnp.asarray(bl)))
    # both paths are ~49-bit float-float; on barely-damped ill-conditioned
    # blocks (cond ~1e4 at lam=1e-6) each carries ~cond * 2^-49 relative
    # error, so they differ by up to ~1e-10 of each other — conditioning
    # noise, not kernel error (same argument as tools/tpu_parity.py [2/4])
    scale = np.abs(ref_inv).max()
    np.testing.assert_allclose(inv, ref_inv, atol=1e-12 * scale, rtol=1e-9)
    np.testing.assert_allclose(
        y, ref_y, atol=1e-12 * (np.abs(ref_y).max() or 1.0), rtol=1e-9
    )
    assert np.all(np.isfinite(inv))


def test_sym3x3_mv_matches_oracle():
    rng = np.random.default_rng(5)
    La = 256
    G = rng.normal(size=(La, 3, 3))
    H9 = (np.einsum("nij,nkj->nik", G, G) + np.eye(3)).reshape(La, 9)
    inv = np.asarray(flat_sym3x3_inv(jnp.asarray(H9)))
    c = rng.normal(size=(3, La))
    i_h, i_l = split_ff(jnp.asarray(inv.T))
    c_h, c_l = split_ff(jnp.asarray(c))
    x_h, x_l = sym3x3_mv_call(i_h, i_l, c_h, c_l, interpret=True)
    x = (np.asarray(x_h, np.float64) + np.asarray(x_l, np.float64)).T
    ref = np.asarray(flat_mv_3x3(jnp.asarray(inv), jnp.asarray(c.T)))
    np.testing.assert_allclose(
        x, ref, atol=1e-12 * (np.abs(ref).max() or 1.0), rtol=1e-11
    )
