"""Banded block Cholesky kernels (pallas/bandchol.py) vs a numpy oracle."""

import numpy as np
import jax.numpy as jnp

from cuda_bundle_adjustment_tpu.pallas.bandchol import band_factor, band_solve


def _random_banded_spd(Pa, bw, SB, rng):
    n = Pa * 6
    A = np.zeros((n, n))
    for c in range(Pa):
        for d in range(min(bw + 1, Pa - c)):
            if d > 0 and rng.random() < 0.3:
                continue  # band holes: the kernel must handle missing blocks
            A[c * 6 : (c + 1) * 6, (c + d) * 6 : (c + d + 1) * 6] = rng.normal(
                size=(6, 6)
            )
    A = A + A.T
    A += np.eye(n) * (np.abs(A).sum(axis=1).max() + 1.0)
    band = np.zeros(((Pa + SB) * SB, 36), np.float32)
    for c in range(Pa):
        for d in range(min(bw + 1, Pa - c)):
            band[c * SB + d] = A[
                c * 6 : (c + 1) * 6, (c + d) * 6 : (c + d + 1) * 6
            ].reshape(-1)
    return A, band


def test_band_factor_and_solve_match_numpy():
    rng = np.random.default_rng(0)
    Pa, bw = 37, 5
    SB = 8
    A, band = _random_banded_spd(Pa, bw, SB, rng)
    b = rng.normal(size=(Pa, 6)).astype(np.float32)

    L = band_factor(jnp.asarray(band), Pa, SB, bw, interpret=True)
    x = band_solve(L, jnp.asarray(b), Pa, SB, bw, interpret=True)

    xref = np.linalg.solve(A, b.reshape(-1))
    rel = np.linalg.norm(np.asarray(x).reshape(-1) - xref) / np.linalg.norm(xref)
    assert rel < 5e-5, rel

    # the stored factor: d>=1 rows hold L_{(c+d),c}^T, d=0 holds inv(L_cc)
    Lref = np.linalg.cholesky(A)
    Lgot = np.asarray(L)
    scale = np.abs(Lref).max()
    for c in range(0, Pa, 5):
        inv_got = Lgot[c * SB].reshape(6, 6)
        inv_ref = np.linalg.inv(Lref[c * 6 : (c + 1) * 6, c * 6 : (c + 1) * 6])
        np.testing.assert_allclose(inv_got, inv_ref, atol=1e-4 * np.abs(inv_ref).max())
        for d in range(1, bw + 1):
            if c + d >= Pa:
                continue
            got = Lgot[c * SB + d].reshape(6, 6).T
            ref = Lref[(c + d) * 6 : (c + d + 1) * 6, c * 6 : (c + 1) * 6]
            np.testing.assert_allclose(got, ref, atol=2e-3 * scale)


def test_band_nonspd_goes_nonfinite():
    """A non-SPD system must surface as non-finite output (the LM loop's
    rejection signal), not silently wrong numbers."""
    rng = np.random.default_rng(1)
    Pa, bw, SB = 9, 2, 8
    A, band = _random_banded_spd(Pa, bw, SB, rng)
    band[0] = -np.eye(6).reshape(-1)  # negative diagonal block
    b = rng.normal(size=(Pa, 6)).astype(np.float32)
    L = band_factor(jnp.asarray(band), Pa, SB, bw, interpret=True)
    x = band_solve(L, jnp.asarray(b), Pa, SB, bw, interpret=True)
    assert not bool(np.all(np.isfinite(np.asarray(x))))


def test_band_factor2_matches_v1():
    from cuda_bundle_adjustment_tpu.pallas.bandchol import band_factor2

    rng = np.random.default_rng(2)
    Pa, bw, SB = 23, 4, 8
    A, band = _random_banded_spd(Pa, bw, SB, rng)
    L1 = np.asarray(band_factor(jnp.asarray(band), Pa, SB, bw, interpret=True))
    L2 = np.asarray(band_factor2(jnp.asarray(band), Pa, SB, interpret=True))
    np.testing.assert_allclose(
        L2[: Pa * SB], L1[: Pa * SB], atol=1e-5 * max(np.abs(L1).max(), 1.0)
    )
