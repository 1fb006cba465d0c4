"""Interpret-mode checks of the fused linearisation kernel (pallas/terms.py)
against a NumPy f64 oracle of ops/components.py's stereo/mono math.

Interpret mode executes the double-float arithmetic as plain f32 jnp ops.
XLA:CPU's excess precision (--xla_allow_excess_precision, on in this
environment) flows THROUGH ``optimization_barrier`` — it is a code-motion
barrier, not a rounding barrier — so two-sum compensation terms can silently
evaluate to zero and the in-kernel slot/member sums degrade to f32 accuracy
*relative to the summed term magnitudes* under cancellation.  The per-edge
values themselves verify at ~1e-11 relative.  This is the same accepted
limitation as tests/test_groups.py's pairprod check; the EXACT double-float
bound is pinned on hardware (tools/tpu_parity.py, pytest -m tpu), where the
Mosaic through-int bitcast forces true f32 rounding."""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from cuda_bundle_adjustment_tpu.pallas.terms import (  # noqa: E402
    split_ff,
    terms_class_call,
)

FX, FY, CX, CY, BF = 718.856, 718.856, 607.1928, 185.2157, 386.1448


def oracle(qt, xw, ms, wa, act, m3, mdim):
    """NumPy f64: per-edge stacks exactly as ops/components.py computes them."""
    E = qt.shape[1]
    t = qt[:3]
    R = qt[3:12]
    Xc = np.empty((3, E))
    for i in range(3):
        Xc[i] = sum(R[3 * i + j] * xw[j] for j in range(3)) + t[i]
    safe = np.abs(Xc[2]) > 1e-30
    inv_z = act * np.where(safe, 1.0 / np.where(safe, Xc[2], 1.0), 0.0)
    izz = inv_z * inv_z
    u = FX * inv_z * Xc[0] + CX
    e = [u - ms[0], FY * inv_z * Xc[1] + CY - ms[1]]
    jl = [
        [-FX * R[j] * inv_z + FX * Xc[0] * R[6 + j] * izz for j in range(3)],
        [-FY * R[3 + j] * inv_z + FY * Xc[1] * R[6 + j] * izz for j in range(3)],
    ]
    zero = np.zeros(E)
    jp = [
        [Xc[0] * Xc[1] * izz * FX, -(1 + Xc[0] ** 2 * izz) * FX,
         Xc[1] * inv_z * FX, -inv_z * FX, zero, Xc[0] * izz * FX],
        [(1 + Xc[1] ** 2 * izz) * FY, -Xc[0] * Xc[1] * izz * FY,
         -Xc[0] * inv_z * FY, zero, -inv_z * FY, Xc[1] * izz * FY],
    ]
    if mdim == 3:
        e.append((u - BF * inv_z - ms[2]) * m3)
        jl.append([(jl[0][j] - BF * R[6 + j] * izz) * m3 for j in range(3)])
        jp.append([
            (jp[0][0] - BF * Xc[1] * izz) * m3,
            (jp[0][1] + BF * Xc[0] * izz) * m3,
            jp[0][2] * m3, jp[0][3] * m3, zero,
            (jp[0][5] - BF * izz) * m3,
        ])
    w = wa
    pose = np.empty((42, E))
    for i in range(6):
        for j in range(6):
            pose[i * 6 + j] = w * sum(jp[m][i] * jp[m][j] for m in range(mdim))
    for i in range(6):
        pose[36 + i] = w * sum(jp[m][i] * e[m] for m in range(mdim))
    lm = np.empty((12, E))
    for i in range(3):
        for j in range(3):
            lm[i * 3 + j] = w * sum(jl[m][i] * jl[m][j] for m in range(mdim))
    for i in range(3):
        lm[9 + i] = w * sum(jl[m][i] * e[m] for m in range(mdim))
    hpl = np.empty((18, E))
    for i in range(6):
        for j in range(3):
            hpl[i * 3 + j] = w * sum(jp[m][i] * jl[m][j] for m in range(mdim))
    return pose, lm, hpl


def _rand_inputs(rng, d, gc, nc_pad, mdim, with_mask):
    DG = d * gc
    E = DG * nc_pad
    # plausible BA state: rotations near identity, points in front of camera
    q = rng.normal(0, 0.1, (E, 4)) + np.array([0, 0, 0, 1.0])
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    x, y, z, wq = q.T
    R = np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - z * wq), 2 * (x * z + y * wq),
        2 * (x * y + z * wq), 1 - 2 * (x * x + z * z), 2 * (y * z - x * wq),
        2 * (x * z - y * wq), 2 * (y * z + x * wq), 1 - 2 * (x * x + y * y),
    ])
    t = rng.normal(0, 1.0, (3, E))
    qt = np.concatenate([t, R], axis=0)
    xw = rng.normal(0, 2.0, (3, E))
    xw[2] += 10.0  # in front
    ms = rng.normal(0, 300.0, (3, E))
    wa = np.abs(rng.normal(1.0, 0.2, E))
    act = (rng.uniform(size=E) > 0.1).astype(np.float64)
    wa = wa * act
    # a few degenerate-z rows must yield exact zeros
    bad = rng.choice(E, max(2, E // 64), replace=False)
    xw[2, bad] = -t[2, bad] - sum(
        R[3 * 2 + j, bad] * xw[j, bad] for j in range(2)
    ) / np.maximum(np.abs(R[8, bad]), 1e-3) * 0  # crude: just zero z below
    # force exact z = 0 via direct construction: overwrite Xc2 pre-image is
    # messy; instead deactivate those rows (act path) and also test safe mask
    act[bad] = 0.0
    wa[bad] = 0.0
    m3 = (rng.uniform(size=E) > 0.5).astype(np.float64) if with_mask else np.ones(E)
    return qt, xw, ms, wa, act, m3


@pytest.mark.parametrize(
    "d,gc,mdim,with_mask",
    # three combos cover mdim 2/3, mask on/off, wide/narrow chunks and
    # multi-slot rolls; the dropped (3,2,3,True) combo duplicated
    # (4,1,3,True)'s coverage at ~60 s of interpret-mode compile
    [(1, 8, 3, False), (2, 4, 2, False), (4, 1, 3, True)],
)
def test_terms_kernel_matches_oracle(d, gc, mdim, with_mask):
    rng = np.random.default_rng(100 + d * 10 + gc)
    nc_pad = 128
    DG = d * gc
    qt, xw, ms, wa, act, m3 = _rand_inputs(rng, d, gc, nc_pad, mdim, with_mask)

    want_pose_rows, want_lm_rows, want_hpl = oracle(
        qt, xw, ms, wa, act, m3, mdim
    )
    # reference reductions: presum over gc (pose), sum over d slots (lm)
    want_pose = want_pose_rows.reshape(42, d, gc, nc_pad).sum(axis=2)
    want_lm = want_lm_rows.reshape(12, d, gc, nc_pad).sum(axis=1)

    camv = np.array([FX, FY, CX, CY, BF])
    hi = camv.astype(np.float32)
    lo = (camv - hi.astype(np.float64)).astype(np.float32)
    cam = np.broadcast_to(
        np.concatenate([hi, lo])[:, None], (10, 128)
    ).astype(np.float32)

    def ffr(x, lead):
        h, l = split_ff(jnp.asarray(x))
        return (h.reshape(lead, DG, nc_pad), l.reshape(lead, DG, nc_pad))

    qt_h, qt_l = ffr(qt, 12)
    xw_h, xw_l = ffr(xw, 3)
    ms_h, ms_l = ffr(ms, 3)
    wa_h, wa_l = ffr(wa, 1)
    act32 = jnp.asarray(act, jnp.float32).reshape(DG, nc_pad)
    m3_32 = jnp.asarray(m3, jnp.float32).reshape(DG, nc_pad)

    pose_h, pose_l, lm_h, lm_l, hpl_h, hpl_l = terms_class_call(
        jnp.asarray(cam), qt_h, qt_l, xw_h, xw_l, ms_h, ms_l, wa_h, wa_l,
        act32, m3_32, d=d, gc=gc, mdim=mdim, has_m3=with_mask, interpret=True,
    )
    got_pose = np.asarray(pose_h, np.float64) + np.asarray(pose_l, np.float64)
    got_lm = np.asarray(lm_h, np.float64) + np.asarray(lm_l, np.float64)
    got_hpl = np.asarray(hpl_h, np.float64) + np.asarray(hpl_l, np.float64)

    # hpl is per-edge (no in-kernel reduction): tight relative bound.  pose
    # and lm pass through the in-kernel roll sums, whose compensation the
    # CPU interpret path loses (see module docstring): bound those by the
    # SUMMED TERM magnitudes at f32 precision, exactly like the pairprod
    # interpret test.
    scale_pose = np.abs(want_pose_rows).reshape(42, d, gc, nc_pad).max(axis=2)
    scale_lm = np.abs(want_lm_rows).reshape(12, d, gc, nc_pad).max(axis=1)
    for name, got, want, tol in (
        ("pose", got_pose, want_pose, 2e-5 * (scale_pose + 1.0)),
        ("lm", got_lm, want_lm, 2e-5 * (scale_lm + 1.0)),
        ("hpl", got_hpl, want_hpl.reshape(18, DG, nc_pad), None),
    ):
        if tol is None:
            scale = np.max(np.abs(want)) or 1.0
            np.testing.assert_allclose(
                got, want, atol=1e-9 * scale, rtol=1e-9,
                err_msg=f"{name} (d={d}, gc={gc}, mdim={mdim}, mask={with_mask})",
            )
        else:
            assert np.all(np.abs(got - want) <= tol), (
                f"{name} (d={d}, gc={gc}, mdim={mdim}, mask={with_mask}): "
                f"max excess {np.max(np.abs(got - want) - tol)}"
            )

    # inert rows must be EXACTLY zero everywhere
    dead = act.reshape(DG, nc_pad) == 0
    assert np.all(got_hpl[:, dead] == 0.0)
