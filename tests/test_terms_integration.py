"""Integration of the fused linearisation kernel path (interpret mode on CPU)
against the XLA build_system + schur/back-substitution chain.

Tolerances are f32-relative-to-term-magnitudes where in-kernel sums are
involved (interpret mode loses double-float compensation to XLA:CPU excess
precision — see tests/test_terms_kernel.py); hardware exactness is pinned by
tools/tpu_parity.py (pytest -m tpu)."""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import cuda_bundle_adjustment_tpu.pallas.terms as terms_mod  # noqa: E402
import cuda_bundle_adjustment_tpu.solver.block_solver as bs  # noqa: E402
from cuda_bundle_adjustment_tpu.io.arrays import (  # noqa: E402
    optimizer_from_problem,
)
from cuda_bundle_adjustment_tpu.io.synthetic import (  # noqa: E402
    make_ba_problem,
    make_mixed_ba_problem,
)


@pytest.fixture
def interp_terms(monkeypatch):
    orig = terms_mod.terms_class_call

    def forced(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(terms_mod, "terms_class_call", forced)


def _kernel_plan(plan):
    return plan._replace(
        layout=plan.layout._replace(use_kernel=True, terms_kernel=True)
    )


def _problem(kind, seed=23):
    # small AND constant-degree on purpose: every (degree) class compiles its
    # own interpret-mode kernel and the unrolled double-float bodies take
    # ~10 s each to build; exact_obs_per_landmark collapses the layout to
    # one or two classes (front-of-camera culling still drops a few edges)
    if kind == "mixed":
        return make_mixed_ba_problem(
            num_poses=10, num_landmarks=70, mean_obs_per_landmark=3.0,
            exact_obs_per_landmark=3, stereo_fraction=0.5, seed=seed,
        )
    return make_ba_problem(
        num_poses=10, num_landmarks=70, mean_obs_per_landmark=3.0,
        exact_obs_per_landmark=3, kind=kind, seed=seed,
    )


@pytest.fixture
def interp_chi(monkeypatch):
    orig = terms_mod.chi_class_call

    def forced(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(terms_mod, "chi_class_call", forced)


@pytest.mark.parametrize("kind", ["mono", "mixed"])
def test_chi_kernel_matches_xla(kind, interp_chi):
    """compute_chi via the fused chi kernel == the XLA model chi.

    Same problems (and so the same class shapes) as the build-system tests
    so interpret-mode compiles share the jit cache.  Tolerance is
    f32-relative (interpret mode loses double-float compensation, module
    docstring)."""
    opt = optimizer_from_problem(_problem(kind))
    solver = opt.solver
    solver.build_structure()
    plan = solver.plan
    assert plan.layout is not None
    graph, packed, metas = solver.graph, solver.packed, solver.metas

    ref = float(bs.compute_chi(graph, packed, metas))
    got = float(
        bs.compute_chi(graph, packed, metas, plan=_kernel_plan(plan))
    )
    assert got == pytest.approx(ref, rel=2e-6)


@pytest.mark.parametrize("kind", ["mono", "stereo", "mixed"])
def test_kernel_build_system_matches_xla(kind, interp_terms):
    opt = optimizer_from_problem(_problem(kind))
    solver = opt.solver
    solver.build_structure()
    plan = solver.plan
    assert plan.layout is not None
    graph, packed, metas = solver.graph, solver.packed, solver.metas

    ref = bs.build_system(graph, packed, metas, solver.Pa, solver.La, plan)
    got = bs.build_system(
        graph, packed, metas, solver.Pa, solver.La, _kernel_plan(plan)
    )

    for name in ("Hpp", "bp", "Hll", "bl"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        scale = np.abs(a).max() or 1.0
        np.testing.assert_allclose(
            b, a, atol=2e-5 * scale, rtol=2e-5, err_msg=f"{name} [{kind}]"
        )

    # Hpl: packed ff component-major [36, e_total] vs row-major f64 [E, 18]
    assert got.Hpl.shape == (36, ref.Hpl.shape[0])
    hpl_cm = np.asarray(got.Hpl[:18], np.float64) + np.asarray(
        got.Hpl[18:], np.float64
    )
    scale = np.abs(np.asarray(ref.Hpl)).max() or 1.0
    np.testing.assert_allclose(
        hpl_cm, np.asarray(ref.Hpl).T, atol=2e-6 * scale, rtol=2e-6,
        err_msg=f"Hpl [{kind}]",
    )


def test_kernel_full_solve_matches_xla(interp_terms):
    """schur_reduce + solve + back-substitution on the packed-Hpl path.

    Uses the SAME problem (seed included) as the [mixed] build-system test:
    identical class shapes let this test reuse every interpret-mode kernel
    compile from the jit cache instead of re-tracing (~minutes each)."""
    opt = optimizer_from_problem(_problem("mixed"))
    solver = opt.solver
    solver.build_structure()
    plan = solver.plan
    graph, packed, metas = solver.graph, solver.packed, solver.metas
    nnz = solver.schur.nnz_blocks
    lam = jnp.asarray(1e-2, solver.dtype)

    ref_sys = bs.build_system(graph, packed, metas, solver.Pa, solver.La, plan)
    # the CPU plan has no kernel plans built; schur_reduce's kernel branch
    # needs class_a/class_b (present: layout builds them) — use the XLA
    # fallback reduce for the reference
    ref_xp, ref_xl, ref_ok = bs.solve_schur(
        ref_sys, lam, plan, solver.Pa, solver.La, nnz, mixed=False
    )

    import cuda_bundle_adjustment_tpu.pallas.lminv as lmv
    import cuda_bundle_adjustment_tpu.pallas.pairprod as pp
    import cuda_bundle_adjustment_tpu.pallas.schurvec as sv

    orig_packed = pp.schur_pair_rows_packed
    orig_splits = pp._pair_rows_from_splits
    orig_mv, orig_mtv = sv.hpl_mv_class_call, sv.hpl_mtv_class_call
    orig_lminv, orig_smv = lmv.lminv_call, lmv.sym3x3_mv_call

    def interp_pp(Hpl36, invHll, plan_, interpret=True):
        return orig_packed(Hpl36, invHll, plan_, interpret=True)

    kplan = _kernel_plan(plan)
    got_sys = bs.build_system(
        graph, packed, metas, solver.Pa, solver.La, kplan
    )
    pp.schur_pair_rows_packed = interp_pp
    pp._pair_rows_from_splits = lambda *a, **k: orig_splits(
        *a, **{**k, "interpret": True}
    )
    sv.hpl_mv_class_call = lambda *a, **k: orig_mv(
        *a, **{**k, "interpret": True}
    )
    sv.hpl_mtv_class_call = lambda *a, **k: orig_mtv(
        *a, **{**k, "interpret": True}
    )
    lmv.lminv_call = lambda *a, **k: orig_lminv(
        *a, **{**k, "interpret": True}
    )
    lmv.sym3x3_mv_call = lambda *a, **k: orig_smv(
        *a, **{**k, "interpret": True}
    )
    try:
        got_xp, got_xl, got_ok = bs.solve_schur(
            got_sys, lam, kplan, solver.Pa, solver.La, nnz, mixed=False
        )
    finally:
        pp.schur_pair_rows_packed = orig_packed
        pp._pair_rows_from_splits = orig_splits
        sv.hpl_mv_class_call = orig_mv
        sv.hpl_mtv_class_call = orig_mtv
        lmv.lminv_call = orig_lminv
        lmv.sym3x3_mv_call = orig_smv

    assert bool(ref_ok) and bool(got_ok)
    # tolerances are interpret-mode-noise bounds, not accuracy claims: the
    # compensation loss (module docstring) amplifies through the Schur solve
    # and SHIFTS whenever XLA:CPU recompiles with different fusion choices
    # (observed 1.6e-4 relative on xp after a compile-cache invalidation);
    # hardware exactness is pinned by tools/tpu_parity.py
    for name, a, b, tol in (
        ("xp", ref_xp, got_xp, 5e-4),
        ("xl", ref_xl, got_xl, 5e-3),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() or 1.0
        np.testing.assert_allclose(
            b, a, atol=tol * scale, rtol=0, err_msg=name
        )


def _per_edge_x(opt):
    """Per-edge x = omega * ||e||^2 from the XLA model (unrobustified)."""
    solver = opt.solver
    model = bs.MODEL_REGISTRY[solver.metas[0].kind]
    return np.asarray(
        model.chi(solver.graph, solver.packed[0], 0, 1.0)
    )


@pytest.mark.parametrize("rk", [1, 2, 3], ids=["tukey", "cauchy", "huber"])
def test_chi_kernel_robust_matches_xla(rk, interp_chi):
    """Robustified chi via the kernel path: rho(x) applies OUTSIDE the chi
    kernel on its per-edge x output (gate widened from the round-4 rk==0
    scope; reference robustifies in-kernel, cuda_block_solver.cu:1085-1097)."""
    delta = 2.0
    opt = optimizer_from_problem(_problem("mono"), rk=rk, delta=delta)
    solver = opt.solver
    solver.build_structure()
    plan = solver.plan
    graph, packed, metas = solver.graph, solver.packed, solver.metas
    assert metas[0].rk == rk

    # the delta must split the live edges so BOTH rho branches execute
    x = _per_edge_x(opt)
    live = np.asarray(packed[0].active) > 0
    assert (x[live] > delta * delta).any() and (x[live] <= delta * delta).any()

    ref = float(bs.compute_chi(graph, packed, metas))
    got = float(
        bs.compute_chi(graph, packed, metas, plan=_kernel_plan(plan))
    )
    assert got == pytest.approx(ref, rel=2e-6)


@pytest.mark.parametrize("rk", [1, 3], ids=["tukey", "huber"])
def test_kernel_build_system_robust_matches_xla(rk, interp_terms, interp_chi):
    """Robustified linearisation: the kernel path scales the weight by
    rho'(x) from a chi-kernel pre-pass (reference scales in-kernel,
    cuda_block_solver.cu:1188-1197)."""
    delta = 2.0
    opt = optimizer_from_problem(_problem("mono"), rk=rk, delta=delta)
    solver = opt.solver
    solver.build_structure()
    plan = solver.plan
    graph, packed, metas = solver.graph, solver.packed, solver.metas

    x = _per_edge_x(opt)
    live = np.asarray(packed[0].active) > 0
    assert (x[live] > delta * delta).any() and (x[live] <= delta * delta).any()

    ref = bs.build_system(graph, packed, metas, solver.Pa, solver.La, plan)
    got = bs.build_system(
        graph, packed, metas, solver.Pa, solver.La, _kernel_plan(plan)
    )
    for name in ("Hpp", "bp", "Hll", "bl"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        scale = np.abs(a).max() or 1.0
        np.testing.assert_allclose(
            b, a, atol=2e-5 * scale, rtol=2e-5, err_msg=f"{name} rk={rk}"
        )
    hpl_cm = np.asarray(got.Hpl[:18], np.float64) + np.asarray(
        got.Hpl[18:], np.float64
    )
    scale = np.abs(np.asarray(ref.Hpl)).max() or 1.0
    np.testing.assert_allclose(
        hpl_cm, np.asarray(ref.Hpl).T, atol=2e-6 * scale, rtol=2e-6,
        err_msg=f"Hpl rk={rk}",
    )


def test_kernel_build_system_f32_matches_xla(interp_terms, interp_chi):
    """f32 mode on the kernel path (gate widened from the round-4 f64-only
    scope): split_ff of f32 inputs is (x, 0) and the df kernel math carries
    spare compensation, so the kernel output is at least as accurate as the
    XLA f32 terms — compare both against each other at f32 tolerance."""
    from cuda_bundle_adjustment_tpu.graph import GraphOptimisationOptions

    opt = optimizer_from_problem(
        _problem("mono", seed=29),
        options=GraphOptimisationOptions(dtype="float32"),
        rk=3, delta=2.0,
    )
    solver = opt.solver
    solver.build_structure()
    plan = solver.plan
    graph, packed, metas = solver.graph, solver.packed, solver.metas
    assert packed[0].meas.dtype == jnp.float32

    ref = bs.build_system(graph, packed, metas, solver.Pa, solver.La, plan)
    got = bs.build_system(
        graph, packed, metas, solver.Pa, solver.La, _kernel_plan(plan)
    )
    for name in ("Hpp", "bp", "Hll", "bl"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        scale = np.abs(a).max() or 1.0
        np.testing.assert_allclose(
            b, a, atol=1e-4 * scale, rtol=1e-4, err_msg=f"{name} f32"
        )
    assert got.Hpl.dtype == jnp.float32
    hpl_cm = np.asarray(got.Hpl[:18], np.float64) + np.asarray(
        got.Hpl[18:], np.float64
    )
    scale = np.abs(np.asarray(ref.Hpl)).max() or 1.0
    np.testing.assert_allclose(
        hpl_cm, np.asarray(ref.Hpl).T, atol=1e-4 * scale, rtol=1e-4,
        err_msg="Hpl f32",
    )

    chi_ref = float(bs.compute_chi(graph, packed, metas))
    chi_got = float(
        bs.compute_chi(graph, packed, metas, plan=_kernel_plan(plan))
    )
    assert chi_got == pytest.approx(chi_ref, rel=1e-5)
