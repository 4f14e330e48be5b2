"""Spectral-analysis utilities (two_pass_lanczos_tpu.spectrum).

The reference stores (α, β) (``src/algorithms/mod.rs:94-108``) but only ever
evaluates f(T_k)e₁; these tests pin the extra analyses the same data buys:
Ritz values/pairs, the β_s·|S_{s,j}| residual identity (checked against an
explicitly reconstructed Ritz vector and a real matvec), Lanczos–Gauss
quadrature for bᵀf(A)b, and the Gauss–Radau bracket for bᵀA⁻¹b on SPD A.
Diagonal operators make every ground truth analytic (the reference's own
test methodology, ``tests/correctness.rs:1-23``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import two_pass_lanczos_tpu as tpl
from two_pass_lanczos_tpu.spectrum import (
    gauss_radau_bracket,
    quadratic_form,
    ritz_pairs,
    ritz_residual_bounds,
    ritz_values,
    tridiagonal_valid,
)


def _diag_problem(n=200, lo=0.1, hi=100.0, seed=0):
    d = np.linspace(lo, hi, n)
    rng = np.random.default_rng(seed)
    b = rng.standard_normal(n)
    return tpl.DiagonalOperator(jnp.asarray(d, jnp.float64)), jnp.asarray(
        b, jnp.float64), d, b


def test_tridiagonal_valid_shapes_and_dtype():
    op, b_dev, _, _ = _diag_problem()
    decomp = tpl.lanczos_pass_one(op, b_dev, 17)
    d, e = tridiagonal_valid(decomp)
    assert d.shape == (17,) and e.shape == (16,)
    assert d.dtype == np.float64 and e.dtype == np.float64


def test_ritz_values_exact_at_full_dimension():
    """k = n on distinct eigenvalues: T_n is similar to A, Ritz == spectrum."""
    n = 24
    d = np.linspace(1.0, 2.0, n)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    op = tpl.DiagonalOperator(jnp.asarray(d, jnp.float64))
    decomp = tpl.lanczos_pass_one(op, jnp.asarray(b, jnp.float64), n)
    theta = ritz_values(decomp)
    assert theta.shape == (decomp.steps(),)
    np.testing.assert_allclose(theta, np.sort(d)[: theta.size], rtol=1e-10)


def test_extreme_ritz_values_converge_first():
    op, b_dev, d, _ = _diag_problem()
    errs = []
    for k in (20, 40, 80):
        theta = ritz_values(tpl.lanczos_pass_one(op, b_dev, k))
        errs.append(abs(theta[-1] - d.max()) / d.max())
        assert theta[0] >= d.min() - 1e-12  # Ritz values stay in the field
        assert theta[-1] <= d.max() + 1e-10
    # the top Ritz value tightens monotonically with k (uniform-gap
    # spectrum: modest rate, but strict improvement)
    assert errs[2] < errs[1] < errs[0]
    assert errs[2] < 1e-9


def test_ritz_residual_identity_against_real_matvec():
    """β_s·|S_{s,j}| equals ‖A·u_j − θ_j·u_j‖ with u_j built from the
    one-pass basis — the Lanczos-relation identity, at f64 working
    precision for modest k (pre-orthogonality-loss)."""
    op, b_dev, d, _ = _diag_problem(lo=1.0, hi=10.0)
    k = 20
    decomp, basis = tpl.lanczos_standard(op, b_dev, k)
    theta, s_vecs = ritz_pairs(decomp)
    bounds = ritz_residual_bounds(decomp)
    v = np.asarray(basis)[: decomp.steps()]  # (s, n), row i = v_{i+1}
    for j in [0, k // 2, k - 1]:
        u = v.T @ s_vecs[:, j]
        resid = np.linalg.norm(d * u - theta[j] * u)
        assert bounds[j] == pytest.approx(resid, rel=1e-8, abs=1e-12)


def test_quadratic_form_matches_direct():
    op, b_dev, d, b = _diag_problem(lo=1.0, hi=10.0)
    for f, truth in [("inv", float(b @ (b / d))),
                     ("exp", float(b @ (np.exp(-d) * b)))]:
        fn = f if f == "inv" else (lambda x: np.exp(-x))
        decomp = tpl.lanczos_pass_one(op, b_dev, 60)
        est = quadratic_form(decomp, fn)
        assert est == pytest.approx(truth, rel=1e-10), f


def test_quadratic_form_log_matches_device_analogue():
    """'log' is accepted (same string set as the device-side
    batched_quadratic_form, which documents this as its host analogue)."""
    op, b_dev, d, b = _diag_problem(lo=1.0, hi=10.0)
    decomp = tpl.lanczos_pass_one(op, b_dev, 60)
    est = quadratic_form(decomp, "log")
    truth = float(b @ (np.log(d) * b))
    assert est == pytest.approx(truth, rel=1e-10)
    dev = float(tpl.batched_quadratic_form(decomp, "log"))
    assert est == pytest.approx(dev, rel=1e-10)


def test_gauss_radau_bracket_encloses_and_tightens():
    op, b_dev, d, b = _diag_problem()  # SPD, [0.1, 100]
    truth = float(b @ (b / d))
    widths = []
    for k in (20, 40, 80):
        decomp = tpl.lanczos_pass_one(op, b_dev, k)
        lo, hi = gauss_radau_bracket(decomp, lambda_min=d.min())
        assert lo <= truth * (1 + 1e-12), (k, lo, truth)
        assert hi >= truth * (1 - 1e-12), (k, hi, truth)
        widths.append(hi - lo)
    assert widths[2] < widths[1] < widths[0]
    assert widths[2] < 1e-6 * truth  # converged enclosure by k=80


def test_breakdown_makes_everything_exact():
    """diag(2,3), b=e₁ → invariant 1-D subspace, steps_taken=1 (the
    reference's breakdown case, ``src/algorithms/mod.rs:409-419``):
    residual bounds identically zero, quadrature exact, bracket collapsed."""
    op = tpl.DiagonalOperator(jnp.asarray([2.0, 3.0], jnp.float64))
    b = jnp.asarray([1.0, 0.0], jnp.float64)
    decomp = tpl.lanczos_pass_one(op, b, 2)
    assert decomp.steps() == 1
    np.testing.assert_array_equal(ritz_residual_bounds(decomp), [0.0])
    assert quadratic_form(decomp, "inv") == pytest.approx(0.5, rel=1e-14)
    lo, hi = gauss_radau_bracket(decomp, lambda_min=1.0)
    assert lo == hi == pytest.approx(0.5, rel=1e-14)


def test_zero_b_empty_results():
    op = tpl.DiagonalOperator(jnp.ones(4, jnp.float64))
    decomp = tpl.lanczos_pass_one(op, jnp.zeros(4, jnp.float64), 3)
    assert decomp.steps() == 0
    assert ritz_values(decomp).size == 0
    assert ritz_residual_bounds(decomp).size == 0
    assert quadratic_form(decomp) == 0.0
    assert gauss_radau_bracket(decomp, 1.0) == (0.0, 0.0)


def test_lambda_min_must_be_positive():
    op, b_dev, _, _ = _diag_problem()
    decomp = tpl.lanczos_pass_one(op, b_dev, 5)
    with pytest.raises(ValueError, match="lambda_min"):
        gauss_radau_bracket(decomp, 0.0)


def test_unknown_function_spec_rejected():
    op, b_dev, _, _ = _diag_problem()
    decomp = tpl.lanczos_pass_one(op, b_dev, 5)
    with pytest.raises(ValueError, match="unknown function"):
        quadratic_form(decomp, "sqrt")


def test_accepts_df_path_decomposition():
    """The double-float pass-one decomposition (hi/lo pairs) feeds the
    same analyses, folded to f64 — the docstring's cross-implementation
    pytree claim, pinned for the df path specifically."""
    n, k = 150, 30
    d = np.linspace(1.0, 10.0, n)
    rng = np.random.default_rng(6)
    b = rng.standard_normal(n)
    op_df = tpl.DFDiagonalOperator.from_f64(d)
    dec_df = tpl.lanczos_pass_one_df(op_df, b, k)
    op = tpl.DiagonalOperator(jnp.asarray(d, jnp.float64))
    dec64 = tpl.lanczos_pass_one(op, jnp.asarray(b, jnp.float64), k)
    # Ritz values from the df coefficients match the f64 oracle's closely
    np.testing.assert_allclose(ritz_values(dec_df), ritz_values(dec64),
                               rtol=1e-7)
    q_df = quadratic_form(dec_df, "inv")
    assert q_df == pytest.approx(float(b @ (b / d)), rel=1e-7)
    bounds = ritz_residual_bounds(dec_df)
    assert bounds.shape == (k,) and np.all(bounds >= 0)
    lo, hi = gauss_radau_bracket(dec_df, lambda_min=1.0)
    truth = float(b @ (b / d))
    assert lo <= truth * (1 + 1e-7) and hi >= truth * (1 - 1e-7)


def test_accepts_chunked_path_decomposition():
    """The pytree contract: decompositions from other pass-one
    implementations feed the same analyses unchanged."""
    op, b_dev, d, b = _diag_problem(lo=1.0, hi=10.0)
    decomp, _ = tpl.lanczos_standard_chunked(op, b_dev, 60, chunk=16)
    assert quadratic_form(decomp, "inv") == pytest.approx(
        float(b @ (b / d)), rel=1e-10)


class TestANormErrorHistory:
    """Golub–Meurant A-norm error certificates for the f=inv solve:
    both sides of the bracket must enclose the TRUE per-step error
    computed against the analytic solution."""

    def test_bracket_encloses_true_error_spd_diagonal(self):
        n, k = 200, 40
        d = np.linspace(0.7, 25.0, n)
        rng = np.random.default_rng(17)
        b = rng.standard_normal(n)
        op = tpl.DiagonalOperator(jnp.asarray(d, jnp.float64))
        dec = tpl.lanczos_pass_one(op, jnp.asarray(b), k)
        js, lows, ups = tpl.a_norm_error_history(dec, lambda_min=0.7)
        assert js[0] == 1 and js[-1] == int(dec.steps()) - 1
        x_true = b / d
        for j, lo, up in zip(js[::5], lows[::5], ups[::5]):
            x_j = np.asarray(tpl.solve_fAb(
                op, jnp.asarray(b), k=int(j), f="inv", method="one_pass"))
            err = float(np.sqrt(np.sum(d * (x_true - x_j) ** 2)))
            # rigorous in exact arithmetic; allow f64 rounding slack
            assert lo <= err * (1 + 1e-8) + 1e-12, (j, lo, err)
            assert err <= up * (1 + 1e-8) + 1e-12, (j, err, up)
        # the upper bound must actually converge (CG rate for kappa = 36
        # over ~39 steps is ~2e-6 relative)
        assert ups[-1] < 1e-5 * ups[0]

    def test_validation_and_edges(self):
        op = tpl.DiagonalOperator(jnp.asarray([2.0, 3.0], jnp.float64))
        dec = tpl.lanczos_pass_one(op, jnp.asarray([1.0, 1.0]), 2)
        with pytest.raises(ValueError, match="lambda_min > 0"):
            tpl.a_norm_error_history(dec, 0.0)
        with pytest.raises(ValueError, match="stride"):
            tpl.a_norm_error_history(dec, 1.0, stride=0)
        # single-step decomposition: empty history
        dec1 = tpl.lanczos_pass_one(
            op, jnp.asarray([1.0, 0.0], jnp.float64), 2)
        js, lows, ups = tpl.a_norm_error_history(dec1, 1.0)
        assert js.size == lows.size == ups.size <= 1


class TestQuadratureBracket:
    """Golub–Meurant enclosures of bᵀf(A)b from spectrum bounds."""

    def test_exp_bracket_encloses_truth_indefinite(self):
        n, k = 150, 25
        d = np.linspace(-2.0, 3.0, n)  # exp: any symmetric A is fine
        rng = np.random.default_rng(41)
        b = rng.standard_normal(n)
        op = tpl.DiagonalOperator(jnp.asarray(d, jnp.float64))
        dec = tpl.lanczos_pass_one(op, jnp.asarray(b), k)
        truth = float(b @ (np.exp(d) * b))
        lo, up = tpl.quadrature_bracket(dec, (-2.5, 3.5), "exp")
        assert lo <= truth * (1 + 1e-10) <= up * (1 + 1e-10), (lo, truth, up)
        # tightens with k: the k=8 bracket strictly contains the k=25 one
        dec8 = tpl.lanczos_pass_one(op, jnp.asarray(b), 8)
        lo8, up8 = tpl.quadrature_bracket(dec8, (-2.5, 3.5), "exp")
        assert lo8 <= lo and up <= up8
        assert (up - lo) < 0.01 * (up8 - lo8)

    def test_inv_bracket_delegates_to_gauss_radau(self):
        n, k = 100, 20
        d = np.linspace(0.5, 9.0, n)
        rng = np.random.default_rng(43)
        b = rng.standard_normal(n)
        op = tpl.DiagonalOperator(jnp.asarray(d, jnp.float64))
        dec = tpl.lanczos_pass_one(op, jnp.asarray(b), k)
        assert tpl.quadrature_bracket(dec, (0.5, 9.0), "inv") == \
            tpl.gauss_radau_bracket(dec, 0.5)
        truth = float(b @ (b / d))
        lo, up = tpl.quadrature_bracket(dec, (0.5, 9.0), "inv")
        assert lo <= truth * (1 + 1e-10) <= up * (1 + 1e-10)

    def test_validation(self):
        op = tpl.DiagonalOperator(jnp.asarray([1.0, 2.0], jnp.float64))
        dec = tpl.lanczos_pass_one(op, jnp.asarray([1.0, 1.0]), 2)
        with pytest.raises(ValueError, match="a < b"):
            tpl.quadrature_bracket(dec, (3.0, 1.0), "exp")
        with pytest.raises(ValueError, match="a > 0"):
            tpl.quadrature_bracket(dec, (-1.0, 2.0), "inv")
        with pytest.raises(ValueError, match="sign-definite"):
            tpl.quadrature_bracket(dec, (0.5, 2.0), np.sin)

    def test_breakdown_collapses_to_exact(self):
        op = tpl.DiagonalOperator(jnp.asarray([2.0, 5.0], jnp.float64))
        b = np.array([1.0, 1.0])
        dec = tpl.lanczos_pass_one(op, jnp.asarray(b), 6)
        lo, up = tpl.quadrature_bracket(dec, (1.0, 6.0), "exp")
        truth = float(np.exp(2.0) + np.exp(5.0))
        assert lo == pytest.approx(truth, rel=1e-12)
        assert up == pytest.approx(truth, rel=1e-12)


def test_certificate_from_sharded_decomposition():
    """The pytree contract extends to the certificates: the distributed
    solver's replicated decomposition feeds a_norm_error_history and the
    brackets agree with the single-device run's to reduction rounding."""
    from two_pass_lanczos_tpu.parallel import (
        ShardedSparseOperator, make_mesh,
    )

    n, k = 240, 30
    d = np.linspace(0.5, 20.0, n)
    rng = np.random.default_rng(51)
    b = rng.standard_normal(n)
    idx = np.arange(n)
    sop = ShardedSparseOperator(n, idx, idx, d, make_mesh(2))
    _, dec_sh = sop.solve_fAb(b, k=k, f="inv")
    op = tpl.DiagonalOperator(jnp.asarray(d, jnp.float64))
    dec_1 = tpl.lanczos_pass_one(op, jnp.asarray(b), k)
    js_s, lo_s, up_s = tpl.a_norm_error_history(dec_sh, 0.5)
    js_1, lo_1, up_1 = tpl.a_norm_error_history(dec_1, 0.5)
    np.testing.assert_array_equal(js_s, js_1)
    np.testing.assert_allclose(up_s, up_1, rtol=1e-6)
    # and the bracket still encloses the truth computed from the
    # sharded solve's own iterate at the final certified step
    x_true = b / d
    x_sh, _ = sop.solve_fAb(b, k=int(js_s[-1]), f="inv")
    err = float(np.sqrt(np.sum(d * (x_true - np.asarray(x_sh)) ** 2)))
    assert lo_s[-1] <= err * (1 + 1e-6) + 1e-12
    assert err <= up_s[-1] * (1 + 1e-6) + 1e-12
