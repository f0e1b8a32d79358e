"""GCV selection oracles (SURVEY.md §4 oracle 5 + the gcv_function semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hybrid_gmres_tpu as hg
from hybrid_gmres_tpu.problems import add_noise, perturb_backprojector
from hybrid_gmres_tpu.krylov.arnoldi import arnoldi
from hybrid_gmres_tpu.reg import (
    gcv_from_H,
    gcv_curve,
    gcv_surface,
    gcv_lambda,
    minimize_scalar_bounded,
)
from hybrid_gmres_tpu.reg.lcurve import lcurve_sweep


@pytest.fixture(scope="module")
def setup():
    A, b_exact, x_true = hg.generate_test_problem("shaw", 32)
    b, _ = add_noise(b_exact, 1e-2, seed=0)
    B, _ = perturb_backprojector(A, 1e-4, seed=0)
    return A, B, b, x_true


def test_gcv_from_H_matches_numpy(setup):
    A, B, b, x_true = setup
    k = 10
    M = np.asarray(B) @ np.asarray(A)
    r0 = np.asarray(B @ b)
    Q, H, beta, _ = arnoldi(lambda v: jnp.asarray(M) @ v, jnp.asarray(r0), k)
    t = jnp.zeros((k + 1,)).at[0].set(beta)
    lam = 1e-4
    got = float(gcv_from_H(H, t, lam, trace_dim=32, kdim=k))

    Hk = np.asarray(H)
    tk = np.zeros(k + 1)
    tk[0] = float(beta)
    yk = np.linalg.solve(Hk.T @ Hk + lam * np.eye(k), Hk.T @ tk)
    rss = np.linalg.norm(tk - Hk @ yk) ** 2
    s = np.linalg.svd(Hk[:k, :k], compute_uv=False)
    tr = np.sum(s**2 / (s**2 + lam))
    want = rss / (32 - tr) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_gcv_curve_vectorizes(setup):
    A, B, b, x_true = setup
    grid = jnp.asarray(np.logspace(-8, -1, 30))
    vals = gcv_curve("ba", A, B, b, k_gcv=15, lam_grid=grid)
    assert vals.shape == (30,)
    assert bool(jnp.all(jnp.isfinite(vals)))
    # single-value evaluation must agree with the vmapped grid
    v0 = gcv_curve("ba", A, B, b, k_gcv=15, lam_grid=grid[:1])
    np.testing.assert_allclose(float(v0[0]), float(vals[0]), rtol=1e-12)


def test_gcv_surface_shape_and_path(setup):
    A, B, b, x_true = setup
    grid = np.logspace(-8, -1, 20)
    surface, path = gcv_surface("ab", A, B, b, range(1, 11), grid)
    assert surface.shape == (20, 10)
    assert path.shape == (10,)
    # path entries are grid members achieving the per-k min
    s = np.asarray(surface)
    for j in range(10):
        np.testing.assert_allclose(float(path[j]), grid[np.argmin(s[:, j])])


def test_minimize_scalar_bounded_quadratic():
    x, fx = minimize_scalar_bounded(lambda x: (x - 0.3) ** 2 + 1.0, 0.0, 1.0)
    assert abs(x - 0.3) < 1e-6
    assert abs(fx - 1.0) < 1e-10


def test_gcv_lambda_near_true_optimal(setup):
    """Oracle 5: the GCV-selected lambda's final error is close to the best
    achievable over the lambda sweep (the reference prints this comparison at
    analyze_regularization.m:43,49)."""
    A, B, b, x_true = setup
    lam_ab, _ = gcv_lambda("ab", A, B, b, k_gcv=20)
    sweep = lcurve_sweep("ab", A, B, b, x_true, np.logspace(-10, 0, 50), maxit=32)
    r = hg.ab_gmres(A, B, b, x_true, tol=1e-6, maxit=32, lam=lam_ab)
    err_gcv = float(r.err_hist[int(r.niters) - 1])
    err_best = float(sweep.err_min)
    assert err_gcv < 3.0 * err_best, (err_gcv, err_best, lam_ab)


def test_gcv_lambda_near_true_optimal_ba_original_space(setup):
    """Oracle 5, BA side (VERDICT r1 #6).  Plain GCV's projected numerator
    ||t - Hbar y||^2 vanishes as lam -> 0 for BA (B pre-smooths the noise
    out of the n-space Krylov residual), parking fminbnd at the 1e-9 floor;
    wGCV cannot fix a vanishing numerator (omega in [0.5, 1.6] measured to
    all select the floor).  The original-space numerator ||b - A Q y||^2
    restores an interior minimum and lands within 3x of the oracle error,
    symmetric with AB."""
    A, B, b, x_true = setup
    lam_floor, _ = gcv_lambda("ba", A, B, b, k_gcv=20)
    assert lam_floor <= 1.1e-9  # the reference-shared failure mode

    lam_ba, _ = gcv_lambda("ba", A, B, b, k_gcv=20,
                           residual_space="original")
    assert lam_ba > 1e-8, lam_ba  # interior minimum, off the floor
    sweep = lcurve_sweep("ba", A, B, b, x_true, np.logspace(-10, 0, 50),
                         maxit=32)
    r = hg.ba_gmres(A, B, b, x_true, tol=1e-6, maxit=32, lam=lam_ba)
    err_gcv = float(r.err_hist[int(r.niters) - 1])
    err_best = float(sweep.err_min)
    assert err_gcv < 3.0 * err_best, (err_gcv, err_best, lam_ba)


def test_gcv_original_space_equals_projected_for_ab(setup):
    """For AB the Arnoldi relation A B Q_k = Q_{k+1} Hbar_k (r0 = b) makes
    the original-space and projected numerators identical."""
    A, B, b, x_true = setup
    grid = jnp.asarray(np.logspace(-8, -1, 20))
    v_proj = gcv_curve("ab", A, B, b, k_gcv=15, lam_grid=grid)
    v_orig = gcv_curve("ab", A, B, b, k_gcv=15, lam_grid=grid,
                       residual_space="original")
    np.testing.assert_allclose(np.asarray(v_orig), np.asarray(v_proj),
                               rtol=1e-8)


def test_gcv_lambda_within_bounds(setup):
    A, B, b, x_true = setup
    for typ in ("ab", "ba"):
        lam, val = gcv_lambda(typ, A, B, b, k_gcv=20)
        assert 1e-9 <= lam <= 1e-1
        assert np.isfinite(val)


def test_discrepancy_principle_selects_reasonable_lambda():
    """DP with the true noise norm: residual at the selected lambda sits at
    the tau*delta crossing and the error is near the oracle optimum."""
    import numpy as np
    import jax.numpy as jnp
    from hybrid_gmres_tpu import ba_gmres, generate_test_problem
    from hybrid_gmres_tpu.problems import add_noise
    from hybrid_gmres_tpu.reg import discrepancy_lambda, lcurve_sweep

    A, b_exact, x_true = generate_test_problem("shaw", 32)
    b, e = add_noise(b_exact, 1e-2, seed=0)
    delta = float(jnp.linalg.norm(e))
    grid = np.logspace(-9, 0, 60)
    for variant in ("ab", "ba"):
        lam, info = discrepancy_lambda(variant, A, A.T, b, delta, tau=1.02,
                                       k=20, lam_grid=grid)
        lam = float(lam)
        assert grid[0] <= lam <= grid[-1]
        # residual at the crossing obeys the bound
        idx = int(np.argmin(np.abs(np.asarray(info["lam_grid"]) - lam)))
        assert float(info["res"][idx]) <= 1.02 * delta * (1 + 1e-6)
    # error within 3x of the oracle-optimal error over the same grid
    lam_ba, _ = discrepancy_lambda("ba", A, A.T, b, delta, k=20,
                                   lam_grid=grid)
    sweep = lcurve_sweep("ba", A, A.T, b, x_true, grid, tol=0.0, maxit=20)
    r = ba_gmres(A, A.T, b, x_true, tol=0.0, maxit=20, lam=float(lam_ba))
    err_dp = float(r.err_hist[int(r.niters) - 1])
    assert err_dp <= 3.0 * float(sweep.err_min)


def test_gcv_factored_matches_direct(setup):
    """The factored O(k)-per-lambda evaluation (two SVDs per factorization,
    used by the solvers' adaptive lam="gcv" mode) equals gcv_from_H on a
    grid, including padded columns beyond kdim."""
    from hybrid_gmres_tpu.reg import gcv_factors, gcv_from_factors
    from hybrid_gmres_tpu.krylov.arnoldi import arnoldi

    A, B, b, x_true = setup
    kmax, kdim = 16, 10
    M = np.asarray(B) @ np.asarray(A)
    r0 = np.asarray(B @ b)
    Q, H, beta, _ = arnoldi(lambda v: jnp.asarray(M) @ v, jnp.asarray(r0),
                            kmax)
    col = jnp.arange(kmax)
    H = jnp.where(col[None, :] < kdim, H, 0.0)  # padded projected system
    t = jnp.zeros((kmax + 1,)).at[0].set(beta)
    factors = gcv_factors(H, t, jnp.int32(kdim))
    grid = jnp.asarray(np.logspace(-9, -1, 30))
    got = jax.vmap(lambda l: gcv_from_factors(factors, l, 32))(grid)
    want = jax.vmap(lambda l: gcv_from_H(H, t, l, 32, jnp.int32(kdim)))(grid)
    # The spectral residual identity is exact; in floats its absolute error
    # is ~eps*||t||^2 while the GCV values themselves are ~1e-12 (tiny
    # projected residuals), so compare absolutely at that scale AND assert
    # the argmin (what the adaptive solver consumes) coincides.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-2, atol=1e-13)
    assert int(jnp.argmin(got)) == int(jnp.argmin(want))


def test_adaptive_gcv_solver_mode_larger_problem():
    """lam='gcv' inside the solver scan on n=48: finite histories, the
    per-iteration selected lambda path is sane (final error comparable to a
    fixed good lambda), and it runs at maxit=48 (the mode was previously
    untested beyond n=24 — VERDICT r1 weak#7)."""
    A, b_exact, x_true = hg.generate_test_problem("shaw", 48)
    b, _ = add_noise(b_exact, 1e-2, seed=0)
    r = hg.ba_gmres(A, A.T, b, x_true, tol=0.0, maxit=48, lam="gcv")
    err = np.asarray(r.err_hist)
    assert np.isfinite(err).all()
    r_fixed = hg.ba_gmres(A, A.T, b, x_true, tol=0.0, maxit=48, lam=1e-5)
    assert np.nanmin(err) < 2.0 * np.nanmin(np.asarray(r_fixed.err_hist))
