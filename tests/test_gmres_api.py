import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_gmres_tpu import ab_gmres, ba_gmres, generate_test_problem
from hybrid_gmres_tpu.problems import add_noise


@pytest.fixture(scope="module")
def prob():
    A, b_exact, x_true = generate_test_problem("shaw", 24)
    b, _ = add_noise(b_exact, 1e-2, seed=0)
    return A, A.T, b, x_true


def test_histories_shapes_and_masking(prob):
    A, B, b, x_true = prob
    r = ba_gmres(A, B, b, x_true, tol=1e-6, maxit=20)
    assert r.err_hist.shape == (20,)
    assert r.res_hist.shape == (20,)
    k = int(r.niters)
    assert 1 <= k <= 20
    assert np.all(np.isfinite(np.asarray(r.res_hist)[:k]))
    if k < 20:
        assert np.all(np.isnan(np.asarray(r.res_hist)[k:]))


def test_early_exit_on_tol():
    # Well-conditioned square system: GMRES converges fast, must early-exit.
    rng = np.random.default_rng(0)
    n = 24
    A = jnp.asarray(np.eye(n) + 0.01 * rng.standard_normal((n, n)))
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true
    r = ba_gmres(A, A.T, b, x_true, tol=1e-8, maxit=n)
    assert int(r.niters) < n
    assert float(r.res_hist[int(r.niters) - 1]) <= 1e-8


def test_jit_and_vmap_over_lambda(prob):
    A, B, b, x_true = prob
    lam_grid = jnp.asarray(np.logspace(-6, -1, 8))

    def final_err(lam):
        r = ba_gmres(A, B, b, x_true, tol=1e-10, maxit=16, lam=lam)
        return r.err_hist[r.niters - 1], r.x

    errs, xs = jax.jit(jax.vmap(final_err))(lam_grid)
    assert errs.shape == (8,)
    assert xs.shape == (8, A.shape[1])
    # must agree with per-lambda runs
    for i in (0, 4, 7):
        r = ba_gmres(A, B, b, x_true, tol=1e-10, maxit=16, lam=lam_grid[i])
        np.testing.assert_allclose(
            float(errs[i]), float(r.err_hist[int(r.niters) - 1]), rtol=1e-10
        )


def test_history_false_matches_final_solution(prob):
    A, B, b, x_true = prob
    r_full = ba_gmres(A, B, b, x_true, tol=0.0, maxit=16, lam=1e-3)
    r_lite = ba_gmres(A, B, b, x_true, tol=0.0, maxit=16, lam=1e-3, history=False)
    np.testing.assert_allclose(
        np.asarray(r_full.x), np.asarray(r_lite.x), rtol=1e-9, atol=1e-12
    )


def test_ab_gmres_mismatched_runs(prob):
    A, _, b, x_true = prob
    from hybrid_gmres_tpu.problems import perturb_backprojector

    B_pert, _ = perturb_backprojector(A, 1e-4, seed=0)
    r = ab_gmres(A, B_pert, b, x_true, tol=1e-6, maxit=16, lam=1e-3)
    assert np.isfinite(float(r.err_hist[int(r.niters) - 1]))


def test_restarted_gmres_converges():
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres_restarted

    rng = np.random.default_rng(0)
    n = 40
    A = jnp.asarray(np.eye(n) + 0.1 * rng.standard_normal((n, n)))
    x_true = jnp.asarray(rng.standard_normal(n))
    b = A @ x_true
    r = ba_gmres_restarted(A, A.T, b, x_true, tol=1e-10, restart=10,
                           max_restarts=8)
    k = int(r.niters)
    assert float(r.res_hist[k - 1]) <= 1e-10
    assert np.all(np.isfinite(np.asarray(r.err_hist)[:k]))


def test_x0_warm_start(prob):
    A, B, b, x_true = prob
    r1 = ba_gmres(A, B, b, x_true, tol=1e-10, maxit=8, lam=1e-3)
    r2 = ba_gmres(A, B, b, x_true, tol=1e-10, maxit=8, lam=1e-3, x0=r1.x)
    # warm start from a partial solution must not regress the residual much
    k1, k2 = int(r1.niters), int(r2.niters)
    assert float(r2.res_hist[k2 - 1]) <= 2.0 * float(r1.res_hist[k1 - 1])


def test_breakdown_niters_contract():
    """Lucky breakdown: histories are finite exactly up to niters (the
    'NaN beyond niters' contract), and restarted GMRES terminates."""
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres_restarted

    n = 8
    A = jnp.eye(n)
    b = jnp.zeros(n).at[0].set(1.0)
    r = ba_gmres(A, A.T, b, None, tol=1e-12, maxit=4)
    k = int(r.niters)
    assert k == 1  # one adopted iteration (exact solve), then breakdown
    assert np.isfinite(float(r.res_hist[k - 1]))
    assert np.all(np.isnan(np.asarray(r.res_hist)[k:]))
    # restarted wrapper must terminate promptly with the exact solution
    rr = ba_gmres_restarted(A, A.T, b, None, tol=1e-12, restart=4,
                            max_restarts=5)
    assert np.allclose(np.asarray(rr.x), np.asarray(b))


def test_zero_rhs_is_guarded():
    n = 8
    A = jnp.eye(n)
    r = ba_gmres(A, A.T, jnp.zeros(n), None, tol=1e-12, maxit=4)
    assert int(r.niters) == 0
    assert np.all(np.asarray(r.x) == 0.0)
    assert np.all(np.isnan(np.asarray(r.res_hist)))


def test_residual_estimate_mode(prob):
    A, B, b, x_true = prob
    r_true = ba_gmres(A, B, b, x_true, tol=0.0, maxit=12, lam=1e-3)
    r_est = ba_gmres(A, B, b, x_true, tol=0.0, maxit=12, lam=1e-3,
                     residual="estimate")
    # same iterates (error histories identical); different residual metric
    np.testing.assert_allclose(
        np.asarray(r_est.err_hist), np.asarray(r_true.err_hist), rtol=1e-12
    )
    assert np.all(np.isfinite(np.asarray(r_est.res_hist)[:12]))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ba_gmres(A, B, b, x_true, maxit=4, residual="banana")


def test_residual_fused_mode_exact(prob):
    # fused = true residual reconstructed from stored operator images:
    # identical numbers (up to reassociation) for AB and BA, hybrid or not,
    # and with an x0 warm start.
    A, B, b, x_true = prob
    for solver in (ab_gmres, ba_gmres):
        for lam in (None, 1e-3):
            # shaw is ill-conditioned; late non-hybrid iterations amplify
            # float reassociation (convention: early iters tight — CLAUDE.md)
            rtol = 1e-10 if lam is not None else 1e-4
            rt = solver(A, B, b, x_true, tol=0.0, maxit=12, lam=lam)
            rf = solver(A, B, b, x_true, tol=0.0, maxit=12, lam=lam,
                        residual="fused")
            np.testing.assert_allclose(
                np.asarray(rf.res_hist), np.asarray(rt.res_hist),
                rtol=rtol, atol=1e-13)
            np.testing.assert_allclose(
                np.asarray(rf.err_hist), np.asarray(rt.err_hist),
                rtol=rtol, atol=1e-13)
            np.testing.assert_allclose(
                np.asarray(rf.res_hist)[:6], np.asarray(rt.res_hist)[:6],
                rtol=1e-10, atol=1e-14)
            np.testing.assert_allclose(
                np.asarray(rf.x), np.asarray(rt.x), rtol=1e-3, atol=1e-12)
    x0 = jnp.full(A.shape[1], 0.1, b.dtype)
    rt = ba_gmres(A, B, b, x_true, tol=0.0, maxit=8, lam=1e-3, x0=x0)
    rf = ba_gmres(A, B, b, x_true, tol=0.0, maxit=8, lam=1e-3, x0=x0,
                  residual="fused")
    np.testing.assert_allclose(np.asarray(rf.res_hist),
                               np.asarray(rt.res_hist), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(rf.x), np.asarray(rt.x),
                               rtol=1e-9, atol=1e-12)


def test_residual_fused_rejects_unsupported_combos(prob):
    A, B, b, x_true = prob
    with pytest.raises(ValueError):
        ba_gmres(A, B, b, x_true, maxit=4, residual="fused", history=False)


def test_ab_x0_warm_start_and_restart(prob):
    A, B, b, x_true = prob
    from hybrid_gmres_tpu import ab_gmres_restarted
    # x0 warm start: starting from the 4-step solution must reproduce a
    # residual no worse than cold start at the same total budget
    r4 = ab_gmres(A, B, b, x_true, tol=0.0, maxit=4, lam=1e-3)
    rw = ab_gmres(A, B, b, x_true, tol=0.0, maxit=4, lam=1e-3, x0=r4.x)
    assert float(rw.res_hist[0]) <= float(r4.res_hist[3]) * 1.5
    # fused residual agrees with true under x0
    rwf = ab_gmres(A, B, b, x_true, tol=0.0, maxit=4, lam=1e-3, x0=r4.x,
                   residual="fused")
    np.testing.assert_allclose(np.asarray(rwf.res_hist),
                               np.asarray(rw.res_hist), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(rwf.x), np.asarray(rw.x),
                               rtol=1e-8, atol=1e-12)
    # restarted wrapper terminates with concatenated histories
    rr = ab_gmres_restarted(A, A.T, b, x_true, tol=1e-10, restart=6,
                            max_restarts=4)
    k = int(rr.niters)
    assert k >= 6
    assert np.all(np.isfinite(np.asarray(rr.res_hist)[:k]))


@pytest.mark.parametrize("kind", ["ba", "ab"])
@pytest.mark.parametrize("lam", [None, 1e-3])
def test_defer_histories_matches_masked_scan(kind, lam):
    """defer_histories=True (Arnoldi-only scan + batched projected solves +
    matmul histories) reproduces the masked scan: machine-precision on
    err/x/niters/NaN-mask; residual values match except when the LS residual
    sits at the machine-rank floor (|res| ~ 1e-8) where batched-vs-single QR
    kernel rounding is amplified by conditioning."""
    import numpy as np
    from hybrid_gmres_tpu import ab_gmres, ba_gmres, generate_test_problem
    from hybrid_gmres_tpu.problems import add_noise, perturb_backprojector

    A, b_exact, x_true = generate_test_problem("shaw", 32)
    b, _ = add_noise(b_exact, 1e-2, seed=0)
    B, _ = perturb_backprojector(A, 1e-4, seed=0)
    solver = ba_gmres if kind == "ba" else ab_gmres
    for tol in (0.0, 1e-2):
        r1 = solver(A, B, b, x_true, tol=tol, maxit=20, lam=lam,
                    residual="fused")
        r2 = solver(A, B, b, x_true, tol=tol, maxit=20, lam=lam,
                    residual="fused", defer_histories=True)
        assert int(r2.niters) == int(r1.niters)
        a1, a2 = np.asarray(r1.res_hist), np.asarray(r2.res_hist)
        assert np.array_equal(np.isnan(a1), np.isnan(a2))
        m = ~np.isnan(a1)
        # Nonhybrid solves run past the numerical rank grow ||y_k|| ~ 1e10,
        # and the computed residual b - W y carries an irreducible
        # eps*||W||*||y|| ~ 1e-4 noise floor in BOTH modes (the two QR
        # kernels land on different-but-equally-valid LS solutions); hybrid
        # solves are well-conditioned and match to machine precision.
        res_atol = 1e-12 if lam is not None else 5e-4
        np.testing.assert_allclose(a2[m], a1[m], rtol=1e-8, atol=res_atol)
        e1, e2 = np.asarray(r1.err_hist), np.asarray(r2.err_hist)
        np.testing.assert_allclose(e2[m], e1[m], rtol=1e-9)
        np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                                   rtol=1e-9, atol=1e-13)


def test_defer_histories_requires_fused():
    import pytest as _pytest
    from hybrid_gmres_tpu import ba_gmres, generate_test_problem

    A, b_exact, x_true = generate_test_problem("shaw", 16)
    with _pytest.raises(ValueError):
        ba_gmres(A, A.T, b_exact, maxit=4, defer_histories=True)


def test_basis_dtype_bf16_storage():
    """bf16 basis storage (DESIGN §10): Q/IMG stored bfloat16, arithmetic
    f32 — histories stay within the storage-rounding band of the f32 run,
    resume is exact within the bf16 run, and non-fused modes reject it."""
    import numpy as np
    import jax.numpy as jnp
    from hybrid_gmres_tpu.solvers.gmres import ab_gmres, ba_gmres

    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal((48, 32)).astype(np.float32) * 0.1
                    + np.eye(48, 32, dtype=np.float32))
    B = jnp.asarray(np.asarray(A).T.copy())
    xt = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    b = A @ xt

    r32 = ba_gmres(A, B, b, xt, tol=0.0, maxit=10, lam=1e-2,
                   residual="fused")
    rbf = ba_gmres(A, B, b, xt, tol=0.0, maxit=10, lam=1e-2,
                   residual="fused", basis_dtype=jnp.bfloat16)
    assert rbf.Q.dtype == jnp.bfloat16 and rbf.IMG.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(rbf.res_hist, np.float32), np.asarray(r32.res_hist),
        atol=5e-3, rtol=5e-3)

    part = ba_gmres(A, B, b, xt, tol=0.0, maxit=5, lam=1e-2,
                    residual="fused", basis_dtype=jnp.bfloat16)
    resd = ba_gmres(A, B, b, xt, tol=0.0, maxit=10, lam=1e-2,
                    residual="fused", basis_dtype=jnp.bfloat16,
                    resume_from=part)
    np.testing.assert_allclose(np.asarray(resd.res_hist, np.float32),
                               np.asarray(rbf.res_hist, np.float32),
                               rtol=2e-5)

    rab = ab_gmres(A, B, b, xt, tol=0.0, maxit=10, lam=1e-2,
                   residual="fused", basis_dtype=jnp.bfloat16)
    assert rab.S.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(rab.err_hist, np.float32)).all()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="basis_dtype"):
        ba_gmres(A, B, b, xt, tol=0.0, maxit=4, lam=1e-2,
                 basis_dtype=jnp.bfloat16)
