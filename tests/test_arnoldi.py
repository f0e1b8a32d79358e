import numpy as np
import jax.numpy as jnp

from hybrid_gmres_tpu.krylov.arnoldi import arnoldi
from hybrid_gmres_tpu.krylov.projected import (
    projected_ls_solve,
    projected_tikhonov_solve,
)
from hybrid_gmres_tpu.problems import shaw


def _problem(n=24):
    A, b, x = shaw(n)
    M = np.asarray(A.T @ A)  # BA-type operator with B = A^T
    r0 = np.asarray(A.T @ b)
    return M, r0


def test_arnoldi_orthonormal_and_relation():
    M, r0 = _problem()
    maxit = 12
    Q, H, beta, nsteps = arnoldi(lambda v: jnp.asarray(M) @ v, jnp.asarray(r0), maxit)
    Q = np.asarray(Q)
    H = np.asarray(H)
    k = int(nsteps)
    assert k == maxit
    Qk = Q[:, : k + 1]
    np.testing.assert_allclose(Qk.T @ Qk, np.eye(k + 1), atol=1e-12)
    # Arnoldi relation M Q_k = Q_{k+1} Hbar_k
    np.testing.assert_allclose(M @ Q[:, :k], Qk @ H[: k + 1, :k], atol=1e-10)
    assert abs(float(beta) - np.linalg.norm(r0)) < 1e-12


def test_arnoldi_matches_numpy_cgs2():
    """The JAX CGS2 must agree with an independent numpy CGS2 in f64.

    Limited to k=6: beyond that shaw's A^T A is at machine-precision rank and
    the Krylov directions are rounding noise (any two correct implementations
    diverge there).
    """
    M, r0 = _problem()
    maxit = 6
    Q, H, beta, _ = arnoldi(lambda v: jnp.asarray(M) @ v, jnp.asarray(r0), maxit)

    n = M.shape[0]
    Qn = np.zeros((n, maxit + 1))
    Hn = np.zeros((maxit + 1, maxit))
    Qn[:, 0] = r0 / np.linalg.norm(r0)
    for k in range(maxit):
        w = M @ Qn[:, k]
        c1 = Qn.T @ w
        w = w - Qn @ c1
        c2 = Qn.T @ w
        w = w - Qn @ c2
        Hn[:, k] = c1 + c2
        Hn[k + 1, k] = np.linalg.norm(w)
        Qn[:, k + 1] = w / Hn[k + 1, k]

    np.testing.assert_allclose(np.asarray(H), Hn, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Q), Qn, atol=1e-12)


def test_arnoldi_close_to_mgs_on_moderate_problem():
    """CGS2 and MGS agree to rounding on a moderately conditioned operator
    (the reference's MGS loop, ``ABgmres_hybrid_bounds.m:26-29``, is the
    process being reproduced; differences appear only at the level of lost
    orthogonality on severely ill-posed operators)."""
    from hybrid_gmres_tpu.problems import deriv2

    A, b, _ = deriv2(24)
    M = np.asarray(A.T @ A)
    r0 = np.asarray(A.T @ b)
    maxit = 8
    Q, H, _, _ = arnoldi(lambda v: jnp.asarray(M) @ v, jnp.asarray(r0), maxit)

    n = M.shape[0]
    Qn = np.zeros((n, maxit + 1))
    Hn = np.zeros((maxit + 1, maxit))
    Qn[:, 0] = r0 / np.linalg.norm(r0)
    for k in range(maxit):
        v = M @ Qn[:, k]
        for j in range(k + 1):
            Hn[j, k] = Qn[:, j] @ v
            v = v - Hn[j, k] * Qn[:, j]
        Hn[k + 1, k] = np.linalg.norm(v)
        Qn[:, k + 1] = v / Hn[k + 1, k]

    np.testing.assert_allclose(np.asarray(H), Hn, atol=1e-10)


def test_projected_ls_matches_lstsq():
    M, r0 = _problem()
    maxit = 12
    Q, H, beta, _ = arnoldi(lambda v: jnp.asarray(M) @ v, jnp.asarray(r0), maxit)
    t = jnp.zeros((maxit + 1,)).at[0].set(beta)
    for kdim in (1, 4, 12):
        y = np.asarray(projected_ls_solve(H, t, kdim))
        Hk = np.asarray(H)[: kdim + 1, :kdim]
        tk = np.zeros(kdim + 1)
        tk[0] = float(beta)
        y_ref, *_ = np.linalg.lstsq(Hk, tk, rcond=None)
        np.testing.assert_allclose(y[:kdim], y_ref, rtol=1e-8, atol=1e-10)
        assert np.all(y[kdim:] == 0.0)


def test_projected_tikhonov_matches_dense():
    M, r0 = _problem()
    maxit = 12
    Q, H, beta, _ = arnoldi(lambda v: jnp.asarray(M) @ v, jnp.asarray(r0), maxit)
    t = jnp.zeros((maxit + 1,)).at[0].set(beta)
    lam = 1e-3
    for kdim in (1, 5, 12):
        y = np.asarray(projected_tikhonov_solve(H, t, lam, kdim))
        Hk = np.asarray(H)[: kdim + 1, :kdim]
        tk = np.zeros(kdim + 1)
        tk[0] = float(beta)
        y_ref = np.linalg.solve(Hk.T @ Hk + lam * np.eye(kdim), Hk.T @ tk)
        np.testing.assert_allclose(y[:kdim], y_ref, rtol=1e-9, atol=1e-12)
        assert np.all(y[kdim:] == 0.0)
