"""Batched (multi-RHS) solver + SpMM kernel oracles.

Semantics per RHS must EQUAL the single-RHS solvers — batching shares the
operator panel reads, it must not change a single number.
"""

import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import pytest

from hybrid_gmres_tpu import (
    ab_gmres,
    ab_gmres_batched,
    ba_gmres,
    ba_gmres_batched,
    generate_test_problem,
)
from hybrid_gmres_tpu.problems import add_noise, perturb_backprojector


@pytest.fixture(scope="module")
def prob():
    A, b_exact, x_true = generate_test_problem("shaw", 24)
    B, _ = perturb_backprojector(A, 1e-4, seed=0)
    rng = np.random.default_rng(3)
    R = 4
    bs = []
    for r in range(R):
        b, _ = add_noise(b_exact, 1e-2, seed=r)
        bs.append(np.asarray(b))
    return A, B, jnp.asarray(np.stack(bs, axis=1)), x_true


@pytest.mark.parametrize("lam", [None, 1e-3, "gcv"])
def test_ba_batched_matches_single_rhs(prob, lam):
    A, B, b_batch, x_true = prob
    r = ba_gmres_batched(A, B, b_batch, x_true, tol=0.0, maxit=12, lam=lam)
    assert r.x.shape == (24, 4) and r.err_hist.shape == (12, 4)
    for j in range(b_batch.shape[1]):
        rj = ba_gmres(A, B, b_batch[:, j], x_true, tol=0.0, maxit=12,
                      lam=lam, residual="fused")
        np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                   np.asarray(rj.res_hist), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(r.err_hist[:, j]),
                                   np.asarray(rj.err_hist), rtol=1e-8)
        xj = np.asarray(rj.x)
        # non-hybrid runs amplify to ~1e4 scale; compare relative to ||x||
        np.testing.assert_allclose(np.asarray(r.x[:, j]), xj, rtol=1e-6,
                                   atol=1e-8 * np.linalg.norm(xj))
        assert int(r.niters[j]) == int(rj.niters)


def test_ab_batched_matches_single_rhs(prob):
    A, B, b_batch, x_true = prob
    r = ab_gmres_batched(A, B, b_batch, x_true, tol=0.0, maxit=10, lam=1e-3)
    for j in range(b_batch.shape[1]):
        rj = ab_gmres(A, B, b_batch[:, j], x_true, tol=0.0, maxit=10,
                      lam=1e-3, residual="fused")
        np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                   np.asarray(rj.res_hist), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(r.x[:, j]),
                                   np.asarray(rj.x), rtol=1e-7, atol=1e-12)


def test_batched_per_rhs_early_exit(prob):
    """tol stops each RHS independently (per-RHS active masks)."""
    A, B, b_batch, x_true = prob
    # different noise per column -> different stopping iterations
    r = ba_gmres_batched(A, B, b_batch, x_true, tol=1e-2, maxit=24,
                         lam=None)
    niters = np.asarray(r.niters)
    hist = np.asarray(r.res_hist)
    for j in range(b_batch.shape[1]):
        k = int(niters[j])
        assert np.isfinite(hist[:k, j]).all()
        assert np.isnan(hist[k:, j]).all()
        rj = ba_gmres(A, B, b_batch[:, j], x_true, tol=1e-2, maxit=24,
                      residual="fused")
        assert k == int(rj.niters)


def test_batched_rejects_single_vector(prob):
    A, B, b_batch, x_true = prob
    with pytest.raises(ValueError, match="shape"):
        ba_gmres_batched(A, B, b_batch[:, 0], x_true, maxit=4)


def test_pallas_matmat_matches_per_column_matvec():
    """The SpMM kernels (interpret mode) reproduce per-column matvec
    exactly for f32/int8/packed-int4 panels, forward and transposed."""
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator

    rng = np.random.default_rng(0)
    A = sp.random(300, 260, density=0.05, format="csr",
                  random_state=0).astype(np.float32)
    A.data = rng.standard_normal(A.nnz).astype(np.float32)
    X = rng.standard_normal((260, 8)).astype(np.float32)
    U = rng.standard_normal((300, 8)).astype(np.float32)
    for dt, with_adj in ((jnp.float32, False), ("int8", True),
                         ("int4", False)):
        dt_arg = jnp.int8 if dt == "int8" else dt
        op = PallasBSROperator.from_csr(A, dtype=dt_arg, interpret=True,
                                        with_adjoint=with_adj)
        Y = np.asarray(op.matmat(jnp.asarray(X)))
        Z = np.asarray(op.rmatmat(jnp.asarray(U)))
        Yr = np.stack([np.asarray(op.matvec(jnp.asarray(X[:, j])))
                       for j in range(8)], 1)
        Zr = np.stack([np.asarray(op.rmatvec(jnp.asarray(U[:, j])))
                       for j in range(8)], 1)
        np.testing.assert_allclose(Y, Yr, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(Z, Zr, rtol=1e-6, atol=1e-6)


def test_batched_with_pallas_operator():
    """End-to-end batched solve on the Pallas SpMM path (interpret) ==
    single-RHS Pallas runs."""
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator

    rng = np.random.default_rng(5)
    m, n = 96, 64
    Ad = (rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.3)
          ).astype(np.float32)
    Bd = (Ad.T + 1e-3 * rng.standard_normal((n, m))).astype(np.float32)
    A_op = PallasBSROperator.from_csr(sp.csr_matrix(Ad), interpret=True)
    B_op = PallasBSROperator.from_csr(sp.csr_matrix(Bd), interpret=True)
    x_true = rng.standard_normal(n).astype(np.float32)
    b1 = (Ad @ x_true + 0.01 * rng.standard_normal(m)).astype(np.float32)
    b2 = (Ad @ x_true + 0.02 * rng.standard_normal(m)).astype(np.float32)
    b_batch = jnp.asarray(np.stack([b1, b2], 1))
    r = ba_gmres_batched(A_op, B_op, b_batch, jnp.asarray(x_true), tol=0.0,
                         maxit=8, lam=1e-3)
    for j, bj in enumerate((b1, b2)):
        rj = ba_gmres(A_op, B_op, jnp.asarray(bj), jnp.asarray(x_true),
                      tol=0.0, maxit=8, lam=1e-3, residual="fused")
        np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                   np.asarray(rj.res_hist), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(r.err_hist[:, j]),
                                   np.asarray(rj.err_hist), rtol=1e-4)


# ---------------------------------------------------------------------------
# Warm start / resume / chunking (VERDICT r3 #2, #8)
# ---------------------------------------------------------------------------

def _serving_pair(m=48, n=32, R=5, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32) * 0.1
                    + np.eye(m, n, dtype=np.float32))
    B = jnp.asarray(np.asarray(A).T
                    + 1e-3 * rng.standard_normal((n, m)).astype(np.float32))
    Xt = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32))
    X0 = jnp.asarray(rng.standard_normal((n, R)).astype(np.float32) * 0.1)
    return A, B, A @ Xt, Xt, X0


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_batched_warm_start_matches_single_rhs(kind):
    """x0 != 0 batched == per-RHS single-RHS solver with the same x0."""
    from hybrid_gmres_tpu.solvers.gmres import ab_gmres, ba_gmres

    A, B, bb, Xt, X0 = _serving_pair()
    batched = ba_gmres_batched if kind == "ba" else ab_gmres_batched
    single = ba_gmres if kind == "ba" else ab_gmres
    rb = batched(A, B, bb, Xt, maxit=8, lam=1e-3, x0=X0)
    for r in range(bb.shape[1]):
        rs = single(A, B, bb[:, r], Xt[:, r], tol=0.0, maxit=8, lam=1e-3,
                    x0=X0[:, r], residual="fused")
        np.testing.assert_allclose(np.asarray(rb.res_hist[:, r]),
                                   np.asarray(rs.res_hist), atol=5e-5)
        np.testing.assert_allclose(np.asarray(rb.err_hist[:, r]),
                                   np.asarray(rs.err_hist), atol=5e-5)


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_batched_resume_equals_uninterrupted(kind):
    """resume(run(5), 10) == run(10) for every RHS, including a tol stop
    that freezes some RHS mid-history (active flags carried)."""
    A, B, bb, Xt, X0 = _serving_pair(seed=2)
    batched = ba_gmres_batched if kind == "ba" else ab_gmres_batched
    kw = dict(maxit=10, lam=1e-3, tol=1e-5, x0=X0, chunk_rhs=2)
    full = batched(A, B, bb, Xt, **kw)
    part = batched(A, B, bb, Xt, **{**kw, "maxit": 5})
    resd = batched(A, B, bb, Xt, **kw, resume_from=part)
    f, r = np.asarray(full.res_hist), np.asarray(resd.res_hist)
    assert (np.isfinite(f) == np.isfinite(r)).all()
    np.testing.assert_allclose(r[np.isfinite(r)], f[np.isfinite(f)],
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(resd.x), np.asarray(full.x),
                               atol=5e-5)


def test_batched_chunking_matches_unchunked():
    """chunk_rhs splits R into independent scans with identical numbers
    and correctly concatenated result shapes."""
    A, B, bb, Xt, X0 = _serving_pair(R=5)
    n, R = Xt.shape
    r1 = ba_gmres_batched(A, B, bb, Xt, maxit=8, lam=1e-3, x0=X0,
                          chunk_rhs=None)
    r2 = ba_gmres_batched(A, B, bb, Xt, maxit=8, lam=1e-3, x0=X0,
                          chunk_rhs=2)
    np.testing.assert_allclose(np.asarray(r2.res_hist),
                               np.asarray(r1.res_hist), atol=1e-6)
    assert r2.x.shape == (n, R)
    assert r2.Q.shape[2] == R and r2.H.shape[2] == R
    assert r2.active.shape == (R,) and r2.niters.shape == (R,)


def test_batched_warm_start_saves_iterations():
    """The serving win: a warm start from a nearby solution reaches the
    quality target in fewer iterations than a cold start."""
    A, B, bb, Xt, _ = _serving_pair(R=3, seed=4)
    cold = ba_gmres_batched(A, B, bb, Xt, maxit=12, lam=1e-4)
    warm = ba_gmres_batched(A, B, bb, Xt, maxit=12, lam=1e-4, x0=cold.x)
    # the warm start begins at the cold run's final residual level
    assert float(np.nanmax(warm.res_hist[0, :])) < \
        float(np.nanmin(cold.res_hist[0, :]))


def test_batched_checkpoint_roundtrip(tmp_path):
    """save_state/load_state handle the batched (R,) niters/beta/active and
    the loaded checkpoint resumes identically (the serving persistence
    flow)."""
    from hybrid_gmres_tpu.utils.checkpoint import load_state, save_state

    A, B, bb, Xt, X0 = _serving_pair(seed=7)
    part = ba_gmres_batched(A, B, bb, Xt, maxit=4, lam=1e-3, x0=X0)
    path = str(tmp_path / "batched.npz")
    save_state(path, part)
    loaded = load_state(path)
    assert loaded.niters.shape == part.niters.shape
    full = ba_gmres_batched(A, B, bb, Xt, maxit=8, lam=1e-3, x0=X0)
    resd = ba_gmres_batched(A, B, bb, Xt, maxit=8, lam=1e-3, x0=X0,
                            resume_from=loaded)
    np.testing.assert_allclose(np.asarray(resd.res_hist),
                               np.asarray(full.res_hist), atol=5e-5)


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_batched_defer_histories_matches_in_scan(kind):
    """defer_histories (Arnoldi-only scan + post-scan solves/histories)
    reproduces the in-scan batched solver including warm starts, chunking
    and post-hoc tol stopping; resume is rejected."""
    A, B, bb, Xt, X0 = _serving_pair(seed=11)
    batched = ba_gmres_batched if kind == "ba" else ab_gmres_batched
    r_s = batched(A, B, bb, Xt, maxit=8, lam=1e-3, x0=X0, chunk_rhs=2)
    r_d = batched(A, B, bb, Xt, maxit=8, lam=1e-3, x0=X0, chunk_rhs=2,
                  defer_histories=True)
    np.testing.assert_allclose(np.asarray(r_d.res_hist),
                               np.asarray(r_s.res_hist), atol=5e-5)
    np.testing.assert_allclose(np.asarray(r_d.err_hist),
                               np.asarray(r_s.err_hist), atol=5e-5)
    np.testing.assert_allclose(np.asarray(r_d.x), np.asarray(r_s.x),
                               atol=5e-5)
    assert r_d.IMG.shape == r_s.IMG.shape

    rt_s = batched(A, B, bb, Xt, maxit=10, lam=1e-3, tol=1e-5)
    rt_d = batched(A, B, bb, Xt, maxit=10, lam=1e-3, tol=1e-5,
                   defer_histories=True)
    assert (np.asarray(rt_s.niters) == np.asarray(rt_d.niters)).all()
    assert (np.isfinite(np.asarray(rt_s.res_hist))
            == np.isfinite(np.asarray(rt_d.res_hist))).all()

    with pytest.raises(ValueError, match="defer_histories"):
        batched(A, B, bb, Xt, maxit=10, lam=1e-3, defer_histories=True,
                resume_from=rt_s)


def test_batched_defer_edge_cases_match_in_scan():
    """Deferred edge semantics == in-scan: an exactly-converged warm start
    returns x0 (not zero), and a breakdown on the FINAL iteration ends
    inactive (else a resumed solve would iterate on the zero vector)."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32) * 0.1
                    + np.eye(16, 8, dtype=np.float32))
    B = jnp.asarray(np.asarray(A).T.copy())
    X0 = jnp.asarray(rng.standard_normal((8, 2)).astype(np.float32))
    bb = A @ X0                       # zero residual under the warm start
    r_d = ba_gmres_batched(A, B, bb, maxit=4, lam=1e-3, x0=X0,
                           defer_histories=True)
    np.testing.assert_allclose(np.asarray(r_d.x), np.asarray(X0),
                               atol=1e-6)

    I8 = jnp.eye(8, dtype=jnp.float32)
    be = jnp.zeros((8, 2), jnp.float32).at[0, 0].set(1.0).at[1, 1].set(2.0)
    rs = ba_gmres_batched(I8, I8, be, maxit=1, lam=1e-1)
    rd = ba_gmres_batched(I8, I8, be, maxit=1, lam=1e-1,
                          defer_histories=True)
    assert (np.asarray(rs.active) == np.asarray(rd.active)).all()
    assert not np.asarray(rd.active).any()


def test_gcv_final_matches_per_iteration_gcv_minima():
    """lam='gcv-final' (one GCV selection per RHS from the final projected
    problem, ~fixed-lambda cost) reproduces the per-iteration lam='gcv'
    min-over-k errors on the deriv2 scenario, and is rejected without
    defer_histories (VERDICT r4 #6; reference anchor
    analyze_regularization.m:37-46)."""
    import numpy as np
    import jax.numpy as jnp
    import pytest
    from hybrid_gmres_tpu import generate_test_problem
    from hybrid_gmres_tpu.problems import add_noise
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    A, b_exact, x_true = generate_test_problem("deriv2", 32)
    A = jnp.asarray(np.asarray(A, np.float32))
    cols = []
    for r in range(3):
        bn, _ = add_noise(A @ jnp.asarray(np.asarray(x_true, np.float32)),
                          1e-2, seed=r)
        cols.append(np.asarray(bn, np.float32))
    b = jnp.asarray(np.stack(cols, 1))
    xt = jnp.asarray(np.asarray(x_true, np.float32))

    r_gcv = ba_gmres_batched(A, A.T, b, xt, tol=0.0, maxit=16, lam="gcv",
                             defer_histories=True)
    r_fin = ba_gmres_batched(A, A.T, b, xt, tol=0.0, maxit=16,
                             lam="gcv-final", defer_histories=True)
    m_gcv = np.nanmin(np.asarray(r_gcv.err_hist), axis=0)
    m_fin = np.nanmin(np.asarray(r_fin.err_hist), axis=0)
    np.testing.assert_allclose(m_fin, m_gcv, rtol=0.05)

    with pytest.raises(ValueError, match="gcv-final"):
        ba_gmres_batched(A, A.T, b, xt, maxit=8, lam="gcv-final")


# ---------------------------------------------------------------------------
# Batched GKB family (solvers/gkb_batched.py)
# ---------------------------------------------------------------------------

def _gkb_pair(m=48, n=24, R=4, seed=13):
    """Moderately conditioned random pair: strict per-column parity is
    meaningful here (on shaw, cond ~1e12 amplifies last-digit
    matmat-vs-matvec differences into O(1) null-space drift of the
    NON-regularized x — physical semiconvergence, see the conventions
    note in CLAUDE.md)."""
    rng = np.random.default_rng(seed)
    Ad = jnp.asarray(rng.standard_normal((m, n)) / np.sqrt(n))
    X_true = jnp.asarray(rng.standard_normal((n, R)))
    Bb = Ad @ X_true + 0.01 * jnp.asarray(rng.standard_normal((m, R)))
    return Ad, Bb, X_true


def test_gkb_batched_matches_single_rhs():
    """lsqr/hybrid_lsqr/lsmr_batched == the single-RHS solvers per column
    (same recurrences vectorized to (R,); per-RHS final true-residual
    patch on LSQR; exact ar_hist on LSMR), incl. reorth."""
    from hybrid_gmres_tpu import (hybrid_lsqr, hybrid_lsqr_batched, lsmr,
                                  lsmr_batched, lsqr, lsqr_batched)

    Ad, Bb, X_true = _gkb_pair()
    for reorth in (False, True):
        cases = [(lsqr_batched, lsqr, {}),
                 (hybrid_lsqr_batched, hybrid_lsqr, {"lam": 1e-3}),
                 (lsmr_batched, lsmr, {})]
        for batched, single, kw in cases:
            r = batched(Ad, Bb, X_true, tol=0.0, maxit=10, reorth=reorth,
                        **kw)
            assert r.res_hist.shape == (10, 4)
            for j in range(Bb.shape[1]):
                rj = single(Ad, Bb[:, j], X_true[:, j], tol=0.0, maxit=10,
                            reorth=reorth, **kw)
                np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                           np.asarray(rj.res_hist),
                                           rtol=1e-8, atol=1e-12)
                np.testing.assert_allclose(np.asarray(r.err_hist[:, j]),
                                           np.asarray(rj.err_hist),
                                           rtol=1e-8, atol=1e-12)
                np.testing.assert_allclose(np.asarray(r.x[:, j]),
                                           np.asarray(rj.x), rtol=1e-7,
                                           atol=1e-10)
                if rj.ar_hist is not None:
                    np.testing.assert_allclose(np.asarray(r.ar_hist[:, j]),
                                               np.asarray(rj.ar_hist),
                                               rtol=1e-7, atol=1e-12)
                assert int(r.niters[j]) == int(rj.niters)


def test_gkb_batched_hybrid_on_illposed(prob):
    """On the ill-posed shaw operator the REGULARIZED batched solve stays
    at ~1e-4 per-column parity (lam pins the null-space components enough
    that the matmat-vs-matvec last-digit differences no longer blow up to
    the O(1) drift of the non-hybrid x there — but shaw's conditioning
    still magnifies them ~1e4x over the well-conditioned case)."""
    from hybrid_gmres_tpu import hybrid_lsqr, hybrid_lsqr_batched

    A, B, b_batch, x_true = prob
    r = hybrid_lsqr_batched(A, b_batch, x_true, tol=0.0, maxit=10,
                            lam=1e-3)
    for j in range(b_batch.shape[1]):
        rj = hybrid_lsqr(A, b_batch[:, j], x_true, tol=0.0, maxit=10,
                         lam=1e-3)
        np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                   np.asarray(rj.res_hist), rtol=1e-4)
        # x itself keeps percent-level sensitivity: sigma ~ sqrt(lam)
        # components are only half-pinned on this spectrum
        xj = np.asarray(rj.x)
        assert np.linalg.norm(np.asarray(r.x[:, j]) - xj) <= \
            2e-2 * np.linalg.norm(xj)


def test_gkb_batched_warm_start_and_resume():
    """Batched GKB x0 warm starts match the single-RHS warm starts per
    column; resume(run(k), K) == run(K) exactly; wrong-x0 and mismatched
    reorth resumes raise."""
    from hybrid_gmres_tpu import (hybrid_lsqr, hybrid_lsqr_batched, lsmr,
                                  lsmr_batched, lsqr, lsqr_batched)

    Ad, Bb, X_true = _gkb_pair(seed=17)
    rng = np.random.default_rng(5)
    X0 = X_true + 0.2 * jnp.asarray(rng.standard_normal(X_true.shape))
    cases = [(lsqr_batched, lsqr, {}),
             (hybrid_lsqr_batched, hybrid_lsqr, {"lam": 1e-3}),
             (lsmr_batched, lsmr, {})]
    for batched, single, kw in cases:
        r = batched(Ad, Bb, X_true, tol=0.0, maxit=8, x0=X0, **kw)
        for j in range(Bb.shape[1]):
            rj = single(Ad, Bb[:, j], X_true[:, j], tol=0.0, maxit=8,
                        x0=X0[:, j], **kw)
            np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                       np.asarray(rj.res_hist),
                                       rtol=1e-8, atol=1e-12)
            np.testing.assert_allclose(np.asarray(r.x[:, j]),
                                       np.asarray(rj.x), rtol=1e-7,
                                       atol=1e-10)
        for reorth in (False, True):
            full = batched(Ad, Bb, X_true, tol=0.0, maxit=8, x0=X0,
                           reorth=reorth, **kw)
            part = batched(Ad, Bb, X_true, tol=0.0, maxit=4, x0=X0,
                           reorth=reorth, **kw)
            resumed = batched(Ad, Bb, X_true, tol=0.0, maxit=8, x0=X0,
                              reorth=reorth, resume_from=part.state, **kw)
            np.testing.assert_array_equal(np.asarray(resumed.res_hist),
                                          np.asarray(full.res_hist))
            np.testing.assert_array_equal(np.asarray(resumed.x),
                                          np.asarray(full.x))
        with pytest.raises(ValueError, match="reorth"):
            batched(Ad, Bb, X_true, maxit=8, x0=X0, reorth=False,
                    resume_from=part.state, **kw)
        with pytest.raises(ValueError, match="fingerprint"):
            batched(Ad, Bb, X_true, maxit=8, x0=2.0 * X0, reorth=True,
                    resume_from=part.state, **kw)


def test_gkb_batched_rejects_single_vector(prob):
    from hybrid_gmres_tpu import lsqr_batched

    A, B, b_batch, x_true = prob
    with pytest.raises(ValueError, match="shape"):
        lsqr_batched(A, b_batch[:, 0], x_true)


def test_gkb_batched_with_pallas_operator():
    """Batched GKB on the sparse kernel operator: the multi-RHS SpMM path
    with the exact shared-quantization adjoint pair (int8), per-column
    parity with the single-RHS solver on the same operator."""
    from hybrid_gmres_tpu import lsqr, lsqr_batched
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator

    rng = np.random.default_rng(7)
    Ad = (rng.standard_normal((64, 32)) * (rng.random((64, 32)) < 0.3)
          ).astype(np.float32)
    X_true = rng.standard_normal((32, 3)).astype(np.float32)
    Bb = jnp.asarray((Ad @ X_true).astype(np.float32))
    for dtype in (jnp.float32, jnp.int8):
        A_op = PallasBSROperator.from_csr(sp.csr_matrix(Ad), dtype=dtype,
                                          interpret=True)
        r = lsqr_batched(A_op, Bb, jnp.asarray(X_true), tol=0.0, maxit=8)
        for j in range(3):
            rj = lsqr(A_op, Bb[:, j], jnp.asarray(X_true[:, j]), tol=0.0,
                      maxit=8)
            np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                       np.asarray(rj.res_hist), rtol=2e-5,
                                       atol=1e-7)


def test_hybrid_lsqr_batched_per_rhs_lam():
    """An (R,) lam vector on hybrid_lsqr_batched gives each RHS its own
    Tikhonov strength — per column == the single-RHS solver at that lam;
    resuming with a different lam VECTOR is fingerprint-rejected."""
    from hybrid_gmres_tpu import hybrid_lsqr, hybrid_lsqr_batched

    Ad, Bb, X_true = _gkb_pair(seed=19)
    lams = jnp.asarray([1e-4, 1e-3, 1e-2, 1e-1])
    r = hybrid_lsqr_batched(Ad, Bb, X_true, tol=0.0, maxit=8, lam=lams)
    for j in range(4):
        rj = hybrid_lsqr(Ad, Bb[:, j], X_true[:, j], tol=0.0, maxit=8,
                         lam=float(lams[j]))
        np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                   np.asarray(rj.res_hist), rtol=1e-8,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(r.x[:, j]),
                                   np.asarray(rj.x), rtol=1e-7, atol=1e-10)
    part = hybrid_lsqr_batched(Ad, Bb, X_true, tol=0.0, maxit=4, lam=lams)
    full = hybrid_lsqr_batched(Ad, Bb, X_true, tol=0.0, maxit=8, lam=lams,
                               resume_from=part.state)
    np.testing.assert_array_equal(np.asarray(full.res_hist[:4]),
                                  np.asarray(part.res_hist))
    with pytest.raises(ValueError, match="fingerprint"):
        hybrid_lsqr_batched(Ad, Bb, X_true, maxit=8,
                            lam=jnp.asarray([1e-3, 1e-3, 1e-2, 1e-1]),
                            resume_from=part.state)
    with pytest.raises(ValueError, match="scalar or an"):
        hybrid_lsqr_batched(Ad, Bb, X_true, maxit=8,
                            lam=jnp.asarray([1e-3, 1e-2]))
