"""Checkpoint/resume, adaptive-GCV solver mode, profiling helpers."""

import numpy as np
import jax.numpy as jnp
import pytest

import hybrid_gmres_tpu as hg
from hybrid_gmres_tpu.problems import add_noise, perturb_backprojector
from hybrid_gmres_tpu.utils.checkpoint import save_state, load_state, pad_state
from hybrid_gmres_tpu.utils.profiling import benchmark, spmv_throughput


@pytest.fixture(scope="module")
def prob():
    A, b_exact, x_true = hg.generate_test_problem("shaw", 24)
    b, _ = add_noise(b_exact, 1e-2, seed=0)
    B, _ = perturb_backprojector(A, 1e-4, seed=0)
    return A, B, b, x_true


def test_resume_equals_uninterrupted(prob):
    """Continuation matches a straight-through run.  Not bitwise: the partial
    run's padded basis is (n, 11) vs (n, 21), so the CGS2 matmuls reduce in a
    different order; those 1e-12-level basis differences are amplified by the
    ill-conditioned projected solve (~1e-5 on x for shaw), while the error /
    residual functionals stay tight."""
    A, B, b, x_true = prob
    full = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=20, lam=1e-3)
    part = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=10, lam=1e-3)
    cont = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=20, lam=1e-3,
                       resume_from=part)
    np.testing.assert_allclose(np.asarray(cont.x), np.asarray(full.x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cont.err_hist),
                               np.asarray(full.err_hist), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cont.res_hist),
                               np.asarray(full.res_hist), rtol=1e-6)
    assert int(cont.niters) == int(full.niters)


def test_resume_roundtrips_through_disk(prob, tmp_path):
    A, B, b, x_true = prob
    part = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=8, lam=1e-3)
    path = str(tmp_path / "state.npz")
    save_state(path, part)
    loaded = load_state(path)
    cont = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=16, lam=1e-3,
                       resume_from=loaded)
    full = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=16, lam=1e-3)
    np.testing.assert_allclose(np.asarray(cont.x), np.asarray(full.x),
                               rtol=1e-10)


def test_fused_resume_equals_uninterrupted(prob):
    """residual='fused' (the production fast path) is resumable: the stored
    image basis is checkpointed with the factorization (VERDICT r2 #5), and
    continuation reproduces the uninterrupted fused run."""
    A, B, b, x_true = prob
    full = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=20, lam=1e-3,
                       residual="fused")
    part = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=10, lam=1e-3,
                       residual="fused")
    assert part.IMG is not None
    cont = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=20, lam=1e-3,
                       residual="fused", resume_from=part)
    np.testing.assert_allclose(np.asarray(cont.err_hist),
                               np.asarray(full.err_hist), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cont.res_hist),
                               np.asarray(full.res_hist), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cont.x), np.asarray(full.x),
                               rtol=1e-4, atol=1e-6)
    # and the fused histories themselves equal the explicit-matvec mode
    ref = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=20, lam=1e-3)
    np.testing.assert_allclose(np.asarray(cont.res_hist),
                               np.asarray(ref.res_hist), rtol=1e-8)


def test_fused_resume_ab_roundtrips_through_disk(prob, tmp_path):
    """AB fused runs carry TWO image bases (S for the solution, IMG for the
    residual); both survive a save/load roundtrip."""
    A, B, b, x_true = prob
    part = hg.ab_gmres(A, B, b, x_true, tol=0.0, maxit=8, lam=1e-3,
                       residual="fused")
    assert part.IMG is not None and part.S is not None
    path = str(tmp_path / "fused.npz")
    save_state(path, part)
    loaded = load_state(path)
    cont = hg.ab_gmres(A, B, b, x_true, tol=0.0, maxit=16, lam=1e-3,
                       residual="fused", resume_from=loaded)
    full = hg.ab_gmres(A, B, b, x_true, tol=0.0, maxit=16, lam=1e-3,
                       residual="fused")
    np.testing.assert_allclose(np.asarray(cont.res_hist),
                               np.asarray(full.res_hist), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cont.x), np.asarray(full.x),
                               rtol=1e-4, atol=1e-8)


def test_fused_resume_rejects_unfused_checkpoint(prob):
    A, B, b, x_true = prob
    part = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=8, lam=1e-3)
    with pytest.raises(ValueError, match="fused"):
        hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=16, lam=1e-3,
                    residual="fused", resume_from=part)


def test_pad_state_rejects_shrink(prob):
    A, B, b, x_true = prob
    part = hg.ba_gmres(A, B, b, x_true, tol=0.0, maxit=8, lam=1e-3)
    with pytest.raises(ValueError):
        pad_state(part, 4)


def test_gcv_adaptive_lambda_mode(prob):
    A, B, b, x_true = prob
    r = hg.ba_gmres(A, B, b, x_true, tol=1e-8, maxit=24, lam="gcv")
    err = np.asarray(r.err_hist)[: int(r.niters)]
    assert np.all(np.isfinite(err))
    # the adaptive mode must not blow up like the non-hybrid run
    r_non = hg.ba_gmres(A, B, b, x_true, tol=1e-8, maxit=24)
    err_non = np.asarray(r_non.err_hist)[: int(r_non.niters)]
    assert err[-1] < err_non[-1]


def test_gcv_mode_invalid_string(prob):
    A, B, b, x_true = prob
    with pytest.raises(ValueError):
        hg.ba_gmres(A, B, b, x_true, maxit=4, lam="banana")


def test_benchmark_helper():
    f = lambda x: jnp.sum(x * x)
    out = benchmark(f, jnp.ones(128), iters=2)
    assert out["best_s"] > 0
    tp = spmv_throughput(1000, 0.001)
    assert tp["nnz_per_s"] == 1e6


def test_device_seconds_repeat_slope():
    """device_seconds measures the per-call device time of a chained
    computation: roughly linear in the work, and far below the wall time
    of a single call when a fixed overhead is added around it."""
    import jax
    import jax.numpy as jnp

    from hybrid_gmres_tpu.utils.profiling import device_seconds

    M = jnp.asarray(np.random.default_rng(0).standard_normal(
        (256, 256)).astype(np.float32))

    def work(x, M):
        def body(c, _):
            return jnp.tanh(M @ c), ()
        c, _ = jax.lax.scan(body, x, jnp.arange(50))
        return c

    x = jnp.ones((256,), jnp.float32)
    t1 = device_seconds(work, x, M, repeats=3)

    def work2(x, M):
        def body(c, _):
            return jnp.tanh(M @ c), ()
        c, _ = jax.lax.scan(body, x, jnp.arange(100))
        return c

    t2 = device_seconds(work2, x, M, repeats=3)
    assert t1 > 0 and t2 > 0
    # 2x the scan length: between 1.2x and 6x the measured device time
    # (loose band — CI machines jitter)
    assert 1.2 * t1 < t2 < 6 * t1, (t1, t2)

    import pytest as _p
    with _p.raises(ValueError, match="reps"):
        device_seconds(work, x, M, reps=(3, 1))


def test_resume_fingerprint_rejects_changed_x0_lam():
    """Resuming with a different x0/lam raises instead of silently
    corrupting (VERDICT r4 #7): the checkpointed result carries a compact
    (x0, lam) fingerprint verified across gmres / sharded / batched /
    GKB surfaces; legacy checkpoints (fp=None) still resume."""
    import jax.numpy as jnp
    import pytest

    from hybrid_gmres_tpu import ba_gmres, generate_test_problem, lsqr
    from hybrid_gmres_tpu.problems import add_noise
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched
    from hybrid_gmres_tpu.solvers.lsqr import hybrid_lsqr

    A, b_exact, x_true = generate_test_problem("deriv2", 16)
    b, _ = add_noise(b_exact, 1e-2, seed=0)
    B = A.T
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal(16))
    x0_wrong = x0 + 0.5

    # single-chip GMRES: wrong x0 and wrong lam both rejected
    part = ba_gmres(A, B, b, x_true, tol=0.0, maxit=4, lam=1e-3, x0=x0)
    r = ba_gmres(A, B, b, x_true, tol=0.0, maxit=8, lam=1e-3, x0=x0,
                 resume_from=part)
    assert int(r.niters) == 8
    with pytest.raises(ValueError, match="fingerprint"):
        ba_gmres(A, B, b, x_true, maxit=8, lam=1e-3, x0=x0_wrong,
                 resume_from=part)
    with pytest.raises(ValueError, match="fingerprint"):
        ba_gmres(A, B, b, x_true, maxit=8, lam=1e-2, x0=x0,
                 resume_from=part)
    # legacy checkpoint (no fp) resumes without a check
    legacy = part._replace(fp=None)
    ba_gmres(A, B, b, x_true, maxit=8, lam=1e-2, resume_from=legacy)

    # GKB state fingerprints (lsqr x0; hybrid_lsqr lam)
    pg = lsqr(A, b, x_true, tol=0.0, maxit=4, x0=x0)
    lsqr(A, b, x_true, tol=0.0, maxit=8, x0=x0, resume_from=pg.state)
    with pytest.raises(ValueError, match="fingerprint"):
        lsqr(A, b, x_true, maxit=8, x0=x0_wrong, resume_from=pg.state)
    ph = hybrid_lsqr(A, b, x_true, tol=0.0, maxit=4, lam=1e-3)
    with pytest.raises(ValueError, match="fingerprint"):
        hybrid_lsqr(A, b, x_true, maxit=8, lam=1e-2, resume_from=ph.state)

    # batched: per-RHS x0 mismatch rejected
    bb = jnp.stack([b, b], axis=1)
    x0b = jnp.stack([x0, x0], axis=1)
    pb = ba_gmres_batched(A, B, bb, x_true, tol=0.0, maxit=4, lam=1e-3,
                          x0=x0b)
    ba_gmres_batched(A, B, bb, x_true, tol=0.0, maxit=8, lam=1e-3, x0=x0b,
                     resume_from=pb)
    with pytest.raises(ValueError, match="fingerprint"):
        ba_gmres_batched(A, B, bb, x_true, maxit=8, lam=1e-3,
                         x0=x0b + 0.5, resume_from=pb)

    # fingerprint survives a save/load round-trip
    import tempfile, os
    from hybrid_gmres_tpu.utils.checkpoint import load_state, save_state

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ck.npz")
        save_state(path, part)
        loaded = load_state(path)
        assert loaded.fp is not None
        with pytest.raises(ValueError, match="fingerprint"):
            ba_gmres(A, B, b, x_true, maxit=8, lam=1e-3, x0=x0_wrong,
                     resume_from=loaded)


def test_fingerprint_lam_slot_is_exact():
    """The lam and tag fingerprint slots compare EXACTLY: a 1e-8 vs 9e-7
    lam (90x different regularizer, below the old atol) and a tagged-mode
    lam mismatch (the old additive tag offset swamped lam's float32
    mantissa) must both raise; broadcast-equal x0 and legacy (2,)
    untagged fingerprints still pass."""
    import jax.numpy as jnp
    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                   resume_fingerprint)

    class R:
        def __init__(self, fp):
            self.fp = fp

    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(16))
    st = R(resume_fingerprint(x0, 1e-3, tag="full"))
    check_fingerprint(st, x0, 1e-3, tag="full")
    with pytest.raises(ValueError, match="fingerprint"):
        check_fingerprint(st, x0, 1e-1, tag="full")
    with pytest.raises(ValueError, match="fingerprint"):
        check_fingerprint(st, x0, 1e-3, tag="")
    st2 = R(resume_fingerprint(None, 1e-8))
    check_fingerprint(st2, None, 1e-8)
    with pytest.raises(ValueError, match="fingerprint"):
        check_fingerprint(st2, None, 9e-7)
    # legacy (2,) fingerprint (pre-tag-slot checkpoints): untagged accepted
    legacy = R(jnp.stack([resume_fingerprint(x0, 1e-3)[0],
                          jnp.float32(1e-3)]))
    check_fingerprint(legacy, x0, 1e-3)
