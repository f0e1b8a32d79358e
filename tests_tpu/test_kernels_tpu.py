"""Mosaic-compiled kernel oracles on the real chip.

These mirror the CPU interpret-mode tests in tests/test_sparse.py but run
the actual TPU lowering: forward / transposed bucketed block-ELL kernels,
the int8 quantized operator (incl. the exact-adjoint property GKB needs),
and the packaged Morton-ordered CT operator path.
"""

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu


def _random_csr(m, n, density=0.05, seed=0):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, random_state=seed, format="csr",
                  dtype=np.float64)
    A.data = rng.standard_normal(A.nnz)
    return A.astype(np.float32)


@pytest.fixture(scope="module")
def ops():
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator

    A = _random_csr(1024, 512)
    ops = {}
    for dt in (jnp.float32, jnp.bfloat16, jnp.int8):
        ops[jnp.dtype(dt).name] = PallasBSROperator.from_csr(
            A, dtype=dt, with_adjoint=True)
    return A, ops


def test_forward_kernel_matches_csr(ops):
    A, d = ops
    x = np.random.default_rng(1).standard_normal(A.shape[1]).astype(
        np.float32)
    want = A @ x
    got = np.asarray(jax.block_until_ready(d["float32"].matvec(
        jnp.asarray(x))))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)
    got_bf = np.asarray(d["bfloat16"].matvec(jnp.asarray(x)))
    np.testing.assert_allclose(got_bf, want, rtol=2e-2, atol=5e-2)


def test_transposed_kernel_matches_csr(ops):
    A, d = ops
    u = np.random.default_rng(2).standard_normal(A.shape[0]).astype(
        np.float32)
    want = A.T @ u
    got = np.asarray(d["float32"].rmatvec(jnp.asarray(u)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_fallback_rmatvec_without_adjoint_panel():
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator

    A = _random_csr(512, 256, seed=3)
    op = PallasBSROperator.from_csr(A, dtype=jnp.float32, with_adjoint=False)
    u = np.random.default_rng(3).standard_normal(512).astype(np.float32)
    got = np.asarray(op.rmatvec(jnp.asarray(u)))
    np.testing.assert_allclose(got, A.T @ u, rtol=2e-5, atol=1e-4)


def test_int8_operator_quality_and_exact_adjoint(ops):
    """int8 storage: ~1e-2-scale relative matvec error on random data (CT
    rows are much friendlier), and <A x, u> == <x, A^T u> to f32 roundoff —
    the exact-adjoint pair GKB requires (ADVICE r1 medium)."""
    A, d = ops
    op = d["int8"]
    assert op.dtype == jnp.dtype(jnp.float32)     # compute dtype
    assert op.storage_dtype == jnp.dtype(jnp.int8)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    u = rng.standard_normal(A.shape[0]).astype(np.float32)
    ax = np.asarray(op.matvec(jnp.asarray(x)))
    atu = np.asarray(op.rmatvec(jnp.asarray(u)))
    # quality vs the exact product
    denom = np.linalg.norm(A @ x)
    assert np.linalg.norm(ax - A @ x) / denom < 2e-2
    # exact adjoint pair
    lhs = float(np.dot(ax, u))
    rhs = float(np.dot(x, atu))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-6) < 1e-5, (lhs, rhs)


def test_ct_tpu_operators_match_csr():
    """Packaged production path (Morton ordering + tuned blocks/row groups)
    reproduces the CSR products on device."""
    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators

    prob = ct_mismatched(n=32, n_angles=90, n_det=90, dense=False)
    A_op, B_op, b_p, x_p, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=jnp.bfloat16)
    A_csr = prob.A_csr.astype(np.float32)
    B_csr = prob.B_csr.astype(np.float32)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(A_csr.shape[1]).astype(np.float32)
    u = rng.standard_normal(A_csr.shape[0]).astype(np.float32)

    got_A = np.asarray(A_op.matvec(jnp.asarray(x[pix_perm])))
    want_A = (A_csr @ x)[ray_perm]
    assert (np.linalg.norm(got_A - want_A) / np.linalg.norm(want_A)) < 5e-3

    got_B = np.asarray(B_op.matvec(jnp.asarray(u[ray_perm])))
    want_B = (B_csr @ u)[pix_perm]
    assert (np.linalg.norm(got_B - want_B) / np.linalg.norm(want_B)) < 5e-3


def test_hybrid_ba_gmres_on_device_pallas_vs_dense():
    """End-to-end solver on the chip: the full int8 fast path's histories
    track the dense-f32 operator run on the same problem."""
    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.ops.linear_operator import DenseOperator
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres

    prob = ct_mismatched(n=32, n_angles=90, n_det=90, dense=False)
    A_op, B_op, b_p, x_p, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=jnp.int8)
    rng = np.random.default_rng(0)
    e = rng.standard_normal(prob.b_exact.shape)
    e = e / np.linalg.norm(e) * 0.25 * float(jnp.linalg.norm(prob.b_exact))
    b = (jnp.asarray(prob.b_exact) + jnp.asarray(e)).astype(jnp.float32)

    maxit = 30
    r_fast = ba_gmres(A_op, B_op, b[np.asarray(ray_perm)],
                      jnp.asarray(prob.x_true)[np.asarray(pix_perm)],
                      tol=0.0, maxit=maxit, lam=1e-2, residual="fused")
    Ad = DenseOperator(jnp.asarray(prob.A_csr.toarray(), dtype=jnp.float32))
    Bd = DenseOperator(jnp.asarray(prob.B_csr.toarray(), dtype=jnp.float32))
    r_ref = ba_gmres(Ad, Bd, b, jnp.asarray(prob.x_true), tol=0.0,
                     maxit=maxit, lam=1e-2)
    err_fast = np.asarray(r_fast.err_hist)
    err_ref = np.asarray(r_ref.err_hist)
    assert np.isfinite(err_fast).all()
    # semi-convergence minima agree (the scientifically meaningful number)
    assert abs(np.nanmin(err_fast) - np.nanmin(err_ref)) < 0.03, (
        np.nanmin(err_fast), np.nanmin(err_ref))


def test_defer_histories_on_device_matches_masked():
    """Batched projected solves (vmapped padded Cholesky on the MXU) ==
    the masked in-scan solves on the chip, hybrid f32."""
    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres

    prob = ct_mismatched(n=32, n_angles=90, n_det=90, dense=False)
    A_op, B_op, b_p, x_p, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    e = rng.standard_normal(prob.b_exact.shape)
    e = e / np.linalg.norm(e) * 0.25 * float(jnp.linalg.norm(prob.b_exact))
    b = (jnp.asarray(prob.b_exact) + jnp.asarray(e)).astype(
        jnp.float32)[np.asarray(ray_perm)]
    xt = jnp.asarray(prob.x_true)[np.asarray(pix_perm)].astype(jnp.float32)

    # maxit kept small: the deferred variant's batched-solve program is
    # expensive to compile through the remote-compile tunnel
    r1 = ba_gmres(A_op, B_op, b, xt, tol=0.0, maxit=12, lam=1e-2,
                  residual="fused")
    r2 = ba_gmres(A_op, B_op, b, xt, tol=0.0, maxit=12, lam=1e-2,
                  residual="fused", defer_histories=True)
    assert int(r1.niters) == int(r2.niters)
    e1, e2 = np.asarray(r1.err_hist), np.asarray(r2.err_hist)
    a1, a2 = np.asarray(r1.res_hist), np.asarray(r2.res_hist)
    # the deferred core runs its post-scan products at Precision.HIGHEST
    # (solvers/common.py) so the on-chip band matches the batched twin's
    # 2e-4, not the ~1e-3 of default-precision (bf16-pass) f32 matmuls
    np.testing.assert_allclose(e2, e1, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(a2, a1, rtol=2e-4, atol=1e-6)


def test_int4_packed_kernel_on_chip():
    """Packed-int4 Mosaic lowering: the nibble decode ((raw<<28)>>28 /
    (raw<<24)>>28 on int32) must match the exact diag(s) Q reference, and
    the adjoint pair must stay exact."""
    from hybrid_gmres_tpu.ops.spmv_pallas import (
        PallasBSROperator, _row_quantize_csr)

    A = _random_csr(1024, 512, seed=5)
    op = PallasBSROperator.from_csr(A, dtype="int4", with_adjoint=True)
    csr_q, s = _row_quantize_csr(A, qmax=7)
    rng = np.random.default_rng(6)
    x = rng.standard_normal(A.shape[1]).astype(np.float32)
    u = rng.standard_normal(A.shape[0]).astype(np.float32)
    y = np.asarray(jax.block_until_ready(op.matvec(jnp.asarray(x))))
    y_ref = s * (csr_q @ x.astype(np.float64))
    assert np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref) < 1e-5
    z = np.asarray(op.rmatvec(jnp.asarray(u)))
    z_ref = csr_q.T @ (s * u.astype(np.float64))
    assert np.linalg.norm(z - z_ref) / np.linalg.norm(z_ref) < 1e-5
    lhs = float(jnp.vdot(op.matvec(jnp.asarray(x)), jnp.asarray(u)))
    rhs = float(jnp.vdot(jnp.asarray(x), op.rmatvec(jnp.asarray(u))))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-30) < 1e-4


def test_matmat_kernels_on_chip(ops):
    """Multi-RHS SpMM kernels under real Mosaic: per-column parity with the
    single-RHS kernels for f32 and int8 panels (the serving-batch path)."""
    A, d = ops
    rng = np.random.default_rng(9)
    X = rng.standard_normal((A.shape[1], 8)).astype(np.float32)
    U = rng.standard_normal((A.shape[0], 8)).astype(np.float32)
    for name in ("float32", "int8"):
        op = d[name]
        Y = np.asarray(jax.block_until_ready(op.matmat(jnp.asarray(X))))
        Yr = np.stack([np.asarray(op.matvec(jnp.asarray(X[:, j])))
                       for j in range(8)], 1)
        np.testing.assert_allclose(Y, Yr, rtol=1e-5, atol=1e-5)
        Z = np.asarray(op.rmatmat(jnp.asarray(U)))
        Zr = np.stack([np.asarray(op.rmatvec(jnp.asarray(U[:, j])))
                       for j in range(8)], 1)
        np.testing.assert_allclose(Z, Zr, rtol=1e-5, atol=1e-5)


def test_batched_solver_on_chip_quality():
    """End-to-end serving batch on the chip: 4 noise realizations solved in
    ONE ba_gmres_batched call — every per-RHS semi-convergence minimum must
    match the single-RHS quality regime (the bench gate's band)."""
    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    prob = ct_mismatched(n=32, n_angles=90, n_det=90, dense=False)
    A_op, B_op, _, x_true, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=jnp.int8)
    b_ex = np.asarray(prob.b_exact)
    rp = np.asarray(ray_perm)
    cols = []
    for r in range(4):
        rng = np.random.default_rng(r)
        e = rng.standard_normal(b_ex.shape)
        e = e / np.linalg.norm(e) * 0.25 * float(np.linalg.norm(b_ex))
        cols.append((b_ex + e).astype(np.float32)[rp])
    b_batch = jnp.asarray(np.stack(cols, axis=1))
    xt = jnp.asarray(np.asarray(x_true)).astype(jnp.float32)
    r = ba_gmres_batched(A_op, B_op, b_batch, xt, tol=0.0, maxit=30,
                         lam=1e-2)
    err = np.asarray(r.err_hist)
    assert np.isfinite(err).all()
    mins = np.nanmin(err, axis=0)
    # n=32 phantom at 25% noise reconstructs to ~0.6; all four RHS must
    # land in the same band
    assert (mins < 0.75).all(), mins
    # the deferred serving mode must reproduce the in-scan numbers under
    # real Mosaic (DESIGN §13: +27-36% aggregate at bench scale)
    r_d = ba_gmres_batched(A_op, B_op, b_batch, xt, tol=0.0, maxit=30,
                           lam=1e-2, defer_histories=True)
    np.testing.assert_allclose(np.asarray(r_d.err_hist), err, rtol=2e-4,
                               atol=1e-6)


def test_scale_n128_quality_gated():
    """The n=128 regime (467 MB int8 panels, ~425 GB/s-equiv wall — the
    proof the path is bandwidth-bound rather than dispatch-bound, DESIGN
    §10) re-measured and QUALITY-GATED every round instead of quoted from
    history (VERDICT r4 #9).  Gate anchors to the measured int8 min-err
    0.3698 (v5e) with a 5% regression band; also asserts the wall
    throughput stays within 2x of the recorded 908 it/s (a loose
    anti-collapse bound — tunnel weather swings the wall number)."""
    import time

    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres

    maxit = 100
    prob = ct_mismatched(n=128, n_angles=360, n_det=360, dense=False)
    A_op, B_op, _, x_true, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=jnp.int8, n_buckets=8)
    rng = np.random.default_rng(0)
    e = rng.standard_normal(prob.b_exact.shape)
    e = e / np.linalg.norm(e) * 0.25 * float(np.linalg.norm(prob.b_exact))
    b = jnp.asarray((np.asarray(prob.b_exact) + e)[np.asarray(ray_perm)],
                    dtype=jnp.float32)
    xt = jnp.asarray(np.asarray(prob.x_true)[np.asarray(pix_perm)],
                     dtype=jnp.float32)

    @jax.jit
    def solve(A, B, bb, x):
        return ba_gmres(A, B, bb, x, tol=0.0, maxit=maxit, lam=1e-2,
                        residual="fused")

    r = solve(A_op, B_op, b, xt)
    jax.block_until_ready(r.x)
    float(jnp.sum(r.x))
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = solve(A_op, B_op, b, xt)
        jax.block_until_ready(r.x)
        ts.append(time.time() - t0)
    float(jnp.sum(r.x))
    it_s = maxit / min(ts)
    min_err = float(np.nanmin(np.asarray(r.err_hist)))
    assert min_err <= 0.3698 * 1.05, (min_err, it_s)
    assert it_s > 908.0 / 2, (it_s, min_err)
