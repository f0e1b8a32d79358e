"""Real-Mosaic coverage of the SHARDED Pallas tier (VERDICT r2 #1).

Everything in parallel/panels.py + parallel/sharded_pallas.py had only ever
run in Pallas interpret mode on a virtual CPU mesh.  This module compiles
the same kernels with ``interpret=False`` on the bench chip:

  * full sharded solvers (BA/AB GMRES, LSQR-on-panels) under a 1-device
    mesh — real shard_map + Mosaic lowering of the mesh-uniform panels;
  * the windowed kernels of a p=8 panel build driven DIRECTLY via
    ``shard_view`` — window-relative bcols, the (win_blocks, bc) rmatvec
    accumulation target, and the packed-int4 nibble decode, none of which a
    1-device mesh can reach (p=1 always degenerates to the unwindowed path).

Mirrors the hot loop of the reference at scale
(/root/reference/BAgmres_hybrid_bounds.m:24-40).
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


def _banded_csr(m, n, halfband=20, seed=0):
    """Banded operator: every row i touches columns near i*n/m — gives the
    sharded build a window strictly smaller than the mesh (L < p)."""
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for i in range(m):
        c0 = int(i * n / m)
        for dc in range(-halfband, halfband + 1):
            if 0 <= c0 + dc < n:
                rows.append(i)
                cols.append(c0 + dc)
    vals = rng.standard_normal(len(rows))
    return sp.csr_matrix((vals, (rows, cols)), shape=(m, n)).astype(
        np.float32)


@pytest.fixture(scope="module")
def onedev_problem():
    from hybrid_gmres_tpu.parallel.panels import shard_bucketed_panels

    A = _random_csr(512, 256)
    B = (A.T * 1.0).tocsr()
    rng = np.random.default_rng(1)
    x_true = rng.standard_normal(256).astype(np.float32)
    b = jnp.asarray(A @ x_true)
    A_p = shard_bucketed_panels(A, 1)
    BT_p = shard_bucketed_panels(B.T.tocsr(), 1)
    return A, B, x_true, b, A_p, BT_p


def test_ba_sharded_pallas_1dev_mosaic_matches_dense(onedev_problem):
    """Non-interpret sharded BA-GMRES on a real 1-device TPU mesh == the
    single-chip dense solver, full history."""
    from hybrid_gmres_tpu.ops.linear_operator import DenseOperator
    from hybrid_gmres_tpu.parallel.mesh import make_mesh
    from hybrid_gmres_tpu.parallel.sharded_pallas import (
        ba_gmres_sharded_pallas)
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres

    A, B, x_true, b, A_p, BT_p = onedev_problem
    mesh = make_mesh(1)
    r = ba_gmres_sharded_pallas(A_p, BT_p, b, jnp.asarray(x_true), tol=0.0,
                                maxit=10, lam=1e-3, mesh=mesh,
                                interpret=False)
    rd = ba_gmres(DenseOperator(jnp.asarray(A.toarray())),
                  DenseOperator(jnp.asarray(B.toarray())), b,
                  jnp.asarray(x_true), tol=0.0, maxit=10, lam=1e-3)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(rd.res_hist), rtol=1e-4, atol=1e-6)


def test_ab_sharded_pallas_1dev_mosaic_matches_dense(onedev_problem):
    from hybrid_gmres_tpu.ops.linear_operator import DenseOperator
    from hybrid_gmres_tpu.parallel.mesh import make_mesh
    from hybrid_gmres_tpu.parallel.sharded_pallas import (
        ab_gmres_sharded_pallas)
    from hybrid_gmres_tpu.solvers.gmres import ab_gmres

    A, B, x_true, b, A_p, BT_p = onedev_problem
    mesh = make_mesh(1)
    r = ab_gmres_sharded_pallas(A_p, BT_p, b, jnp.asarray(x_true), tol=0.0,
                                maxit=10, lam=1e-3, mesh=mesh,
                                interpret=False)
    rd = ab_gmres(DenseOperator(jnp.asarray(A.toarray())),
                  DenseOperator(jnp.asarray(B.toarray())), b,
                  jnp.asarray(x_true), tol=0.0, maxit=10, lam=1e-3)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=1e-4, atol=1e-6)


def test_lsqr_sharded_panels_1dev_mosaic(onedev_problem):
    """Sharded LSQR consuming panels (forward + transposed kernels as the
    exact adjoint pair) under real Mosaic == the single-chip LSQR."""
    from hybrid_gmres_tpu.parallel.mesh import make_mesh
    from hybrid_gmres_tpu.parallel.sharded_gkb import lsqr_sharded
    from hybrid_gmres_tpu.ops.linear_operator import DenseOperator
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    A, B, x_true, b, A_p, BT_p = onedev_problem
    mesh = make_mesh(1)
    r = lsqr_sharded(A_p, b, jnp.asarray(x_true), tol=0.0, maxit=12,
                     mesh=mesh, interpret=False)
    rd = lsqr(DenseOperator(jnp.asarray(A.toarray())), b,
              jnp.asarray(x_true), tol=0.0, maxit=12)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("dtype", ["float32", "int8", "int4"])
def test_windowed_panel_kernels_p8_mosaic(dtype):
    """Window-relative panels of a p=8 build through the REAL Mosaic
    lowering: forward, transposed-accumulate-into-window, and the int4
    nibble decode, asserted exactly against the (quantized) CSR products."""
    from hybrid_gmres_tpu.parallel.panels import (
        host_window_x, local_matvec, local_rmatvec_window,
        scatter_window_to_full, shard_bucketed_panels, shard_view)

    p = 8
    m, n = p * 64, p * 128          # nloc = 128 -> block-aligned slabs
    A = _banded_csr(m, n, seed=2)
    panels = shard_bucketed_panels(A, p, dtype=dtype)
    assert panels.windowed and panels.shifts[1] < p, (
        "banded fixture must produce an active window")
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    u = rng.standard_normal(m).astype(np.float32)

    if dtype == "float32":
        want_y = A @ x
        want_z = A.T @ u
        tol = 2e-5
    else:
        from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr

        csr_q, s = _row_quantize_csr(A, qmax=7 if dtype == "int4" else 127)
        want_y = s * (csr_q @ x.astype(np.float64))
        want_z = csr_q.T @ (s * u.astype(np.float64))
        tol = 1e-5

    y = np.zeros(m, np.float32)
    z = np.zeros(n, np.float64)
    mloc = m // p
    for i in range(p):
        view = shard_view(panels, i)
        xw = host_window_x(panels, i, x)
        y[i * mloc:(i + 1) * mloc] = np.asarray(
            local_matvec(view, xw, interpret=False))
        part = local_rmatvec_window(
            view, jnp.asarray(u[i * mloc:(i + 1) * mloc]), interpret=False)
        z += np.asarray(scatter_window_to_full(view, part), np.float64)
    assert np.linalg.norm(y - want_y) / np.linalg.norm(want_y) < tol
    assert np.linalg.norm(z - want_z) / np.linalg.norm(want_z) < tol


def test_sharded_int8_solver_1dev_mosaic(onedev_problem):
    """Quantized sharded panels end-to-end under Mosaic: histories track the
    dense run (int8 perturbation ~1e-4 on this operator)."""
    from hybrid_gmres_tpu.ops.linear_operator import DenseOperator
    from hybrid_gmres_tpu.parallel.mesh import make_mesh
    from hybrid_gmres_tpu.parallel.panels import shard_bucketed_panels
    from hybrid_gmres_tpu.parallel.sharded_pallas import (
        ba_gmres_sharded_pallas)
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres

    A, B, x_true, b, _, BT_p = onedev_problem
    A_p8 = shard_bucketed_panels(A, 1, dtype="int8")
    mesh = make_mesh(1)
    r = ba_gmres_sharded_pallas(A_p8, BT_p, b, jnp.asarray(x_true), tol=0.0,
                                maxit=8, lam=1e-3, mesh=mesh,
                                interpret=False)
    rd = ba_gmres(DenseOperator(jnp.asarray(A.toarray())),
                  DenseOperator(jnp.asarray(B.toarray())), b,
                  jnp.asarray(x_true), tol=0.0, maxit=8, lam=1e-3)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("dtype", ["float32", "int4"])
def test_tiled_panels_2d_kernels_mosaic(dtype):
    """2-D tiled panels under the REAL Mosaic lowering: per-tile forward
    and transposed kernels driven directly (leading-axis views), partials
    reduced on host exactly as the psum would, vs the (quantized) CSR
    products."""
    import jax.tree_util as jtu
    from hybrid_gmres_tpu.parallel.panels2d import (
        TiledPanels, tile_bucketed_panels, tile_matvec, tile_rmatvec)

    pr, pc = 4, 2
    m, n = 512, 256
    A = _random_csr(m, n, seed=7)
    tp = tile_bucketed_panels(A, pr, pc, dtype=dtype)
    rng = np.random.default_rng(8)
    x = rng.standard_normal(n).astype(np.float32)
    u = rng.standard_normal(m).astype(np.float32)
    mloc, nloc = m // pr, n // pc

    if dtype == "float32":
        want_y = A @ x
        want_z = A.T @ u
        scales = None
    else:
        from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr

        csr_q, s = _row_quantize_csr(A, qmax=7)
        want_y = s * (csr_q @ x.astype(np.float64))
        want_z = csr_q.T @ (s * u.astype(np.float64))
        scales = s

    y = np.zeros(m, np.float64)
    z = np.zeros(n, np.float64)
    for i in range(pr):
        for j in range(pc):
            d = i * pc + j
            view = jtu.tree_map(lambda a: a[d:d + 1], tp)
            part = np.asarray(tile_matvec(
                view, jnp.asarray(x[j * nloc:(j + 1) * nloc]),
                interpret=False), np.float64)
            y[i * mloc:(i + 1) * mloc] += part
            u_i = u[i * mloc:(i + 1) * mloc]
            if scales is not None:
                u_i = scales[i * mloc:(i + 1) * mloc] * u_i
            z[j * nloc:(j + 1) * nloc] += np.asarray(tile_rmatvec(
                view, jnp.asarray(u_i.astype(np.float32)),
                interpret=False), np.float64)
    if scales is not None:
        y = scales * y
    assert np.linalg.norm(y - want_y) / np.linalg.norm(want_y) < 2e-5
    assert np.linalg.norm(z - want_z) / np.linalg.norm(want_z) < 2e-5


def test_rtp_sharded_1dev_mosaic_matches_single(onedev_problem):
    """Sharded RTP (shifted-operator Krylov + incremental image Gram) under
    real Mosaic on a 1-device mesh == solvers/rtp.py."""
    from hybrid_gmres_tpu.ops.linear_operator import DenseOperator
    from hybrid_gmres_tpu.parallel.mesh import make_mesh
    from hybrid_gmres_tpu.parallel.sharded_rtp import ab_gmres_rtp_sharded
    from hybrid_gmres_tpu.solvers.rtp import ab_gmres_rtp

    A, B, x_true, b, A_p, BT_p = onedev_problem
    mesh = make_mesh(1)
    r = ab_gmres_rtp_sharded(A_p, BT_p, b, jnp.asarray(x_true), tol=0.0,
                             maxit=8, lam=1e-2, mesh=mesh, interpret=False)
    # HIGHEST-precision dense reference: the AB-RTP inner solve is a Gram
    # normal-equations solve (conditioning squared), and at the TPU's
    # DEFAULT f32 matmul precision (bf16 passes) BOTH the Gram and the
    # dense reference's own matvecs cost ~1e-2/1e-3 late-history drift.
    # Round 4 forms the Gram at Precision.HIGHEST on both paths (VERDICT
    # r3 #7) — measured: the sharded history lands within 2e-6 of a CPU
    # f64 truth run — so with an accurate reference the band tightens
    # 1e-2 -> 2e-4 over the FULL history.
    hi = jax.lax.Precision.HIGHEST
    rd = ab_gmres_rtp(DenseOperator(jnp.asarray(A.toarray()), precision=hi),
                      DenseOperator(jnp.asarray(B.toarray()), precision=hi),
                      b, jnp.asarray(x_true), tol=0.0, maxit=8, lam=1e-2)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=2e-4,
                               atol=1e-6)


def test_forward_b_layout_1dev_mosaic_matches_dense(onedev_problem):
    """Round-4 forward-layout back-projector (the per-shard-gap fix,
    DESIGN §12) under real Mosaic on a 1-device mesh == the single-chip
    dense solver; the bf16 wire option compiles and stays in its band."""
    from hybrid_gmres_tpu.ops.linear_operator import DenseOperator
    from hybrid_gmres_tpu.parallel.mesh import make_mesh
    from hybrid_gmres_tpu.parallel.panels import shard_bucketed_panels
    from hybrid_gmres_tpu.parallel.sharded_pallas import (
        ba_gmres_sharded_pallas)
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres

    A, B, x_true, b, A_p, _ = onedev_problem
    B_p = shard_bucketed_panels(B, 1)
    mesh = make_mesh(1)
    r = ba_gmres_sharded_pallas(A_p, None, b, jnp.asarray(x_true), tol=0.0,
                                maxit=10, lam=1e-3, mesh=mesh,
                                interpret=False, B_panels=B_p)
    rd = ba_gmres(DenseOperator(jnp.asarray(A.toarray())),
                  DenseOperator(jnp.asarray(B.toarray())), b,
                  jnp.asarray(x_true), tol=0.0, maxit=10, lam=1e-3)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=1e-4,
                               atol=1e-6)

    # bf16 wire exchange under Mosaic: collectives are degenerate at p=1
    # but the bitcast/round-trip path must lower and stay in the
    # quantization band
    rbf = ba_gmres_sharded_pallas(A_p, None, b, jnp.asarray(x_true),
                                  tol=0.0, maxit=10, lam=1e-3, mesh=mesh,
                                  interpret=False, B_panels=B_p,
                                  comm_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(rbf.err_hist),
                               np.asarray(rd.err_hist), rtol=3e-2,
                               atol=1e-5)


def test_batched_warm_start_on_chip(onedev_problem):
    """Serving warm start through the multi-RHS SpMM kernels on the real
    chip: frame 2 warm-started from frame 1's solution starts at frame
    1's converged residual level."""
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    A, B, x_true, b, _, _ = onedev_problem
    A_op = PallasBSROperator.from_csr(A)
    B_op = PallasBSROperator.from_csr(B)
    R = 4
    bb = jnp.stack([b] * R, axis=1)
    xt = jnp.asarray(np.stack([x_true] * R, axis=1))
    cold = ba_gmres_batched(A_op, B_op, bb, xt, maxit=8, lam=1e-3)
    warm = ba_gmres_batched(A_op, B_op, bb, xt, maxit=8, lam=1e-3,
                            x0=cold.x)
    c = np.asarray(cold.res_hist)
    w = np.asarray(warm.res_hist)
    assert np.isfinite(w).all()
    assert float(np.max(w[0])) < float(np.min(c[0]))


def test_int8_forward_adjoint_gkb_on_chip(onedev_problem):
    """build_panels_with_adjoint(int8) under real Mosaic: the raw-Q^T
    forward kernel + input pre-scaling reproduces the transposed-kernel
    int8 LSQR exactly (same shared quantization)."""
    from hybrid_gmres_tpu.parallel import (
        build_panels_with_adjoint, lsqr_sharded, shard_bucketed_panels)
    from hybrid_gmres_tpu.parallel.mesh import make_mesh

    A, B, x_true, b, _, _ = onedev_problem
    mesh = make_mesh(1)
    A8 = shard_bucketed_panels(A, 1, dtype=np.int8)
    pair8 = build_panels_with_adjoint(A, 1, dtype=np.int8)
    r_t = lsqr_sharded(A8, b, jnp.asarray(x_true), tol=0.0, maxit=8,
                       mesh=mesh, interpret=False)
    r_f = lsqr_sharded(pair8, b, jnp.asarray(x_true), tol=0.0, maxit=8,
                       mesh=mesh, interpret=False)
    np.testing.assert_allclose(np.asarray(r_f.res_hist),
                               np.asarray(r_t.res_hist), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_f.err_hist),
                               np.asarray(r_t.err_hist), rtol=2e-4,
                               atol=1e-6)


def test_sharded_batched_1dev_mosaic_matches_batched(onedev_problem):
    """Sharded multi-RHS GMRES (SpMM kernels under real Mosaic, 1-device
    mesh) == the single-chip batched solver per RHS, in-scan and deferred
    (the serving x distribution composition, VERDICT r4 #1)."""
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator
    from hybrid_gmres_tpu.parallel.mesh import make_mesh
    from hybrid_gmres_tpu.parallel.sharded_batched import (
        ba_gmres_sharded_batched)
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    A, B, x_true, b, A_p, BT_p = onedev_problem
    rng = np.random.default_rng(5)
    R = 3
    X_true = rng.standard_normal((A.shape[1], R)).astype(np.float32)
    Bmat = jnp.asarray(A @ X_true, dtype=jnp.float32)
    mesh = make_mesh(1)
    r = ba_gmres_sharded_batched(A_p, BT_p, Bmat, jnp.asarray(X_true),
                                 tol=0.0, maxit=8, lam=1e-3, mesh=mesh,
                                 interpret=False)
    # reference through the SAME SpMM kernels (a dense on-chip reference
    # would inject its own ~1e-3 bf16-pass matmul noise)
    A_op = PallasBSROperator.from_csr(A, with_adjoint=False)
    B_op = PallasBSROperator.from_csr(B, with_adjoint=False)
    rd = ba_gmres_batched(A_op, B_op, Bmat,
                          jnp.asarray(X_true), tol=0.0, maxit=8, lam=1e-3,
                          chunk_rhs=None)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(rd.res_hist), rtol=2e-4,
                               atol=1e-6)
    r2 = ba_gmres_sharded_batched(A_p, BT_p, Bmat, jnp.asarray(X_true),
                                  tol=0.0, maxit=8, lam=1e-3, mesh=mesh,
                                  interpret=False, defer_histories=True)
    np.testing.assert_allclose(np.asarray(r2.err_hist),
                               np.asarray(r.err_hist), rtol=2e-4,
                               atol=1e-6)


def test_sharded_batched_2d_1x1_mosaic(onedev_problem):
    """Multi-RHS tile SpMM kernels (tile_matmat/tile_rmatmat) under real
    Mosaic on a 1x1 tile grid == the single-chip batched solver."""
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator
    from hybrid_gmres_tpu.parallel import (ba_gmres_sharded_batched_2d,
                                           make_mesh_2d,
                                           tile_bucketed_panels)
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    A, B, x_true, b, A_p, BT_p = onedev_problem
    rng = np.random.default_rng(7)
    R = 3
    X_true = rng.standard_normal((A.shape[1], R)).astype(np.float32)
    Bmat = jnp.asarray(A @ X_true, dtype=jnp.float32)
    mesh2 = make_mesh_2d((1, 1))
    A_t = tile_bucketed_panels(A, 1, 1)
    BT_t = tile_bucketed_panels(B.T.tocsr(), 1, 1)
    r = ba_gmres_sharded_batched_2d(A_t, BT_t, Bmat, jnp.asarray(X_true),
                                    tol=0.0, maxit=8, lam=1e-3, mesh=mesh2,
                                    interpret=False)
    A_op = PallasBSROperator.from_csr(A, with_adjoint=False)
    B_op = PallasBSROperator.from_csr(B, with_adjoint=False)
    rd = ba_gmres_batched(A_op, B_op, Bmat, jnp.asarray(X_true), tol=0.0,
                          maxit=8, lam=1e-3, chunk_rhs=None)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(rd.res_hist), rtol=2e-3,
                               atol=1e-5)


def test_gkb_2d_modes_1x1_mosaic(onedev_problem):
    """The round-5 2-D GKB modes (reorth + x0 warm start + exact resume)
    through REAL Mosaic tile kernels on a 1x1 grid == the single-chip
    reorthogonalized warm-started LSQR."""
    from hybrid_gmres_tpu.parallel import (lsqr_sharded_2d, make_mesh_2d,
                                           tile_bucketed_panels)
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    A, B, x_true, b, A_p, BT_p = onedev_problem
    mesh2 = make_mesh_2d((1, 1))
    A_t = tile_bucketed_panels(A, 1, 1)
    x0 = jnp.asarray(0.5 * x_true)
    xt = jnp.asarray(x_true)
    kw = dict(mesh=mesh2, interpret=False, reorth=True, x0=x0, tol=0.0)
    part = lsqr_sharded_2d(A_t, b, xt, maxit=4, **kw)
    r = lsqr_sharded_2d(A_t, b, xt, maxit=8, resume_from=part.state, **kw)
    rd = lsqr(jnp.asarray(A.toarray()), b, xt, tol=0.0, maxit=8,
              reorth=True, x0=x0)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(rd.res_hist), rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(rd.err_hist), rtol=2e-3,
                               atol=1e-5)


def test_gkb_batched_mosaic_matches_single_rhs(onedev_problem):
    """lsqr_batched under real Mosaic (multi-RHS SpMM on the int8
    shared-quantization exact-adjoint pair — the serving regime of
    scripts/gkb_batched_bench.py) == the single-RHS lsqr per column."""
    from hybrid_gmres_tpu.ops.spmv_pallas import PallasBSROperator
    from hybrid_gmres_tpu.solvers.gkb_batched import lsqr_batched
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    A, B, x_true, b, _, _ = onedev_problem
    rng = np.random.default_rng(9)
    R = 3
    X_true = rng.standard_normal((A.shape[1], R)).astype(np.float32)
    Bb = jnp.asarray((A @ X_true).astype(np.float32))
    A_op = PallasBSROperator.from_csr(A, dtype=jnp.int8, with_adjoint=True)
    r = lsqr_batched(A_op, Bb, jnp.asarray(X_true), tol=0.0, maxit=8)
    for j in range(R):
        rj = lsqr(A_op, Bb[:, j], jnp.asarray(X_true[:, j]), tol=0.0,
                  maxit=8)
        np.testing.assert_allclose(np.asarray(r.res_hist[:, j]),
                                   np.asarray(rj.res_hist), rtol=2e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(r.err_hist[:, j]),
                                   np.asarray(rj.err_hist), rtol=2e-4,
                                   atol=1e-6)
