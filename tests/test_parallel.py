"""Distributed-parity tests on a virtual 8-device CPU mesh.

Fake-backend strategy per SURVEY.md §4: the same solver must produce the
same numbers sharded over N devices as on one device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hybrid_gmres_tpu import ba_gmres, generate_test_problem
from hybrid_gmres_tpu.problems import add_noise, perturb_backprojector
from hybrid_gmres_tpu.parallel import (
    make_mesh,
    shard_problem,
    sharded_ba_matvec,
    sharded_ab_matvec,
    ba_gmres_sharded,
)


@pytest.fixture(scope="module")
def prob():
    # m = 40 divisible by 8 devices; n = 32
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((40, 32)) * 0.1 + np.eye(40, 32))
    x_true = jnp.asarray(rng.standard_normal(32))
    b = A @ x_true + 0.01 * jnp.asarray(rng.standard_normal(40))
    B = A.T
    return A, B, b, x_true


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_matvecs_match_dense(prob):
    A, B, b, x_true = prob
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, B, b, mesh)

    mv_ba = sharded_ba_matvec(A_s, B_s, mesh)
    x = x_true
    np.testing.assert_allclose(
        np.asarray(mv_ba(x)), np.asarray(B @ (A @ x)), rtol=1e-12
    )

    mv_ab = sharded_ab_matvec(A_s, B_s, mesh)
    np.testing.assert_allclose(
        np.asarray(mv_ab(b_s)), np.asarray(A @ (B @ b)), rtol=1e-12
    )


@pytest.mark.parametrize("lam", [None, 1e-3])
def test_sharded_solver_matches_single_device(prob, lam):
    A, B, b, x_true = prob
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, B, b, mesh)

    r_ref = ba_gmres(A, B, b, x_true, tol=1e-10, maxit=16, lam=lam)
    r_sh = ba_gmres_sharded(
        A_s, B_s, b_s, x_true, tol=1e-10, maxit=16, lam=lam, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist), np.asarray(r_ref.err_hist), rtol=1e-8
    )
    assert int(r_sh.niters) == int(r_ref.niters)


def test_gspmd_solver_runs_with_sharded_inputs(prob):
    """Existing solver code must run unchanged under jit on sharded inputs."""
    A, B, b, x_true = prob
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, B, b, mesh)
    r_ref = ba_gmres(A, B, b, x_true, tol=1e-10, maxit=12, lam=1e-3)
    r = ba_gmres(A_s, B_s, b_s, x_true, tol=1e-10, maxit=12, lam=1e-3)
    np.testing.assert_allclose(np.asarray(r.x), np.asarray(r_ref.x), rtol=1e-9)


def test_sharded_ill_posed_problem():
    """Sharded parity on the actual ill-posed reference problem."""
    A, b_exact, x_true = generate_test_problem("shaw", 32)
    b, _ = add_noise(b_exact, 1e-2, seed=0)
    B, _ = perturb_backprojector(A, 1e-4, seed=1)
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, B, b, mesh)
    r_ref = ba_gmres(A, B, b, x_true, tol=1e-6, maxit=16, lam=1e-3)
    r_sh = ba_gmres_sharded(A_s, B_s, b_s, x_true, tol=1e-6, maxit=16, lam=1e-3, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist), np.asarray(r_ref.err_hist), rtol=1e-6
    )


@pytest.mark.parametrize("lam", [None, 1e-3])
def test_sharded_basis_solver_matches_single_device(prob, lam):
    """Fully-sharded basis (one fused psum per CGS2 pass) == replicated."""
    from hybrid_gmres_tpu.parallel import ba_gmres_sharded_basis

    A, B, b, x_true = prob
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, B, b, mesh)
    r_ref = ba_gmres(A, B, b, x_true, tol=1e-10, maxit=16, lam=lam)
    r_sh = ba_gmres_sharded_basis(
        A_s, B_s, b_s, x_true, tol=1e-10, maxit=16, lam=lam, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist), np.asarray(r_ref.err_hist), rtol=1e-8
    )
    assert int(r_sh.niters) == int(r_ref.niters)


def test_sharded_basis_requires_divisible_dims(prob):
    from hybrid_gmres_tpu.parallel import ba_gmres_sharded_basis

    A, B, b, x_true = prob
    mesh = make_mesh()
    with pytest.raises(ValueError):
        ba_gmres_sharded_basis(A[:, :30], B[:30], b, None, maxit=4, mesh=mesh)


@pytest.mark.parametrize("lam", [None, 1e-3])
def test_ab_sharded_basis_matches_single_device(prob, lam):
    """m-space basis sharded over rays: == single-device AB-GMRES."""
    from hybrid_gmres_tpu.parallel import ab_gmres_sharded_basis
    from hybrid_gmres_tpu import ab_gmres

    A, B, b, x_true = prob
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, B, b, mesh)
    r_ref = ab_gmres(A, B, b, x_true, tol=1e-10, maxit=16, lam=lam)
    r_sh = ab_gmres_sharded_basis(
        A_s, B_s, b_s, x_true, tol=1e-10, maxit=16, lam=lam, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist), np.asarray(r_ref.err_hist), rtol=1e-8
    )
    assert int(r_sh.niters) == int(r_ref.niters)


def test_initialize_multihost_noop_single_host():
    from hybrid_gmres_tpu.parallel import initialize_multihost

    assert initialize_multihost() is False


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_sharded_basis_fused_residual_matches_true(prob, kind):
    """fused residual (stored image bases, fewer collectives) == true."""
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_basis, ba_gmres_sharded_basis)

    A, B, b, x_true = prob
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, B, b, mesh)
    f = ba_gmres_sharded_basis if kind == "ba" else ab_gmres_sharded_basis
    rt = f(A_s, B_s, b_s, x_true, tol=0.0, maxit=12, lam=1e-3, mesh=mesh)
    rf = f(A_s, B_s, b_s, x_true, tol=0.0, maxit=12, lam=1e-3, mesh=mesh,
           residual="fused")
    np.testing.assert_allclose(np.asarray(rf.res_hist),
                               np.asarray(rt.res_hist), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rf.err_hist),
                               np.asarray(rt.err_hist), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rf.x), np.asarray(rt.x),
                               rtol=1e-9, atol=1e-12)


def test_sharded_pallas_solver_matches_dense(prob):
    """Per-shard Pallas block-ELL SpMV (interpret mode) == dense sharded ==
    single-device, on the virtual 8-device mesh."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, shard_block_ell)

    rng = np.random.default_rng(1)
    m, n = 64, 32
    Ad = (rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.3)
          ).astype(np.float32)
    Bd = (Ad.T + 1e-3 * rng.standard_normal((n, m))).astype(np.float32)
    x_true = rng.standard_normal(n).astype(np.float32)
    b = (Ad @ x_true + 0.01 * rng.standard_normal(m)).astype(np.float32)

    mesh = make_mesh()
    A_bell = shard_block_ell(sp.csr_matrix(Ad), mesh.devices.size)
    BT_bell = shard_block_ell(sp.csr_matrix(Bd.T), mesh.devices.size)
    r_sh = ba_gmres_sharded_pallas(
        A_bell, BT_bell, jnp.asarray(b), jnp.asarray(x_true),
        tol=0.0, maxit=8, lam=1e-3, mesh=mesh, interpret=True)
    r_ref = ba_gmres(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                     jnp.asarray(x_true), tol=0.0, maxit=8, lam=1e-3)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=5e-5)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=5e-5)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=1e-3, atol=1e-5)
