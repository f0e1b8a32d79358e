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


def _sparse_pair(m, n, density=0.3, seed=1):
    rng = np.random.default_rng(seed)
    Ad = (rng.standard_normal((m, n)) * (rng.random((m, n)) < density)
          ).astype(np.float32)
    Bd = (Ad.T + 1e-3 * rng.standard_normal((n, m))).astype(np.float32)
    x_true = rng.standard_normal(n).astype(np.float32)
    b = (Ad @ x_true + 0.01 * rng.standard_normal(m)).astype(np.float32)
    return Ad, Bd, b, x_true


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_sharded_pallas_solver_matches_dense(kind):
    """Per-shard bucketed Pallas SpMV (interpret mode) + reduce-scatter
    comms == dense single-device, on the virtual 8-device mesh."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ab_gmres
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas, ba_gmres_sharded_pallas,
        shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
    if kind == "ba":
        r_sh = ba_gmres_sharded_pallas(
            A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
            tol=0.0, maxit=8, lam=1e-3, mesh=mesh, interpret=True)
        r_ref = ba_gmres(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                         jnp.asarray(x_true), tol=0.0, maxit=8, lam=1e-3)
    else:
        r_sh = ab_gmres_sharded_pallas(
            A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
            tol=0.0, maxit=8, lam=1e-3, mesh=mesh, interpret=True)
        r_ref = ab_gmres(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
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


def test_sharded_panels_windowed_exchange():
    """A block-banded operator on a block-aligned mesh must trigger the
    static-window exchange (few ppermute shifts, not an all_gather) and
    still reproduce the dense solver exactly."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, comms_bytes_per_iteration,
        shard_bucketed_panels)

    p = 8
    n = 128 * p          # nloc = 128 = one block column per slab
    m = n
    rng = np.random.default_rng(3)
    # block-tridiagonal band: row slab i touches column slabs i-1..i+1
    diags = [np.ones(n - abs(o)) * rng.standard_normal(n - abs(o))
             for o in (-130, -40, 0, 40, 130)]
    Ad = sp.diags(diags, offsets=(-130, -40, 0, 40, 130)).tocsr()
    Bd = (Ad.T).tocsr()
    Bd = Bd + sp.random(n, m, density=1e-4, random_state=5, format="csr")

    A_panels = shard_bucketed_panels(Ad, p)
    BT_panels = shard_bucketed_panels(Bd.T.tocsr(), p)
    assert A_panels.windowed, "banded operator must get a static window"
    dmin, L = A_panels.shifts
    assert L < p, (dmin, L)
    comms = comms_bytes_per_iteration(A_panels)
    full = (p - 1) * (n // p) * 4
    assert comms["gather_bytes"] < full

    x_true = rng.standard_normal(n).astype(np.float32)
    b = (Ad @ x_true + 0.01 * rng.standard_normal(m)).astype(np.float32)
    mesh = make_mesh()
    r_sh = ba_gmres_sharded_pallas(
        A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
        tol=0.0, maxit=6, lam=1e-3, mesh=mesh, interpret=True)
    Adj = jnp.asarray(Ad.toarray(), dtype=jnp.float32)
    Bdj = jnp.asarray(Bd.toarray(), dtype=jnp.float32)
    r_ref = ba_gmres(Adj, Bdj, jnp.asarray(b), jnp.asarray(x_true),
                     tol=0.0, maxit=6, lam=1e-3)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=5e-5)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=1e-3, atol=1e-5)


def test_sharded_panels_matvec_primitives():
    """local_matvec / local_rmatvec + collectives == CSR products, both
    windowed and full-gather panels."""
    import scipy.sparse as sp
    from jax.sharding import PartitionSpec as P
    from hybrid_gmres_tpu.parallel import shard_bucketed_panels
    from hybrid_gmres_tpu.parallel.panels import (
        gather_window, local_matvec, local_rmatvec_window,
        scatter_window_to_full)

    p = 8
    for n, density in ((128 * p, 0.02), (32 * p, 0.2)):
        m = n
        A = sp.random(m, n, density=density, random_state=7,
                      format="csr", dtype=np.float64).astype(np.float32)
        panels = shard_bucketed_panels(A, p)
        x = np.random.default_rng(11).standard_normal(n).astype(np.float32)
        u = np.random.default_rng(12).standard_normal(m).astype(np.float32)
        mesh = make_mesh()

        def fwd(pan, x_loc):
            xw = gather_window(pan, x_loc, "rows")
            return local_matvec(pan, xw, interpret=True)

        def rmv(pan, u_loc):
            part = local_rmatvec_window(pan, u_loc, interpret=True)
            full = scatter_window_to_full(pan, part)
            return jax.lax.psum(full, "rows")

        y = jax.shard_map(
            fwd, mesh=mesh, in_specs=(P("rows"), P("rows")),
            out_specs=P("rows"), check_vma=False)(panels, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), A @ x, rtol=2e-5,
                                   atol=1e-5)
        z = jax.shard_map(
            rmv, mesh=mesh, in_specs=(P("rows"), P("rows")),
            out_specs=P(), check_vma=False)(panels, jnp.asarray(u))
        np.testing.assert_allclose(np.asarray(z), A.T @ u, rtol=2e-5,
                                   atol=1e-5)


# ---------------------------------------------------------------------------
# Sharded GKB family (lsqr/lsmr + hybrids) — VERDICT r1 #3
# ---------------------------------------------------------------------------

def test_lsqr_sharded_matches_single_device(prob):
    from hybrid_gmres_tpu.solvers.lsqr import lsqr
    from hybrid_gmres_tpu.parallel import lsqr_sharded

    A, B, b, x_true = prob
    mesh = make_mesh()
    r_ref = lsqr(A, b, x_true, tol=1e-12, maxit=16)
    r_sh = lsqr_sharded(A, b, x_true, tol=1e-12, maxit=16, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), rtol=1e-7)
    assert int(r_sh.niters) == int(r_ref.niters)


def test_lsqr_sharded_resume_equals_uninterrupted(prob):
    """Sharded resume (VERDICT r2 #5): the checkpointed carry keeps its
    vectors SHARDED across the boundary, continuation == uninterrupted run
    including the re-applied true-residual final patch."""
    from hybrid_gmres_tpu.parallel import lsqr_sharded

    A, B, b, x_true = prob
    mesh = make_mesh()
    r_full = lsqr_sharded(A, b, x_true, tol=0.0, maxit=16, mesh=mesh)
    r_half = lsqr_sharded(A, b, x_true, tol=0.0, maxit=8, mesh=mesh)
    assert r_half.state is not None
    r_res = lsqr_sharded(A, b, x_true, tol=0.0, maxit=16, mesh=mesh,
                         resume_from=r_half.state)
    np.testing.assert_allclose(np.asarray(r_res.res_hist),
                               np.asarray(r_full.res_hist), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r_res.err_hist),
                               np.asarray(r_full.err_hist), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r_res.x), np.asarray(r_full.x),
                               rtol=1e-12)
    assert int(r_res.niters) == int(r_full.niters)
    # the saved state keeps the reference's UNPATCHED estimate history
    # (lsqr_solver.m:44); the result re-applies the true-residual patch
    assert (float(np.asarray(r_half.state.res_hist)[-1])
            != float(np.asarray(r_half.res_hist)[-1]))


def test_lsqr_sharded_panels_resume(prob):
    """Resume composes with the Pallas-panel operator path."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import lsqr_sharded, shard_bucketed_panels

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=21)
    mesh = make_mesh()
    panels = shard_bucketed_panels(sp.csr_matrix(Ad), mesh.devices.size)
    r_full = lsqr_sharded(panels, jnp.asarray(b), jnp.asarray(x_true),
                          tol=0.0, maxit=12, mesh=mesh, interpret=True)
    r_half = lsqr_sharded(panels, jnp.asarray(b), jnp.asarray(x_true),
                          tol=0.0, maxit=6, mesh=mesh, interpret=True)
    r_res = lsqr_sharded(panels, jnp.asarray(b), jnp.asarray(x_true),
                         tol=0.0, maxit=12, mesh=mesh, interpret=True,
                         resume_from=r_half.state)
    np.testing.assert_allclose(np.asarray(r_res.res_hist),
                               np.asarray(r_full.res_hist), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(r_res.x), np.asarray(r_full.x),
                               rtol=1e-10, atol=1e-12)


def test_hybrid_lsqr_sharded_matches_single_device(prob):
    from hybrid_gmres_tpu.solvers.lsqr import hybrid_lsqr
    from hybrid_gmres_tpu.parallel import hybrid_lsqr_sharded

    A, B, b, x_true = prob
    mesh = make_mesh()
    r_ref = hybrid_lsqr(A, b, x_true, tol=1e-12, maxit=16, lam=1e-3)
    r_sh = hybrid_lsqr_sharded(A, b, x_true, tol=1e-12, maxit=16, lam=1e-3,
                               mesh=mesh)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), rtol=1e-7)
    assert int(r_sh.niters) == int(r_ref.niters)


def test_lsmr_sharded_matches_single_device(prob):
    from hybrid_gmres_tpu.solvers.lsmr import lsmr
    from hybrid_gmres_tpu.parallel import lsmr_sharded

    A, B, b, x_true = prob
    mesh = make_mesh()
    r_ref = lsmr(A, b, x_true, tol=1e-12, maxit=16)
    r_sh = lsmr_sharded(A, b, x_true, tol=1e-12, maxit=16, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(r_sh.ar_hist),
                               np.asarray(r_ref.ar_hist), rtol=1e-6)
    assert int(r_sh.niters) == int(r_ref.niters)


def test_hybrid_lsmr_sharded_matches_single_device(prob):
    from hybrid_gmres_tpu.solvers.lsmr import hybrid_lsmr
    from hybrid_gmres_tpu.parallel import hybrid_lsmr_sharded

    A, B, b, x_true = prob
    mesh = make_mesh()
    for mode in ("last", "first"):
        r_ref = hybrid_lsmr(A, b, x_true, tol=1e-12, maxit=16, lam=1e-3,
                            rank1_mode=mode)
        r_sh = hybrid_lsmr_sharded(A, b, x_true, tol=1e-12, maxit=16,
                                   lam=1e-3, rank1_mode=mode, mesh=mesh)
        np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                                   rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                                   np.asarray(r_ref.err_hist), rtol=1e-7)
        assert int(r_sh.niters) == int(r_ref.niters)


def test_lsqr_sharded_pallas_panels():
    """Sharded LSQR through the Pallas panels (exact adjoint pair from the
    same panel) == single-device LSQR on the dense matrix."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.solvers.lsqr import lsqr
    from hybrid_gmres_tpu.parallel import lsqr_sharded, shard_bucketed_panels

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=4)
    mesh = make_mesh()
    panels = shard_bucketed_panels(sp.csr_matrix(Ad), mesh.devices.size)
    r_sh = lsqr_sharded(panels, jnp.asarray(b), jnp.asarray(x_true),
                        tol=0.0, maxit=10, mesh=mesh, interpret=True)
    r_ref = lsqr(jnp.asarray(Ad), jnp.asarray(b), jnp.asarray(x_true),
                 tol=0.0, maxit=10)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=2e-4)


def test_equivalence_sharded_gkb_vs_sharded_gmres(prob):
    """The reference's equivalence oracle at scale (run_equivalence_plots.m:
    12-22): with B = A^T, sharded BA-GMRES == sharded LSMR and sharded
    AB-GMRES == sharded LSQR over the early iterations."""
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_basis, ba_gmres_sharded_basis, lsmr_sharded,
        lsqr_sharded)

    A, B, b, x_true = prob
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, A.T, b, mesh)
    k = 6
    r_ba = ba_gmres_sharded_basis(A_s, B_s, b_s, x_true, tol=0.0, maxit=k,
                                  mesh=mesh)
    r_lsmr = lsmr_sharded(A, b, x_true, tol=0.0, maxit=k, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r_ba.err_hist),
                               np.asarray(r_lsmr.err_hist), rtol=1e-6)
    r_ab = ab_gmres_sharded_basis(A_s, B_s, b_s, x_true, tol=0.0, maxit=k,
                                  mesh=mesh)
    r_lsqr = lsqr_sharded(A, b, x_true, tol=0.0, maxit=k, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r_ab.err_hist),
                               np.asarray(r_lsqr.err_hist), rtol=1e-6)


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
@pytest.mark.parametrize("lam", [None, 1e-3])
def test_ba_gmres_sharded_2d_matches_single_device(prob, shape, lam):
    """SUMMA-style 2-D (ray x pixel) tiling == single-device BA-GMRES:
    per-iteration collectives shrink to O(m/pr) + O(n/pc) (DESIGN.md §7-8)."""
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_2d, make_mesh_2d, shard_problem_2d)

    A, B, b, x_true = prob
    mesh = make_mesh_2d(shape)
    A_s, B_s, b_s = shard_problem_2d(A, B, b, mesh)
    r_ref = ba_gmres(A, B, b, x_true, tol=1e-10, maxit=16, lam=lam,
                     residual="fused")
    r_sh = ba_gmres_sharded_2d(A_s, B_s, b_s, x_true, tol=1e-10, maxit=16,
                               lam=lam, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), rtol=1e-8)
    assert int(r_sh.niters) == int(r_ref.niters)


def test_ba_gmres_sharded_2d_requires_divisible(prob):
    from hybrid_gmres_tpu.parallel import ba_gmres_sharded_2d, make_mesh_2d

    A, B, b, x_true = prob
    mesh = make_mesh_2d((4, 2))
    with pytest.raises(ValueError):
        ba_gmres_sharded_2d(A[:30], B[:, :30], b[:30], None, maxit=4,
                            mesh=mesh)
    with pytest.raises(ValueError):
        ba_gmres_sharded_2d(A, B, b, None, maxit=4, mesh=None)


def test_sharded_panels_int8_quantized():
    """int8 sharded panels: per-row scales outside the kernel, exact
    adjoint pair (<A x, u> == <x, A^T u>), parity with the f32 panels to
    the ~1e-2 quantization error on random data, and a working sharded
    GKB solve (fro_sq stored exactly at build time)."""
    import scipy.sparse as sp
    from jax.sharding import PartitionSpec as P
    from hybrid_gmres_tpu.parallel import (
        lsqr_sharded, shard_bucketed_panels)
    from hybrid_gmres_tpu.parallel.panels import (
        gather_window, local_matvec, local_rmatvec_window,
        scatter_window_to_full)
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=6)
    p = 8
    mesh = make_mesh()
    panels = shard_bucketed_panels(sp.csr_matrix(Ad), p, dtype=np.int8)
    assert panels.row_scale is not None
    assert panels.buckets[0][0].dtype == jnp.int8
    x = np.random.default_rng(7).standard_normal(32).astype(np.float32)
    u = np.random.default_rng(8).standard_normal(64).astype(np.float32)

    def fwd(pan, x_loc):
        return local_matvec(pan, gather_window(pan, x_loc, "rows"),
                            interpret=True)

    def rmv(pan, u_loc):
        part = local_rmatvec_window(pan, u_loc, interpret=True)
        return jax.lax.psum(scatter_window_to_full(pan, part), "rows")

    y = jax.shard_map(fwd, mesh=mesh, in_specs=(P("rows"), P("rows")),
                      out_specs=P("rows"), check_vma=False)(
        panels, jnp.asarray(x))
    z = jax.shard_map(rmv, mesh=mesh, in_specs=(P("rows"), P("rows")),
                      out_specs=P(), check_vma=False)(panels, jnp.asarray(u))
    # quantization error is a NORM-level ~0.5% on random data (per-element
    # errors scale with the row max); the panel product itself matches the
    # reference quantized product diag(s) (Q x) to 1e-7
    Aq, sA = __import__("hybrid_gmres_tpu.ops.spmv_pallas",
                        fromlist=["_row_quantize_csr"])._row_quantize_csr(
        sp.csr_matrix(Ad))
    ref_q = sA * (Aq @ x)
    assert (np.linalg.norm(np.asarray(y) - ref_q)
            / np.linalg.norm(ref_q)) < 1e-5
    assert (np.linalg.norm(np.asarray(y) - Ad @ x)
            / np.linalg.norm(Ad @ x)) < 2e-2
    assert (np.linalg.norm(np.asarray(z) - Ad.T @ u)
            / np.linalg.norm(Ad.T @ u)) < 2e-2
    # exact adjoint pair (GKB requirement): <A x, u> == <x, A^T u>
    lhs = float(np.dot(np.asarray(y), u))
    rhs = float(np.dot(x, np.asarray(z)))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-6) < 1e-5, (lhs, rhs)
    # exact fro_sq regardless of storage dtype
    np.testing.assert_allclose(float(jnp.sum(panels.fro_sq)),
                               float((Ad * Ad).sum()), rtol=1e-5)

    r_sh = lsqr_sharded(panels, jnp.asarray(b), jnp.asarray(x_true),
                        tol=0.0, maxit=8, mesh=mesh, interpret=True)
    r_ref = lsqr(jnp.asarray(Ad), jnp.asarray(b), jnp.asarray(x_true),
                 tol=0.0, maxit=8)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist, dtype=np.float32),
                               rtol=0.05)


@pytest.mark.parametrize("kind", ["ab", "ba"])
def test_composed_panels_gkb_matches_product_operator(kind):
    """Distributed twin of the reference's composed hybrid path
    (run_2D_phantom.m:150-176): sharded LSQR / hybrid LSQR over
    M = A B ('ab') or B A ('ba') built from the two panel sets ==
    single-device solvers on the dense product."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ComposedPanels, hybrid_lsqr_sharded, lsqr_sharded,
        shard_bucketed_panels)
    from hybrid_gmres_tpu.solvers.lsqr import hybrid_lsqr, lsqr

    Ad, Bd, b, x_true = _sparse_pair(64, 64, seed=9)
    mesh = make_mesh()
    A_p = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_p = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    M = ComposedPanels(A_p, BT_p, kind)
    if kind == "ab":
        Md = jnp.asarray(Ad @ Bd)
        rhs = jnp.asarray(b)
    else:
        Md = jnp.asarray(Bd @ Ad)
        rhs = jnp.asarray(Bd @ b)

    r_sh = lsqr_sharded(M, rhs, tol=0.0, maxit=8, mesh=mesh,
                        interpret=True)
    r_ref = lsqr(Md, rhs, tol=0.0, maxit=8)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=1e-2, atol=1e-4)

    r_hsh = hybrid_lsqr_sharded(M, rhs, tol=0.0, maxit=8, lam=1e-2,
                                mesh=mesh, interpret=True)
    r_href = hybrid_lsqr(Md, rhs, tol=0.0, maxit=8, lam=1e-2)
    np.testing.assert_allclose(
        np.asarray(r_hsh.res_hist),
        np.asarray(r_href.res_hist, dtype=np.float32), rtol=2e-3,
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r_hsh.x), np.asarray(r_href.x, dtype=np.float32),
        rtol=1e-2, atol=1e-4)


def test_sharded_panels_int4_packed():
    """Packed-int4 sharded panels: nibble-pair storage flows through the
    windowed exchange + both kernels, the per-nibble window scan ignores
    packing padding, and the panel product matches the exact diag(s) Q
    reference (qmax=7)."""
    import scipy.sparse as sp
    from jax.sharding import PartitionSpec as P
    from hybrid_gmres_tpu.parallel import shard_bucketed_panels
    from hybrid_gmres_tpu.parallel.panels import (
        gather_window, local_matvec, local_rmatvec_window,
        scatter_window_to_full)
    from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=9)
    p = 8
    mesh = make_mesh()
    panels = shard_bucketed_panels(sp.csr_matrix(Ad), p, dtype="int4")
    assert panels.packed4 and panels.row_scale is not None
    assert panels.buckets[0][0].dtype == jnp.int8  # bytes hold nibble pairs
    blocks, bcols = panels.buckets[0]
    assert bcols.shape[1] == blocks.shape[1] * 2 * blocks.shape[2]
    x = np.random.default_rng(7).standard_normal(32).astype(np.float32)
    u = np.random.default_rng(8).standard_normal(64).astype(np.float32)

    def fwd(pan, x_loc):
        return local_matvec(pan, gather_window(pan, x_loc, "rows"),
                            interpret=True)

    def rmv(pan, u_loc):
        part = local_rmatvec_window(pan, u_loc, interpret=True)
        return jax.lax.psum(scatter_window_to_full(pan, part), "rows")

    y = jax.shard_map(fwd, mesh=mesh, in_specs=(P("rows"), P("rows")),
                      out_specs=P("rows"), check_vma=False)(
        panels, jnp.asarray(x))
    z = jax.shard_map(rmv, mesh=mesh, in_specs=(P("rows"), P("rows")),
                      out_specs=P(), check_vma=False)(panels, jnp.asarray(u))
    Aq, sA = _row_quantize_csr(sp.csr_matrix(Ad), qmax=7)
    ref_q = sA * (Aq @ x)
    assert (np.linalg.norm(np.asarray(y) - ref_q)
            / np.linalg.norm(ref_q)) < 1e-5
    ref_t = Aq.T @ (sA * u)
    assert (np.linalg.norm(np.asarray(z) - ref_t)
            / np.linalg.norm(ref_t)) < 1e-5
    # ~7% quantization error vs the exact operator on random data
    assert (np.linalg.norm(np.asarray(y) - Ad @ x)
            / np.linalg.norm(Ad @ x)) < 0.15
    # exact adjoint pair survives packing
    lhs = float(np.dot(np.asarray(y), u))
    rhs = float(np.dot(x, np.asarray(z)))
    assert abs(lhs - rhs) / max(abs(lhs), 1e-6) < 1e-5, (lhs, rhs)


def test_sharded_panels_int4_packed_windowed():
    """int4 panels with the window ACTIVE (ADVICE r2): a banded operator on
    a block-aligned mesh (n = p*128) must keep L < p with nibble-pair
    storage — the per-nibble ``_nonzero_block_mask`` must not let a padded
    hi nibble drag the window to slab 0 — and both kernels must match the
    exact diag(s) Q reference through the ppermute exchange."""
    import scipy.sparse as sp
    from jax.sharding import PartitionSpec as P
    from hybrid_gmres_tpu.parallel import shard_bucketed_panels
    from hybrid_gmres_tpu.parallel.panels import (
        gather_window, local_matvec, local_rmatvec_window,
        scatter_window_to_full)
    from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr

    p = 8
    n = 128 * p
    rng = np.random.default_rng(13)
    diags = [rng.standard_normal(n - abs(o))
             for o in (-130, -40, 0, 40, 130)]
    Ad = sp.diags(diags, offsets=(-130, -40, 0, 40, 130)).tocsr().astype(
        np.float32)
    panels = shard_bucketed_panels(Ad, p, dtype="int4")
    assert panels.packed4 and panels.windowed
    dmin, L = panels.shifts
    assert L < p, (dmin, L)

    x = rng.standard_normal(n).astype(np.float32)
    u = rng.standard_normal(n).astype(np.float32)
    mesh = make_mesh()

    def fwd(pan, x_loc):
        return local_matvec(pan, gather_window(pan, x_loc, "rows"),
                            interpret=True)

    def rmv(pan, u_loc):
        part = local_rmatvec_window(pan, u_loc, interpret=True)
        return jax.lax.psum(scatter_window_to_full(pan, part), "rows")

    y = jax.shard_map(fwd, mesh=mesh, in_specs=(P("rows"), P("rows")),
                      out_specs=P("rows"), check_vma=False)(
        panels, jnp.asarray(x))
    z = jax.shard_map(rmv, mesh=mesh, in_specs=(P("rows"), P("rows")),
                      out_specs=P(), check_vma=False)(panels, jnp.asarray(u))
    Aq, sA = _row_quantize_csr(Ad, qmax=7)
    ref_q = sA * (Aq @ x)
    assert (np.linalg.norm(np.asarray(y) - ref_q)
            / np.linalg.norm(ref_q)) < 1e-5
    ref_t = Aq.T @ (sA * u)
    assert (np.linalg.norm(np.asarray(z) - ref_t)
            / np.linalg.norm(ref_t)) < 1e-5


def test_sharded_pallas_adaptive_gcv_matches_single_device():
    """lam='gcv' at scale: every shard evaluates the same replicated
    projected-GCV objective (2 SVDs/iter, zero extra collectives) and picks
    the same per-iteration lambda as the single-device solver."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ba_gmres
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=11)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
    grid = np.logspace(-6, -1, 12)
    r_sh = ba_gmres_sharded_pallas(
        A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
        tol=0.0, maxit=6, lam="gcv", gcv_grid=grid, mesh=mesh,
        interpret=True)
    r_ref = ba_gmres(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                     jnp.asarray(x_true), tol=0.0, maxit=6, lam="gcv",
                     gcv_grid=grid)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# Sharded RTP + restarted sharded GMRES — VERDICT r2 #7
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_sharded_rtp_matches_single_device(kind):
    """Sharded RTP (Krylov on B A + lam I with a shard-diagonal shift; AB's
    inner Gram built incrementally on one fused psum) == solvers/rtp.py on
    the 8-device mesh (hybrid_{ab,ba}_gmres_rtp.m at scale)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ab_gmres_rtp, ba_gmres_rtp
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_rtp_sharded, ba_gmres_rtp_sharded, shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=17)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
    sharded = ba_gmres_rtp_sharded if kind == "ba" else ab_gmres_rtp_sharded
    single = ba_gmres_rtp if kind == "ba" else ab_gmres_rtp
    r_sh = sharded(A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
                   tol=0.0, maxit=8, lam=1e-2, mesh=mesh, interpret=True)
    r_ref = single(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                   jnp.asarray(x_true), tol=0.0, maxit=8, lam=1e-2)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=1e-3, atol=1e-5)


def test_sharded_rtp_differs_from_ptr():
    """The repo's central PTR != RTP claim (run_ptr_rtp_comparison.m) holds
    at scale too."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_rtp_sharded, ba_gmres_sharded_pallas,
        shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=18)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
    r_rtp = ba_gmres_rtp_sharded(A_panels, BT_panels, jnp.asarray(b),
                                 jnp.asarray(x_true), tol=0.0, maxit=8,
                                 lam=1e-1, mesh=mesh, interpret=True)
    r_ptr = ba_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                    jnp.asarray(x_true), tol=0.0, maxit=8,
                                    lam=1e-1, mesh=mesh, interpret=True)
    d = np.nanmax(np.abs(np.asarray(r_rtp.err_hist)
                         - np.asarray(r_ptr.err_hist)))
    assert d > 1e-4, d


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_sharded_restarted_matches_single_device(kind):
    """Restarted sharded GMRES chains the n-sharded warm start across
    cycles and reproduces the single-device restarted wrappers."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.solvers.gmres import (
        ab_gmres_restarted, ba_gmres_restarted)
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas_restarted, ba_gmres_sharded_pallas_restarted,
        shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=19)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
    sharded = (ba_gmres_sharded_pallas_restarted if kind == "ba"
               else ab_gmres_sharded_pallas_restarted)
    single = ba_gmres_restarted if kind == "ba" else ab_gmres_restarted
    r_sh = sharded(A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
                   tol=1e-10, restart=4, max_restarts=3, lam=1e-3,
                   mesh=mesh, interpret=True)
    r_ref = single(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                   jnp.asarray(x_true), tol=1e-10, restart=4,
                   max_restarts=3, lam=1e-3)
    assert int(r_sh.niters) == int(r_ref.niters)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=1e-2, atol=1e-4)


# ---------------------------------------------------------------------------
# 2-D mesh x Pallas panels — VERDICT r2 #2
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("grid", [(4, 2), (2, 4)])
@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_tiled_panels_2d_solver_matches_dense(kind, grid):
    """2-D (ray x pixel) mesh with per-tile bucketed Pallas SpMV == dense
    single-device, on (4,2) and (2,4) CPU meshes — the sparse-format 2-D
    path DESIGN §8 deferred (panel compression retained at scale)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ab_gmres
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas_2d, ba_gmres_sharded_pallas_2d,
        make_mesh_2d, tile_bucketed_panels)

    pr, pc = grid
    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=23)
    mesh = make_mesh_2d((pr, pc))
    A_tiles = tile_bucketed_panels(sp.csr_matrix(Ad), pr, pc)
    BT_tiles = tile_bucketed_panels(sp.csr_matrix(Bd.T), pr, pc)
    solver2d = (ba_gmres_sharded_pallas_2d if kind == "ba"
                else ab_gmres_sharded_pallas_2d)
    single = ba_gmres if kind == "ba" else ab_gmres
    r_sh = solver2d(A_tiles, BT_tiles, jnp.asarray(b), jnp.asarray(x_true),
                    tol=0.0, maxit=8, lam=1e-3, mesh=mesh, interpret=True)
    r_ref = single(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                   jnp.asarray(x_true), tol=0.0, maxit=8, lam=1e-3)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=2e-3, atol=1e-5)


@pytest.mark.parametrize("dtype", ["int8", "int4"])
def test_tiled_panels_2d_quantized(dtype):
    """Quantized 2-D tiles share ONE global per-row diag(s) Q, so the
    cross-tile psum reduces exact integer images: the solver matches the
    dense run on the exactly-quantized operator."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ba_gmres
    from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas_2d, make_mesh_2d, tile_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=24)
    mesh = make_mesh_2d((4, 2))
    A_tiles = tile_bucketed_panels(sp.csr_matrix(Ad), 4, 2, dtype=dtype)
    BT_tiles = tile_bucketed_panels(sp.csr_matrix(Bd.T), 4, 2)
    qmax = 7 if dtype == "int4" else 127
    Aq_csr, sA = _row_quantize_csr(sp.csr_matrix(Ad), qmax=qmax)
    Aq = jnp.asarray(sA[:, None] * Aq_csr.toarray(), dtype=jnp.float32)
    r_sh = ba_gmres_sharded_pallas_2d(
        A_tiles, BT_tiles, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
        maxit=6, lam=1e-3, mesh=mesh, interpret=True)
    r_ref = ba_gmres(Aq, jnp.asarray(Bd), jnp.asarray(b),
                     jnp.asarray(x_true), tol=0.0, maxit=6, lam=1e-3)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=2e-4, atol=1e-6)


def test_tiled_panels_2d_adaptive_gcv():
    """lam='gcv' on the 2-D tiled path picks the same per-iteration lambda
    as the single-device adaptive solver."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ba_gmres
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas_2d, make_mesh_2d, tile_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=25)
    mesh = make_mesh_2d((2, 4))
    A_tiles = tile_bucketed_panels(sp.csr_matrix(Ad), 2, 4)
    BT_tiles = tile_bucketed_panels(sp.csr_matrix(Bd.T), 2, 4)
    grid = np.logspace(-6, -1, 12)
    r_sh = ba_gmres_sharded_pallas_2d(
        A_tiles, BT_tiles, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
        maxit=6, lam="gcv", gcv_grid=grid, mesh=mesh, interpret=True)
    r_ref = ba_gmres(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                     jnp.asarray(x_true), tol=0.0, maxit=6, lam="gcv",
                     gcv_grid=grid)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=2e-4, atol=1e-6)


def test_dense_2d_adaptive_gcv():
    """lam='gcv' on the dense 2-D SUMMA path (VERDICT r2 weak#5)."""
    from hybrid_gmres_tpu import ba_gmres
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_2d, make_mesh_2d, shard_problem_2d)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=26)
    mesh = make_mesh_2d((4, 2))
    A2, B2, b2 = shard_problem_2d(jnp.asarray(Ad), jnp.asarray(Bd),
                                  jnp.asarray(b), mesh)
    grid = np.logspace(-6, -1, 12)
    r_sh = ba_gmres_sharded_2d(A2, B2, b2, jnp.asarray(x_true), tol=0.0,
                               maxit=6, lam="gcv", gcv_grid=grid, mesh=mesh)
    r_ref = ba_gmres(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                     jnp.asarray(x_true), tol=0.0, maxit=6, lam="gcv",
                     gcv_grid=grid)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist), np.asarray(r_ref.err_hist, np.float32),
        rtol=2e-4, atol=1e-6)


def test_tiled_panels_2d_comms_model_and_compression():
    """The 2-D comms model falls in BOTH mesh dimensions and the tiled
    storage keeps the bucketed compression (<= a dense tile's bytes)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        comms_bytes_per_iteration_2d, tile_bucketed_panels)
    from hybrid_gmres_tpu.parallel.panels import comms_bytes_per_iteration
    from hybrid_gmres_tpu.parallel import shard_bucketed_panels

    rng = np.random.default_rng(30)
    m = n = 1024
    # structured (banded) operator: BLOCK sparsity is what the bucketed
    # format compresses — a uniformly random pattern fills every (8,128)
    # block and legitimately stores dense.  Mesh-uniform padding means
    # near-empty tiles pad to the fullest tile's bucket shapes (the SPMD
    # price); the CT pair's ray/pixel tiles are load-balanced so the real
    # compression there matches the 1-D panels (DESIGN §7).
    diags = [rng.standard_normal(n - abs(o)) for o in (-40, 0, 40)]
    Ad = sp.diags(diags, offsets=(-40, 0, 40)).tocsr().astype(np.float32)
    t42 = tile_bucketed_panels(Ad, 4, 2)
    t24 = tile_bucketed_panels(Ad, 2, 4)
    c42 = comms_bytes_per_iteration_2d(t42)
    c24 = comms_bytes_per_iteration_2d(t24)
    # vector bytes per device: m/pr + n/pc reductions
    assert c42["A_reduce_bytes"] < c24["A_reduce_bytes"]  # pr 4 vs 2
    assert c42["B_reduce_bytes"] > c24["B_reduce_bytes"]
    # vs the 1-D full-gather bound at p=8 on the same operator: the 2-D
    # total falls below the fixed O(n) 1-D floor
    p1d = shard_bucketed_panels(Ad, 8, window=False)
    c1d = comms_bytes_per_iteration(p1d)
    assert c42["total_bytes"] < c1d["total_bytes"]
    # compression: sparse tiles smaller than a dense tiling
    dense_bytes = m * n * 4
    assert t42.nbytes <= 0.55 * dense_bytes


def test_ba_sharded_pallas_resume_equals_uninterrupted():
    """Flagship sharded solver resume: the sharded Q/H/x/IMG checkpoint
    continues the Arnoldi recurrence exactly (multi-chip production resume,
    VERDICT r2 #5 completed for the GMRES tier)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=27)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
    kw = dict(tol=0.0, lam=1e-3, mesh=mesh, interpret=True)
    r_full = ba_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                     jnp.asarray(x_true), maxit=12, **kw)
    r_half = ba_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                     jnp.asarray(x_true), maxit=6, **kw)
    assert r_half.IMG is not None
    r_res = ba_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                    jnp.asarray(x_true), maxit=12,
                                    resume_from=r_half, **kw)
    # not bitwise: the half run's padded basis is (n, 7) vs (n, 13), so the
    # CGS2 matmuls reduce in a different order (f32 reassociation ~3e-5,
    # same caveat as the single-chip resume test)
    np.testing.assert_allclose(np.asarray(r_res.res_hist),
                               np.asarray(r_full.res_hist), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(r_res.err_hist),
                               np.asarray(r_full.err_hist), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(r_res.x), np.asarray(r_full.x),
                               rtol=1e-3, atol=1e-6)
    assert int(r_res.niters) == int(r_full.niters)


def test_ba_sharded_pallas_resume_after_tol_stop():
    """Resuming a run that CONVERGED early must not scan over zero Krylov
    columns (self-review r3: k0 comes from niters, not the old history
    length) — the continuation equals an uninterrupted larger-budget run."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, shard_bucketed_panels)

    rng = np.random.default_rng(33)
    # well-conditioned: converges to tol quickly
    Ad = (np.eye(64, 32) * 3.0 + 0.05 * rng.standard_normal((64, 32))
          ).astype(np.float32)
    Bd = Ad.T.copy()
    x_true = rng.standard_normal(32).astype(np.float32)
    b = (Ad @ x_true).astype(np.float32)
    mesh = make_mesh()
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    kw = dict(mesh=mesh, interpret=True)
    r_half = ba_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                     jnp.asarray(x_true), tol=1e-3,
                                     maxit=10, **kw)
    assert int(r_half.niters) < 10  # must actually stop early
    r_res = ba_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                    jnp.asarray(x_true), tol=1e-3, maxit=14,
                                    resume_from=r_half, **kw)
    r_full = ba_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                     jnp.asarray(x_true), tol=1e-3,
                                     maxit=14, **kw)
    assert np.isfinite(np.asarray(r_res.x)).all()
    assert int(r_res.niters) == int(r_full.niters)
    np.testing.assert_allclose(np.asarray(r_res.x), np.asarray(r_full.x),
                               rtol=1e-4, atol=1e-6)


def test_sharded_restarted_zero_rhs():
    """b = 0 must return x = 0 with niters = 0 (self-review r3: the
    unguarded r0/beta division produced NaN), matching single-chip."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres_restarted
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas_restarted, shard_bucketed_panels)

    Ad, Bd, _, x_true = _sparse_pair(64, 32, seed=34)
    mesh = make_mesh()
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    z = jnp.zeros(64, jnp.float32)
    r_sh = ba_gmres_sharded_pallas_restarted(
        A_panels, BT_panels, z, jnp.asarray(x_true), tol=1e-6, restart=4,
        max_restarts=3, mesh=mesh, interpret=True)
    r_ref = ba_gmres_restarted(jnp.asarray(Ad), jnp.asarray(Bd), z,
                               jnp.asarray(x_true), tol=1e-6, restart=4,
                               max_restarts=3)
    assert int(r_sh.niters) == int(r_ref.niters) == 0
    np.testing.assert_array_equal(np.asarray(r_sh.x), 0.0)
    assert np.isfinite(np.asarray(r_sh.x)).all()


# ---------------------------------------------------------------------------
# 2-D tiled GKB family
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("grid", [(4, 2), (2, 4)])
def test_gkb_2d_matches_single_device(grid):
    """All four GKB solvers over the 2-D tiled mesh == their single-device
    twins (exact adjoint pair from the same tiles; completes the solver x
    layout feature matrix)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.solvers.lsqr import hybrid_lsqr, lsqr
    from hybrid_gmres_tpu.solvers.lsmr import hybrid_lsmr, lsmr
    from hybrid_gmres_tpu.parallel import (
        hybrid_lsmr_sharded_2d, hybrid_lsqr_sharded_2d, lsmr_sharded_2d,
        lsqr_sharded_2d, make_mesh_2d, tile_bucketed_panels)

    pr, pc = grid
    Ad, _, b, x_true = _sparse_pair(64, 32, seed=41)
    mesh = make_mesh_2d((pr, pc))
    tiles = tile_bucketed_panels(sp.csr_matrix(Ad), pr, pc)
    Aj = jnp.asarray(Ad)
    kw2 = dict(mesh=mesh, interpret=True)

    r = lsqr_sharded_2d(tiles, jnp.asarray(b), jnp.asarray(x_true),
                        tol=0.0, maxit=10, **kw2)
    rr = lsqr(Aj, jnp.asarray(b), jnp.asarray(x_true), tol=0.0, maxit=10)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(rr.res_hist, np.float32),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r.x),
                               np.asarray(rr.x, np.float32), rtol=1e-2,
                               atol=1e-4)

    r = hybrid_lsqr_sharded_2d(tiles, jnp.asarray(b), jnp.asarray(x_true),
                               tol=0.0, maxit=10, lam=1e-2, **kw2)
    rr = hybrid_lsqr(Aj, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                     maxit=10, lam=1e-2)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(rr.res_hist, np.float32),
                               rtol=2e-3, atol=1e-5)

    r = lsmr_sharded_2d(tiles, jnp.asarray(b), jnp.asarray(x_true),
                        tol=0.0, maxit=10, **kw2)
    rr = lsmr(Aj, jnp.asarray(b), jnp.asarray(x_true), tol=0.0, maxit=10)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(rr.res_hist, np.float32),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r.ar_hist),
                               np.asarray(rr.ar_hist, np.float32),
                               rtol=5e-3, atol=1e-5)

    for lam in (1e-2, "gcv"):
        r = hybrid_lsmr_sharded_2d(tiles, jnp.asarray(b),
                                   jnp.asarray(x_true), tol=0.0, maxit=10,
                                   lam=lam, **kw2)
        rr = hybrid_lsmr(Aj, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                         maxit=10, lam=lam)
        np.testing.assert_allclose(np.asarray(r.err_hist),
                                   np.asarray(rr.err_hist, np.float32),
                                   rtol=2e-3, atol=1e-5)


def test_sharded_pallas_hlo_collective_schedule():
    """Compiler-level comms oracle: the OPTIMIZED HLO of the windowed
    sharded solver must contain exactly the designed collectives — the
    ppermute hops of the static window (L shifts minus the local d=0 one),
    NO all_gather, and one reduce_scatter per B product (loop body + the
    r0 setup).  Turns the DESIGN §7 analytic table into a fact the
    compiler certifies."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, shard_bucketed_panels)

    rng = np.random.default_rng(3)
    n = 128 * 8
    diags = [rng.standard_normal(n - abs(o))
             for o in (-130, -40, 0, 40, 130)]
    Ad = sp.diags(diags, offsets=(-130, -40, 0, 40, 130)).tocsr().astype(
        np.float32)
    mesh = make_mesh()
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def compiled_hlo(window):
        A_p = shard_bucketed_panels(Ad, 8, window=window)
        BT_p = shard_bucketed_panels(Ad.T.tocsr(), 8, window=window)
        f = jax.jit(lambda Ap, BTp, bb: ba_gmres_sharded_pallas(
            Ap, BTp, bb, None, tol=0.0, maxit=6, lam=1e-3, mesh=mesh,
            interpret=True).x)
        return A_p, f.lower(A_p, BT_p, b).compile().as_text()

    A_p, hlo = compiled_hlo(window=True)
    dmin, L = A_p.shifts
    assert A_p.windowed and L < 8
    n_hops = L - (1 if dmin <= 0 <= dmin + L - 1 else 0)
    assert hlo.count("all-gather") == 0, "windowed path must not all_gather"
    assert hlo.count("collective-permute") == n_hops, (
        hlo.count("collective-permute"), n_hops)
    assert hlo.count("reduce-scatter") == 2  # B product: loop body + r0

    _, hlo_full = compiled_hlo(window=False)
    assert hlo_full.count("collective-permute") == 0
    assert hlo_full.count("all-gather") > 0


def test_ab_sharded_pallas_resume_equals_uninterrupted():
    """AB sharded resume: both image bases (W for the residual, S for the
    solution) continue across the checkpoint."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas, shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=43)
    mesh = make_mesh()
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    kw = dict(tol=0.0, lam=1e-3, mesh=mesh, interpret=True)
    r_full = ab_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                     jnp.asarray(x_true), maxit=12, **kw)
    r_half = ab_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                     jnp.asarray(x_true), maxit=6, **kw)
    assert r_half.IMG is not None and r_half.S is not None
    r_res = ab_gmres_sharded_pallas(A_panels, BT_panels, jnp.asarray(b),
                                    jnp.asarray(x_true), maxit=12,
                                    resume_from=r_half, **kw)
    np.testing.assert_allclose(np.asarray(r_res.res_hist),
                               np.asarray(r_full.res_hist), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(r_res.err_hist),
                               np.asarray(r_full.err_hist), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(r_res.x), np.asarray(r_full.x),
                               rtol=1e-3, atol=1e-6)
    assert int(r_res.niters) == int(r_full.niters)


# ---------------------------------------------------------------------------
# Forward-layout back-projector panels (VERDICT r3 #1)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_forward_b_layout_matches_dense(kind):
    """B applied through the FORWARD kernel of its own pixel-row panels
    (gather schedule, the single-chip kernel configuration) must reproduce
    the dense single-device solver — BT_panels=None exercised."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ab_gmres
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas, ba_gmres_sharded_pallas,
        shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    B_panels = shard_bucketed_panels(sp.csr_matrix(Bd), p)
    solver = (ba_gmres_sharded_pallas if kind == "ba"
              else ab_gmres_sharded_pallas)
    ref_solver = ba_gmres if kind == "ba" else ab_gmres
    r_sh = solver(A_panels, None, jnp.asarray(b), jnp.asarray(x_true),
                  tol=0.0, maxit=8, lam=1e-3, mesh=mesh, interpret=True,
                  B_panels=B_panels)
    r_ref = ref_solver(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                       jnp.asarray(x_true), tol=0.0, maxit=8, lam=1e-3)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=5e-5)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=5e-5)


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_forward_b_layout_rtp_matches_transposed(kind):
    """RTP solvers accept the forward B layout too and match the
    transposed-layout schedule to f32 roundoff."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import shard_bucketed_panels
    from hybrid_gmres_tpu.parallel.sharded_rtp import (
        ab_gmres_rtp_sharded, ba_gmres_rtp_sharded)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=5)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
    B_panels = shard_bucketed_panels(sp.csr_matrix(Bd), p)
    solver = (ba_gmres_rtp_sharded if kind == "ba" else ab_gmres_rtp_sharded)
    r_t = solver(A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
                 tol=0.0, maxit=6, lam=1e-3, mesh=mesh, interpret=True)
    r_f = solver(A_panels, None, jnp.asarray(b), jnp.asarray(x_true),
                 tol=0.0, maxit=6, lam=1e-3, mesh=mesh, interpret=True,
                 B_panels=B_panels)
    np.testing.assert_allclose(np.asarray(r_f.res_hist),
                               np.asarray(r_t.res_hist), rtol=5e-5)
    np.testing.assert_allclose(np.asarray(r_f.err_hist),
                               np.asarray(r_t.err_hist), rtol=5e-5)


def test_forward_b_layout_restarted_and_resume():
    """The forward layout flows through the restarted wrapper and the resume
    path (the sharded carry is layout-independent)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, ba_gmres_sharded_pallas_restarted,
        shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=9)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    B_panels = shard_bucketed_panels(sp.csr_matrix(Bd), p)
    bj, xtj = jnp.asarray(b), jnp.asarray(x_true)

    full = ba_gmres_sharded_pallas(A_panels, None, bj, xtj, tol=0.0,
                                   maxit=8, lam=1e-3, mesh=mesh,
                                   interpret=True, B_panels=B_panels)
    part = ba_gmres_sharded_pallas(A_panels, None, bj, xtj, tol=0.0,
                                   maxit=4, lam=1e-3, mesh=mesh,
                                   interpret=True, B_panels=B_panels)
    resumed = ba_gmres_sharded_pallas(A_panels, None, bj, xtj, tol=0.0,
                                      maxit=8, lam=1e-3, mesh=mesh,
                                      interpret=True, B_panels=B_panels,
                                      resume_from=part)
    np.testing.assert_allclose(np.asarray(resumed.res_hist),
                               np.asarray(full.res_hist), rtol=2e-5)

    r_re = ba_gmres_sharded_pallas_restarted(
        A_panels, None, bj, xtj, tol=1e-10, restart=4, max_restarts=2,
        lam=1e-3, mesh=mesh, interpret=True, B_panels=B_panels)
    assert int(r_re.niters) > 0
    assert np.isfinite(np.asarray(r_re.res_hist)).all()


def test_forward_b_layout_validation_and_comms():
    """Missing both layouts raises; wrong-shape forward panels raise; the
    analytic comms model swaps the reduce_scatter term for the B gather."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, shard_bucketed_panels)
    from hybrid_gmres_tpu.parallel.panels import comms_bytes_per_iteration

    Ad, Bd, b, x_true = _sparse_pair(64, 32)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    B_panels = shard_bucketed_panels(sp.csr_matrix(Bd), p)
    with pytest.raises(ValueError, match="BT_panels.*or B_panels"):
        ba_gmres_sharded_pallas(A_panels, None, jnp.asarray(b),
                                mesh=mesh, interpret=True)
    with pytest.raises(ValueError, match="B panels"):
        ba_gmres_sharded_pallas(A_panels, None, jnp.asarray(b), mesh=mesh,
                                interpret=True, B_panels=A_panels)

    c_t = comms_bytes_per_iteration(A_panels, kdim=10)
    c_f = comms_bytes_per_iteration(A_panels, kdim=10, B_panels=B_panels)
    assert "reduce_scatter_bytes" in c_t and "b_gather_bytes" in c_f
    m, n = 64, 32
    # full-gather forward panels: (p-1)*m/p bytes vs (p-1)*n/p scatter
    assert c_f["b_gather_bytes"] == (p - 1) * (m // p) * 4
    assert c_t["reduce_scatter_bytes"] == (p - 1) * (n // p) * 4


# ---------------------------------------------------------------------------
# bf16 wire exchange (VERDICT r3 #4, DESIGN §8 lever (a))
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("layout", ["transposed", "forward"])
def test_comm_dtype_bf16_band(layout):
    """comm_dtype=bfloat16 halves the gather wire bytes; the result must
    stay within a quantization band of the f32-exchange run (bit parity is
    EXPECTED to break — the exchanged basis slab is rounded ~4e-3)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=11)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    if layout == "transposed":
        BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
        kw = {}
    else:
        BT_panels = None
        kw = dict(B_panels=shard_bucketed_panels(sp.csr_matrix(Bd), p))
    bj, xtj = jnp.asarray(b), jnp.asarray(x_true)
    r32 = ba_gmres_sharded_pallas(A_panels, BT_panels, bj, xtj, tol=0.0,
                                  maxit=6, lam=1e-3, mesh=mesh,
                                  interpret=True, **kw)
    rbf = ba_gmres_sharded_pallas(A_panels, BT_panels, bj, xtj, tol=0.0,
                                  maxit=6, lam=1e-3, mesh=mesh,
                                  interpret=True,
                                  comm_dtype=jnp.bfloat16, **kw)
    res32 = np.asarray(r32.res_hist)
    resbf = np.asarray(rbf.res_hist)
    assert np.isfinite(resbf).all()
    # quantization band: well above roundoff, well below any real change
    band = np.max(np.abs(resbf - res32) / np.maximum(np.abs(res32), 1e-6))
    assert 0 < band < 3e-2, band


def test_comm_dtype_bf16_hlo_wire_dtype():
    """Compiler certification: with comm_dtype=bfloat16 the gather
    collective moves 16-bit words (half the wire bytes); the
    reduce_scatter stays f32."""
    import re
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, shard_bucketed_panels)

    Ad, Bd, b, _ = _sparse_pair(64, 32, seed=11)
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)

    def hlo(comm_dtype):
        f = jax.jit(lambda Ap, BTp, bb: ba_gmres_sharded_pallas(
            Ap, BTp, bb, None, tol=0.0, maxit=4, lam=1e-3, mesh=mesh,
            interpret=True, comm_dtype=comm_dtype).x)
        return f.lower(A_panels, BT_panels, jnp.asarray(b)
                       ).compile().as_text()

    h32, hbf = hlo(None), hlo(jnp.bfloat16)
    ag32 = re.findall(r"= (\w+)\[[^\]]*\][^=]* all-gather\(", h32)
    agbf = re.findall(r"= (\w+)\[[^\]]*\][^=]* all-gather\(", hbf)
    assert ag32 and agbf
    assert all(v == "f32" for v in ag32), ag32
    # the narrow slab rides the wire as raw 16-bit words (bitcast — a
    # plain convert gets reordered past the collective by XLA)
    assert all(v in ("bf16", "u16") for v in agbf), agbf
    rsbf = re.findall(r"= (\w+)\[[^\]]*\][^=]* reduce-scatter\(", hbf)
    assert rsbf and all(v == "f32" for v in rsbf), rsbf


# ---------------------------------------------------------------------------
# Forward-layout adjoint panels for the GKB family (round 4)
# ---------------------------------------------------------------------------

def test_panels_with_adjoint_gkb_matches_dense():
    """PanelsWithAdjoint (dedicated forward A^T panel) reproduces the dense
    LSQR / hybrid-LSMR histories; quantized panels are rejected (per-row
    scales of A^T are per-column scales of A — the exact adjoint pair
    would silently break)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        PanelsWithAdjoint, hybrid_lsmr_sharded, lsqr_sharded,
        shard_bucketed_panels)
    from hybrid_gmres_tpu.solvers.lsmr import hybrid_lsmr
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=13)
    mesh = make_mesh()
    p = mesh.devices.size
    A_p = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    AT_p = shard_bucketed_panels(sp.csr_matrix(Ad.T.copy()), p)
    pair = PanelsWithAdjoint(A_p, AT_p)
    bj, xtj = jnp.asarray(b), jnp.asarray(x_true)

    ref = lsqr(jnp.asarray(Ad), bj, xtj, tol=0.0, maxit=6)
    r = lsqr_sharded(pair, bj, xtj, tol=0.0, maxit=6, mesh=mesh,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(ref.res_hist), atol=5e-5)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(ref.err_hist), atol=5e-5)

    refh = hybrid_lsmr(jnp.asarray(Ad), bj, xtj, tol=0.0, maxit=6, lam=1e-3)
    rh = hybrid_lsmr_sharded(pair, bj, xtj, tol=0.0, maxit=6, lam=1e-3,
                             mesh=mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(rh.res_hist),
                               np.asarray(refh.res_hist), atol=5e-5)

    A8 = shard_bucketed_panels(sp.csr_matrix(Ad), p, dtype=np.int8)
    # int8 A with a float AT: must demand the shared-quantization builder
    with pytest.raises(ValueError, match="shared-quantization"):
        PanelsWithAdjoint(A8, AT_p)
    AT8 = shard_bucketed_panels(sp.csr_matrix(Ad.T.copy()), p,
                                dtype=np.int8)
    with pytest.raises(ValueError, match="quantized"):
        PanelsWithAdjoint(A_p, AT8)
    # mixed float storage dtypes are not an exact pair either
    AT_bf = shard_bucketed_panels(sp.csr_matrix(Ad.T.copy()), p,
                                  dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="storage dtypes differ"):
        PanelsWithAdjoint(A_p, AT_bf)


def test_composed_panels_forward_b_matches_transposed():
    """ComposedPanels(B=...) applies B through the forward kernel of its
    own pixel-row panel; the composed GKB solve is unchanged."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ComposedPanels, lsqr_sharded, shard_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=17)
    mesh = make_mesh()
    p = mesh.devices.size
    A_p = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_p = shard_bucketed_panels(sp.csr_matrix(Bd.T.copy()), p)
    B_p = shard_bucketed_panels(sp.csr_matrix(Bd), p)
    d = jnp.asarray((Bd @ b).astype(np.float32))
    xtj = jnp.asarray(x_true)
    r_t = lsqr_sharded(ComposedPanels(A_p, BT_p, "ba"), d, xtj, tol=0.0,
                       maxit=5, mesh=mesh, interpret=True)
    r_f = lsqr_sharded(ComposedPanels(A_p, BT_p, "ba", B=B_p), d, xtj,
                       tol=0.0, maxit=5, mesh=mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(r_f.res_hist),
                               np.asarray(r_t.res_hist), atol=5e-5)
    np.testing.assert_allclose(np.asarray(r_f.err_hist),
                               np.asarray(r_t.err_hist), atol=5e-5)


def test_build_panels_with_adjoint_int8_shared_quantization():
    """build_panels_with_adjoint(int8): ONE quantization A ~= diag(s) Q
    with AT storing raw Q^T — the forward-adjoint GKB matches a dense
    solve on the exactly-quantized operator AND the transposed-kernel
    int8 path; hand-built mismatched pairs stay rejected."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr
    from hybrid_gmres_tpu.parallel import (
        PanelsWithAdjoint, build_panels_with_adjoint, lsqr_sharded,
        shard_bucketed_panels)
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=19)
    mesh = make_mesh()
    p = mesh.devices.size
    bj, xtj = jnp.asarray(b), jnp.asarray(x_true)

    pair8 = build_panels_with_adjoint(sp.csr_matrix(Ad), p, dtype=np.int8)
    csr_q, s8 = _row_quantize_csr(sp.csr_matrix(Ad), qmax=127)
    Aq = jnp.asarray(s8[:, None] * csr_q.toarray(), dtype=jnp.float32)
    ref = lsqr(Aq, bj, xtj, tol=0.0, maxit=6)
    r = lsqr_sharded(pair8, bj, xtj, tol=0.0, maxit=6, mesh=mesh,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(ref.res_hist), atol=5e-5)

    A8 = shard_bucketed_panels(sp.csr_matrix(Ad), p, dtype=np.int8)
    r_t = lsqr_sharded(A8, bj, xtj, tol=0.0, maxit=6, mesh=mesh,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(r_t.res_hist), atol=5e-5)

    AT_f32 = shard_bucketed_panels(sp.csr_matrix(Ad.T.copy()), p)
    with pytest.raises(ValueError, match="shared-quantization"):
        PanelsWithAdjoint(A8, AT_f32)
    with pytest.raises(ValueError, match="int4"):
        build_panels_with_adjoint(sp.csr_matrix(Ad), p, dtype="int4")


def test_lsqr_sharded_warm_start():
    """Sharded LSQR/LSMR x0 warm starts match the single-chip warm starts
    and resume exactly; the cold paths are unchanged."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (lsmr_sharded, lsqr_sharded,
                                           shard_bucketed_panels)
    from hybrid_gmres_tpu.solvers.lsmr import lsmr
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=23)
    rng = np.random.default_rng(24)
    x0 = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1)
    mesh = make_mesh()
    A_p = shard_bucketed_panels(sp.csr_matrix(Ad), mesh.devices.size)
    bj, xtj = jnp.asarray(b), jnp.asarray(x_true)

    ref = lsqr(jnp.asarray(Ad), bj, xtj, tol=0.0, maxit=6, x0=x0)
    r = lsqr_sharded(A_p, bj, xtj, tol=0.0, maxit=6, mesh=mesh,
                     interpret=True, x0=x0)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(ref.res_hist), atol=5e-5)
    np.testing.assert_allclose(np.asarray(r.err_hist),
                               np.asarray(ref.err_hist), atol=5e-5)
    part = lsqr_sharded(A_p, bj, xtj, tol=0.0, maxit=3, mesh=mesh,
                        interpret=True, x0=x0)
    resd = lsqr_sharded(A_p, bj, xtj, tol=0.0, maxit=6, mesh=mesh,
                        interpret=True, x0=x0, resume_from=part.state)
    np.testing.assert_allclose(np.asarray(resd.res_hist),
                               np.asarray(r.res_hist), atol=5e-5)

    refm = lsmr(jnp.asarray(Ad), bj, xtj, tol=0.0, maxit=6, x0=x0)
    rm = lsmr_sharded(A_p, bj, xtj, tol=0.0, maxit=6, mesh=mesh,
                      interpret=True, x0=x0)
    np.testing.assert_allclose(np.asarray(rm.res_hist),
                               np.asarray(refm.res_hist), atol=5e-5)


@pytest.mark.parametrize("grid", [(4, 2), (2, 4)])
def test_tiled_2d_forward_b_layout(grid):
    """2-D forward-layout back-projector (tile_backprojector_forward):
    device (i, j) holds B[pixel slab j, ray slab i], B u runs the forward
    tile kernel with the SAME psum(rows) as the transposed layout —
    parity vs the dense solvers on both mesh shapes, and int8 forward
    tiles match the exactly-quantized operator (B's own global-row
    quantization; B is only ever applied forward here)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ab_gmres
    from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas_2d, ba_gmres_sharded_pallas_2d,
        make_mesh_2d, tile_backprojector_forward, tile_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=29)
    pr, pc = grid
    mesh2 = make_mesh_2d(grid)
    A_t = tile_bucketed_panels(sp.csr_matrix(Ad), pr, pc)
    B_t = tile_backprojector_forward(sp.csr_matrix(Bd), pr, pc)
    bj, xtj = jnp.asarray(b), jnp.asarray(x_true)

    ref = ba_gmres(jnp.asarray(Ad), jnp.asarray(Bd), bj, xtj, tol=0.0,
                   maxit=6, lam=1e-3)
    r = ba_gmres_sharded_pallas_2d(A_t, None, bj, xtj, tol=0.0, maxit=6,
                                   lam=1e-3, mesh=mesh2, interpret=True,
                                   B_tiles=B_t)
    np.testing.assert_allclose(np.asarray(r.res_hist),
                               np.asarray(ref.res_hist), atol=5e-5)
    ref2 = ab_gmres(jnp.asarray(Ad), jnp.asarray(Bd), bj, xtj, tol=0.0,
                    maxit=6, lam=1e-3)
    r2 = ab_gmres_sharded_pallas_2d(A_t, None, bj, xtj, tol=0.0, maxit=6,
                                    lam=1e-3, mesh=mesh2, interpret=True,
                                    B_tiles=B_t)
    np.testing.assert_allclose(np.asarray(r2.res_hist),
                               np.asarray(ref2.res_hist), atol=5e-5)

    if grid == (4, 2):
        csr_q, s8 = _row_quantize_csr(sp.csr_matrix(Bd), qmax=127)
        Bq = jnp.asarray(s8[:, None] * csr_q.toarray(), dtype=jnp.float32)
        ref8 = ba_gmres(jnp.asarray(Ad), Bq, bj, xtj, tol=0.0, maxit=6,
                        lam=1e-3)
        B8 = tile_backprojector_forward(sp.csr_matrix(Bd), pr, pc,
                                        dtype=np.int8)
        r8 = ba_gmres_sharded_pallas_2d(A_t, None, bj, xtj, tol=0.0,
                                        maxit=6, lam=1e-3, mesh=mesh2,
                                        interpret=True, B_tiles=B8)
        np.testing.assert_allclose(np.asarray(r8.res_hist),
                                   np.asarray(ref8.res_hist), atol=5e-5)
        # wrong-grid forward tiles rejected
        with pytest.raises(ValueError, match="B tiles"):
            ba_gmres_sharded_pallas_2d(
                A_t, None, bj, xtj, maxit=4, mesh=mesh2, interpret=True,
                B_tiles=tile_bucketed_panels(sp.csr_matrix(Bd), pr, pc))


# ---------------------------------------------------------------------------
# Sharded multi-RHS (serving x distribution composition, VERDICT r4 #1)
# ---------------------------------------------------------------------------


def _batched_pair(m=64, n=32, R=3, seed=1):
    rng = np.random.default_rng(seed)
    Ad = (rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.3)
          ).astype(np.float32)
    Bd = (Ad.T + 1e-3 * rng.standard_normal((n, m))).astype(np.float32)
    x_true = rng.standard_normal((n, R)).astype(np.float32)
    b = (Ad @ x_true + 0.01 * rng.standard_normal((m, R))
         ).astype(np.float32)
    return Ad, Bd, b, x_true


@pytest.mark.parametrize("kind", ["ba", "ab"])
@pytest.mark.parametrize("lam", [None, 1e-3])
def test_sharded_batched_matches_single_device(kind, lam):
    """Sharded multi-RHS GMRES == the single-device batched solver per RHS
    on the virtual 8-device mesh (panel SpMM + fused psum CGS2)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_batched, ba_gmres_sharded_batched,
        shard_bucketed_panels)
    from hybrid_gmres_tpu.solvers.batched import (ab_gmres_batched,
                                                  ba_gmres_batched)

    Ad, Bd, b, x_true = _batched_pair()
    mesh = make_mesh()
    p = mesh.devices.size
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), p)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), p)
    sh = ba_gmres_sharded_batched if kind == "ba" else \
        ab_gmres_sharded_batched
    ref_f = ba_gmres_batched if kind == "ba" else ab_gmres_batched
    r_sh = sh(A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
              tol=0.0, maxit=6, lam=lam, mesh=mesh, interpret=True)
    r_ref = ref_f(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                  jnp.asarray(x_true), tol=0.0, maxit=6, lam=lam,
                  chunk_rhs=None)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               rtol=1e-3, atol=2e-5)
    assert np.array_equal(np.asarray(r_sh.niters), np.asarray(r_ref.niters))


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_sharded_batched_deferred_matches_in_scan(kind):
    """defer_histories on the sharded batched solver reproduces the masked
    in-scan numbers (post-scan einsums at HIGHEST)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_batched, ba_gmres_sharded_batched,
        shard_bucketed_panels)

    Ad, Bd, b, x_true = _batched_pair()
    mesh = make_mesh()
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    sh = ba_gmres_sharded_batched if kind == "ba" else \
        ab_gmres_sharded_batched
    r1 = sh(A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
            tol=0.0, maxit=6, lam=1e-3, mesh=mesh, interpret=True)
    r2 = sh(A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
            tol=0.0, maxit=6, lam=1e-3, mesh=mesh, interpret=True,
            defer_histories=True)
    np.testing.assert_allclose(np.asarray(r2.res_hist),
                               np.asarray(r1.res_hist), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2.err_hist),
                               np.asarray(r1.err_hist), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x),
                               rtol=1e-3, atol=1e-5)
    assert np.array_equal(np.asarray(r2.niters), np.asarray(r1.niters))
    assert np.array_equal(np.asarray(r2.active), np.asarray(r1.active))


def test_sharded_batched_warm_start_and_chunking():
    """Per-RHS x0 warm start (serving: previous frame's solutions) and
    chunk_rhs splitting reproduce the unchunked cold references."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (ba_gmres_sharded_batched,
                                           shard_bucketed_panels)
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    Ad, Bd, b, x_true = _batched_pair(R=5, seed=4)
    mesh = make_mesh()
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    rng = np.random.default_rng(9)
    x0 = (x_true + 0.1 * rng.standard_normal(x_true.shape)
          ).astype(np.float32)
    r_sh = ba_gmres_sharded_batched(
        A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
        maxit=5, lam=1e-3, mesh=mesh, interpret=True, x0=jnp.asarray(x0),
        chunk_rhs=2)
    r_ref = ba_gmres_batched(jnp.asarray(Ad), jnp.asarray(Bd),
                             jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                             maxit=5, lam=1e-3, x0=jnp.asarray(x0),
                             chunk_rhs=None)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist), atol=2e-5)
    # warm start must beat cold start in iteration-1 error
    r_cold = ba_gmres_sharded_batched(
        A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
        maxit=5, lam=1e-3, mesh=mesh, interpret=True)
    assert np.all(np.asarray(r_sh.err_hist)[0] <
                  np.asarray(r_cold.err_hist)[0])


def test_sharded_batched_forward_B_and_wire_dtype():
    """Forward-layout back-projector panels and the bf16 wire exchange on
    the batched path reproduce the transposed-layout f32 run (tolerance
    band for the bf16 wire)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (ba_gmres_sharded_batched,
                                           shard_bucketed_panels)

    Ad, Bd, b, x_true = _batched_pair(seed=7)
    mesh = make_mesh()
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    B_panels = shard_bucketed_panels(sp.csr_matrix(Bd), 8)
    r_t = ba_gmres_sharded_batched(
        A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
        maxit=5, lam=1e-3, mesh=mesh, interpret=True)
    r_f = ba_gmres_sharded_batched(
        A_panels, None, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
        maxit=5, lam=1e-3, mesh=mesh, interpret=True, B_panels=B_panels)
    np.testing.assert_allclose(np.asarray(r_f.res_hist),
                               np.asarray(r_t.res_hist), atol=2e-5)
    r_w = ba_gmres_sharded_batched(
        A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
        maxit=5, lam=1e-3, mesh=mesh, interpret=True,
        comm_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(r_w.res_hist),
                               np.asarray(r_t.res_hist), atol=3e-2)
    # single-RHS misuse rejected
    with pytest.raises(ValueError, match="expects b of shape"):
        ba_gmres_sharded_batched(A_panels, BT_panels,
                                 jnp.asarray(b[:, 0]), maxit=4, mesh=mesh)


# ---------------------------------------------------------------------------
# 2-D tiled tier: warm start + resume + restarts (VERDICT r4 #2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_tiled_2d_warm_start_matches_single_chip(kind):
    """x0 on the 2-D tiled solvers == the single-chip x0 semantics
    (r0 from b - A x0, solution offset), carry kept tile-sharded."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu import ab_gmres
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas_2d, ba_gmres_sharded_pallas_2d,
        make_mesh_2d, tile_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=11)
    mesh2 = make_mesh_2d((4, 2))
    A_t = tile_bucketed_panels(sp.csr_matrix(Ad), 4, 2)
    BT_t = tile_bucketed_panels(sp.csr_matrix(Bd.T), 4, 2)
    rng = np.random.default_rng(3)
    x0 = (x_true + 0.2 * rng.standard_normal(x_true.shape)
          ).astype(np.float32)
    solver2d = (ba_gmres_sharded_pallas_2d if kind == "ba"
                else ab_gmres_sharded_pallas_2d)
    ref_solver = ba_gmres if kind == "ba" else ab_gmres
    r_sh = solver2d(A_t, BT_t, jnp.asarray(b), jnp.asarray(x_true),
                    tol=0.0, maxit=6, lam=1e-3, mesh=mesh2, interpret=True,
                    x0=jnp.asarray(x0))
    r_ref = ref_solver(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                       jnp.asarray(x_true), tol=0.0, maxit=6, lam=1e-3,
                       x0=jnp.asarray(x0))
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.x), np.asarray(r_ref.x, dtype=np.float32),
        rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_tiled_2d_resume_equals_uninterrupted(kind):
    """resume(run(4), 8) == run(8) exactly on the 2-D tiled tier; state
    stays tile-sharded across the checkpoint boundary."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas_2d, ba_gmres_sharded_pallas_2d,
        make_mesh_2d, tile_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=12)
    mesh2 = make_mesh_2d((4, 2))
    A_t = tile_bucketed_panels(sp.csr_matrix(Ad), 4, 2)
    BT_t = tile_bucketed_panels(sp.csr_matrix(Bd.T), 4, 2)
    solver2d = (ba_gmres_sharded_pallas_2d if kind == "ba"
                else ab_gmres_sharded_pallas_2d)
    bj, xtj = jnp.asarray(b), jnp.asarray(x_true)
    full = solver2d(A_t, BT_t, bj, xtj, tol=0.0, maxit=8, lam=1e-3,
                    mesh=mesh2, interpret=True)
    part = solver2d(A_t, BT_t, bj, xtj, tol=0.0, maxit=4, lam=1e-3,
                    mesh=mesh2, interpret=True)
    resumed = solver2d(A_t, BT_t, bj, xtj, tol=0.0, maxit=8, lam=1e-3,
                       mesh=mesh2, interpret=True, resume_from=part)
    np.testing.assert_allclose(np.asarray(resumed.res_hist),
                               np.asarray(full.res_hist), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(resumed.err_hist),
                               np.asarray(full.err_hist), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_tiled_2d_restarted_matches_single_chip(kind):
    """Restarted 2-D tiled GMRES == the single-chip restarted wrapper
    (same _restarted outer loop, warm-started cycles on the 2-D layout —
    the run_2D_phantom.m:121 restarted surface at scale)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.solvers.gmres import (ab_gmres_restarted,
                                                ba_gmres_restarted)
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_pallas_2d_restarted,
        ba_gmres_sharded_pallas_2d_restarted, make_mesh_2d,
        tile_bucketed_panels)

    Ad, Bd, b, x_true = _sparse_pair(64, 32, seed=13)
    mesh2 = make_mesh_2d((4, 2))
    A_t = tile_bucketed_panels(sp.csr_matrix(Ad), 4, 2)
    BT_t = tile_bucketed_panels(sp.csr_matrix(Bd.T), 4, 2)
    sh = (ba_gmres_sharded_pallas_2d_restarted if kind == "ba"
          else ab_gmres_sharded_pallas_2d_restarted)
    ref = ba_gmres_restarted if kind == "ba" else ab_gmres_restarted
    r_sh = sh(A_t, BT_t, jnp.asarray(b), jnp.asarray(x_true), tol=1e-10,
              restart=4, max_restarts=2, lam=1e-3, mesh=mesh2,
              interpret=True)
    r_ref = ref(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                jnp.asarray(x_true), tol=1e-10, restart=4, max_restarts=2,
                lam=1e-3)
    np.testing.assert_allclose(
        np.asarray(r_sh.res_hist),
        np.asarray(r_ref.res_hist, dtype=np.float32), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_sh.err_hist),
        np.asarray(r_ref.err_hist, dtype=np.float32), rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# Sharded GKB mode matrix completion (VERDICT r4 #5)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def deriv2_prob():
    from hybrid_gmres_tpu import generate_test_problem
    from hybrid_gmres_tpu.problems import add_noise

    A, b_exact, x_true = generate_test_problem("deriv2", 32)
    b_noise, _ = add_noise(b_exact, 1e-2, seed=0)
    return A, b_noise, x_true


def test_sharded_gkb_reorth_matches_single_chip(deriv2_prob):
    """reorth=True on the sharded GKB family == the single-chip reorth
    runs (distributed CGS2 purification, fused psums)."""
    from hybrid_gmres_tpu.parallel import (hybrid_lsmr_sharded,
                                           lsmr_sharded, lsqr_sharded)
    from hybrid_gmres_tpu.solvers.lsmr import hybrid_lsmr, lsmr
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    A, b, x_true = deriv2_prob
    mesh = make_mesh()
    for sh, ref, kw in ((lsqr_sharded, lsqr, {}),
                        (lsmr_sharded, lsmr, {}),
                        (hybrid_lsmr_sharded, hybrid_lsmr, {"lam": 1e-3})):
        r_sh = sh(A, b, x_true, tol=0.0, maxit=12, mesh=mesh, reorth=True,
                  **kw)
        r_ref = ref(A, b, x_true, tol=0.0, maxit=12, reorth=True, **kw)
        np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                                   np.asarray(r_ref.res_hist), rtol=1e-7,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                                   np.asarray(r_ref.err_hist), rtol=1e-7,
                                   atol=1e-12)


def test_hybrid_lsqr_sharded_x0_resume_reorth(deriv2_prob):
    """hybrid_lsqr_sharded: exact Tikhonov warm start (== single-chip),
    resume(run(k), K) == run(K) exactly (incl. with reorth), and a
    mismatched reorth= on resume raises."""
    from hybrid_gmres_tpu.parallel import hybrid_lsqr_sharded
    from hybrid_gmres_tpu.solvers.lsqr import hybrid_lsqr

    A, b, x_true = deriv2_prob
    mesh = make_mesh()
    rng = np.random.default_rng(5)
    x0 = jnp.asarray(np.asarray(x_true) +
                     0.2 * rng.standard_normal(x_true.shape[0]))
    r_sh = hybrid_lsqr_sharded(A, b, x_true, tol=0.0, maxit=8, lam=1e-3,
                               mesh=mesh, x0=x0)
    r_ref = hybrid_lsqr(A, b, x_true, tol=0.0, maxit=8, lam=1e-3, x0=x0)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               rtol=1e-7, atol=1e-12)

    for reorth in (False, True):
        full = hybrid_lsqr_sharded(A, b, x_true, tol=0.0, maxit=8,
                                   lam=1e-3, mesh=mesh, x0=x0,
                                   reorth=reorth)
        part = hybrid_lsqr_sharded(A, b, x_true, tol=0.0, maxit=4,
                                   lam=1e-3, mesh=mesh, x0=x0,
                                   reorth=reorth)
        resumed = hybrid_lsqr_sharded(A, b, x_true, tol=0.0, maxit=8,
                                      lam=1e-3, mesh=mesh, x0=x0,
                                      reorth=reorth,
                                      resume_from=part.state)
        np.testing.assert_array_equal(np.asarray(resumed.res_hist),
                                      np.asarray(full.res_hist))
        np.testing.assert_array_equal(np.asarray(resumed.x),
                                      np.asarray(full.x))
    # `part` now holds the reorth=True state: resuming WITHOUT reorth must
    # be rejected (the carries disagree), not silently mis-specced
    with pytest.raises(ValueError, match="reorth"):
        hybrid_lsqr_sharded(A, b, x_true, maxit=8, lam=1e-3, mesh=mesh,
                            x0=x0, reorth=False, resume_from=part.state)


def test_lsmr_sharded_resume_equals_uninterrupted(deriv2_prob):
    """lsmr_sharded resume continues the recurrence exactly, including the
    ||A^T r|| history; state carries stay sharded."""
    from hybrid_gmres_tpu.parallel import lsmr_sharded

    A, b, x_true = deriv2_prob
    mesh = make_mesh()
    full = lsmr_sharded(A, b, x_true, tol=0.0, maxit=8, mesh=mesh)
    part = lsmr_sharded(A, b, x_true, tol=0.0, maxit=4, mesh=mesh)
    resumed = lsmr_sharded(A, b, x_true, tol=0.0, maxit=8, mesh=mesh,
                           resume_from=part.state)
    np.testing.assert_array_equal(np.asarray(resumed.res_hist),
                                  np.asarray(full.res_hist))
    np.testing.assert_array_equal(np.asarray(resumed.ar_hist),
                                  np.asarray(full.ar_hist))
    np.testing.assert_array_equal(np.asarray(resumed.x),
                                  np.asarray(full.x))


def test_sharded_equivalence_full_history_with_reorth(deriv2_prob):
    """The reference's full-depth equivalence oracles
    (run_equivalence_plots.m:26-58) asserted AT SCALE: with
    reorthogonalized sharded GKB, sharded LSMR == sharded BA-GMRES,
    sharded LSQR == sharded AB-GMRES, and sharded hybrid LSMR == sharded
    hybrid BA-GMRES over the ENTIRE 32-iteration history on the ill-posed
    deriv2 operator (previously only early iterations were compared at
    scale)."""
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_basis, ba_gmres_sharded_basis,
        hybrid_lsmr_sharded, lsmr_sharded, lsqr_sharded)

    A, b, x_true = deriv2_prob
    mesh = make_mesh()
    A_s, B_s, b_s = shard_problem(A, A.T, b, mesh)
    k = 32
    r_ba = ba_gmres_sharded_basis(A_s, B_s, b_s, x_true, tol=0.0, maxit=k,
                                  mesh=mesh)
    r_lsmr = lsmr_sharded(A, b, x_true, tol=0.0, maxit=k, mesh=mesh,
                          reorth=True)
    np.testing.assert_allclose(np.asarray(r_ba.err_hist),
                               np.asarray(r_lsmr.err_hist), rtol=1e-7)
    r_ab = ab_gmres_sharded_basis(A_s, B_s, b_s, x_true, tol=0.0, maxit=k,
                                  mesh=mesh)
    r_lsqr = lsqr_sharded(A, b, x_true, tol=0.0, maxit=k, mesh=mesh,
                          reorth=True)
    np.testing.assert_allclose(np.asarray(r_ab.err_hist),
                               np.asarray(r_lsqr.err_hist), rtol=1e-7)
    r_hba = ba_gmres_sharded_basis(A_s, B_s, b_s, x_true, tol=0.0, maxit=k,
                                   lam=1e-3, mesh=mesh)
    r_hl = hybrid_lsmr_sharded(A, b, x_true, tol=0.0, maxit=k, lam=1e-3,
                               mesh=mesh, reorth=True)
    np.testing.assert_allclose(np.asarray(r_hba.err_hist),
                               np.asarray(r_hl.err_hist), rtol=1e-6)


def test_sharded_batched_gcv_final_matches_single_chip():
    """lam='gcv-final' through the sharded batched deferred path
    (replicated per-RHS selection inside shard_map) == the single-chip
    batched solver."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (ba_gmres_sharded_batched,
                                           shard_bucketed_panels)
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    Ad, Bd, b, x_true = _batched_pair(seed=15)
    mesh = make_mesh()
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    r_sh = ba_gmres_sharded_batched(
        A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
        maxit=6, lam="gcv-final", mesh=mesh, interpret=True,
        defer_histories=True)
    r_ref = ba_gmres_batched(jnp.asarray(Ad), jnp.asarray(Bd),
                             jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                             maxit=6, lam="gcv-final", chunk_rhs=None,
                             defer_histories=True)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist), atol=5e-5)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), atol=5e-5)
    with pytest.raises(ValueError, match="gcv-final"):
        ba_gmres_sharded_batched(A_panels, BT_panels, jnp.asarray(b),
                                 maxit=4, lam="gcv-final", mesh=mesh,
                                 interpret=True)


def test_hybrid_lsmr_sharded_warm_start_matches_single_chip(deriv2_prob):
    """hybrid_lsmr_sharded x0 in both regularizer semantics == the
    single-chip run (early iterations tight; late divergence on the
    ill-conditioned operator is the usual short-recurrence physics)."""
    from hybrid_gmres_tpu.parallel import hybrid_lsmr_sharded
    from hybrid_gmres_tpu.solvers.lsmr import hybrid_lsmr

    A, b, x_true = deriv2_prob
    mesh = make_mesh()
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(np.asarray(x_true) +
                     0.3 * rng.standard_normal(x_true.shape[0]))
    for reg in ("correction", "full"):
        r_ref = hybrid_lsmr(A, b, x_true, tol=0.0, maxit=10, lam=1e-3,
                            x0=x0, x0_reg=reg)
        r_sh = hybrid_lsmr_sharded(A, b, x_true, tol=0.0, maxit=10,
                                   lam=1e-3, mesh=mesh, x0=x0, x0_reg=reg)
        np.testing.assert_allclose(np.asarray(r_sh.err_hist)[:5],
                                   np.asarray(r_ref.err_hist)[:5],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(r_sh.res_hist)[:5],
                                   np.asarray(r_ref.res_hist)[:5],
                                   rtol=1e-6)


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_sharded_batched_resume_equals_uninterrupted(kind):
    """Sharded batched resume continues every RHS's recurrence with the
    carried per-RHS active flags (state sharded across the checkpoint,
    warm start preserved, chunking preserved); wrong-x0 resume raises."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_batched, ba_gmres_sharded_batched,
        shard_bucketed_panels)

    Ad, Bd, b, x_true = _batched_pair(R=5, seed=21)
    mesh = make_mesh()
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 8)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 8)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray((x_true + 0.1 * rng.standard_normal(x_true.shape)
                      ).astype(np.float32))
    sh = ba_gmres_sharded_batched if kind == "ba" else \
        ab_gmres_sharded_batched
    kw = dict(tol=0.0, lam=1e-3, mesh=mesh, interpret=True, x0=x0,
              chunk_rhs=2)
    full = sh(A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
              maxit=8, **kw)
    part = sh(A_panels, BT_panels, jnp.asarray(b), jnp.asarray(x_true),
              maxit=4, **kw)
    resumed = sh(A_panels, BT_panels, jnp.asarray(b),
                 jnp.asarray(x_true), maxit=8, resume_from=part, **kw)
    np.testing.assert_allclose(np.asarray(resumed.res_hist),
                               np.asarray(full.res_hist), atol=1e-6)
    np.testing.assert_allclose(np.asarray(resumed.err_hist),
                               np.asarray(full.err_hist), atol=1e-6)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               atol=1e-6)
    with pytest.raises(ValueError, match="fingerprint"):
        sh(A_panels, BT_panels, jnp.asarray(b), maxit=8, tol=0.0,
           lam=1e-3, mesh=mesh, interpret=True, x0=x0 + 0.5, chunk_rhs=2,
           resume_from=part)
    with pytest.raises(ValueError, match="defer"):
        sh(A_panels, BT_panels, jnp.asarray(b), maxit=8, lam=1e-3,
           mesh=mesh, interpret=True, x0=x0, defer_histories=True,
           resume_from=part)


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_sharded_batched_2d_matches_single_device(kind):
    """2-D tiled multi-RHS GMRES == the single-device batched solver per
    RHS (multi-RHS tile SpMM + fused psums on both mesh axes), incl. the
    deferred serving mode, warm start and forward-B layout — the last
    capability-matrix hole in the batched row."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_batched_2d, ba_gmres_sharded_batched_2d,
        make_mesh_2d, tile_backprojector_forward, tile_bucketed_panels)
    from hybrid_gmres_tpu.solvers.batched import (ab_gmres_batched,
                                                  ba_gmres_batched)

    Ad, Bd, b, x_true = _batched_pair(seed=31)
    mesh2 = make_mesh_2d((4, 2))
    A_t = tile_bucketed_panels(sp.csr_matrix(Ad), 4, 2)
    BT_t = tile_bucketed_panels(sp.csr_matrix(Bd.T), 4, 2)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray((x_true + 0.1 * rng.standard_normal(x_true.shape)
                      ).astype(np.float32))
    sh = ba_gmres_sharded_batched_2d if kind == "ba" else \
        ab_gmres_sharded_batched_2d
    ref_f = ba_gmres_batched if kind == "ba" else ab_gmres_batched
    r_sh = sh(A_t, BT_t, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
              maxit=6, lam=1e-3, mesh=mesh2, interpret=True, x0=x0)
    r_ref = ref_f(jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b),
                  jnp.asarray(x_true), tol=0.0, maxit=6, lam=1e-3,
                  chunk_rhs=None, x0=x0)
    np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                               np.asarray(r_ref.res_hist), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                               np.asarray(r_ref.err_hist), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_sh.x), np.asarray(r_ref.x),
                               rtol=1e-3, atol=2e-5)
    # deferred twin reproduces the masked in-scan numbers
    r_d = sh(A_t, BT_t, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
             maxit=6, lam=1e-3, mesh=mesh2, interpret=True, x0=x0,
             defer_histories=True)
    np.testing.assert_allclose(np.asarray(r_d.err_hist),
                               np.asarray(r_sh.err_hist), atol=1e-5)
    assert np.array_equal(np.asarray(r_d.niters), np.asarray(r_sh.niters))
    if kind == "ba":
        B_t = tile_backprojector_forward(sp.csr_matrix(Bd), 4, 2)
        r_f = sh(A_t, None, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                 maxit=6, lam=1e-3, mesh=mesh2, interpret=True, x0=x0,
                 B_tiles=B_t)
        np.testing.assert_allclose(np.asarray(r_f.res_hist),
                                   np.asarray(r_sh.res_hist), atol=2e-5)


def test_gkb_2d_reorth_matches_single_chip():
    """reorth=True on the 2-D tiled GKB family == the single-chip reorth
    runs (CGS2 purification with u-space psums over the row axis, v-space
    over the col axis)."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        hybrid_lsmr_sharded_2d, lsmr_sharded_2d, lsqr_sharded_2d,
        make_mesh_2d, tile_bucketed_panels)
    from hybrid_gmres_tpu.solvers.lsmr import hybrid_lsmr, lsmr
    from hybrid_gmres_tpu.solvers.lsqr import lsqr

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=41)
    mesh = make_mesh_2d((2, 4))
    tiles = tile_bucketed_panels(sp.csr_matrix(Ad), 2, 4)
    Aj = jnp.asarray(Ad)
    kw2 = dict(mesh=mesh, interpret=True, reorth=True)
    for sh, ref, kw in ((lsqr_sharded_2d, lsqr, {}),
                        (lsmr_sharded_2d, lsmr, {}),
                        (hybrid_lsmr_sharded_2d, hybrid_lsmr,
                         {"lam": 1e-2})):
        r_sh = sh(tiles, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                  maxit=10, **kw2, **kw)
        r_ref = ref(Aj, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                    maxit=10, reorth=True, **kw)
        np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                                   np.asarray(r_ref.res_hist, np.float32),
                                   rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                                   np.asarray(r_ref.err_hist, np.float32),
                                   rtol=2e-3, atol=1e-5)


def test_gkb_2d_x0_matches_single_chip():
    """2-D tiled warm starts == the single-chip warm starts: LSQR/LSMR
    correction-space, hybrid LSQR exact Tikhonov restart, hybrid LSMR
    under both regularizer semantics."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        hybrid_lsmr_sharded_2d, hybrid_lsqr_sharded_2d, lsmr_sharded_2d,
        lsqr_sharded_2d, make_mesh_2d, tile_bucketed_panels)
    from hybrid_gmres_tpu.solvers.lsmr import hybrid_lsmr, lsmr
    from hybrid_gmres_tpu.solvers.lsqr import hybrid_lsqr, lsqr

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=41)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray((x_true + 0.2 * rng.standard_normal(x_true.shape)
                      ).astype(np.float32))
    mesh = make_mesh_2d((2, 4))
    tiles = tile_bucketed_panels(sp.csr_matrix(Ad), 2, 4)
    Aj = jnp.asarray(Ad)
    kw2 = dict(mesh=mesh, interpret=True, x0=x0)
    cases = [(lsqr_sharded_2d, lsqr, {}),
             (lsmr_sharded_2d, lsmr, {}),
             (hybrid_lsqr_sharded_2d, hybrid_lsqr, {"lam": 1e-2}),
             (hybrid_lsmr_sharded_2d, hybrid_lsmr, {"lam": 1e-2}),
             (hybrid_lsmr_sharded_2d, hybrid_lsmr,
              {"lam": 1e-2, "x0_reg": "full"})]
    for sh, ref, kw in cases:
        r_sh = sh(tiles, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                  maxit=8, **kw2, **kw)
        r_ref = ref(Aj, jnp.asarray(b), jnp.asarray(x_true), tol=0.0,
                    maxit=8, x0=x0, **kw)
        np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                                   np.asarray(r_ref.res_hist, np.float32),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                                   np.asarray(r_ref.err_hist, np.float32),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(r_sh.x),
                                   np.asarray(r_ref.x, np.float32),
                                   rtol=1e-2, atol=1e-4)


def test_gkb_2d_resume_equals_uninterrupted():
    """2-D tiled GKB resume(run(k), K) == run(K) exactly (carry stays
    tile-sharded; LSQR's true-residual patch re-applied after concat;
    LSMR's ar_hist continued), incl. with reorth bases grown to the new
    budget; mismatched reorth= and a changed x0 on resume raise."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        hybrid_lsqr_sharded_2d, lsmr_sharded_2d, lsqr_sharded_2d,
        make_mesh_2d, tile_bucketed_panels)

    Ad, _, b, x_true = _sparse_pair(64, 32, seed=41)
    rng = np.random.default_rng(9)
    x0 = jnp.asarray((x_true + 0.2 * rng.standard_normal(x_true.shape)
                      ).astype(np.float32))
    mesh = make_mesh_2d((2, 4))
    tiles = tile_bucketed_panels(sp.csr_matrix(Ad), 2, 4)
    bj, xtj = jnp.asarray(b), jnp.asarray(x_true)

    for solver, kw in ((lsqr_sharded_2d, {}),
                       (lsmr_sharded_2d, {}),
                       (hybrid_lsqr_sharded_2d, {"lam": 1e-2})):
        for reorth in (False, True):
            kws = dict(mesh=mesh, interpret=True, x0=x0, reorth=reorth,
                       tol=0.0, **kw)
            full = solver(tiles, bj, xtj, maxit=8, **kws)
            part = solver(tiles, bj, xtj, maxit=4, **kws)
            resumed = solver(tiles, bj, xtj, maxit=8,
                             resume_from=part.state, **kws)
            np.testing.assert_array_equal(np.asarray(resumed.res_hist),
                                          np.asarray(full.res_hist))
            np.testing.assert_array_equal(np.asarray(resumed.x),
                                          np.asarray(full.x))
            if full.ar_hist is not None:
                np.testing.assert_array_equal(np.asarray(resumed.ar_hist),
                                              np.asarray(full.ar_hist))
        # `part` holds the reorth=True state: resuming WITHOUT reorth must
        # be rejected (the carries disagree), not silently mis-specced
        with pytest.raises(ValueError, match="reorth"):
            solver(tiles, bj, xtj, maxit=8, mesh=mesh, interpret=True,
                   x0=x0, reorth=False, resume_from=part.state, **kw)
        # a resume with a DIFFERENT x0 is fingerprint-rejected
        with pytest.raises(ValueError, match="fingerprint"):
            solver(tiles, bj, xtj, maxit=8, mesh=mesh, interpret=True,
                   x0=2.0 * x0, reorth=True, resume_from=part.state, **kw)


@pytest.mark.parametrize("kind", ["ba", "ab"])
def test_sharded_batched_2d_resume_equals_uninterrupted(kind):
    """2-D tiled batched resume continues every RHS's recurrence with the
    carried per-RHS active flags (state tile-sharded across the
    checkpoint, warm start + chunking preserved); wrong-x0 and deferred
    resumes raise — mode parity with the 1-D sharded batched tier."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ab_gmres_sharded_batched_2d, ba_gmres_sharded_batched_2d,
        make_mesh_2d, tile_bucketed_panels)

    Ad, Bd, b, x_true = _batched_pair(R=5, seed=23)
    mesh2 = make_mesh_2d((4, 2))
    A_t = tile_bucketed_panels(sp.csr_matrix(Ad), 4, 2)
    BT_t = tile_bucketed_panels(sp.csr_matrix(Bd.T), 4, 2)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray((x_true + 0.1 * rng.standard_normal(x_true.shape)
                      ).astype(np.float32))
    sh = ba_gmres_sharded_batched_2d if kind == "ba" else \
        ab_gmres_sharded_batched_2d
    kw = dict(tol=0.0, lam=1e-3, mesh=mesh2, interpret=True, x0=x0,
              chunk_rhs=2)
    full = sh(A_t, BT_t, jnp.asarray(b), jnp.asarray(x_true), maxit=8,
              **kw)
    part = sh(A_t, BT_t, jnp.asarray(b), jnp.asarray(x_true), maxit=4,
              **kw)
    resumed = sh(A_t, BT_t, jnp.asarray(b), jnp.asarray(x_true), maxit=8,
                 resume_from=part, **kw)
    np.testing.assert_allclose(np.asarray(resumed.res_hist),
                               np.asarray(full.res_hist), atol=1e-6)
    np.testing.assert_allclose(np.asarray(resumed.err_hist),
                               np.asarray(full.err_hist), atol=1e-6)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               atol=1e-6)
    with pytest.raises(ValueError, match="fingerprint"):
        sh(A_t, BT_t, jnp.asarray(b), maxit=8, tol=0.0, lam=1e-3,
           mesh=mesh2, interpret=True, x0=x0 + 0.5, chunk_rhs=2,
           resume_from=part)
    with pytest.raises(ValueError, match="defer"):
        sh(A_t, BT_t, jnp.asarray(b), maxit=8, lam=1e-3, mesh=mesh2,
           interpret=True, x0=x0, defer_histories=True, resume_from=part)


def test_replica_fleet_composition():
    """Replica-level composition of serving with distribution
    (FEATURES.md): the 8 devices split into a 2-replica fleet of 4-shard
    sub-meshes via make_replica_meshes; each replica runs an INDEPENDENT
    sharded batched solve on its own frame batch, per-RHS numbers
    matching the single-chip batched solver — no collective crosses
    replicas, so a data-parallel fleet scales linearly on top of the
    in-mesh (replica x shard) composition."""
    import scipy.sparse as sp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_batched, make_replica_meshes,
        shard_bucketed_panels)
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    Ad, Bd, b, x_true = _batched_pair(R=4, seed=27)
    meshes = make_replica_meshes(2)
    assert len(meshes) == 2 and all(m.devices.size == 4 for m in meshes)
    assert not (set(meshes[0].devices.flat) & set(meshes[1].devices.flat))
    A_panels = shard_bucketed_panels(sp.csr_matrix(Ad), 4)
    BT_panels = shard_bucketed_panels(sp.csr_matrix(Bd.T), 4)
    # frames 0-1 on replica 0, frames 2-3 on replica 1
    for rep, sl in ((0, slice(0, 2)), (1, slice(2, 4))):
        r_sh = ba_gmres_sharded_batched(
            A_panels, BT_panels, jnp.asarray(b[:, sl]),
            jnp.asarray(x_true[:, sl]), tol=0.0, maxit=6, lam=1e-3,
            mesh=meshes[rep], interpret=True)
        r_ref = ba_gmres_batched(
            jnp.asarray(Ad), jnp.asarray(Bd), jnp.asarray(b[:, sl]),
            jnp.asarray(x_true[:, sl]), tol=0.0, maxit=6, lam=1e-3,
            chunk_rhs=None)
        np.testing.assert_allclose(np.asarray(r_sh.res_hist),
                                   np.asarray(r_ref.res_hist), atol=2e-5)
        np.testing.assert_allclose(np.asarray(r_sh.err_hist),
                                   np.asarray(r_ref.err_hist), atol=2e-5)
    with pytest.raises(ValueError, match="replicas"):
        make_replica_meshes(3)
