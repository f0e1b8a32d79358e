"""Fan-beam CT problem oracles (the run_2D_phantom scenario, SURVEY.md §4.6)."""

import numpy as np
import jax.numpy as jnp
import pytest

import hybrid_gmres_tpu as hg
from hybrid_gmres_tpu.problems import add_noise
from hybrid_gmres_tpu.problems.ct import (
    ct_mismatched,
    shepp_logan,
    FanBeamGeometry,
    build_fan_projector,
)


@pytest.fixture(scope="module")
def ct():
    # small config for test speed; the reference config is n=32, 90x90
    return ct_mismatched(n=16, n_angles=36, n_det=24)


def test_shapes_and_mismatch(ct):
    m = 36 * 24
    assert ct.A.shape == (m, 256)
    assert ct.B.shape == (256, m)
    # B must NOT be A^T (the whole point)
    diff = np.linalg.norm(np.asarray(ct.B) - np.asarray(ct.A).T) / np.linalg.norm(
        np.asarray(ct.B)
    )
    assert diff > 0.1
    # but it must be a sane back-projector: <x, B A x> ~ <Ax, Ax> by scaling
    x = ct.x_true
    lhs = float(x @ (ct.B @ (ct.A @ x)))
    rhs = float((ct.A @ x) @ (ct.A @ x))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6)


def test_shepp_logan_range():
    img = shepp_logan(64)
    assert img.shape == (64, 64)
    assert img.max() <= 2.0 and img.min() >= -0.5
    # corners are background
    assert img[0, 0] == 0.0


def test_projector_nonnegative_and_nonempty(ct):
    A = np.asarray(ct.A)
    assert np.all(A >= 0.0)
    # every angle has some rays hitting the object region
    assert (A.sum(axis=1) > 0).mean() > 0.5


def test_reconstruction_semiconvergence(ct):
    """Non-hybrid BA on noisy data: error dips then grows (semi-convergence);
    hybrid is more robust at late iterations (run_2D_phantom.m:64-75)."""
    b, _ = add_noise(ct.b_exact, 0.25, seed=0)
    r_n = hg.ba_gmres(ct.A, ct.B, b, ct.x_true, tol=1e-8, maxit=40)
    r_h = hg.ba_gmres(ct.A, ct.B, b, ct.x_true, tol=1e-8, maxit=40, lam=1e-2)
    err_n = np.asarray(r_n.err_hist)[: int(r_n.niters)]
    err_h = np.asarray(r_h.err_hist)[: int(r_h.niters)]
    # both reconstruct to well below the trivial error of 1
    assert err_n.min() < 0.6
    # non-hybrid blows past its own minimum (semi-convergence)
    assert err_n[-1] > 1.5 * err_n.min()
    # hybrid's final error beats non-hybrid's final error
    assert err_h[-1] < err_n[-1]


def test_matched_pair_equals_transpose():
    """With B := A^T the AB solver must agree with LSQR on the CT problem."""
    prob = ct_mismatched(n=16, n_angles=36, n_det=24)
    b, _ = add_noise(prob.b_exact, 0.05, seed=0)
    B = prob.A.T
    r_ab = hg.ab_gmres(prob.A, B, b, prob.x_true, tol=1e-8, maxit=10)
    r_lsqr = hg.lsqr(prob.A, b, prob.x_true, tol=1e-8, maxit=10)
    np.testing.assert_allclose(
        np.asarray(r_ab.err_hist)[:5], np.asarray(r_lsqr.err_hist)[:5], rtol=1e-6
    )


def test_geometry_rays_cover_detector():
    geom = FanBeamGeometry(n=16, n_angles=4, n_det=12, source_radius=32.0)
    A = build_fan_projector(geom)
    assert A.shape == (48, 256)
    # each angle's central rays pass through the image
    row_sums = np.asarray(A.sum(axis=1)).ravel()
    for a in range(4):
        center = a * 12 + 6
        assert row_sums[center] > 0


def test_ct_tpu_operators_matvec_parity():
    """The packaged TPU path (Morton perms + Pallas operators) applies the
    same linear maps as the dense reordered pair (interpret mode on CPU)."""
    import numpy as np
    import jax.numpy as jnp
    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.ops.ordering import reorder_pair

    prob = ct_mismatched(n=16, n_angles=24, n_det=24, dense=False)
    A_op, B_op, b_p, x_p, rperm, pperm = ct_tpu_operators(
        prob, dtype="float32", n_buckets=2)
    A_op.interpret = B_op.interpret = True
    Ad, Bd = reorder_pair(prob.A_csr.astype(np.float32),
                          prob.B_csr.astype(np.float32), rperm, pperm)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(Ad.shape[1]).astype(np.float32))
    u = jnp.asarray(rng.standard_normal(Ad.shape[0]).astype(np.float32))
    ax_ref = Ad @ np.asarray(x)
    bu_ref = Bd @ np.asarray(u)
    assert np.abs(np.asarray(A_op.matvec(x)) - ax_ref).max() < 1e-4 * (
        1 + np.abs(ax_ref).max())
    assert np.abs(np.asarray(B_op.matvec(u)) - bu_ref).max() < 1e-4 * (
        1 + np.abs(bu_ref).max())
    # permuted data vectors really are the originals relabeled
    assert np.allclose(np.asarray(b_p), np.asarray(prob.b_exact)[rperm])
    assert np.allclose(np.asarray(x_p), np.asarray(prob.x_true)[pperm])
