"""Filter-factor and perturbation-bound oracles (SURVEY.md §4, oracles 3-4).

Configs mirror ``plot_filter_factors.m`` (shaw n=32, noise 1e-3,
B = A^T + 1e-4 E) and ``plot_perturbation_bound_validation.m`` (b_exact,
lam=1e-3).  Comparisons use moderate k: at k -> n the shaw operator is at
machine-precision rank and both theory and empirics degenerate (in the
reference as well).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import hybrid_gmres_tpu as hg
from hybrid_gmres_tpu.problems import add_noise, perturb_backprojector
from hybrid_gmres_tpu.analysis import (
    run_with_bounds,
    empirical_filter_factors,
    filter_bounds_from_factorization,
    spectral_setup,
)


@pytest.fixture(scope="module")
def setup():
    A, b_exact, x_true = hg.generate_test_problem("shaw", 32)
    b, _ = add_noise(b_exact, 1e-3, seed=0)
    B, E = perturb_backprojector(A, 1e-4, seed=0)
    DeltaM_AB = np.asarray(A) @ np.asarray(E)
    DeltaM_BA = np.asarray(E) @ np.asarray(A)
    return A, B, b, b_exact, x_true, DeltaM_AB, DeltaM_BA


@pytest.mark.parametrize("variant", ["ab", "ba"])
def test_nonhybrid_theory_matches_empirical(setup, variant):
    A, B, b, b_exact, x_true, D_AB, D_BA = setup
    D = D_AB if variant == "ab" else D_BA
    res, bounds = run_with_bounds(variant, A, B, b, x_true, maxit=8, DeltaM=D)
    emp = empirical_filter_factors(A, b, res.x)
    th = np.real(bounds.phi_final)
    np.testing.assert_allclose(th[:6], emp[:6], atol=0.05)


def test_hybrid_theory_matches_empirical_low_modes(setup):
    A, B, b, b_exact, x_true, D_AB, D_BA = setup
    lam = 1e-3
    res, bounds = run_with_bounds("ba", A, B, b, x_true, maxit=8, lam=lam,
                                  DeltaM=D_BA)
    emp = empirical_filter_factors(A, b, res.x)
    th = np.real(bounds.phi_final)
    # For the leading modes mu >> lam both the reference's mu/(mu+lam) theory
    # and the actual mu^2/(mu^2+lam) filtering are ~1.
    np.testing.assert_allclose(th[:4], emp[:4], atol=0.05)


def test_perturbation_bound_tracks_actual_change(setup):
    A, B, b, b_exact, x_true, D_AB, D_BA = setup
    lam = 1e-3
    B_u = jnp.asarray(np.asarray(A).T)
    _, bd_u = run_with_bounds("ba", A, B_u, b_exact, x_true, maxit=8, lam=lam,
                              DeltaM=D_BA)
    _, bd_p = run_with_bounds("ba", A, B, b_exact, x_true, maxit=8, lam=lam,
                              DeltaM=None)
    k = min(len(bd_u.phi_iter), len(bd_p.phi_iter))
    actual = np.abs(bd_p.phi_iter[k - 1][:k] - bd_u.phi_iter[k - 1][:k])
    bound = np.abs(bd_u.dphi_iter[k - 1][:k])
    ratio = np.log10(np.maximum(bound, 1e-300) / np.maximum(actual, 1e-300))
    assert np.all(np.abs(ratio) < 0.5), ratio


def test_dphi_zero_without_perturbation(setup):
    A, B, b, b_exact, x_true, D_AB, D_BA = setup
    _, bounds = run_with_bounds("ba", A, B, b, x_true, maxit=6, lam=1e-3,
                                DeltaM=None)
    for d in bounds.dphi_iter:
        assert np.all(d == 0.0)


def test_spectral_setup_sorted_descending(setup):
    A, B, *_ = setup
    M = np.asarray(B) @ np.asarray(A)
    mu, U, dmu = spectral_setup(M)
    assert np.all(np.diff(mu) <= 1e-12)
    # eigen residuals for the dominant modes
    for i in range(3):
        r = M @ np.real(U[:, i]) - mu[i] * np.real(U[:, i])
        assert np.linalg.norm(r) < 1e-8 * abs(mu[0])


def test_ab_vs_ba_hybrid_pencils_differ(setup):
    """AB-hybrid uses the shifted standard pencil, BA-hybrid the generalized
    eig — they must produce different theta (reference §2.3)."""
    A, B, b, b_exact, x_true, D_AB, D_BA = setup
    res_ab, bd_ab = run_with_bounds("ab", A, B, b, x_true, maxit=6, lam=1e-3,
                                    DeltaM=D_AB)
    res_ba, bd_ba = run_with_bounds("ba", A, B, b, x_true, maxit=6, lam=1e-3,
                                    DeltaM=D_BA)
    assert bd_ab.phi_final.shape == bd_ba.phi_final.shape
