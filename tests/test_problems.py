import numpy as np
import jax.numpy as jnp

from hybrid_gmres_tpu.problems import (
    generate_test_problem,
    shaw,
    heat,
    deriv2,
    add_noise,
    perturb_backprojector,
)
import pytest


@pytest.mark.parametrize("name", ["shaw", "heat", "deriv2"])
def test_shapes_and_consistency(name):
    n = 32
    A, b, x = generate_test_problem(name, n)
    assert A.shape == (n, n)
    assert b.shape == (n,)
    assert x.shape == (n,)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(b), rtol=1e-12)


def test_shaw_is_symmetric_and_illposed():
    A, _, _ = shaw(32)
    np.testing.assert_allclose(np.asarray(A), np.asarray(A).T, atol=1e-14)
    s = np.linalg.svd(np.asarray(A), compute_uv=False)
    # Shaw singular values decay below machine precision well before n.
    assert s[0] / s[-1] > 1e15


def test_heat_lower_triangular():
    A, _, x = heat(32)
    A_np = np.asarray(A)
    assert np.all(np.triu(A_np, 1) == 0.0)
    # true solution supported on the first half
    assert np.all(np.asarray(x)[16:] == 0.0)


def test_deriv2_symmetric_negative():
    A, _, _ = deriv2(32)
    A_np = np.asarray(A)
    np.testing.assert_allclose(A_np, A_np.T, atol=1e-15)
    assert np.all(A_np <= 0.0)


def test_unknown_problem_raises():
    with pytest.raises(ValueError):
        generate_test_problem("nope", 8)


def test_add_noise_level():
    _, b, _ = shaw(32)
    b_noise, e = add_noise(b, 1e-2, seed=0)
    rel = float(jnp.linalg.norm(b_noise - b) / jnp.linalg.norm(b))
    assert abs(rel - 1e-2) < 1e-12
    # deterministic
    b2, _ = add_noise(b, 1e-2, seed=0)
    np.testing.assert_array_equal(np.asarray(b_noise), np.asarray(b2))


def test_perturb_backprojector():
    A, _, _ = shaw(16)
    B, E = perturb_backprojector(A, 1e-4, seed=0)
    np.testing.assert_allclose(np.asarray(B - A.T), np.asarray(E), atol=1e-15)
    Bn, En = perturb_backprojector(A, 1e-4, seed=0, normalize=True)
    assert abs(float(jnp.linalg.norm(En)) - 1e-4) < 1e-12
