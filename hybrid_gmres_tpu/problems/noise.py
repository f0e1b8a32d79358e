"""Seeded noise injection and back-projector perturbation.

The reference's experiments all follow the same recipe (``rng(0)`` then
Gaussian draws): relative noise ``b + level * ||b|| * e/||e||``
(``run_2D_phantom.m:17-20``) and operator mismatch ``B = A^T + c E``
(``analyze_regularization.m:12-13``, ``plot_error_vs_mismatch_norm.m:30-39``).
MATLAB RNG streams are not bit-reproducible in JAX; parity is curve-shape
based with fixed seeds on our side (SURVEY.md "hard parts").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def add_noise(b, level: float, seed: int = 0):
    """Return ``(b_noise, e)`` with ``||e|| = level * ||b||``."""
    rng = np.random.default_rng(seed)
    b_np = np.asarray(b, dtype=np.float64)
    e = rng.standard_normal(b_np.shape)
    e = e / np.linalg.norm(e) * level * np.linalg.norm(b_np)
    return jnp.asarray(b_np + e, dtype=b.dtype), jnp.asarray(e, dtype=b.dtype)


def perturb_backprojector(A, scale: float, seed: int = 0, normalize: bool = False):
    """Return ``(B, E)`` with ``B = A^T + scale * E`` and Gaussian ``E``.

    With ``normalize=True`` the perturbation is scaled so
    ``||scale * E||_F = scale`` (the ``plot_error_vs_mismatch_norm.m:15-16``
    convention); otherwise raw ``scale * randn`` (the
    ``analyze_regularization.m:12`` convention).
    """
    rng = np.random.default_rng(seed)
    A_np = np.asarray(A, dtype=np.float64)
    E = rng.standard_normal(A_np.T.shape)
    if normalize:
        E = E / np.linalg.norm(E, "fro")
    E = scale * E
    B = A_np.T + E
    return jnp.asarray(B, dtype=A.dtype), jnp.asarray(E, dtype=A.dtype)
