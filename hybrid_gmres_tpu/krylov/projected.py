"""Masked projected solves on padded Hessenberg / bidiagonal systems.

Everything here operates on *static-shape* padded matrices so the solves can
live inside a jitted ``lax.scan`` and be ``vmap``-ed over lambda grids.  An
upper-Hessenberg ``H`` of static shape (maxit+1, maxit) whose columns with
index >= kdim are exactly zero represents the k-step projected operator
``Hbar_k = H[:kdim+1, :kdim]``.

Reference semantics being reproduced:
  * non-hybrid projected LS ``y = Hbar_k \\ (beta e1)`` via QR
    (``ABgmres_nonhybrid_bounds.m:34-35`` uses MATLAB backslash = QR LS);
  * hybrid Tikhonov-projected solve
    ``y = (Hbar' Hbar + lam I)^{-1} Hbar' (beta e1)``
    (``ABgmres_hybrid_bounds.m:34-38``), solved exactly as the reference does
    — via the shifted normal equations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inactive_diag(maxit: int, kdim, dtype):
    """Diagonal mask that is 1.0 on rows/cols with index >= kdim, else 0."""
    idx = jnp.arange(maxit)
    return jnp.where(idx >= kdim, jnp.ones((), dtype), jnp.zeros((), dtype))


def projected_ls_solve(H, t, kdim):
    """LS solution of ``min || t - H y ||`` over the first ``kdim`` columns.

    ``H``: (maxit+1, maxit) padded Hessenberg with columns >= kdim zero.
    ``t``: (maxit+1,) padded RHS (``beta e1`` for GMRES).
    Returns padded ``y`` of length maxit with zeros beyond kdim.

    Implementation: Householder QR of the padded matrix.  Zero trailing
    columns yield zero trailing columns of R; injecting an identity into the
    inactive diagonal and zeroing the corresponding RHS entries decouples the
    inactive block, so the active part equals the QR least-squares solution
    (numerically equivalent to MATLAB's backslash on the k-step system).
    """
    maxit = H.shape[1]
    dtype = H.dtype
    col = jnp.arange(maxit)
    H = jnp.where(col[None, :] < kdim, H, jnp.zeros((), dtype))
    Qr, R = jnp.linalg.qr(H, mode="reduced")  # Qr: (maxit+1, maxit), R: (maxit, maxit)
    g = Qr.T @ t
    idx = jnp.arange(maxit)
    active = idx < kdim
    g = jnp.where(active, g, jnp.zeros((), dtype))
    Rm = R + jnp.diag(_inactive_diag(maxit, kdim, dtype))
    y = jnp.linalg.solve(Rm, g)
    return jnp.where(active, y, jnp.zeros((), dtype))


def projected_tikhonov_solve(H, t, lam, kdim):
    """Tikhonov-projected solve ``(H'H + lam I) y = H' t`` on the active block.

    Matches the reference's normal-equations formulation
    (``ABgmres_hybrid_bounds.m:36``).  The inactive diagonal gets an extra
    identity so the padded system is nonsingular; its RHS entries are zero
    (zero columns of H), hence the padded solution is zero there.
    """
    maxit = H.shape[1]
    dtype = H.dtype
    col = jnp.arange(maxit)
    H = jnp.where(col[None, :] < kdim, H, jnp.zeros((), dtype))
    G = H.T @ H
    lam = jnp.asarray(lam, dtype=dtype)
    G = G + lam * jnp.eye(maxit, dtype=dtype) + jnp.diag(_inactive_diag(maxit, kdim, dtype))
    rhs = H.T @ t
    # G is SPD (Gram + lam I + identity on the inactive block): Cholesky is
    # cheaper than LU on device and runs once per scan iteration.
    L = jnp.linalg.cholesky(G)
    y = jax.scipy.linalg.cho_solve((L, True), rhs)
    idx = jnp.arange(maxit)
    return jnp.where(idx < kdim, y, jnp.zeros((), dtype))


def projected_gram_tikhonov_solve(G_full, rhs_full, lam, kdim):
    """Solve ``(G + lam I) y = rhs`` restricted to the leading kdim block.

    ``G_full`` must be zero outside its leading kdim x kdim block and
    ``rhs_full`` zero beyond kdim.  Used by the AB-RTP inner solve
    ``(AQ' AQ + lam I) y = AQ' b`` (``hybrid_ab_gmres_rtp.m:31-33``) and the
    hybrid-LSMR normal equations (``hybrid_lsmr_solver.m:41-44``).
    """
    maxit = G_full.shape[0]
    dtype = G_full.dtype
    lam = jnp.asarray(lam, dtype=dtype)
    G = G_full + lam * jnp.eye(maxit, dtype=dtype) + jnp.diag(
        _inactive_diag(maxit, kdim, dtype)
    )
    y = jnp.linalg.solve(G, rhs_full)
    idx = jnp.arange(maxit)
    return jnp.where(idx < kdim, y, jnp.zeros((), dtype))
