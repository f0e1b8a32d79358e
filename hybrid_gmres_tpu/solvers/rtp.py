"""Regularize-then-project (RTP) hybrid GMRES variants.

Both build their Krylov space on the *shifted* operator ``B A + lam I`` with
``d = B b`` (reference ``hybrid_ab_gmres_rtp.m:6-7``, despite the "ab" name —
see SURVEY.md §2.3).  They differ in the inner solve:

  * BA-RTP: plain projected Hessenberg LS ``y = Hbar \\ (beta e1)``
    (``hybrid_ba_gmres_rtp.m:28-30``);
  * AB-RTP: a Tikhonov re-solve against the *original* A and b restricted to
    the Krylov basis, ``y = (AQ' AQ + lam I)^{-1} AQ' b``
    (``hybrid_ab_gmres_rtp.m:31-33``).

The repo's experimental point is PTR != RTP (``run_ptr_rtp_comparison.m``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.ops.linear_operator import as_operator
from hybrid_gmres_tpu.krylov.projected import (
    projected_ls_solve,
    projected_gram_tikhonov_solve,
)
from hybrid_gmres_tpu.solvers.common import (
    GMRESResult,
    gmres_core,
    rel_error_fn,
    rel_residual_fn,
)


def _shifted_ba_mv(A, B, lam):
    lam = jnp.asarray(lam)

    def mv(q):
        return B.matvec(A.matvec(q)) + lam.astype(q.dtype) * q

    return mv


def ba_gmres_rtp(
    A,
    B,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    lam=1e-3,
    history: bool = True,
    breakdown_tol: float = 0.0,
) -> GMRESResult:
    """BA-GMRES (RTP): Krylov on ``B A + lam I``, plain projected solve."""
    A = as_operator(A)
    B = as_operator(B)
    if maxit is None:
        maxit = min(A.shape)
    maxit = int(maxit)

    r0 = B.matvec(b)  # x0 = 0 => r0 = d - (BA + lam I) 0 = B b
    return gmres_core(
        krylov_mv=_shifted_ba_mv(A, B, lam),
        r0=r0,
        project_solve=lambda H, Q, t, kdim: projected_ls_solve(H, t, kdim),
        solution_fn=lambda Q, y: Q[:, :maxit] @ y,
        residual_fn=rel_residual_fn(A, b),
        error_fn=rel_error_fn(x_true),
        maxit=maxit,
        tol=tol,
        x_shape=A.shape[1],
        breakdown_tol=breakdown_tol,
        history=history,
    )


def ab_gmres_rtp(
    A,
    B,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    lam=1e-3,
    history: bool = True,
    breakdown_tol: float = 0.0,
) -> GMRESResult:
    """AB-GMRES (RTP): Krylov on ``B A + lam I``; inner Tikhonov solve vs A, b."""
    A = as_operator(A)
    B = as_operator(B)
    if maxit is None:
        maxit = min(A.shape)
    maxit = int(maxit)

    A_cols = jax.vmap(A.matvec, in_axes=1, out_axes=1)

    def project_solve(H, Q, t, kdim):
        idx = jnp.arange(maxit)
        mask = (idx < kdim).astype(Q.dtype)
        Qa = Q[:, :maxit] * mask[None, :]
        AQ = A_cols(Qa)  # (m, maxit), cols >= kdim exactly zero
        # HIGHEST: the Gram normal equations square the conditioning
        # (hybrid_ab_gmres_rtp.m:31-33) — the TPU's default f32 matmul
        # (bf16 passes) costs ~3 digits in G that the solve amplifies
        hi = jax.lax.Precision.HIGHEST
        G = jnp.matmul(AQ.T, AQ, precision=hi)
        rhs = jnp.matmul(AQ.T, b, precision=hi)
        return projected_gram_tikhonov_solve(G, rhs, lam, kdim)

    r0 = B.matvec(b)
    return gmres_core(
        krylov_mv=_shifted_ba_mv(A, B, lam),
        r0=r0,
        project_solve=project_solve,
        solution_fn=lambda Q, y: Q[:, :maxit] @ y,
        residual_fn=rel_residual_fn(A, b),
        error_fn=rel_error_fn(x_true),
        maxit=maxit,
        tol=tol,
        x_shape=A.shape[1],
        breakdown_tol=breakdown_tol,
        history=history,
    )
