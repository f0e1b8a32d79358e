"""Arnoldi process with blocked CGS2 orthogonalization (TPU-first design).

The reference orthogonalizes with a sequential modified-Gram-Schmidt loop of
k dot products (``ABgmres_hybrid_bounds.m:26-29``); on TPU that is k serial
reductions per step.  Here one step is two classical-Gram-Schmidt passes
("twice is enough"), each a pair of (maxit+1, n) matmuls against the padded
basis — MXU-friendly, and on a device mesh each pass needs a single fused
psum for all k coefficients (SURVEY.md §2.4).  Zero-padding of inactive
basis columns makes the masking free: dot products against unset columns are
exactly zero.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class ArnoldiState(NamedTuple):
    Q: jax.Array  # (n, maxit+1) padded orthonormal basis, cols > k zero
    H: jax.Array  # (maxit+1, maxit) padded upper Hessenberg
    breakdown: jax.Array  # bool: subdiagonal entry hit breakdown_tol


def arnoldi_orthogonalize(
    Q: jax.Array,
    H: jax.Array,
    k,
    w: jax.Array,
    breakdown_tol: float = 0.0,
) -> ArnoldiState:
    """CGS2-orthogonalize a precomputed expansion vector ``w = M q_k``.

    Split out of :func:`arnoldi_step` so callers that need the raw operator
    image (e.g. the fused-residual GMRES mode, which stores ``A q_k`` to
    reconstruct ``A x_k`` without an extra SpMV) can compute ``w`` themselves.

    ``Q`` may be stored in a NARROWER dtype than ``w`` (bf16 basis storage,
    DESIGN §10): the projections/updates then run in ``w``'s precision (the
    MXU reads bf16 natively and accumulates f32) and only the stored column
    is rounded.
    """
    dtype = w.dtype
    c1 = Q.T @ w
    w = w - Q @ c1
    c2 = Q.T @ w
    w = w - Q @ c2
    h = c1 + c2
    hnorm = jnp.linalg.norm(w)
    breakdown = hnorm <= jnp.asarray(breakdown_tol, dtype)
    hsafe = jnp.where(breakdown, jnp.ones((), dtype), hnorm)
    h = h.at[k + 1].set(hnorm)
    H = H.at[:, k].set(h.astype(H.dtype))
    qnew = jnp.where(breakdown, jnp.zeros_like(w), w / hsafe)
    Q = Q.at[:, k + 1].set(qnew.astype(Q.dtype))
    return ArnoldiState(Q=Q, H=H, breakdown=breakdown)


def arnoldi_step(
    matvec: Callable,
    Q: jax.Array,
    H: jax.Array,
    k,
    breakdown_tol: float = 0.0,
) -> ArnoldiState:
    """One Arnoldi expansion: from basis size k+1 to k+2 (0-based step k).

    CGS2: w = M q_k; two projection passes c = Q^T w, w -= Q c; the summed
    coefficients land in H[:, k] and ||w|| in H[k+1, k].
    """
    return arnoldi_orthogonalize(Q, H, k, matvec(Q[:, k]), breakdown_tol)


def arnoldi(
    matvec: Callable,
    r0: jax.Array,
    maxit: int,
    breakdown_tol: float = 0.0,
):
    """Run ``maxit`` Arnoldi steps from ``r0``; returns (Q, H, beta, nsteps).

    ``nsteps`` is the number of fully completed expansions (a breakdown at
    step k still records H[k+1, k] but stops growing the basis, mirroring the
    reference's ``if H(k+1,k)==0, break`` at ``ABgmres_hybrid_bounds.m:31``).
    Fully jittable: static shapes, ``lax.scan`` over steps with an active
    mask instead of dynamic loop bounds.
    """
    n = r0.shape[0]
    dtype = r0.dtype
    beta = jnp.linalg.norm(r0)
    Q0 = jnp.zeros((n, maxit + 1), dtype=dtype).at[:, 0].set(r0 / beta)
    H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)

    def body(carry, k):
        Q, H, active, nsteps = carry
        st = arnoldi_step(matvec, Q, H, k, breakdown_tol)
        take = active & ~st.breakdown
        Q = jnp.where(take, st.Q, Q)
        H = jnp.where(active, st.H, H)  # record the breakdown column too
        nsteps = jnp.where(take, k + 1, nsteps)
        active = take
        return (Q, H, active, nsteps), None

    (Q, H, _, nsteps), _ = jax.lax.scan(
        body,
        (Q0, H0, jnp.bool_(True), jnp.int32(0)),
        jnp.arange(maxit, dtype=jnp.int32),
    )
    return Q, H, beta, nsteps
