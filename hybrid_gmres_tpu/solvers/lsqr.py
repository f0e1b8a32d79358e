"""LSQR and hybrid LSQR (Golub–Kahan bidiagonalization + Givens recurrences).

Reference semantics (rebuilt):
  * LSQR: O(1)-memory GKB with a single Givens recurrence
    (``lsqr_solver.m:20-47``).  The per-iteration residual history uses the
    cheap estimate ``|phi_bar| / ||b||`` and the final entry is patched with
    the true residual at exit (``lsqr_solver.m:44,52``).
  * Hybrid LSQR: plain LSQR on the Tikhonov-augmented system
    ``[A; sqrt(lam) I] x ~= [b; 0]`` (``hybrid_lsqr_solver.m:5-6``), with the
    residual tracked every iteration against the *unaugmented* system
    (``hybrid_lsqr_solver.m:43``).

The GKB transpose-matvec goes through ``op.rmatvec`` so a mismatched
back-projector can stand in for ``A^T`` (SURVEY.md "mismatched-adjoint
plumbing"); the reference always uses the exact adjoint here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.ops.linear_operator import AugmentedOperator, as_operator
from hybrid_gmres_tpu.solvers.common import GKBResult, safe_normalize as _safe_normalize


def _lsqr_core(
    iter_op,
    b_iter,
    residual_fn,   # x -> true relative residual, or None for cheap estimate
    error_fn,
    b_norm_for_estimate,
    maxit: int,
    tol: float,
    reorth: bool = False,
    carry_init=None,
    k0: int = 0,
):
    dtype = b_iter.dtype
    n = iter_op.shape[1]
    m = iter_op.shape[0]

    if carry_init is None:
        u, beta, _ = _safe_normalize(b_iter)
        v, alpha, _ = _safe_normalize(iter_op.rmatvec(u))
        w = v
        x0 = jnp.zeros((n,), dtype=dtype)
        # Full reorthogonalization stores the GKB bases and CGS2-purifies
        # each new vector — O(maxit (m+n)) memory instead of O(1), used by
        # the equivalence oracles to hold GMRES==LSQR to final iterations
        # (the short recurrence alone loses orthogonality on
        # ill-conditioned operators; run_equivalence_plots.m:26-47 overlays
        # final solutions).
        if reorth:
            U0 = jnp.zeros((m, maxit + 1), dtype=dtype).at[:, 0].set(u)
            V0 = jnp.zeros((n, maxit + 1), dtype=dtype).at[:, 0].set(v)
        else:
            U0, V0 = None, None

    def _purify(Basis, vec):
        vec = vec - Basis @ (Basis.T @ vec)
        return vec - Basis @ (Basis.T @ vec)

    # The scan carries the GKB vectors (u, v, w) plus the Givens scalars.
    def step(carry, k):
        x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters, U, V = carry
        uhat = iter_op.matvec(v) - alpha_c * u
        if reorth:
            uhat = _purify(U, uhat)
        u_n, beta_k, ok_u = _safe_normalize(uhat)
        vhat = iter_op.rmatvec(u_n) - beta_k * v
        if reorth:
            vhat = _purify(V, vhat)
        v_n, alpha_n, ok_v = _safe_normalize(vhat)

        rho = jnp.hypot(rho_bar, beta_k)
        c = rho_bar / rho
        s = beta_k / rho
        theta = s * alpha_n
        rho_bar_n = -c * alpha_n
        phi = c * phi_bar
        phi_bar_n = s * phi_bar

        x_n = x + (phi / rho) * w
        w_n = v_n - (theta / rho) * w

        if residual_fn is None:
            res_k = jnp.abs(phi_bar_n) / b_norm_for_estimate
        else:
            res_k = residual_fn(x_n)
        err_k = error_fn(x_n)

        ok = ok_u & ok_v
        adopt = active & ok
        nan = jnp.asarray(jnp.nan, dtype)
        x = jax.lax.select(adopt, x_n, x)
        u = jax.lax.select(adopt, u_n, u)
        v = jax.lax.select(adopt, v_n, v)
        w = jax.lax.select(adopt, w_n, w)
        if reorth:
            U = jax.lax.select(adopt, U.at[:, k + 1].set(u_n), U)
            V = jax.lax.select(adopt, V.at[:, k + 1].set(v_n), V)
        phi_bar = jnp.where(adopt, phi_bar_n, phi_bar)
        rho_bar = jnp.where(adopt, rho_bar_n, rho_bar)
        alpha_c = jnp.where(adopt, alpha_n, alpha_c)
        res_rec = jnp.where(adopt, res_k, nan)
        err_rec = jnp.where(adopt, err_k, nan)
        niters = jnp.where(adopt, k + 1, niters)
        active = adopt & (res_k > tol)
        return (x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters, U, V), \
            (res_rec, err_rec)

    if carry_init is None:
        carry0 = (x0, u, v, w, beta, alpha, alpha, jnp.bool_(True),
                  jnp.int32(0), U0, V0)
    else:
        carry0 = carry_init
        if reorth:
            # grow the stored bases to the new budget
            U0, V0 = carry0[9], carry0[10]
            extra = maxit + 1 - U0.shape[1]
            if extra > 0:
                carry0 = carry0[:9] + (jnp.pad(U0, ((0, 0), (0, extra))),
                                       jnp.pad(V0, ((0, 0), (0, extra))))
    carry_out, (res_hist, err_hist) = jax.lax.scan(
        step, carry0, jnp.arange(k0, maxit, dtype=jnp.int32)
    )
    x, niters = carry_out[0], carry_out[8]
    return x, res_hist, err_hist, niters, carry_out


def lsqr(
    A,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    reorth: bool = False,
    resume_from=None,
    x0=None,
) -> GKBResult:
    """Standard LSQR with the reference's cheap residual estimate + final patch.

    ``reorth=True`` fully reorthogonalizes the GKB bases (O(maxit (m+n))
    memory) — restores exact-arithmetic equivalence with AB-GMRES (B=A^T) to
    final iterations on ill-conditioned operators.

    ``resume_from``: a prior result's ``.state`` (:class:`GKBState`) — the
    recurrence continues where it stopped with the larger ``maxit`` budget,
    producing exactly the numbers of an uninterrupted run (pass the same
    ``reorth``).

    ``x0``: optional warm start — the GKB runs on the correction
    ``min ||(b - A x0) - A d||`` and returns ``x = x0 + d`` (residuals
    still reported relative to ``||b||``); pass the SAME ``x0`` when
    resuming.  (``hybrid_lsqr`` warm-starts EXACTLY via the augmented
    rhs; ``hybrid_lsmr`` offers two regularizer semantics via
    ``x0_reg``.)  Multi-RHS serving twin: ``lsqr_batched``."""
    from hybrid_gmres_tpu.solvers.common import GKBState, rel_error_fn

    A = as_operator(A)
    if maxit is None:
        maxit = min(A.shape)
    maxit = int(maxit)
    b_norm = jnp.linalg.norm(b)
    b_iter = b if x0 is None else b - A.matvec(x0)
    base_err = rel_error_fn(x_true)
    error_fn = base_err if x0 is None else (lambda d: base_err(x0 + d))

    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    resume_fingerprint)

    k0 = 0 if resume_from is None else resume_from.res_hist.shape[0]
    if resume_from is not None:
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        check_fingerprint(resume_from, x0, None)
    x, res_new, err_new, niters, carry = _lsqr_core(
        iter_op=A,
        b_iter=b_iter,
        residual_fn=None,
        error_fn=error_fn,
        b_norm_for_estimate=b_norm,
        maxit=maxit,
        tol=tol,
        reorth=reorth,
        carry_init=None if resume_from is None else resume_from.carry,
        k0=k0,
    )
    if x0 is not None:
        x = x0 + x
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
    state = GKBState(carry=carry, res_hist=res_hist, err_hist=err_hist,
                     fp=resume_fingerprint(x0, None))
    # Patch the last recorded entry with the true residual (lsqr_solver.m:52);
    # skip when no iteration was ever adopted (niters=0 would wrap the index).
    true_res = jnp.linalg.norm(b - A.matvec(x)) / b_norm
    slot = jnp.maximum(niters - 1, 0)
    res_hist = res_hist.at[slot].set(
        jnp.where(niters > 0, true_res, res_hist[slot]))
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, state=state)


def hybrid_lsqr(
    A,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    lam: float = 1e-3,
    error_map=None,
    reorth: bool = False,
    resume_from=None,
    x0=None,
) -> GKBResult:
    """LSQR on the augmented system [A; sqrt(lam) I], residual vs original A.

    ``error_map`` (optional) maps the iterate before comparing against
    ``x_true`` — used when the iterate lives in a different space than the
    final solution (e.g. the AB-style composed solve where x = B z,
    run_2D_phantom.m:150-163).
    ``resume_from``: a prior result's ``.state`` (same ``lam``/``reorth``).
    ``x0``: optional warm start — an EXACT restart of the Tikhonov
    problem: ``min_d ||A(x0+d)-b||^2 + lam ||x0+d||^2`` is the augmented
    LSQR on ``[A; sqrt(lam) I] d ~ [b - A x0; -sqrt(lam) x0]`` with
    ``x = x0 + d`` — unlike a correction-space warm start of the
    projected hybrids, the regularizer still acts on the full ``x``.
    Pass the same ``x0`` when resuming.  Incompatible with ``error_map``
    (the offset lives in the iterate's own space).
    """
    from hybrid_gmres_tpu.solvers.common import GKBState

    A = as_operator(A)
    if maxit is None:
        maxit = min(A.shape)
    maxit = int(maxit)
    if x0 is not None and error_map is not None:
        raise ValueError("x0 warm start and error_map cannot be combined")
    aug = AugmentedOperator(A, lam)
    b_norm = jnp.linalg.norm(b)
    if x0 is None:
        b_aug = aug.augment_rhs(b)
    else:
        sqlam = jnp.sqrt(jnp.asarray(lam, dtype=b.dtype))
        b_aug = jnp.concatenate([b - A.matvec(x0), -sqlam * x0])

    from hybrid_gmres_tpu.solvers.common import rel_error_fn

    if x0 is None:
        def residual_fn(x):
            return jnp.linalg.norm(b - A.matvec(x)) / b_norm
    else:
        def residual_fn(d):
            return jnp.linalg.norm(b - A.matvec(x0 + d)) / b_norm

    base_error_fn = rel_error_fn(x_true)
    if error_map is not None:
        error_fn = lambda z: base_error_fn(error_map(z))
    elif x0 is not None:
        error_fn = lambda d: base_error_fn(x0 + d)
    else:
        error_fn = base_error_fn

    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    resume_fingerprint)

    k0 = 0 if resume_from is None else resume_from.res_hist.shape[0]
    if resume_from is not None:
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        check_fingerprint(resume_from, x0, lam)
    x, res_new, err_new, niters, carry = _lsqr_core(
        iter_op=aug,
        b_iter=b_aug,
        residual_fn=residual_fn,
        error_fn=error_fn,
        b_norm_for_estimate=b_norm,
        maxit=maxit,
        tol=tol,
        reorth=reorth,
        carry_init=None if resume_from is None else resume_from.carry,
        k0=k0,
    )
    if x0 is not None:
        x = x0 + x
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
    state = GKBState(carry=carry, res_hist=res_hist, err_hist=err_hist,
                     fp=resume_fingerprint(x0, lam))
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, state=state)
