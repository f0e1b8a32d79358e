"""LSMR and hybrid LSMR.

Reference semantics (rebuilt):
  * LSMR: GKB plus two layers of plane rotations, O(1) memory
    (``lsmr_solver.m:32-77``); tracks the relative residual, the relative
    error, and the normal-equation residual ``||A^T r||`` history
    (``lsmr_solver.m:69-74``).
  * Hybrid LSMR: GKB with a *stored* right basis V and bidiagonal B_k; every
    iteration solves the Tikhonov-shifted projected LSMR normal equations
    ``[(B_k'B_k)^2 + (alpha_{k+1} beta_{k+1})^2 e e' + lam I] y
        = alpha_1 beta_1 (B_k'B_k) e_1``
    and sets ``x = V_k y`` (``hybrid_lsmr_solver.m:37-45``).

Faithfulness note (SURVEY.md §2.3): the reference's rank-1 term uses
``e_1 e_1^T`` where LSMR theory calls for ``e_k e_k^T``.  We default to the
correct ``rank1_mode="last"`` — which makes hybrid LSMR *exactly* equivalent
to hybrid BA-GMRES when ``B = A^T`` (the ``run_equivalence_plots.m:48-58``
oracle) — and keep ``rank1_mode="first"`` for bug-compatible comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.ops.linear_operator import as_operator
from hybrid_gmres_tpu.krylov.projected import projected_gram_tikhonov_solve
from hybrid_gmres_tpu.solvers.common import (
    GKBResult,
    rel_error_fn,
    safe_normalize as _safe_normalize,
)


def lsmr(
    A,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    fro_norm=None,
    reorth: bool = False,
    resume_from=None,
    x0=None,
) -> GKBResult:
    """Standard LSMR (GKB + double QR recurrences).

    ``reorth=True`` fully reorthogonalizes the GKB bases (O(maxit (m+n))
    memory) — restores exact-arithmetic equivalence with BA-GMRES (B=A^T) to
    final iterations on ill-conditioned operators.
    ``resume_from``: a prior result's ``.state`` (same ``reorth``) — the
    recurrence continues with the larger ``maxit`` budget, reproducing an
    uninterrupted run exactly.
    ``x0``: optional warm start — the GKB runs on ``b - A x0`` with the
    iterate carried in x-space (``x = x0 + d``); the true residual/err/
    ``ar_hist`` records need no remapping.  Pass the same ``x0`` when
    resuming.  (``hybrid_lsmr`` warm-starts too, with two documented
    regularizer semantics via ``x0_reg``.)  Multi-RHS serving twin:
    ``lsmr_batched``."""
    from hybrid_gmres_tpu.solvers.common import GKBState

    A = as_operator(A)
    if maxit is None:
        maxit = min(A.shape)
    maxit = int(maxit)
    dtype = b.dtype
    eps = jnp.finfo(dtype).eps
    b_norm = jnp.linalg.norm(b)
    if fro_norm is None:
        # Prefer an operator-recorded exact value (PallasBSROperator stores
        # ||A||_F at from_csr time — the production sparse path must not
        # lose the lsmr_solver.m:71 history to a NaN fallback), then a
        # dense .mat, then NaN for truly matrix-free operators.
        op_fro = getattr(A, "fro_norm", None)
        if op_fro is not None:
            fro_norm = jnp.asarray(op_fro, dtype)
        else:
            mat = getattr(A, "mat", None)
            fro_norm = (jnp.linalg.norm(mat) if mat is not None
                        else jnp.asarray(jnp.nan, dtype))

    b_iter = b if x0 is None else b - A.matvec(x0)
    u, beta1, _ = _safe_normalize(b_iter)
    v, alpha1, _ = _safe_normalize(A.rmatvec(u))

    error_fn = rel_error_fn(x_true)
    n = A.shape[1]
    m = A.shape[0]
    xc0 = (jnp.zeros((n,), dtype=dtype) if x0 is None
           else jnp.asarray(x0, dtype=dtype))
    h0 = v
    hbar0 = jnp.zeros((n,), dtype=dtype)
    if reorth:
        U0 = jnp.zeros((m, maxit + 1), dtype=dtype).at[:, 0].set(u)
        V0 = jnp.zeros((n, maxit + 1), dtype=dtype).at[:, 0].set(v)
    else:
        U0, V0 = None, None

    def _purify(Basis, vec):
        vec = vec - Basis @ (Basis.T @ vec)
        return vec - Basis @ (Basis.T @ vec)

    def step(carry, k):
        (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar, cbar, sbar,
         active, niters, U, V) = carry

        uhat = A.matvec(v) - alpha * u
        if reorth:
            uhat = _purify(U, uhat)
        u_n, beta_k, ok_u = _safe_normalize(uhat)
        vhat = A.rmatvec(u_n) - beta_k * v
        if reorth:
            vhat = _purify(V, vhat)
        v_n, alpha_n, ok_v = _safe_normalize(vhat)

        alphahat = alphabar
        rhoold = rho
        rho_n = jnp.hypot(alphahat, beta_k)
        c = alphahat / rho_n
        s = beta_k / rho_n

        thetanew = s * alpha_n
        alphabar_n = c * alpha_n

        rhobarold = rhobar
        thetabar = sbar * rho_n
        rhobar_n = jnp.hypot(cbar * rho_n, thetanew)
        cbar_n = (cbar * rho_n) / rhobar_n
        sbar_n = thetanew / rhobar_n

        zeta = cbar_n * zetabar
        zetabar_n = -sbar_n * zetabar

        # At k=1 thetabar = 0 so this reduces to hbar = h, matching the
        # reference's explicit first-iteration branch (lsmr_solver.m:56-60).
        hbar_n = h - (thetabar * rho_n) / (rhoold * rhobarold) * hbar
        x_n = x + (zeta / (rho_n * rhobar_n)) * hbar_n
        h_n = v_n - (thetanew / rho_n) * h

        r = b - A.matvec(x_n)
        r_norm = jnp.linalg.norm(r)
        res_k = r_norm / (b_norm + eps)
        ar_k = jnp.linalg.norm(A.rmatvec(r)) / (fro_norm * jnp.maximum(r_norm, eps))
        err_k = error_fn(x_n)

        adopt = active & ok_u & ok_v
        nan = jnp.asarray(jnp.nan, dtype)
        sel = lambda a, b_: jax.lax.select(adopt, a, b_)
        x, u, v, h, hbar = sel(x_n, x), sel(u_n, u), sel(v_n, v), sel(h_n, h), sel(hbar_n, hbar)
        if reorth:
            U = sel(U.at[:, k + 1].set(u_n), U)
            V = sel(V.at[:, k + 1].set(v_n), V)
        alpha = jnp.where(adopt, alpha_n, alpha)
        zetabar = jnp.where(adopt, zetabar_n, zetabar)
        alphabar = jnp.where(adopt, alphabar_n, alphabar)
        rho = jnp.where(adopt, rho_n, rho)
        rhobar = jnp.where(adopt, rhobar_n, rhobar)
        cbar = jnp.where(adopt, cbar_n, cbar)
        sbar = jnp.where(adopt, sbar_n, sbar)
        res_rec = jnp.where(adopt, res_k, nan)
        err_rec = jnp.where(adopt, err_k, nan)
        ar_rec = jnp.where(adopt, ar_k, nan)
        niters = jnp.where(adopt, k + 1, niters)
        active = adopt & (res_k >= tol)
        return (
            (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar, cbar, sbar,
             active, niters, U, V),
            (res_rec, err_rec, ar_rec),
        )

    one = jnp.ones((), dtype)
    if resume_from is None:
        k0 = 0
        carry0 = (
            xc0, u, v, h0, hbar0, alpha1, alpha1 * beta1, alpha1, one, one,
            one, jnp.zeros((), dtype), jnp.bool_(True), jnp.int32(0), U0, V0,
        )
    else:
        k0 = resume_from.res_hist.shape[0]
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        from hybrid_gmres_tpu.utils.checkpoint import check_fingerprint

        check_fingerprint(resume_from, x0, None)
        carry0 = resume_from.carry
        if reorth:
            Up, Vp = carry0[14], carry0[15]
            extra = maxit + 1 - Up.shape[1]
            if extra > 0:
                carry0 = carry0[:14] + (jnp.pad(Up, ((0, 0), (0, extra))),
                                        jnp.pad(Vp, ((0, 0), (0, extra))))
    carry_out, (res_new, err_new, ar_new) = jax.lax.scan(
        step, carry0, jnp.arange(k0, maxit, dtype=jnp.int32)
    )
    x, niters = carry_out[0], carry_out[13]
    if resume_from is None:
        res_hist, err_hist, ar_hist = res_new, err_new, ar_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
        ar_hist = jnp.concatenate([resume_from.ar_hist, ar_new])
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    state = GKBState(carry=carry_out, res_hist=res_hist, err_hist=err_hist,
                     ar_hist=ar_hist, fp=resume_fingerprint(x0, None))
    return GKBResult(
        x=x, err_hist=err_hist, res_hist=res_hist, niters=niters,
        ar_hist=ar_hist, state=state
    )


def _hybrid_lsmr_projected(Bmat, alpha_next, beta_k, ab1, lam, kdim, maxit,
                           rank1_mode, dtype, rhs_offset=None):
    """The per-iteration shifted projected LSMR solve
    (``hybrid_lsmr_solver.m:37-45``): LHS ``(B'B)^2 + (alpha beta)^2 ee' +
    lam I``, RHS ``alpha1 beta1 (B'B) e1`` — shared by the scan body and the
    resume patch.  ``rhs_offset``: optional (maxit,) linear term added to
    the RHS (the warm-start ``x0_reg="full"`` mode's ``-lam V^T x0`` —
    regularizing ``||x0 + V y||^2`` instead of ``||y||^2``)."""
    BtB = Bmat.T @ Bmat  # zero outside the kdim x kdim block
    G = BtB @ BtB
    coef = (alpha_next * beta_k) ** 2
    if rank1_mode == "last":
        e_idx = kdim - 1
    else:
        e_idx = jnp.zeros((), jnp.int32)
    e_vec = jax.nn.one_hot(e_idx, maxit, dtype=dtype)
    G = G + coef * jnp.outer(e_vec, e_vec)
    rhs = ab1 * BtB[:, 0]
    if rhs_offset is not None:
        rhs = rhs + rhs_offset
    return projected_gram_tikhonov_solve(G, rhs, lam, kdim)


def make_hybrid_lsmr_lam_fn(lam, gcv_grid, n, maxit, dtype):
    """Shared lambda-selection strategy for hybrid LSMR (single-chip and
    the 1-D/2-D sharded twins): scalar passthrough, or the HyBR-style
    per-iteration GCV pick on the projected bidiagonal problem.  Returns
    ``lam_fn(Bmat_k, kdim, b_norm)``; pure replicated k x k compute, safe
    inside shard_map."""
    if not isinstance(lam, str):
        return lambda Bmat_k, kdim, b_norm: lam
    if lam != "gcv":
        raise ValueError("lam must be a scalar or 'gcv'")
    import numpy as _np

    from hybrid_gmres_tpu.reg.gcv import gcv_factors, gcv_from_factors

    grid_arr = jnp.asarray(
        _np.logspace(-8, -1, 50) if gcv_grid is None else gcv_grid,
        dtype=dtype)

    def lam_fn(Bmat_k, kdim, b_norm):
        t = jnp.zeros((maxit + 1,), dtype).at[0].set(b_norm)
        factors = gcv_factors(Bmat_k, t, kdim)
        vals = jax.vmap(
            lambda l: gcv_from_factors(factors, l, n))(grid_arr)
        return grid_arr[jnp.argmin(vals)]

    return lam_fn


def hybrid_lsmr(
    A,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    lam=1e-3,
    rank1_mode: str = "last",
    reorth: bool = False,
    resume_from=None,
    gcv_grid=None,
    x0=None,
    x0_reg: str = "correction",
) -> GKBResult:
    """Hybrid LSMR: stored-basis GKB + per-iteration shifted projected solve.

    ``lam``: scalar, or ``"gcv"`` for HyBR-style per-iteration adaptive
    selection — at every k the lambda minimizing the GCV functional of the
    projected bidiagonal Tikhonov problem ``min ||B_k y - beta_1 e_1||``
    over ``gcv_grid`` (the GKB analog of the GMRES solvers' adaptive mode;
    no reference counterpart — ``gcv_function.m`` covers only the GMRES
    spaces).

    ``reorth=True`` fully reorthogonalizes both GKB bases (CGS2 against the
    stored U/V) — holds the hybrid BA-GMRES == hybrid LSMR equivalence
    (``run_equivalence_plots.m:48-58``) to FULL history depth on
    ill-conditioned operators.

    ``x0``: optional warm start — GKB runs on ``b - A x0`` with
    ``x = x0 + V y``.  ``x0_reg`` picks the regularizer semantics
    (documented trade, VERDICT r4 weak#6):

      * ``"correction"`` (default): Tikhonov acts on the CORRECTION,
        ``lam ||y||^2`` — exactly the semantics of the hybrid GMRES
        solvers' warm start (their projected solve regularizes ``y``
        with ``x = x0 + Q y``), so the warm-started equivalence
        hybrid BA-GMRES(x0) == hybrid LSMR(x0, reorth=True) holds;
      * ``"full"``: Tikhonov acts on the full iterate restricted to the
        affine search space, ``lam ||x0 + V y||^2`` — the projected RHS
        gains ``-lam V^T x0`` (the GKB analog of ``hybrid_lsqr``'s exact
        augmented restart; use when successive-frame warm starts must not
        re-penalize the carried-over solution mass).

    ``resume_from``: a prior result's ``.state`` (same ``lam`` /
    ``rank1_mode`` / ``reorth`` / ``x0``).  The reference holds a stale
    alpha at its final iteration (``hybrid_lsmr_solver.m:26-33``, a
    maxit-dependent artifact); the checkpoint carries the *advanced*
    recurrence and the resume re-solves that entry under non-final
    semantics, so ``resume(run(k), K) == run(K)`` exactly, including
    entry ``k-1``.
    """
    from hybrid_gmres_tpu.solvers.common import GKBState

    if rank1_mode not in ("last", "first"):
        raise ValueError("rank1_mode must be 'last' (textbook) or 'first' (reference-compat)")
    if x0_reg not in ("correction", "full"):
        raise ValueError("x0_reg must be 'correction' or 'full'")
    A = as_operator(A)
    if maxit is None:
        maxit = min(A.shape)
    maxit = int(maxit)
    dtype = b.dtype
    n = A.shape[1]
    m = A.shape[0]
    b_norm = jnp.linalg.norm(b)
    base_error_fn = rel_error_fn(x_true)
    xoff = x0
    have_x0 = xoff is not None
    b_iter = b - A.matvec(xoff) if have_x0 else b
    error_fn = ((lambda d: base_error_fn(xoff + d)) if have_x0
                else base_error_fn)

    _lam_fn = make_hybrid_lsmr_lam_fn(lam, gcv_grid, n, maxit, dtype)
    _lam_k = lambda Bmat_k, kdim: _lam_fn(Bmat_k, kdim, b_norm)

    def _purify(Basis, vec):
        vec = vec - Basis @ (Basis.T @ vec)
        return vec - Basis @ (Basis.T @ vec)

    def _roff(V_k, lam_k):
        # x0_reg="full": regularize ||x0 + V y||^2 -> RHS -= lam V^T x0
        if have_x0 and x0_reg == "full":
            return -lam_k * (V_k.T @ xoff)
        return None

    def step(carry, k):
        x, u, v, V, Bmat, alpha, active, niters, U, ab1 = carry
        kdim = k + 1

        Bmat_n = Bmat.at[k, k].set(alpha)
        uhat = A.matvec(v) - alpha * u
        if reorth:
            uhat = _purify(U, uhat)
        u_n, beta_k, ok_u = _safe_normalize(uhat)
        Bmat_n = Bmat_n.at[k + 1, k].set(beta_k)

        # The carry always ADVANCES the right recurrence (so a checkpoint
        # can continue exactly); the reference's stale-alpha final-iteration
        # REPORTING (hybrid_lsmr_solver.m:26-33) is recovered with selects.
        vhat = A.rmatvec(u_n) - beta_k * v
        if reorth:
            vhat = _purify(V, vhat)
        v2, alpha2, ok2 = _safe_normalize(vhat)
        adv = k < maxit - 1
        alpha_rep = jnp.where(adv, alpha2, alpha)   # stale at final iter
        ok_v = jnp.where(adv, ok2, jnp.bool_(True))
        V_n = jax.lax.select(
            adv, V.at[:, jnp.minimum(k + 1, maxit - 1)].set(v2), V)
        if reorth:
            U_n = U.at[:, k + 1].set(u_n)
        else:
            U_n = U

        lam_k = _lam_k(Bmat_n, kdim)
        y = _hybrid_lsmr_projected(Bmat_n, alpha_rep, beta_k, ab1,
                                   lam_k, kdim, maxit,
                                   rank1_mode, dtype,
                                   rhs_offset=_roff(V_n, lam_k))
        x_n = V_n @ y

        res_k = jnp.linalg.norm(b_iter - A.matvec(x_n)) / b_norm
        err_k = error_fn(x_n)

        adopt = active & ok_u & ok_v
        nan = jnp.asarray(jnp.nan, dtype)
        x = jax.lax.select(adopt, x_n, x)
        u = jax.lax.select(adopt, u_n, u)
        v = jax.lax.select(adopt, v2, v)
        V = jax.lax.select(adopt, V_n, V)
        Bmat = jax.lax.select(adopt, Bmat_n, Bmat)
        if reorth:
            U = jax.lax.select(adopt, U_n, U)
        alpha = jnp.where(adopt, alpha2, alpha)
        res_rec = jnp.where(adopt, res_k, nan)
        err_rec = jnp.where(adopt, err_k, nan)
        niters = jnp.where(adopt, kdim, niters)
        active = adopt & (res_k > tol)
        return (x, u, v, V, Bmat, alpha, active, niters, U, ab1), \
            (res_rec, err_rec)

    if resume_from is None:
        k0 = 0
        u, beta1, _ = _safe_normalize(b_iter)
        v, alpha1, _ = _safe_normalize(A.rmatvec(u))
        V0 = jnp.zeros((n, maxit), dtype=dtype).at[:, 0].set(v)
        Bmat0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        d0 = jnp.zeros((n,), dtype=dtype)
        U0 = (jnp.zeros((m, maxit + 1), dtype=dtype).at[:, 0].set(u)
              if reorth else jnp.zeros((0, 0), dtype=dtype))
        carry0 = (d0, u, v, V0, Bmat0, alpha1, jnp.bool_(True),
                  jnp.int32(0), U0, alpha1 * beta1)
        prior_res = prior_err = None
    else:
        k0 = resume_from.res_hist.shape[0]
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        from hybrid_gmres_tpu.utils.checkpoint import check_fingerprint

        # the tag makes an x0_reg-mismatched resume raise (the two
        # semantics produce different histories for the same x0/lam)
        check_fingerprint(resume_from, xoff, lam,
                          tag=x0_reg if (have_x0 and x0_reg == "full")
                          else "")
        (d0, u, v, Vp, Bp, alpha, active, niters, Up, ab1) = \
            resume_from.carry
        extra = maxit - Vp.shape[1]
        V0 = jnp.pad(Vp, ((0, 0), (0, extra)))
        Bmat0 = jnp.pad(Bp, ((0, extra), (0, extra)))
        U0 = (jnp.pad(Up, ((0, 0), (0, extra))) if Up.size else Up)
        prior_res, prior_err = resume_from.res_hist, resume_from.err_hist
        # Re-solve entry k0-1 under NON-final semantics (the carried alpha
        # is the advanced one): this is exactly what an uninterrupted run
        # records at that iteration.
        did = jnp.isfinite(prior_res[k0 - 1]) if k0 > 0 else jnp.bool_(False)
        if k0 > 0 and k0 < maxit:
            # The checkpointed run could not write v_{k0+1} into V (its V
            # had only k0 columns); the uninterrupted run puts it at column
            # k0.  The carried v IS that advanced vector — place it, so
            # resumed iterates x = V y keep the y[k0] component (without
            # this, resume silently dropped a basis direction).
            V0 = jax.lax.select(did, V0.at[:, k0].set(v), V0)
        if k0 > 0:
            beta_k = Bmat0[k0, k0 - 1]
            lam_p = _lam_k(Bmat0, k0)
            y = _hybrid_lsmr_projected(Bmat0, alpha, beta_k, ab1,
                                       lam_p, k0, maxit,
                                       rank1_mode, dtype,
                                       rhs_offset=_roff(V0, lam_p))
            x_patch = V0 @ y
            res_p = jnp.linalg.norm(b_iter - A.matvec(x_patch)) / b_norm
            err_p = error_fn(x_patch)
            d0 = jax.lax.select(did, x_patch, d0)
            prior_res = prior_res.at[k0 - 1].set(
                jnp.where(did, res_p, prior_res[k0 - 1]))
            prior_err = prior_err.at[k0 - 1].set(
                jnp.where(did, err_p, prior_err[k0 - 1]))
            # exactly the uninterrupted run's post-iteration active flag:
            # adopted there iff adopted here (did), continuing iff the
            # re-solved (advanced-alpha) residual is still above tol
            active = did & (res_p > tol)
        carry0 = (d0, u, v, V0, Bmat0, alpha, active, niters, U0, ab1)

    carry_out, (res_new, err_new) = jax.lax.scan(
        step, carry0, jnp.arange(k0, maxit, dtype=jnp.int32)
    )
    x, niters = carry_out[0], carry_out[7]
    if have_x0:
        x = xoff + x
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([prior_res, res_new])
        err_hist = jnp.concatenate([prior_err, err_new])
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    state = GKBState(carry=carry_out, res_hist=res_hist, err_hist=err_hist,
                     fp=resume_fingerprint(
                         xoff, lam,
                         tag=x0_reg if (have_x0 and x0_reg == "full")
                         else ""))
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, state=state)
