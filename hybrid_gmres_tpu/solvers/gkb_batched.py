"""Batched multi-RHS GKB solvers: LSQR / hybrid LSQR / LSMR over R RHS.

The GKB serving twins of ``solvers/batched.py`` (reference recurrences
``lsqr_solver.m:20-47``, ``hybrid_lsqr_solver.m:21-46``,
``lsmr_solver.m:32-77`` run per RHS): R INDEPENDENT bidiagonalizations in
one scan, every operator application a multi-RHS SpMM
(``op.matmat``/``rmatmat`` — one panel read serves all R columns on
:class:`~hybrid_gmres_tpu.ops.spmv_pallas.PallasBSROperator`), every
rotation recurrence vectorized to (R,) scalars.  Per-RHS semantics match
the single-RHS solvers exactly: independent histories / niters / active
flags / breakdown handling / warm starts / final true-residual patch
(LSQR), ``reorth`` stores (space, maxit+1, R) bases with per-RHS CGS2
purification, and ``resume_from`` continues every RHS's recurrence
exactly (fingerprint-guarded).

The GKB adjoint half-step requires the exact adjoint pair — quantized
operators keep it exact via the shared-quantization ``diag(s) Q`` panels
(see ``PallasBSROperator``).  Hybrid LSMR has no batched form here: its
per-iteration stored-basis projected solve is the dominant cost and does
not amortize across RHS the way the SpMM-bound solvers do (use
``hybrid_lsqr_batched`` — same Tikhonov estimator through the augmented
system — or the batched hybrid GMRES family).

No reference counterpart: the reference is single-RHS MATLAB.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.ops.linear_operator import as_operator
from hybrid_gmres_tpu.solvers.common import (GKBResult, GKBState,
                                              grow_stored_bases)

__all__ = [
    "lsqr_batched",
    "hybrid_lsqr_batched",
    "lsmr_batched",
]


def _normalize_cols(X):
    """Per-column (vec/||vec||, ||vec||, ok) — the (R,)-batched
    ``safe_normalize``."""
    nrm = jnp.sqrt(jnp.sum(X * X, axis=0))
    ok = nrm > 0
    safe = jnp.where(ok, nrm, jnp.ones((), X.dtype))
    return jnp.where(ok[None, :], X / safe, jnp.zeros_like(X)), nrm, ok


def _purify_cols(Basis, X):
    """Per-RHS CGS2 against a stored (space, k, R) basis — two passes,
    each one einsum pair (the batched twin of ``lsqr._purify``)."""
    c = jnp.einsum("mkr,mr->kr", Basis, X)
    X = X - jnp.einsum("mkr,kr->mr", Basis, c)
    c = jnp.einsum("mkr,mr->kr", Basis, X)
    return X - jnp.einsum("mkr,kr->mr", Basis, c)


def _cols_norm(X):
    return jnp.sqrt(jnp.sum(X * X, axis=0))


def _prep_batched(A, b, x_true, x0, maxit, name):
    A = as_operator(A)
    if b.ndim != 2:
        raise ValueError(f"{name} expects b of shape (m, R); use the "
                         "single-RHS solver for one right-hand side")
    m, n = A.shape
    if maxit is None:
        maxit = min(m, n)
    maxit = int(maxit)
    dtype = b.dtype
    R = b.shape[1]
    have_xt = x_true is not None
    if have_xt:
        x_true = jnp.broadcast_to(
            jnp.asarray(x_true, dtype).reshape(n, -1), (n, R))
    else:
        x_true = jnp.zeros((n, R), dtype)
    have_x0 = x0 is not None
    if have_x0:
        x0 = jnp.broadcast_to(jnp.asarray(x0, dtype).reshape(n, -1), (n, R))
    else:
        x0 = jnp.zeros((n, R), dtype)
    return A, maxit, dtype, m, n, R, x_true, have_xt, x0, have_x0


def _error_fn_cols(x_true):
    xt_norm = _cols_norm(x_true)

    def f(X):
        return _cols_norm(X - x_true) / xt_norm

    return f


def _resume_k0(resume_from, maxit, x0, lam):
    from hybrid_gmres_tpu.utils.checkpoint import check_fingerprint

    if resume_from is None:
        return 0
    k0 = resume_from.res_hist.shape[0]
    if k0 >= maxit:
        raise ValueError(f"resume needs maxit > {k0}")
    check_fingerprint(resume_from, x0, lam)
    return k0


def _resume_carry(resume_from, reorth, n_plain, maxit, idx):
    """Validate a resumed carry's reorth layout and grow its stored bases
    to the new budget (shared by all three batched GKB solvers)."""
    rc = resume_from.carry
    expect = n_plain + 2 if reorth else n_plain
    if len(rc) != expect:
        raise ValueError("resume_from state does not match reorth=; "
                         "pass the same reorth as the original run")
    return grow_stored_bases(rc, maxit, idx) if reorth else rc


def _lsqr_core_batched(mm, rmm, b_iter, residual_fn, error_fn, b_norm,
                       maxit, tol, reorth, m_sp, n, dtype,
                       carry_init=None, k0=0):
    """(R,)-batched twin of ``lsqr._lsqr_core``: same Givens recurrence per
    RHS, operator products via the injected multi-RHS ``mm``/``rmm``."""
    R = b_iter.shape[1]

    if carry_init is None:
        u, beta, _ = _normalize_cols(b_iter)
        v, alpha, _ = _normalize_cols(rmm(u))
        w = v
        x0c = jnp.zeros((n, R), dtype)
        carry0 = (x0c, u, v, w, beta, alpha, alpha, beta > 0,
                  jnp.zeros((R,), jnp.int32))
        if reorth:
            U0 = jnp.zeros((m_sp, maxit + 1, R), dtype).at[:, 0, :].set(u)
            V0 = jnp.zeros((n, maxit + 1, R), dtype).at[:, 0, :].set(v)
            carry0 = carry0 + (U0, V0)
    else:
        carry0 = carry_init

    def step(carry, k):
        if reorth:
            (x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters,
             U, V) = carry
        else:
            x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters = carry
        uhat = mm(v) - alpha_c[None, :] * u
        if reorth:
            uhat = _purify_cols(U, uhat)
        u_n, beta_k, ok_u = _normalize_cols(uhat)
        vhat = rmm(u_n) - beta_k[None, :] * v
        if reorth:
            vhat = _purify_cols(V, vhat)
        v_n, alpha_n, ok_v = _normalize_cols(vhat)

        rho = jnp.hypot(rho_bar, beta_k)
        c = rho_bar / rho
        s = beta_k / rho
        theta = s * alpha_n
        rho_bar_n = -c * alpha_n
        phi = c * phi_bar
        phi_bar_n = s * phi_bar

        x_n = x + (phi / rho)[None, :] * w
        w_n = v_n - (theta / rho)[None, :] * w

        if residual_fn is None:
            res_k = jnp.abs(phi_bar_n) / b_norm
        else:
            res_k = residual_fn(x_n)
        err_k = error_fn(x_n)

        adopt = active & ok_u & ok_v
        nan = jnp.asarray(jnp.nan, dtype)
        selc = lambda a, b_: jnp.where(adopt[None, :], a, b_)
        x, u, v, w = selc(x_n, x), selc(u_n, u), selc(v_n, v), selc(w_n, w)
        if reorth:
            sel3 = lambda a, b_: jnp.where(adopt[None, None, :], a, b_)
            U = sel3(U.at[:, k + 1, :].set(u_n), U)
            V = sel3(V.at[:, k + 1, :].set(v_n), V)
        phi_bar = jnp.where(adopt, phi_bar_n, phi_bar)
        rho_bar = jnp.where(adopt, rho_bar_n, rho_bar)
        alpha_c = jnp.where(adopt, alpha_n, alpha_c)
        res_rec = jnp.where(adopt, res_k, nan)
        err_rec = jnp.where(adopt, err_k, nan)
        niters = jnp.where(adopt, k + 1, niters)
        active = adopt & (res_k > tol)
        out = (x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters)
        if reorth:
            out = out + (U, V)
        return out, (res_rec, err_rec)

    carry_out, (res_hist, err_hist) = jax.lax.scan(
        step, carry0, jnp.arange(k0, maxit, dtype=jnp.int32))
    x, niters = carry_out[0], carry_out[8]
    return x, res_hist, err_hist, niters, carry_out


def _patch_true_res(res_hist, niters, true_res):
    """Per-RHS final-entry true-residual patch (``lsqr_solver.m:52``)."""
    R = niters.shape[0]
    slot = jnp.maximum(niters - 1, 0)
    cur = res_hist[slot, jnp.arange(R)]
    return res_hist.at[slot, jnp.arange(R)].set(
        jnp.where(niters > 0, true_res, cur))


def lsqr_batched(
    A,
    b,
    x_true=None,
    tol: float = 0.0,
    maxit: int | None = None,
    reorth: bool = False,
    resume_from=None,
    x0=None,
) -> GKBResult:
    """Batched multi-RHS LSQR: R independent ``lsqr`` runs in one scan,
    operator products shared via multi-RHS SpMM (``lsqr_solver.m:20-47``
    semantics per RHS: cheap residual estimate, per-RHS final true-residual
    patch).  ``b``: (m, R); histories (maxit, R); ``x0``: (n, R) or (n,)
    broadcast (correction-space, ``x = x0 + d``); ``reorth``: per-RHS CGS2
    against (space, maxit+1, R) stored bases; ``resume_from``: a prior
    result's ``.state`` (same ``x0``/``reorth``; per-RHS active flags in
    the carry continue each recurrence exactly)."""
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    A, maxit, dtype, m, n, R, x_true, have_xt, x0a, have_x0 = \
        _prep_batched(A, b, x_true, x0, maxit, "lsqr_batched")
    b_norm = _cols_norm(b)
    b_iter = b - A.matmat(x0a) if have_x0 else b
    base_err = _error_fn_cols(x_true)
    error_fn = (lambda D: base_err(x0a + D)) if have_x0 else base_err
    k0 = _resume_k0(resume_from, maxit, x0a if have_x0 else None, None)
    carry_init = None
    if resume_from is not None:
        carry_init = _resume_carry(resume_from, reorth, 9, maxit, (9, 10))

    x, res_new, err_new, niters, carry = _lsqr_core_batched(
        A.matmat, A.rmatmat, b_iter, None, error_fn, b_norm, maxit, tol,
        reorth, m, n, dtype, carry_init=carry_init, k0=k0)
    if have_x0:
        x = x0a + x
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
    state = GKBState(carry=carry, res_hist=res_hist, err_hist=err_hist,
                     fp=resume_fingerprint(x0a if have_x0 else None, None))
    true_res = _cols_norm(b - A.matmat(x)) / b_norm
    res_hist = _patch_true_res(res_hist, niters, true_res)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, state=state)


def hybrid_lsqr_batched(
    A,
    b,
    x_true=None,
    tol: float = 0.0,
    maxit: int | None = None,
    lam: float = 1e-3,
    reorth: bool = False,
    resume_from=None,
    x0=None,
) -> GKBResult:
    """Batched multi-RHS hybrid LSQR: per RHS, LSQR on the Tikhonov-
    augmented ``[A; sqrt(lam) I]`` with the residual tracked vs the
    unaugmented system (``hybrid_lsqr_solver.m:5-6,43``).  ``x0``: the
    EXACT per-RHS Tikhonov restart (augmented rhs
    ``[b - A x0; -sqrt(lam) x0]``, ``x = x0 + d``).  The augmented u-basis
    is carried as one (m+n, R) slab (the sqrt(lam) I block is R-diagonal
    and free).

    ``lam``: scalar, or an (R,)-vector of PER-RHS regularization weights
    — serving frames with heterogeneous noise levels each get their own
    Tikhonov strength at zero extra cost (the sqrt(lam) block broadcasts
    along columns); the resume fingerprint encodes the full vector."""
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    A, maxit, dtype, m, n, R, x_true, have_xt, x0a, have_x0 = \
        _prep_batched(A, b, x_true, x0, maxit, "hybrid_lsqr_batched")
    lam_arr = jnp.asarray(lam, dtype)
    if lam_arr.ndim not in (0, 1) or \
            (lam_arr.ndim == 1 and lam_arr.shape[0] != R):
        raise ValueError(f"lam must be a scalar or an (R,)={R} vector")
    sql = jnp.sqrt(lam_arr)
    b_norm = _cols_norm(b)

    def mm(V):
        return jnp.concatenate([A.matmat(V), sql * V], axis=0)

    def rmm(U):
        return A.rmatmat(U[:m]) + sql * U[m:]

    if have_x0:
        b_aug = jnp.concatenate([b - A.matmat(x0a), -sql * x0a], axis=0)
    else:
        b_aug = jnp.concatenate([b, jnp.zeros((n, R), dtype)], axis=0)

    def residual_fn(D):
        return _cols_norm(b - A.matmat(x0a + D)) / b_norm

    base_err = _error_fn_cols(x_true)
    error_fn = lambda D: base_err(x0a + D)
    k0 = _resume_k0(resume_from, maxit, x0a if have_x0 else None, lam)
    carry_init = None
    if resume_from is not None:
        carry_init = _resume_carry(resume_from, reorth, 9, maxit, (9, 10))

    d, res_new, err_new, niters, carry = _lsqr_core_batched(
        mm, rmm, b_aug, residual_fn, error_fn, b_norm, maxit, tol,
        reorth, m + n, n, dtype, carry_init=carry_init, k0=k0)
    x = x0a + d
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
    state = GKBState(carry=carry, res_hist=res_hist, err_hist=err_hist,
                     fp=resume_fingerprint(x0a if have_x0 else None, lam))
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, state=state)


def lsmr_batched(
    A,
    b,
    x_true=None,
    tol: float = 0.0,
    maxit: int | None = None,
    fro_norm=None,
    reorth: bool = False,
    resume_from=None,
    x0=None,
) -> GKBResult:
    """Batched multi-RHS LSMR (``lsmr_solver.m:32-77`` per RHS): GKB +
    double plane rotations vectorized to (R,), TRUE residual / error /
    ``||A^T r||`` histories per RHS (``ar_hist`` (maxit, R); exact when the
    operator records ``fro_norm``)."""
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    A, maxit, dtype, m, n, R, x_true, have_xt, x0a, have_x0 = \
        _prep_batched(A, b, x_true, x0, maxit, "lsmr_batched")
    eps = jnp.finfo(dtype).eps
    b_norm = _cols_norm(b)
    if fro_norm is None:
        op_fro = getattr(A, "fro_norm", None)
        if op_fro is not None:
            fro_norm = jnp.asarray(op_fro, dtype)
        else:
            mat = getattr(A, "mat", None)
            fro_norm = (jnp.linalg.norm(mat) if mat is not None
                        else jnp.asarray(jnp.nan, dtype))
    error_fn = _error_fn_cols(x_true)
    k0 = _resume_k0(resume_from, maxit, x0a if have_x0 else None, None)

    def step(carry, k):
        if reorth:
            (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
             cbar, sbar, active, niters, U, V) = carry
        else:
            (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
             cbar, sbar, active, niters) = carry

        uhat = A.matmat(v) - alpha[None, :] * u
        if reorth:
            uhat = _purify_cols(U, uhat)
        u_n, beta_k, ok_u = _normalize_cols(uhat)
        vhat = A.rmatmat(u_n) - beta_k[None, :] * v
        if reorth:
            vhat = _purify_cols(V, vhat)
        v_n, alpha_n, ok_v = _normalize_cols(vhat)

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

        hbar_n = h - ((thetabar * rho_n) / (rhoold * rhobarold))[None, :] \
            * hbar
        x_n = x + (zeta / (rho_n * rhobar_n))[None, :] * hbar_n
        h_n = v_n - (thetanew / rho_n)[None, :] * h

        Rres = b - A.matmat(x_n)
        r_norm = _cols_norm(Rres)
        res_k = r_norm / (b_norm + eps)
        ar_k = _cols_norm(A.rmatmat(Rres)) / (
            fro_norm * jnp.maximum(r_norm, eps))
        err_k = error_fn(x_n)

        adopt = active & ok_u & ok_v
        nan = jnp.asarray(jnp.nan, dtype)
        selc = lambda a, b_: jnp.where(adopt[None, :], a, b_)
        x, u, v, h, hbar = (selc(x_n, x), selc(u_n, u), selc(v_n, v),
                            selc(h_n, h), selc(hbar_n, hbar))
        if reorth:
            sel3 = lambda a, b_: jnp.where(adopt[None, None, :], a, b_)
            U = sel3(U.at[:, k + 1, :].set(u_n), U)
            V = sel3(V.at[:, k + 1, :].set(v_n), V)
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
        out = (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
               cbar, sbar, active, niters)
        if reorth:
            out = out + (U, V)
        return out, (res_rec, err_rec, ar_rec)

    if resume_from is None:
        b_iter = b - A.matmat(x0a) if have_x0 else b
        u, beta1, _ = _normalize_cols(b_iter)
        v, alpha1, _ = _normalize_cols(A.rmatmat(u))
        xc0 = x0a
        one = jnp.ones((R,), dtype)
        carry0 = (
            xc0, u, v, v, jnp.zeros((n, R), dtype), alpha1,
            alpha1 * beta1, alpha1, one, one, one, jnp.zeros((R,), dtype),
            beta1 > 0, jnp.zeros((R,), jnp.int32),
        )
        if reorth:
            U0 = jnp.zeros((m, maxit + 1, R), dtype).at[:, 0, :].set(u)
            V0 = jnp.zeros((n, maxit + 1, R), dtype).at[:, 0, :].set(v)
            carry0 = carry0 + (U0, V0)
    else:
        carry0 = _resume_carry(resume_from, reorth, 14, maxit, (14, 15))
    carry_out, (res_new, err_new, ar_new) = jax.lax.scan(
        step, carry0, jnp.arange(k0, maxit, dtype=jnp.int32))
    x, niters = carry_out[0], carry_out[13]
    if resume_from is None:
        res_hist, err_hist, ar_hist = res_new, err_new, ar_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
        ar_hist = jnp.concatenate([resume_from.ar_hist, ar_new])
    state = GKBState(carry=carry_out, res_hist=res_hist, err_hist=err_hist,
                     ar_hist=ar_hist,
                     fp=resume_fingerprint(x0a if have_x0 else None, None))
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, ar_hist=ar_hist, state=state)
