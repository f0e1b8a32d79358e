"""Batched (multi-RHS) hybrid BA/AB-GMRES — the serving fast path.

Reconstructs R sinograms in ONE solve: every Krylov matvec is a multi-RHS
SpMM (``LinearOperator.matmat`` — for :class:`PallasBSROperator` a single
panel read serves all R columns, measured ~4x aggregate SpMV throughput at
R>=8 on v5e), while the per-RHS Arnoldi recurrences, projected solves and
histories stay independent (each RHS has its own Krylov space and its own
Hessenberg — this is NOT block GMRES).

A plain ``jax.vmap`` over the single-RHS solver is mathematically
identical but re-reads the operator panels once per RHS (pallas batching
rule); this module exists to share them.  Semantics per RHS match
``ba_gmres``/``ab_gmres`` with ``residual="fused"`` (true residual from
stored operator images, reference ``BAgmres_hybrid_bounds.m:24-40``),
including warm starts (``x0``) and checkpoint/resume (``resume_from``) —
the serving scenario is successive-frame reconstruction warm-started from
the previous frame (DESIGN §13).

R is auto-chunked into scans of at most ``chunk_rhs`` (default 8) RHS:
beyond R=8 the (space, maxit+1, R) basis einsums hit VMEM pressure and
aggregate throughput REGRESSES (measured, DESIGN §13), so one solve at
R=16 runs as two pipelined R=8 scans sharing nothing but the operators.

No reference counterpart: the reference solves one RHS per run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.ops.linear_operator import as_operator
from hybrid_gmres_tpu.solvers.common import GMRESResult
from hybrid_gmres_tpu.solvers.gmres import _make_project_solve


def _make_select_lam(trace_dim, gcv_grid):
    """Per-RHS ONE-SHOT GCV selector (``lam="gcv-final"``): pick, for each
    RHS, the lambda minimizing the GCV functional of its FINAL projected
    problem — 2 SVDs per RHS total, vs 2 per (k, RHS) for the per-iteration
    ``lam="gcv"`` (measured ~10x the fixed-lambda cost at R=8, DESIGN §13).
    The serving-grade adaptive mode: the per-k solves then run at that
    fixed per-RHS lambda, costing the same as a scalar ``lam``.  Anchored
    to the reference's GCV-selection-as-part-of-the-solve flow
    (``analyze_regularization.m:37-46``)."""
    from hybrid_gmres_tpu.reg.gcv import gcv_factors, gcv_from_factors

    def select(H, t, nsteps):
        import numpy as np

        grid = jnp.asarray(
            np.logspace(-8, -1, 50) if gcv_grid is None else gcv_grid,
            H.dtype)

        def one(Hr, tr, kd):
            f = gcv_factors(Hr, tr, kd)
            vals = jax.vmap(lambda l: gcv_from_factors(f, l, trace_dim)
                            )(grid)
            return grid[jnp.argmin(vals)]

        return jax.vmap(one, in_axes=(2, 1, 0))(H, t, nsteps)

    return select


def _pad_batched(res: GMRESResult, maxit: int):
    """Pad a batched checkpoint's maxit axes out to a larger budget."""
    maxit1 = res.res_hist.shape[0]
    if maxit1 > maxit:
        raise ValueError(f"resume needs maxit >= checkpointed {maxit1}")
    pk = maxit - maxit1

    def pad(a, axes):
        if a is None:
            return None
        cfg = [(0, pk if ax in axes else 0, 0) for ax in range(a.ndim)]
        return jax.lax.pad(a, jnp.zeros((), a.dtype), cfg)

    return res._replace(
        Q=pad(res.Q, (1,)),          # (nsp, maxit+1, R)
        H=pad(res.H, (0, 1)),        # (maxit+1, maxit, R)
        IMG=pad(res.IMG, (1,)),      # (m_img, maxit, R)
        S=pad(res.S, (1,)),          # (nx, maxit, R)
    )



def _batched_cgs2(Q, H, W, k, active):
    """Two-pass CGS2 + breakdown-masked adoption, shared by the in-scan
    and deferred batched cores (must stay bit-identical between them —
    the deferred==in-scan parity contract)."""
    dtype = W.dtype
    c1 = jnp.einsum("nkr,nr->kr", Q, W)
    W = W - jnp.einsum("nkr,kr->nr", Q, c1)
    c2 = jnp.einsum("nkr,nr->kr", Q, W)
    W = W - jnp.einsum("nkr,kr->nr", Q, c2)
    h = c1 + c2
    hnorm = jnp.linalg.norm(W, axis=0)
    breakdown = hnorm <= jnp.zeros((), dtype)
    hsafe = jnp.where(breakdown, jnp.ones((), dtype), hnorm)
    h = h.at[k + 1].set(hnorm)
    Hn = H.at[:, k, :].set(h)
    Qn = Q.at[:, k + 1, :].set(
        jnp.where(breakdown[None, :], jnp.zeros_like(W), W / hsafe))
    Qn = jnp.where(active[None, None, :], Qn, Q)
    Hn = jnp.where(active[None, None, :], Hn, H)
    return Qn, Hn, breakdown


def _batched_core(first_mm, second_mm, r0, rhs, b_norm, project_solve,
                  solution, x_true, maxit, tol, img_stage,
                  x_offset=None, resume=None):
    """Shared scan: per-RHS CGS2 Arnoldi with multi-RHS operator products.

    ``first_mm``/``second_mm``: the two stages of the composed Krylov
    product (BA: A then B; AB: B then A), acting on (space, R) matrices.
    ``r0`` (space, R) starting residuals (``None`` when resuming — the
    carried state supplies shapes and beta); ``rhs``
    (m_img, R) the fused residual target (``b - A x0`` under a warm
    start); ``img_stage``: which stage's image spans ``A x``.
    ``solution``: "basis" (x = x0 + Q y, BA) or "image" (x = x0 + S y,
    AB).  ``x_offset``: (nx, R) warm-start iterate or None.
    ``resume``: a prior batched :class:`GMRESResult` already padded to
    ``maxit`` — the scan continues at its history length with the carried
    per-RHS active flags (frozen RHS stay frozen, exactly as the
    uninterrupted run's masking would leave them).
    """
    dtype = rhs.dtype
    m_img = rhs.shape[0]
    nx = x_true.shape[0]
    if resume is None:
        nsp, R = r0.shape
    else:
        nsp, R = resume.Q.shape[0], resume.Q.shape[2]

    if resume is None:
        k0 = 0
        beta = jnp.linalg.norm(r0, axis=0)                  # (R,)
        beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
        Q0 = jnp.zeros((nsp, maxit + 1, R), dtype).at[:, 0, :].set(
            jnp.where(beta > 0, r0 / beta_safe, jnp.zeros_like(r0)))
        H0 = jnp.zeros((maxit + 1, maxit, R), dtype)
        IMG0 = jnp.zeros((m_img, maxit, R), dtype)
        S0 = (jnp.zeros((nx, maxit, R), dtype)
              if solution == "image" else None)
        x0 = (jnp.zeros((nx, R), dtype) if x_offset is None
              else jnp.asarray(x_offset, dtype))
        active0 = beta > 0
        niters0 = jnp.zeros((R,), jnp.int32)
    else:
        k0 = resume.res_hist.shape[0]  # static: the prior run's maxit
        beta = resume.beta
        Q0, H0, IMG0 = resume.Q, resume.H, resume.IMG
        S0 = resume.S if solution == "image" else None
        x0 = resume.x
        active0 = resume.active
        if active0 is None:
            raise ValueError("batched resume needs the checkpointed "
                             "per-RHS active flags (result.active)")
        niters0 = resume.niters
    t = jnp.zeros((maxit + 1, R), dtype).at[0].set(beta)

    xt_norm = jnp.linalg.norm(x_true, axis=0)               # (R,) or scalar

    def body(carry, k):
        Q, H, x, active, niters, IMG, S = carry
        U = first_mm(Q[:, k, :])                            # (mid, R)
        W = second_mm(U)                                    # (nsp, R)
        IMG = IMG.at[:, k, :].set(U if img_stage == "first" else W)
        if solution == "image":
            S = S.at[:, k, :].set(U)
        # CGS2, both passes batched over R (einsum hits the MXU)
        Qn, Hn, breakdown = _batched_cgs2(Q, H, W, k, active)

        kdim = k + 1
        y = jax.vmap(project_solve, in_axes=(2, 1, None), out_axes=1)(
            Hn, t, kdim)                                    # (maxit, R)
        if solution == "image":
            xk = jnp.einsum("nkr,kr->nr", S, y)
        else:
            xk = jnp.einsum("nkr,kr->nr", Qn[:, :maxit, :], y)
        if x_offset is not None:
            xk = x_offset + xk
        res = jnp.linalg.norm(rhs - jnp.einsum("mkr,kr->mr", IMG, y),
                              axis=0) / b_norm
        err = jnp.linalg.norm(xk - x_true, axis=0) / xt_norm

        adopt = active
        x = jnp.where(adopt[None, :], xk, x)
        nan = jnp.asarray(jnp.nan, dtype)
        res_rec = jnp.where(adopt, res, nan)
        err_rec = jnp.where(adopt, err, nan)
        niters = jnp.where(adopt, kdim, niters)
        stop = breakdown | (res <= tol)
        active = active & ~stop
        return (Qn, Hn, x, active, niters, IMG, S), (res_rec, err_rec)

    carry0 = (Q0, H0, x0, active0, niters0, IMG0, S0)
    (Q, H, x, active_f, niters, IMG, S), (res_new, err_new) = jax.lax.scan(
        body, carry0, jnp.arange(k0, maxit, dtype=jnp.int32))
    if resume is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([resume.res_hist, res_new])
        err_hist = jnp.concatenate([resume.err_hist, err_new])
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta,
                       IMG=IMG, S=S, active=active_f)



def _batched_core_deferred(first_mm, second_mm, r0, rhs, b_norm,
                           project_solve, solution, x_true, maxit, tol,
                           img_stage, x_offset=None, select_lam=None):
    """Deferred-histories batched scan (the multi-RHS twin of
    ``_gmres_core_deferred``): the scan runs ONLY the Arnoldi expansion
    (SpMM + CGS2 + image stacking); the per-(k, RHS) projected solves
    become one batched post-scan solve, and the residual/error histories
    two big einsums.  The win scales with R: the in-scan fused residual
    reads the ENTIRE (m_img, maxit, R) image basis every iteration
    (~104 MB/iter at the CT bench R=8 — ~18% of device time), the
    deferred form reads it once.  Early exit of the ITERATION is traded
    away exactly as in the single-RHS mode (``tol`` honored post hoc) —
    right for fixed-budget serving solves.  No resume support.
    """
    dtype = rhs.dtype
    nsp, R = r0.shape
    m_img = rhs.shape[0]
    nx = x_true.shape[0]

    beta = jnp.linalg.norm(r0, axis=0)                      # (R,)
    beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
    t = jnp.zeros((maxit + 1, R), dtype).at[0].set(beta)
    Q0 = jnp.zeros((nsp, maxit + 1, R), dtype).at[:, 0, :].set(
        jnp.where(beta > 0, r0 / beta_safe, jnp.zeros_like(r0)))
    H0 = jnp.zeros((maxit + 1, maxit, R), dtype)
    xt_norm = jnp.linalg.norm(x_true, axis=0)

    def body(carry, k):
        Q, H, active = carry
        U = first_mm(Q[:, k, :])
        W = second_mm(U)
        img = U if img_stage == "first" else W              # (m_img, R)
        Qn, Hn, breakdown = _batched_cgs2(Q, H, W, k, active)
        zero = jnp.zeros((), dtype)
        img_rec = jnp.where(active[None, :], img, zero)
        s_rec = (jnp.where(active[None, :], U, zero)
                 if solution == "image" else None)
        ok = active
        bkd_rec = active & breakdown
        active = active & ~breakdown
        return (Qn, Hn, active), (img_rec, s_rec, ok, bkd_rec)

    (Q, H, _), (IMG_rows, S_rows, oks, bkds) = jax.lax.scan(
        body, (Q0, H0, beta > 0), jnp.arange(maxit, dtype=jnp.int32))
    IMG = jnp.moveaxis(IMG_rows, 0, 1)                      # (m_img, maxit, R)
    S = (jnp.moveaxis(S_rows, 0, 1) if solution == "image" else None)
    nsteps = jnp.sum(oks.astype(jnp.int32), axis=0)         # (R,)
    broke = jnp.any(bkds, axis=0)                           # (R,)

    ks = jnp.arange(1, maxit + 1, dtype=jnp.int32)
    if select_lam is not None:
        # gcv-final: ONE GCV selection per RHS (from its final projected
        # problem), then fixed-lambda Tikhonov solves for every k
        from hybrid_gmres_tpu.krylov.projected import (
            projected_tikhonov_solve)

        lam_r = select_lam(H, t, nsteps)                    # (R,)
        solve_rl = jax.vmap(
            lambda Hr, tr, l, kd: projected_tikhonov_solve(Hr, tr, l, kd),
            in_axes=(2, 1, 0, None), out_axes=1)
        Y = jax.vmap(lambda kd: solve_rl(H, t, lam_r, kd))(ks)
    else:
        solve_r = jax.vmap(project_solve, in_axes=(2, 1, None), out_axes=1)
        Y = jax.vmap(lambda kd: solve_r(H, t, kd))(ks)      # (k, maxit, R)

    # HIGHEST: the one-time post-scan einsums must reproduce the in-scan
    # per-iteration matvecs — at the TPU's DEFAULT f32 precision (bf16
    # passes) the reassociation differs by ~1e-3 on-chip; at HIGHEST the
    # band is the usual 2e-4 and the cost is a single pass over the bases
    hi = jax.lax.Precision.HIGHEST
    RES = rhs[:, None, :] - jnp.einsum("mkr,jkr->mjr", IMG, Y,
                                       precision=hi)
    res_full = jnp.linalg.norm(RES, axis=0) / b_norm        # (maxit, R)
    basis = S if solution == "image" else Q[:, :maxit, :]
    X = jnp.einsum("nkr,jkr->njr", basis, Y, precision=hi)  # (nx, maxit, R)
    if x_offset is not None:
        X = X + x_offset[:, None, :]
    err_full = jnp.linalg.norm(X - x_true[:, None, :], axis=0) / xt_norm

    valid = ks[:, None] <= nsteps[None, :]
    hit = valid & (res_full <= tol)
    any_hit = jnp.any(hit, axis=0)
    first_hit = jnp.argmax(hit, axis=0) + 1                 # (R,)
    niters = jnp.where(any_hit, first_hit.astype(jnp.int32), nsteps)
    rec = ks[:, None] <= niters[None, :]
    nan = jnp.asarray(jnp.nan, dtype)
    res_hist = jnp.where(rec, res_full, nan)
    err_hist = jnp.where(rec, err_full, nan)
    slot = jnp.maximum(niters - 1, 0)
    # niters==0 fallback is the warm-start iterate (an exactly-converged
    # RHS must return x0, matching the in-scan core), not zero
    x_fall = (jnp.zeros((nx, R), dtype) if x_offset is None
              else jnp.asarray(x_offset, dtype))
    x = jax.vmap(lambda Xr, sl, ok_, xf: jnp.where(ok_, Xr[:, sl], xf),
                 in_axes=(2, 0, 0, 1), out_axes=1)(X, slot, niters > 0,
                                                   x_fall)
    # a breakdown on the FINAL iteration still counts in nsteps but the
    # equivalent in-scan run ends inactive — exclude it, or a resumed
    # solve would iterate on the zero Krylov vector
    active_f = (nsteps == maxit) & ~any_hit & ~broke
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta,
                       IMG=IMG, S=S, active=active_f)


def _chunk_slices(R, chunk_rhs):
    if chunk_rhs is None or chunk_rhs >= R:
        return [slice(None)]
    c = int(chunk_rhs)
    if c < 1:
        raise ValueError("chunk_rhs must be >= 1")
    return [slice(i, min(i + c, R)) for i in range(0, R, c)]


def _concat_results(parts):
    if len(parts) == 1:
        return parts[0]

    def cat(vals, axis):
        return None if vals[0] is None else jnp.concatenate(vals, axis)

    return GMRESResult(
        x=cat([p.x for p in parts], 1),
        err_hist=cat([p.err_hist for p in parts], 1),
        res_hist=cat([p.res_hist for p in parts], 1),
        niters=cat([p.niters for p in parts], 0),
        Q=cat([p.Q for p in parts], 2),
        H=cat([p.H for p in parts], 2),
        beta=cat([p.beta for p in parts], 0),
        IMG=cat([p.IMG for p in parts], 2),
        S=cat([p.S for p in parts], 2),
        active=cat([p.active for p in parts], 0),
    )


def _slice_result(res: GMRESResult, sl):
    if res is None:
        return None
    return GMRESResult(
        x=res.x[:, sl], err_hist=res.err_hist[:, sl],
        res_hist=res.res_hist[:, sl], niters=res.niters[sl],
        Q=res.Q[:, :, sl], H=res.H[:, :, sl], beta=res.beta[sl],
        IMG=None if res.IMG is None else res.IMG[:, :, sl],
        S=None if res.S is None else res.S[:, :, sl],
        active=None if res.active is None else res.active[sl],
    )


def _batched_solver(kind, A, B, b, x_true, tol, maxit, lam, gcv_grid,
                    x0, resume_from, chunk_rhs, defer_histories=False):
    A = as_operator(A)
    B = as_operator(B)
    if b.ndim != 2:
        raise ValueError(f"{kind}_gmres_batched expects b of shape (m, R); "
                         f"use {kind}_gmres for a single RHS")
    if maxit is None:
        maxit = min(A.shape)
    maxit = int(maxit)
    m, n = A.shape
    R = b.shape[1]
    dtype = b.dtype
    if x_true is None:
        xt = jnp.full((n, R), jnp.nan, dtype)
    else:
        xt = jnp.broadcast_to(
            jnp.asarray(x_true, dtype).reshape(n, -1), (n, R))
    if x0 is not None:
        x0 = jnp.broadcast_to(jnp.asarray(x0, dtype).reshape(n, -1), (n, R))
    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    resume_fingerprint)

    if resume_from is not None:
        check_fingerprint(resume_from, x0, lam)
        if defer_histories:
            raise ValueError("defer_histories does not support resume_from")
        if resume_from.IMG is None or (kind == "ab" and resume_from.S is
                                       None):
            raise ValueError("resume_from must come from the batched "
                             "fused solver (missing .IMG/.S)")
        resume_from = _pad_batched(resume_from, maxit)

    trace_dim = n if kind == "ba" else m
    gcv_final = isinstance(lam, str) and lam == "gcv-final"
    if gcv_final:
        if not defer_histories:
            raise ValueError(
                "lam='gcv-final' requires defer_histories=True — it "
                "selects lambda once per RHS from the final projected "
                "problem, which only exists post-scan (the serving mode); "
                "use lam='gcv' for per-iteration adaptive selection")
        project_solve = None
        select_lam = _make_select_lam(trace_dim, gcv_grid)
    else:
        _ps = _make_project_solve(lam, trace_dim, gcv_grid)
        project_solve = lambda H, t, kdim: _ps(H, None, t, kdim)
        select_lam = None
    b_norm = jnp.linalg.norm(b, axis=0)

    parts = []
    for sl in _chunk_slices(R, chunk_rhs):
        b_c = b[:, sl]
        x0_c = None if x0 is None else x0[:, sl]
        rs_c = None if resume_from is None else _slice_result(resume_from,
                                                              sl)
        rhs_c = b_c if x0_c is None else b_c - A.matmat(x0_c)
        core = _batched_core_deferred if defer_histories else _batched_core
        extra = ({"select_lam": select_lam} if defer_histories
                 else {"resume": rs_c})
        if kind == "ba":
            # r0 only seeds a COLD start; on resume the SpMM would be
            # dead compute outside jit
            r0_c = None if rs_c is not None else B.matmat(rhs_c)
            part = core(
                first_mm=A.matmat, second_mm=B.matmat, r0=r0_c, rhs=rhs_c,
                b_norm=b_norm[sl], project_solve=project_solve,
                solution="basis", x_true=xt[:, sl], maxit=maxit, tol=tol,
                img_stage="first", x_offset=x0_c, **extra)
        else:
            part = core(
                first_mm=B.matmat, second_mm=A.matmat, r0=rhs_c, rhs=rhs_c,
                b_norm=b_norm[sl], project_solve=project_solve,
                solution="image", x_true=xt[:, sl], maxit=maxit, tol=tol,
                img_stage="second", x_offset=x0_c, **extra)
        parts.append(part)
    res = _concat_results(parts)
    if x_true is None:
        res = res._replace(err_hist=jnp.full_like(res.err_hist, jnp.nan))
    return res._replace(fp=resume_fingerprint(x0, lam))


def ba_gmres_batched(
    A,
    B,
    b,
    x_true=None,
    tol: float = 0.0,
    maxit: int | None = None,
    lam=None,
    gcv_grid=None,
    x0=None,
    resume_from: GMRESResult | None = None,
    chunk_rhs: int | None = 8,
    defer_histories: bool = False,
) -> GMRESResult:
    """Batched (hybrid) BA-GMRES over R right-hand sides.

    ``b``: (m, R).  ``x_true``: optional (n, R) (or (n,) broadcast).
    Returns a :class:`GMRESResult` with a trailing batch axis: ``x`` (n,
    R), histories (maxit, R), ``niters`` (R,), ``Q`` (n, maxit+1, R), ``H``
    (maxit+1, maxit, R), ``beta``/``active`` (R,).  ``lam``: None / scalar
    / "gcv" (adaptive per RHS and per iteration — ~10x the fixed-lambda
    cost, DESIGN §13) / "gcv-final" (adaptive per RHS, selected ONCE from
    the final projected problem — the serving-grade mode at ~fixed-lambda
    cost; requires ``defer_histories=True``).

    ``x0``: optional (n, R) (or (n,) broadcast) warm start — per RHS
    ``r0 = B (b - A x0)``, ``x = x0 + Q y``, matching single-RHS
    ``ba_gmres(x0=...)``; the serving move is passing frame t-1's solution
    as frame t's ``x0`` (measured iterations-to-quality saving in DESIGN
    §13).  ``resume_from``: a prior result of THIS solver — continues
    every RHS's Arnoldi recurrence exactly (pass the same ``x0``/``lam``/
    ``chunk_rhs``).  ``chunk_rhs``: R is auto-split into scans of at most
    this many RHS (default 8 — measured aggregate-throughput optimum;
    None disables chunking).  ``defer_histories``: Arnoldi-only scan +
    batched post-scan solves/histories (same numbers; trades in-iteration
    early exit for not re-reading the (m, maxit, R) image basis every
    iteration — the serving fixed-budget mode, DESIGN §13)."""
    return _batched_solver("ba", A, B, b, x_true, tol, maxit, lam, gcv_grid,
                           x0, resume_from, chunk_rhs, defer_histories)


def ab_gmres_batched(
    A,
    B,
    b,
    x_true=None,
    tol: float = 0.0,
    maxit: int | None = None,
    lam=None,
    gcv_grid=None,
    x0=None,
    resume_from: GMRESResult | None = None,
    chunk_rhs: int | None = 8,
    defer_histories: bool = False,
) -> GMRESResult:
    """Batched (hybrid) AB-GMRES over R right-hand sides (m-space Krylov
    bases, solution composed from the stored ``B q_k`` images; per-RHS
    ``r0 = b - A x0``, ``x = x0 + S y``).  See :func:`ba_gmres_batched`
    for ``x0``/``resume_from``/``chunk_rhs``/``defer_histories``."""
    return _batched_solver("ab", A, B, b, x_true, tol, maxit, lam, gcv_grid,
                           x0, resume_from, chunk_rhs, defer_histories)
