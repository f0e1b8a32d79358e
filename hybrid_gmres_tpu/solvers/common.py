"""Shared solver result pytrees and the generic GMRES scan core.

All solvers share the reference's uniform result convention
(``x, err_hist, res_hist, niters`` — e.g. ``ABgmres_hybrid_bounds.m:1-2``)
but as fixed-shape pytrees: histories have static length ``maxit`` with NaN
beyond ``niters`` instead of MATLAB's dynamic truncation, so results stack
under ``vmap`` (lambda sweeps) and cross jit boundaries.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.krylov.arnoldi import (
    arnoldi,
    arnoldi_orthogonalize,
    arnoldi_step,
)


class FusedResidual(NamedTuple):
    """Spec for the fused (stored-image) exact-residual mode.

    The Krylov matvec is a two-stage composition ``w = second(first(q))``
    (BA: ``B(A q)``; AB: ``A(B q)``).  Storing the per-step images lets the
    per-iteration TRUE residual ``||b - A x_k||`` be formed as a small matmul
    against the stored image basis instead of an extra SpMV — exactly equal
    (up to float reassociation) to the explicit recomputation the reference
    does each iteration (``BAgmres_hybrid_bounds.m:39``):

      * BA-GMRES: ``x = Q y`` so ``A x = (A Q) y``; store ``u_k = A q_k``
        (first-stage output) -> saves the residual SpMV (1 of 3 per iter).
      * AB-GMRES: ``x = B Q y`` so ``A x = (A B Q) y``; store the raw
        ``w_k = A (B q_k)`` (second-stage output, pre-orthogonalization) for
        the residual AND ``s_k = B q_k`` for the solution ``x = S y`` ->
        saves both the solution SpMV and the residual SpMV (2 of 4 per iter).
    """
    first_mv: Callable        # q -> first-stage image (BA: A q; AB: B q)
    second_mv: Callable       # first image -> Krylov vector w
    rhs: jax.Array            # image-space RHS: b, or b - A x0 when x0 != 0
    rhs_norm: jax.Array       # ||b|| (residual denominator, always vs b)
    img: str = "first"        # which stage's image spans A x ("first"/"second")
    solution_from_image: bool = False  # AB: x = (first images) @ y
    x_offset: Optional[jax.Array] = None  # x0 added to the image solution


class GMRESResult(NamedTuple):
    x: jax.Array          # final iterate (at iteration `niters`)
    err_hist: jax.Array   # (maxit,) relative error per iteration, NaN beyond niters
    res_hist: jax.Array   # (maxit,) relative residual per iteration
    niters: jax.Array     # int32: last iteration entered (1-based)
    Q: jax.Array          # (n_or_m, maxit+1) padded Krylov basis
    H: jax.Array          # (maxit+1, maxit) padded Hessenberg
    beta: jax.Array       # ||r0||
    # Stored image bases of residual="fused" runs (None otherwise): IMG
    # holds the per-step operator images spanning A x, S the first-stage
    # images when the solution is image-composed (AB).  Checkpointing them
    # makes fused runs resumable (utils/checkpoint.py).
    IMG: Optional[jax.Array] = None   # (m_img, maxit)
    S: Optional[jax.Array] = None     # (x_shape, maxit), AB fused only
    # Final scan active flag (bool scalar; None on legacy checkpoints /
    # non-scan paths): a stopped run (tol or breakdown) must resume
    # INACTIVE even when the stop landed exactly on the last budgeted
    # iteration — inferring from niters alone cannot tell that case apart.
    active: Optional[jax.Array] = None
    # (2,) fingerprint of the solve's (x0, lam) pair
    # (utils.checkpoint.resume_fingerprint): resuming with a DIFFERENT
    # x0/lam silently corrupts (the checkpoint stores neither), so the
    # resume paths verify this when both sides are concrete.  None on
    # legacy checkpoints.
    fp: Optional[jax.Array] = None


class GKBState(NamedTuple):
    """Checkpointable GKB recurrence state (LSQR/LSMR resume).

    ``carry`` is the raw scan carry at the last completed iteration
    (vectors + rotation scalars + active/niters, plus the stored bases when
    ``reorth=True``); the histories are the UNPATCHED records (LSQR's final
    true-residual patch is re-applied after resume so
    ``resume(run(maxit=k), maxit=K) == run(maxit=K)`` exactly)."""

    carry: tuple
    res_hist: jax.Array
    err_hist: jax.Array
    ar_hist: Optional[jax.Array] = None
    fp: Optional[jax.Array] = None  # (x0, lam) fingerprint (see GMRESResult)


class GKBResult(NamedTuple):
    x: jax.Array
    err_hist: jax.Array
    res_hist: jax.Array
    niters: jax.Array
    ar_hist: Optional[jax.Array] = None  # LSMR only: ||A^T r|| history
    state: Optional[GKBState] = None     # resume checkpoint (GKB family)


def gmres_core(
    krylov_mv: Callable,
    r0: jax.Array,
    project_solve: Callable,  # (H, Q, t, kdim) -> padded y of length maxit
    solution_fn: Callable,    # (Q, y) -> x
    residual_fn: Callable,    # x -> relative residual
    error_fn: Callable,       # x -> relative error (may return NaN)
    maxit: int,
    tol: float,
    x_shape: int,
    breakdown_tol: float = 0.0,
    history: bool = True,
    resume_from: "GMRESResult | None" = None,
    x_init=None,
    residual: str = "true",
    fused: "FusedResidual | None" = None,
    defer_histories: bool = False,
    basis_dtype=None,
) -> GMRESResult:
    """Generic preconditioned-GMRES scan shared by AB/BA x {non,}hybrid x PTR/RTP.

    Reference loop shape: Arnoldi expand -> projected solve -> residual/error
    tracking -> early exit on ``res <= tol`` or breakdown
    (``BAgmres_hybrid_bounds.m:24-80``).  Runs as one ``lax.scan`` with an
    active mask; with ``history=False`` the per-iteration projected solves are
    skipped and only the final solution is formed (benchmark mode).

    ``residual``: "true" recomputes ``||b - A x_k||`` each iteration with an
    explicit matvec (reference parity, ``BAgmres_hybrid_bounds.m:39``);
    "estimate" uses the projected LS residual ``||t - Hbar y|| / beta`` —
    the M-space residual, free of matvecs (~30% fewer operator applications
    per iteration; the stopping test then acts in the preconditioned norm);
    "fused" computes the SAME true residual as "true" but from stored
    per-step operator images (see :class:`FusedResidual`) — no extra SpMV,
    identical values up to float reassociation.

    ``basis_dtype``: storage dtype for the LARGE per-iteration arrays (the
    Krylov basis ``Q`` and the fused image bases ``IMG``/``S``) — e.g.
    ``jnp.bfloat16`` halves their HBM traffic (CGS2 reads the full basis
    four times per iteration, the fused residual reads ``IMG`` once); all
    arithmetic still runs in the working dtype (MXU reads bf16 natively,
    f32 accumulation), only the stored columns are rounded.  ``None``
    (default) stores in the working dtype.  Measured on the CT bench the
    rounding is far below the data noise (DESIGN §10).

    ``defer_histories`` (requires ``residual="fused"``): the scan body runs
    ONLY the Arnoldi expansion (SpMV + CGS2 + image store); the per-k
    projected solves become one batched (vmapped) solve after the scan and
    the residual/error histories two big matmuls + column norms.  Turns
    maxit sequential small-kernel solves into MXU-shaped batches — same
    numbers as the masked scan (each padded ``y_k`` is zero beyond k, so
    ``IMG @ y_k`` touches exactly the same columns).  The trade: no early
    exit of the ITERATION (all maxit Arnoldi steps run; ``tol`` is still
    honored in the reported ``niters``/``x``/NaN-masking, computed post
    hoc), so use it when maxit ~ niters (benchmark/production fixed-budget
    solves; the reference regime per DESIGN.md §9 measurements).
    """
    if residual not in ("true", "estimate", "fused"):
        raise ValueError("residual must be 'true', 'estimate' or 'fused'")
    if basis_dtype is not None and residual != "fused":
        raise ValueError("basis_dtype requires residual='fused' (the "
                         "production path; other modes hand basis columns "
                         "straight to the operator)")
    if defer_histories:
        if residual != "fused":
            raise ValueError("defer_histories requires residual='fused'")
        if resume_from is not None or not history:
            raise ValueError("defer_histories requires history=True and no "
                             "resume_from")
    if residual == "fused":
        if fused is None:
            raise ValueError("residual='fused' requires a FusedResidual spec")
        if not history:
            raise ValueError("residual='fused' requires history=True (with "
                             "history=False only one final residual is "
                             "computed; use residual='true')")
        if resume_from is not None and resume_from.IMG is None:
            raise ValueError(
                "residual='fused' resume needs a checkpoint from a fused "
                "run (resume_from.IMG is the stored image basis)")
    dtype = r0.dtype
    bdt = dtype if basis_dtype is None else jnp.dtype(basis_dtype)
    n = r0.shape[0]

    if not history:
        if resume_from is not None:
            raise ValueError("resume_from requires history=True")
        beta = jnp.linalg.norm(r0)
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)
        Q, H, beta_, nsteps = arnoldi(krylov_mv, r0, maxit, breakdown_tol)
        y = project_solve(H, Q, t, nsteps)
        x = solution_fn(Q, y)
        res = residual_fn(x)
        err = error_fn(x)
        slot = jnp.maximum(nsteps - 1, 0)
        ok = nsteps > 0
        nan = jnp.asarray(jnp.nan, dtype)
        res_hist = jnp.full((maxit,), jnp.nan, dtype=dtype).at[slot].set(
            jnp.where(ok, res, nan))
        err_hist = jnp.full((maxit,), jnp.nan, dtype=dtype).at[slot].set(
            jnp.where(ok, err, nan))
        return GMRESResult(x, err_hist, res_hist, nsteps, Q, H, beta_)

    if resume_from is not None:
        # Continue the Arnoldi recurrence from a saved factorization
        # (utils/checkpoint.py): identical numbers to an uninterrupted run.
        from hybrid_gmres_tpu.utils.checkpoint import (check_resumable,
                                                        pad_state)

        check_resumable(resume_from)
        rs = pad_state(resume_from, maxit)
        k0 = int(resume_from.niters)
        beta = rs.beta
        Q0, H0, x0 = rs.Q.astype(bdt), rs.H, rs.x
        prior_res, prior_err = rs.res_hist, rs.err_hist
    else:
        k0 = 0
        beta = jnp.linalg.norm(r0)
        beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
        Q0 = jnp.zeros((n, maxit + 1), dtype=bdt).at[:, 0].set(
            jnp.where(beta > 0, r0 / beta_safe,
                      jnp.zeros_like(r0)).astype(bdt))
        H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        x0 = (jnp.zeros((x_shape,), dtype=dtype) if x_init is None
              else jnp.asarray(x_init, dtype=dtype))
    t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

    if defer_histories:
        return _gmres_core_deferred(
            fused, project_solve, solution_fn, error_fn, maxit, tol,
            x_shape, breakdown_tol, Q0, H0, t, beta, dtype, bdt)

    if residual == "fused":
        if resume_from is not None:
            IMG0 = rs.IMG
            S0 = rs.S if fused.solution_from_image else None
            if fused.solution_from_image and S0 is None:
                raise ValueError("fused resume of an image-composed (AB) "
                                 "run needs resume_from.S")
            IMG0 = IMG0.astype(bdt)
            S0 = None if S0 is None else S0.astype(bdt)
        else:
            IMG0 = jnp.zeros((fused.rhs.shape[0], maxit), dtype=bdt)
            S0 = (jnp.zeros((x_shape, maxit), dtype=bdt)
                  if fused.solution_from_image else None)
    else:
        IMG0, S0 = None, None

    def body(carry, k):
        Q, H, x, active, niters, IMG, S = carry
        if residual == "fused":
            u = fused.first_mv(Q[:, k].astype(dtype))
            w = fused.second_mv(u)
            IMG = IMG.at[:, k].set(
                (u if fused.img == "first" else w).astype(IMG.dtype))
            if fused.solution_from_image:
                S = S.at[:, k].set(u.astype(S.dtype))
            st = arnoldi_orthogonalize(Q, H, k, w, breakdown_tol)
        else:
            st = arnoldi_step(krylov_mv, Q, H, k, breakdown_tol)
        Qn = jax.lax.select(active, st.Q, Q)
        Hn = jax.lax.select(active, st.H, H)
        breakdown = st.breakdown
        kdim = k + 1
        y = project_solve(Hn, Qn, t, kdim)
        if residual == "fused" and fused.solution_from_image:
            xk = S @ y if fused.x_offset is None else fused.x_offset + S @ y
        else:
            xk = solution_fn(Qn, y)
        if residual == "true":
            res_k = residual_fn(xk)
        elif residual == "fused":
            res_k = jnp.linalg.norm(fused.rhs - IMG @ y) / fused.rhs_norm
        else:
            res_k = jnp.linalg.norm(t - Hn @ y) / beta
        err_k = error_fn(xk)
        # On (lucky) breakdown the Krylov space is invariant, so the
        # projected solve at this k is exact — adopt it, then stop.  (The
        # reference breaks *before* the solve, ``ABgmres_nonhybrid_bounds.m:
        # 31``, leaving xk from the previous iteration — and would crash on a
        # first-iteration breakdown; adopting is strictly more correct.)
        adopt = active
        x = jax.lax.select(adopt, xk, x)
        nan = jnp.asarray(jnp.nan, dtype)
        res_rec = jnp.where(adopt, res_k, nan)
        err_rec = jnp.where(adopt, err_k, nan)
        niters = jnp.where(adopt, kdim, niters)
        stop = breakdown | (res_k <= tol)
        active = active & ~stop
        return (Qn, Hn, x, active, niters, IMG, S), (res_rec, err_rec)

    if resume_from is not None:
        # A run that exhausted its budget resumes active; one that STOPPED
        # (tol hit or breakdown) resumes inactive, so resume(run(k), K) ==
        # run(K) exactly even across a stop (the uninterrupted run records
        # nothing after its stopping iteration).  Prefer the checkpointed
        # flag; fall back to the niters heuristic for legacy checkpoints
        # (which cannot distinguish a stop ON the final iteration).
        if resume_from.active is not None:
            start_active = jnp.asarray(resume_from.active, bool)
        else:
            start_active = jnp.bool_(k0 == resume_from.res_hist.shape[0])
    else:
        start_active = beta > 0
    (Q, H, x, active_f, niters, IMG_f, S_f), (res_hist, err_hist) = \
        jax.lax.scan(
            body,
            (Q0, H0, x0, start_active, jnp.int32(k0), IMG0, S0),
            jnp.arange(k0, maxit, dtype=jnp.int32),
        )
    if k0 > 0:
        res_hist = jnp.concatenate([prior_res[:k0], res_hist])
        err_hist = jnp.concatenate([prior_err[:k0], err_hist])
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta,
                       IMG=IMG_f, S=S_f, active=active_f)


def _gmres_core_deferred(fused, project_solve, solution_fn, error_fn, maxit,
                         tol, x_shape, breakdown_tol, Q0, H0, t, beta, dtype,
                         bdt=None):
    """Deferred-histories fused GMRES: Arnoldi-only scan, then batched
    projected solves and matmul-shaped histories (see ``gmres_core``).
    ``bdt``: storage dtype for the stacked image/solution rows (the
    ``basis_dtype`` option — keeps the deferred mode's IMG/S consistent
    with the in-scan mode's)."""
    if bdt is None:
        bdt = dtype

    def body(carry, k):
        Q, H, active = carry
        u = fused.first_mv(Q[:, k].astype(dtype))
        w = fused.second_mv(u)
        img = u if fused.img == "first" else w
        st = arnoldi_orthogonalize(Q, H, k, w, breakdown_tol)
        Qn = jax.lax.select(active, st.Q, Q)
        Hn = jax.lax.select(active, st.H, H)
        zero = jnp.zeros((), dtype)
        img_rec = jnp.where(active, img, zero).astype(bdt)
        s_rec = (jnp.where(active, u, zero).astype(bdt)
                 if fused.solution_from_image else None)
        ok = active
        bkd = active & st.breakdown
        active = active & ~st.breakdown
        return (Qn, Hn, active), (img_rec, s_rec, ok, bkd)

    (Q, H, _), (IMG_rows, S_rows, oks, bkds) = jax.lax.scan(
        body, (Q0, H0, beta > 0), jnp.arange(maxit, dtype=jnp.int32))
    IMG = IMG_rows.T                              # (m_img, maxit)
    nsteps = jnp.sum(oks.astype(jnp.int32))
    broke = jnp.any(bkds)

    ks = jnp.arange(1, maxit + 1, dtype=jnp.int32)
    Y = jax.vmap(lambda kd: project_solve(H, Q, t, kd))(ks)  # (maxit, maxit)

    # HIGHEST: the one-time post-scan products must reproduce the in-scan
    # per-iteration matvecs — at the TPU's DEFAULT f32 precision (bf16
    # passes) the reassociation differs by ~1e-3 on-chip; at HIGHEST the
    # band is the usual 2e-4 and the cost is a single pass over the bases
    # (same fix as the batched twin, solvers/batched.py).
    hi = jax.lax.Precision.HIGHEST
    RES = fused.rhs[:, None] - jnp.matmul(IMG, Y.T, precision=hi)
    res_full = jnp.linalg.norm(RES, axis=0) / fused.rhs_norm
    if fused.solution_from_image:
        X = jnp.matmul(S_rows.T, Y.T, precision=hi)  # (x_shape, maxit)
        if fused.x_offset is not None:
            X = X + fused.x_offset[:, None]
    else:
        with jax.default_matmul_precision("highest"):
            X = jax.vmap(lambda y: solution_fn(Q, y), out_axes=1)(Y)
    err_full = jax.vmap(error_fn, in_axes=1)(X)

    # Post-hoc stopping: the first k with res <= tol (if tol > 0), bounded
    # by the Arnoldi breakdown point — same niters/x/NaN-masking as the
    # masked scan.
    valid = ks <= nsteps
    hit = valid & (res_full <= tol)
    any_hit = jnp.any(hit)
    first_hit = jnp.argmax(hit) + 1               # 1-based k of first hit
    niters = jnp.where(any_hit, first_hit.astype(jnp.int32), nsteps)
    rec = ks <= niters
    nan = jnp.asarray(jnp.nan, dtype)
    res_hist = jnp.where(rec, res_full, nan)
    err_hist = jnp.where(rec, err_full, nan)
    slot = jnp.maximum(niters - 1, 0)
    x = jnp.where(niters > 0, X[:, slot], jnp.zeros((x_shape,), dtype))
    # the active flag an equivalent masked scan would end with: ran the
    # full budget and never hit tol — a breakdown ON the final iteration
    # still counts in nsteps but must end inactive (ADVICE-class bug
    # found in the batched twin, fixed in both)
    active_f = (nsteps == maxit) & ~any_hit & ~broke
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta, IMG=IMG,
                       S=S_rows.T if fused.solution_from_image else None,
                       active=active_f)


def safe_normalize(vec):
    """(vec/||vec||, ||vec||, ok): zero vectors normalize to zero, ok=False."""
    nrm = jnp.linalg.norm(vec)
    ok = nrm > 0
    safe = jnp.where(ok, nrm, jnp.ones((), vec.dtype))
    return jnp.where(ok, vec / safe, jnp.zeros_like(vec)), nrm, ok


def rel_residual_fn(A_op, b):
    bnorm = jnp.linalg.norm(b)

    def f(x):
        return jnp.linalg.norm(b - A_op.matvec(x)) / bnorm

    return f


def rel_error_fn(x_true):
    if x_true is None:
        return lambda x: jnp.asarray(jnp.nan, x.dtype)
    xt_norm = jnp.linalg.norm(x_true)

    def f(x):
        return jnp.linalg.norm(x - x_true) / xt_norm

    return f


def grow_stored_bases(carry, maxit, idx):
    """Pad the stored reorth bases of a resumed carry out to the new
    ``maxit + 1`` budget along axis 1 (rank-agnostic: (space, k) sharded
    bases and (space, k, R) batched bases alike).  ``idx``: positions of
    the basis leaves in the carry tuple."""
    carry = list(carry)
    for i in idx:
        extra = maxit + 1 - carry[i].shape[1]
        if extra > 0:
            pad = (((0, 0), (0, extra)) +
                   ((0, 0),) * (carry[i].ndim - 2))
            carry[i] = jnp.pad(carry[i], pad)
    return tuple(carry)
