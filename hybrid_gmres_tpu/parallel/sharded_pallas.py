"""Fully-sharded BA/AB-GMRES with scale-aware Pallas block-ELL SpMV.

Local compute is the SAME tuned bucketed block-ELL format as the
single-chip production path (``ops/spmv_pallas.py``; panels built by
``parallel/panels.py`` with per-bucket padding, per-operator row groups and
any caller-applied Morton ordering).  The per-iteration communication
schedule (mirroring the reference's hot loop ``BAgmres_hybrid_bounds.m:
24-40`` at scale) is:

  * one **x gather** for the A-side matvec — windowed ppermute hops when the
    panel's static column support allows (L*n/p bytes, constant in mesh size
    for banded operators), else one all_gather ((p-1)*n/p bytes);
  * one **reduce_scatter** of the n-vector for the column-partitioned B
    product ((p-1)*n/p bytes — half the round-1 psum-then-slice);
  * one fused psum of all k+1 CGS2 coefficients per orthogonalization pass
    (the reference's sequential MGS loop would need k round-trips);
  * scalar psums for norms, with the TRUE residual formed from the stored
    per-iteration images ``A q_k`` (no extra SpMV, no extra collective).

``parallel.panels.comms_bytes_per_iteration`` gives the analytic volume;
see DESIGN.md for the measured/analytic table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.solvers.gmres import _make_project_solve
from hybrid_gmres_tpu.parallel.panels import (
    ShardedPanels,
    gather_window,
    local_matvec,
    local_rmatvec_window,
    scatter_window_to_full,
    shard_bucketed_panels,
)
from hybrid_gmres_tpu.solvers.common import GMRESResult

__all__ = [
    "ShardedPanels",
    "shard_bucketed_panels",
    "ba_gmres_sharded_pallas",
    "ab_gmres_sharded_pallas",
    "ba_gmres_sharded_pallas_restarted",
    "ab_gmres_sharded_pallas_restarted",
]


def _validate(A_panels: ShardedPanels, BT_panels, mesh, axis,
              B_panels=None):
    p = mesh.devices.size
    m, n = A_panels.shape
    if BT_panels is None and B_panels is None:
        raise ValueError("need BT_panels (transposed layout) or B_panels "
                         "(forward layout) for the back-projector")
    if BT_panels is not None and BT_panels.shape != (m, n):
        raise ValueError(
            f"BT panels must cover the transposed back-projector as (m, n)="
            f"{(m, n)}; got {BT_panels.shape}")
    if B_panels is not None and B_panels.shape != (n, m):
        raise ValueError(
            f"B panels must cover the back-projector as (n, m)={(n, m)}; "
            f"got {B_panels.shape}")
    for nm, pl in (("A", A_panels), ("BT", BT_panels), ("B", B_panels)):
        if pl is not None and pl.p != p:
            raise ValueError(f"{nm} panels built for p={pl.p}, mesh has {p}")
    if m % p or n % p:
        raise ValueError(f"mesh size {p} must divide m={m} and n={n}")
    return p, m, n


def _make_B_mv(B_loc, b_forward, axis, dtype, interpret, comm_dtype=None):
    """Shard-local ``u (m-sharded) -> B u (n-sharded)`` in one of two
    layouts (DESIGN §12):

      * ``transposed`` (default): ``B_loc`` holds this shard's ray-major
        rows of B^T; the transposed kernel produces a window-relative
        n-space partial that one ``psum_scatter`` ((p-1)*n/p bytes) lands
        on the n-sharded basis.  No gather of u, but the transposed
        kernel's accumulation chain is ~25% slower than the forward one.
      * ``forward``: ``B_loc`` holds this shard's PIXEL rows of B itself
        (``shard_bucketed_panels(B_csr, p)``) — the exact single-chip
        kernel configuration (``ct_tpu_operators`` applies B forward).
        Costs one gather of the m-sharded u ((p-1)*m/p bytes, or windowed)
        and NO reduction: each shard's forward kernel emits its own n/p
        pixel slab directly.  Trades wire bytes (m >> n for CT) for the
        faster kernel — on ICI the extra gather is microseconds while the
        kernel saving is the per-shard throughput gap (VERDICT r3 #1).
    """
    if b_forward:
        def B_mv(u_loc):
            u_win = gather_window(B_loc, u_loc, axis, comm_dtype=comm_dtype)
            return local_matvec(B_loc, u_win,
                                interpret=interpret).astype(dtype)
    else:
        def B_mv(u_loc):
            part = local_rmatvec_window(B_loc, u_loc, interpret=interpret)
            full = scatter_window_to_full(B_loc, part).astype(dtype)
            return jax.lax.psum_scatter(full, axis, scatter_dimension=0,
                                        tiled=True)
    return B_mv


def ba_gmres_sharded_pallas(
    A_panels: ShardedPanels,
    BT_panels: ShardedPanels | None,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    gcv_grid=None,
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
    x0=None,
    resume_from: GMRESResult | None = None,
    B_panels: ShardedPanels | None = None,
    comm_dtype=None,
) -> GMRESResult:
    """Fully-sharded (hybrid) BA-GMRES with Pallas local SpMV on every shard.

    ``A_panels``: sharded panels of A (m x n, ray rows).  ``BT_panels``:
    sharded panels of B^T's ray-major row slabs, i.e.
    ``shard_bucketed_panels(B.T.tocsr(), p)`` — B itself is applied through
    the transposed kernel, and its window-relative partial is
    reduce-scattered straight onto the n-sharded basis.  The TRUE residual
    comes from the stored A q_k images (2 SpMVs/iteration).
    ``B_panels``: OPTIONAL forward-layout back-projector panels
    (``shard_bucketed_panels(B_csr, p)``, B's own pixel rows) — when given,
    B is applied through the FORWARD kernel (the single-chip configuration)
    at the cost of gathering the m-sharded intermediate instead of
    reduce-scattering the n-vector; ``BT_panels`` may then be ``None``.
    See ``_make_B_mv`` for the trade.
    ``comm_dtype`` (e.g. ``jnp.bfloat16``): exchange the gathered basis
    slabs in a narrower wire dtype — halves the dominant gather bytes for
    full-support operators (DESIGN §8 lever (a)); local compute stays
    f32.  Expect a ~4e-3 tolerance band vs the f32-exchange run.
    ``lam``: None (non-hybrid), scalar (hybrid PTR), or "gcv" (per-iteration
    GCV-optimal lambda over ``gcv_grid``, evaluated shard-replicated with no
    extra collectives).
    ``x0``: optional n-length (replicated) warm start — ``r0 = B (b - A
    x0)``, ``x = x0 + Q y`` (the restart building block).
    ``resume_from``: a prior result of THIS solver — the sharded basis Q,
    Hessenberg, iterate and stored image basis (``.IMG``, always recorded
    by the fused-residual schedule) continue the Arnoldi recurrence exactly
    (pass the same ``x0``/``lam``).  State stays sharded across the
    checkpoint boundary.
    ``interpret=True`` runs the kernels in Pallas interpret mode (CPU mesh
    tests)."""
    if mesh is None:
        from hybrid_gmres_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis)
    maxit = int(maxit)
    p, m, n = _validate(A_panels, BT_panels, mesh, axis, B_panels)
    b_forward = B_panels is not None
    Bp = B_panels if b_forward else BT_panels
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    resume_fingerprint)

    fp = resume_fingerprint(x0, lam)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)
    if resume_from is None:
        k0 = 0
    else:
        if resume_from.IMG is None:
            raise ValueError("resume_from must come from "
                             "ba_gmres_sharded_pallas (missing .IMG)")
        check_fingerprint(resume_from, x0 if have_x0 else None, lam)
        # Mirror gmres_core: continue from the last ADOPTED iteration, not
        # the old maxit — resuming a tol-stopped/broken-down run must not
        # scan over zero Krylov columns (self-review r3).
        from hybrid_gmres_tpu.utils.checkpoint import check_resumable

        check_resumable(resume_from)
        k0 = int(resume_from.niters)
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        # exhausted-budget runs resume active; stopped runs (tol/breakdown)
        # resume inactive — matches the uninterrupted run exactly (see
        # gmres_core)
        resumed_active = (bool(resume_from.active)
                          if resume_from.active is not None
                          else k0 == resume_from.res_hist.shape[0])
        from hybrid_gmres_tpu.utils.checkpoint import pad_state

        rs = pad_state(resume_from, maxit)

    def solver(A_loc, B_loc, b_loc, xt_loc, x0_loc, *carry_in):
        nloc = n // p
        mloc = m // p

        def pdot(u_loc, v_loc):
            return jax.lax.psum(jnp.dot(u_loc, v_loc), axis)

        def pnorm(u_loc):
            return jnp.sqrt(pdot(u_loc, u_loc))

        def A_mv(x_loc):
            """A @ x for n-sharded x: windowed gather + forward kernel."""
            x_win = gather_window(A_loc, x_loc, axis,
                                  comm_dtype=comm_dtype)
            return local_matvec(A_loc, x_win, interpret=interpret
                                ).astype(dtype)

        # (n/p,) slab of B @ u from the m-sharded u, forward or transposed
        B_mv_scatter = _make_B_mv(B_loc, b_forward, axis, dtype, interpret,
                                  comm_dtype=comm_dtype)

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)

        # warm start: residual image space shifts to rhs = b - A x0 (one
        # extra SpMV at setup only; x0=0 keeps rhs = b exactly)
        rhs_loc = b_loc - A_mv(x0_loc) if have_x0 else b_loc
        if carry_in:
            Q0, H0, xc0, niters0, IMG0, beta = carry_in
            active0 = jnp.bool_(resumed_active)
        else:
            r0_loc = B_mv_scatter(rhs_loc)
            beta = pnorm(r0_loc)
            # beta == 0 (already-converged warm start / zero RHS) must not
            # divide: normalize safely and start inactive, exactly as the
            # single-chip gmres_core does
            beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
            Q0 = jnp.zeros((nloc, maxit + 1), dtype=dtype).at[:, 0].set(
                jnp.where(beta > 0, r0_loc / beta_safe,
                          jnp.zeros_like(r0_loc)))
            H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
            xc0 = x0_loc + jnp.zeros((nloc,), dtype=dtype)
            niters0 = jnp.int32(0)
            IMG0 = jnp.zeros((mloc, maxit), dtype=dtype)
            active0 = beta > 0
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

        # None -> LS; scalar -> Tikhonov; "gcv" -> per-iteration
        # GCV-optimal lambda (replicated H/t, so every shard picks the same
        # lambda with zero extra collectives; trace_dim = n for BA, matching
        # gcv_function.m:46-50)
        _ps = _make_project_solve(lam, n, gcv_grid)
        project_solve = lambda H, kdim: _ps(H, None, t, kdim)

        def body(carry, k):
            Q, H, x, active, niters, IMG = carry
            img_loc = A_mv(Q[:, k])
            IMG = IMG.at[:, k].set(img_loc)
            w_loc = B_mv_scatter(img_loc)
            c1 = jax.lax.psum(Q.T @ w_loc, axis)
            w_loc = w_loc - Q @ c1
            c2 = jax.lax.psum(Q.T @ w_loc, axis)
            w_loc = w_loc - Q @ c2
            h = c1 + c2
            hnorm = pnorm(w_loc)
            breakdown = hnorm <= jnp.zeros((), dtype)
            hsafe = jnp.where(breakdown, jnp.ones((), dtype), hnorm)
            h = h.at[k + 1].set(hnorm)
            Hn = H.at[:, k].set(h)
            Qn = Q.at[:, k + 1].set(
                jnp.where(breakdown, jnp.zeros_like(w_loc), w_loc / hsafe))
            Qn = jax.lax.select(active, Qn, Q)
            Hn = jax.lax.select(active, Hn, H)

            kdim = k + 1
            y = project_solve(Hn, kdim)
            xk_loc = x0_loc + Qn[:, :maxit] @ y
            r_loc = rhs_loc - IMG @ y
            res_k = pnorm(r_loc) / b_norm
            d_loc = xk_loc - xt_loc
            err_k = jnp.sqrt(pdot(d_loc, d_loc)) / xt_norm

            adopt = active
            x = jax.lax.select(adopt, xk_loc, x)
            nan = jnp.asarray(jnp.nan, dtype)
            res_rec = jnp.where(adopt, res_k, nan)
            err_rec = jnp.where(adopt, err_k, nan)
            niters = jnp.where(adopt, kdim, niters)
            stop = breakdown | (res_k <= tol)
            active = active & ~stop
            return (Qn, Hn, x, active, niters, IMG), (res_rec, err_rec)

        (Q, H, x, active_f, niters, IMG), (res_hist, err_hist) = \
            jax.lax.scan(
                body,
                (Q0, H0, xc0, active0, niters0, IMG0),
                jnp.arange(k0, maxit, dtype=jnp.int32),
            )
        return x, err_hist, res_hist, niters, Q, H, beta, IMG, active_f

    base_specs = (P(axis), P(axis), P(axis), P(axis), P(axis))
    carry_specs = (P(axis, None), P(), P(axis), P(), P(axis, None), P())
    args = (A_panels, Bp, b, x_true, x0)
    in_specs = base_specs
    if resume_from is not None:
        in_specs = base_specs + carry_specs
        args = args + (rs.Q, rs.H, rs.x, rs.niters, rs.IMG, rs.beta)
    f = jax.shard_map(
        solver,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P(), P(), P(), P(axis, None), P(), P(),
                   P(axis, None), P()),
        check_vma=False,
    )
    x, err_new, res_new, niters, Q, H, beta, IMG, active_f = f(*args)
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([rs.res_hist[:k0], res_new])
        err_hist = jnp.concatenate([rs.err_hist[:k0], err_new])
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta, IMG=IMG,
                       active=active_f, fp=fp)


def ab_gmres_sharded_pallas(
    A_panels: ShardedPanels,
    BT_panels: ShardedPanels | None,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    gcv_grid=None,
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
    x0=None,
    resume_from: GMRESResult | None = None,
    B_panels: ShardedPanels | None = None,
    comm_dtype=None,
) -> GMRESResult:
    """Fully-sharded (hybrid) AB-GMRES: m-space Krylov basis sharded over
    rays, Pallas local SpMV (mirror of ``ABgmres_nonhybrid_bounds.m:24-37``
    at scale).  ``x0``: optional warm start (``r0 = b - A x0``,
    ``x = x0 + S y`` — the restart building block).  ``resume_from``: a
    prior result of this solver (the m-sharded W images live in ``.IMG``,
    the n-sharded solution images in ``.S``); same semantics as the BA
    twin's resume.  ``B_panels``: optional forward-layout back-projector
    (see ``ba_gmres_sharded_pallas`` / ``_make_B_mv``).

    The image intermediates ``s_k = B q_k`` stay n-SHARDED (reduce_scatter,
    never replicated) and the raw images ``w_k = A s_k`` m-sharded, so the
    solution ``x = S y`` and TRUE residual ``||b - W y||`` need no extra
    collectives (the fused-residual schedule of ``sharded_full.py``).  The
    returned ``x`` is the n-sharded solution.  Per-iteration communication
    is identical to the BA variant: one reduce_scatter(n), one windowed/full
    x gather, two fused psum(k+1), scalar psums."""
    if mesh is None:
        from hybrid_gmres_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis)
    maxit = int(maxit)
    p, m, n = _validate(A_panels, BT_panels, mesh, axis, B_panels)
    b_forward = B_panels is not None
    Bp = B_panels if b_forward else BT_panels
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    resume_fingerprint)

    fp = resume_fingerprint(x0, lam)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)
    if resume_from is None:
        k0 = 0
    else:
        if resume_from.IMG is None or resume_from.S is None:
            raise ValueError("resume_from must come from "
                             "ab_gmres_sharded_pallas (missing .IMG/.S)")
        check_fingerprint(resume_from, x0 if have_x0 else None, lam)
        from hybrid_gmres_tpu.utils.checkpoint import check_resumable

        check_resumable(resume_from)
        k0 = int(resume_from.niters)
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        resumed_active = (bool(resume_from.active)
                          if resume_from.active is not None
                          else k0 == resume_from.res_hist.shape[0])
        from hybrid_gmres_tpu.utils.checkpoint import pad_state

        rs = pad_state(resume_from, maxit)

    def solver(A_loc, B_loc, b_loc, xt_loc, x0_loc, *carry_in):
        nloc = n // p
        mloc = m // p

        def pdot(u_loc, v_loc):
            return jax.lax.psum(jnp.dot(u_loc, v_loc), axis)

        def pnorm(u_loc):
            return jnp.sqrt(pdot(u_loc, u_loc))

        B_mv_scatter = _make_B_mv(B_loc, b_forward, axis, dtype, interpret,
                                  comm_dtype=comm_dtype)

        def A_mv(x_loc):
            x_win = gather_window(A_loc, x_loc, axis,
                                  comm_dtype=comm_dtype)
            return local_matvec(A_loc, x_win, interpret=interpret
                                ).astype(dtype)

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)

        rhs_loc = b_loc - A_mv(x0_loc) if have_x0 else b_loc
        if carry_in:
            Q0, H0, xc0, niters0, W0, S0, beta = carry_in
            active0 = jnp.bool_(resumed_active)
        else:
            beta = pnorm(rhs_loc)
            beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
            active0 = beta > 0
            Q0 = jnp.zeros((mloc, maxit + 1), dtype=dtype).at[:, 0].set(
                jnp.where(beta > 0, rhs_loc / beta_safe,
                          jnp.zeros_like(rhs_loc)))
            H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
            xc0 = x0_loc + jnp.zeros((nloc,), dtype=dtype)
            niters0 = jnp.int32(0)
            S0 = jnp.zeros((nloc, maxit), dtype=dtype)
            W0 = jnp.zeros((mloc, maxit), dtype=dtype)
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

        # trace_dim = m for AB (gcv_function.m:46-50); see BA note above
        _ps = _make_project_solve(lam, m, gcv_grid)
        project_solve = lambda H, kdim: _ps(H, None, t, kdim)

        def body(carry, k):
            Q, H, x, active, niters, S, W = carry
            s_loc = B_mv_scatter(Q[:, k])          # (n/p,) image slab
            w_loc = A_mv(s_loc)                    # (m/p,) raw image rows
            S = S.at[:, k].set(s_loc)
            W = W.at[:, k].set(w_loc)
            c1 = jax.lax.psum(Q.T @ w_loc, axis)
            w_loc = w_loc - Q @ c1
            c2 = jax.lax.psum(Q.T @ w_loc, axis)
            w_loc = w_loc - Q @ c2
            h = c1 + c2
            hnorm = pnorm(w_loc)
            breakdown = hnorm <= jnp.zeros((), dtype)
            hsafe = jnp.where(breakdown, jnp.ones((), dtype), hnorm)
            h = h.at[k + 1].set(hnorm)
            Hn = H.at[:, k].set(h)
            Qn = Q.at[:, k + 1].set(
                jnp.where(breakdown, jnp.zeros_like(w_loc), w_loc / hsafe))
            Qn = jax.lax.select(active, Qn, Q)
            Hn = jax.lax.select(active, Hn, H)

            kdim = k + 1
            y = project_solve(Hn, kdim)
            xk_loc = x0_loc + S @ y                 # x = x0 + (B Q_k) y
            r_loc = rhs_loc - W @ y                 # true residual, m-sharded
            res_k = pnorm(r_loc) / b_norm
            d_loc = xk_loc - xt_loc
            err_k = jnp.sqrt(pdot(d_loc, d_loc)) / xt_norm

            adopt = active
            x = jax.lax.select(adopt, xk_loc, x)
            nan = jnp.asarray(jnp.nan, dtype)
            res_rec = jnp.where(adopt, res_k, nan)
            err_rec = jnp.where(adopt, err_k, nan)
            niters = jnp.where(adopt, kdim, niters)
            stop = breakdown | (res_k <= tol)
            active = active & ~stop
            return (Qn, Hn, x, active, niters, S, W), (res_rec, err_rec)

        (Q, H, x, active_f, niters, S, W), (res_hist, err_hist) = \
            jax.lax.scan(
                body,
                (Q0, H0, xc0, active0, niters0, S0, W0),
                jnp.arange(k0, maxit, dtype=jnp.int32),
            )
        return x, err_hist, res_hist, niters, Q, H, beta, W, S, active_f

    base_specs = (P(axis), P(axis), P(axis), P(axis), P(axis))
    carry_specs = (P(axis, None), P(), P(axis), P(), P(axis, None),
                   P(axis, None), P())
    args = (A_panels, Bp, b, x_true, x0)
    in_specs = base_specs
    if resume_from is not None:
        in_specs = base_specs + carry_specs
        args = args + (rs.Q, rs.H, rs.x, rs.niters, rs.IMG, rs.S, rs.beta)
    f = jax.shard_map(
        solver,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(axis), P(), P(), P(), P(axis, None), P(), P(),
                   P(axis, None), P(axis, None), P()),
        check_vma=False,
    )
    x, err_new, res_new, niters, Q, H, beta, W, S, active_f = f(*args)
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([rs.res_hist[:k0], res_new])
        err_hist = jnp.concatenate([rs.err_hist[:k0], err_new])
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta, IMG=W,
                       S=S, active=active_f, fp=fp)


def ba_gmres_sharded_pallas_restarted(
    A_panels, BT_panels, b, x_true=None, tol: float = 1e-6,
    restart: int = 20, max_restarts: int = 10, lam=None, gcv_grid=None,
    mesh: Mesh | None = None, axis: str = "rows", interpret: bool = False,
    B_panels=None,
) -> GMRESResult:
    """Restarted sharded BA-GMRES(restart): memory-bounded Krylov cycles at
    scale; each cycle warm-starts from the previous sharded solution with no
    resharding (``x0`` stays n-sharded on device).  The outer loop is the
    SAME ``solvers/gmres._restarted`` the single-chip wrappers use."""
    from hybrid_gmres_tpu.solvers.gmres import _restarted

    return _restarted(
        lambda x0: ba_gmres_sharded_pallas(
            A_panels, BT_panels, b, x_true, tol=tol, maxit=int(restart),
            lam=lam, gcv_grid=gcv_grid, mesh=mesh, axis=axis,
            interpret=interpret, x0=x0, B_panels=B_panels),
        max_restarts, tol)


def ab_gmres_sharded_pallas_restarted(
    A_panels, BT_panels, b, x_true=None, tol: float = 1e-6,
    restart: int = 20, max_restarts: int = 10, lam=None, gcv_grid=None,
    mesh: Mesh | None = None, axis: str = "rows", interpret: bool = False,
    B_panels=None,
) -> GMRESResult:
    """Restarted sharded AB-GMRES(restart) (see the BA twin)."""
    from hybrid_gmres_tpu.solvers.gmres import _restarted

    return _restarted(
        lambda x0: ab_gmres_sharded_pallas(
            A_panels, BT_panels, b, x_true, tol=tol, maxit=int(restart),
            lam=lam, gcv_grid=gcv_grid, mesh=mesh, axis=axis,
            interpret=interpret, x0=x0, B_panels=B_panels),
        max_restarts, tol)
