"""2-D tiled multi-RHS (batched) hybrid BA/AB-GMRES.

Completes the serving x distribution composition on the large-mesh layout
(the last "—" in the capability matrix's batched row): R independent
hybrid reconstructions through the 2-D (ray x pixel) tiled panels of
``parallel/panels2d.py``.  Every Krylov product is a multi-RHS tile SpMM
(``tile_matmat`` / ``tile_rmatmat`` — one tile read serves all R columns)
and the per-iteration collective schedule is the single-RHS 2-D solver's
— one psum(m/pr x R) for the A product, one psum(n/pc x R) for the B
product, one fused psum per CGS2 pass now carrying (k+1, R) coefficients
— so the collective COUNT is independent of R and the bytes fall in BOTH
mesh dimensions (DESIGN §7's 2-D row, amortized over the batch).

Per-RHS semantics match ``solvers.batched.ba/ab_gmres_batched``
(independent Arnoldi recurrences / projected solves / histories / active
flags / warm starts — NOT block GMRES); the scaled form of the
reference's per-sinogram loop (``run_2D_phantom.m:48-51``) on the 2-D
layout.  No resume yet (use the 1-D sharded batched tier or warm-start a
fresh solve from ``.x``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.solvers.common import GMRESResult
from hybrid_gmres_tpu.solvers.gmres import _make_project_solve
from hybrid_gmres_tpu.solvers.batched import (
    _chunk_slices,
    _concat_results,
    _make_select_lam,
)
from hybrid_gmres_tpu.parallel.panels2d import (
    TiledPanels,
    _validate_2d,
    tile_matmat,
    tile_rmatmat,
    tiled_local_mms,
)

__all__ = [
    "ba_gmres_sharded_batched_2d",
    "ab_gmres_sharded_batched_2d",
]


def _make_B_mm_2d(B_or_BT_loc, b_forward, axes, dtype, interpret):
    """Multi-RHS ``U (m/pr, R) -> B U (n/pc, R)``: forward kernel on a
    :func:`tile_backprojector_forward` tile or transposed kernel on the
    BT tile — both complete with ONE psum over the row axis."""
    ar, ac = axes
    if b_forward:
        def B_mm(U_loc):
            part = tile_matmat(B_or_BT_loc, U_loc, interpret=interpret)
            Y = jax.lax.psum(part, ar)
            if B_or_BT_loc.row_scale is not None:
                Y = B_or_BT_loc.row_scale[0][:, None] * Y
            return Y.astype(dtype)
        return B_mm
    _, B_mm = tiled_local_mms(B_or_BT_loc, axes, dtype, interpret)
    return B_mm


def _sharded_batched_2d(kind, A_tiles, BT_tiles, b, x_true, tol, maxit,
                        lam, gcv_grid, mesh, axes, interpret, x0, B_tiles,
                        chunk_rhs, defer_histories):
    if mesh is None:
        raise ValueError("requires an explicit 2-D mesh (make_mesh_2d)")
    ar, ac = axes
    maxit = int(maxit)
    pr, pc, m, n = _validate_2d(A_tiles, BT_tiles, mesh, axes, B_tiles)
    b_forward = B_tiles is not None
    Bp = B_tiles if b_forward else BT_tiles
    if b.ndim != 2:
        raise ValueError(f"{kind}_gmres_sharded_batched_2d expects b of "
                         f"shape (m, R)")
    dtype = b.dtype
    R_total = b.shape[1]
    have_xt = x_true is not None
    if have_xt:
        x_true = jnp.broadcast_to(
            jnp.asarray(x_true, dtype).reshape(n, -1), (n, R_total))
    else:
        x_true = jnp.zeros((n, R_total), dtype)
    have_x0 = x0 is not None
    if have_x0:
        x0 = jnp.broadcast_to(
            jnp.asarray(x0, dtype).reshape(n, -1), (n, R_total))
    else:
        x0 = jnp.zeros((n, R_total), dtype)
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    fp = resume_fingerprint(x0 if have_x0 else None, lam)

    trace_dim = n if kind == "ba" else m
    gcv_final = isinstance(lam, str) and lam == "gcv-final"
    if gcv_final:
        if not defer_histories:
            raise ValueError("lam='gcv-final' requires "
                             "defer_histories=True (see ba_gmres_batched)")
        select_lam = _make_select_lam(trace_dim, gcv_grid)
        solve_r = None
    else:
        select_lam = None
        _ps = _make_project_solve(lam, trace_dim, gcv_grid)
        solve_r = jax.vmap(lambda H, t, kdim: _ps(H, None, t, kdim),
                           in_axes=(2, 1, None), out_axes=1)

    def solver(A_loc, B_loc, b_loc, xt_loc, x0_loc):
        nloc = n // pc
        mloc = m // pr
        R = b_loc.shape[1]

        def pnorm_cols_m(U_loc):
            return jnp.sqrt(jax.lax.psum(jnp.sum(U_loc * U_loc, axis=0),
                                         ar))

        def pnorm_cols_n(V_loc):
            return jnp.sqrt(jax.lax.psum(jnp.sum(V_loc * V_loc, axis=0),
                                         ac))

        A_mm, _ = tiled_local_mms(A_loc, axes, dtype, interpret)
        B_mm = _make_B_mm_2d(B_loc, b_forward, axes, dtype, interpret)

        b_norm = pnorm_cols_m(b_loc)                        # (R,)
        xt_norm = pnorm_cols_n(xt_loc)

        rhs_loc = b_loc - A_mm(x0_loc) if have_x0 else b_loc
        if kind == "ba":
            r0_loc = B_mm(rhs_loc)                          # (nloc, R)
            pnorm_sp = pnorm_cols_n
            sp_axis_name = ac
            nsp_loc = nloc
        else:
            r0_loc = rhs_loc                                # (mloc, R)
            pnorm_sp = pnorm_cols_m
            sp_axis_name = ar
            nsp_loc = mloc
        beta = pnorm_sp(r0_loc)
        beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
        Q0 = jnp.zeros((nsp_loc, maxit + 1, R), dtype).at[:, 0, :].set(
            jnp.where(beta > 0, r0_loc / beta_safe, jnp.zeros_like(r0_loc)))
        H0 = jnp.zeros((maxit + 1, maxit, R), dtype)
        IMG0 = jnp.zeros((mloc, maxit, R), dtype)
        S0 = jnp.zeros((nloc, maxit, R), dtype) if kind == "ab" else None
        t = jnp.zeros((maxit + 1, R), dtype).at[0].set(beta)

        def cgs2(Q, H, W, k, active):
            c1 = jax.lax.psum(jnp.einsum("nkr,nr->kr", Q, W), sp_axis_name)
            W = W - jnp.einsum("nkr,kr->nr", Q, c1)
            c2 = jax.lax.psum(jnp.einsum("nkr,nr->kr", Q, W), sp_axis_name)
            W = W - jnp.einsum("nkr,kr->nr", Q, c2)
            h = c1 + c2
            hnorm = pnorm_sp(W)
            breakdown = hnorm <= jnp.zeros((), dtype)
            hsafe = jnp.where(breakdown, jnp.ones((), dtype), hnorm)
            h = h.at[k + 1].set(hnorm)
            Hn = H.at[:, k, :].set(h)
            Qn = Q.at[:, k + 1, :].set(
                jnp.where(breakdown[None, :], jnp.zeros_like(W), W / hsafe))
            Qn = jnp.where(active[None, None, :], Qn, Q)
            Hn = jnp.where(active[None, None, :], Hn, H)
            return Qn, Hn, breakdown

        def expand(Q, H, IMG, S, k, active, mask_images=False):
            gate = (jnp.where(active[None, :], jnp.ones((), dtype),
                              jnp.zeros((), dtype))
                    if mask_images else jnp.ones((), dtype))
            if kind == "ba":
                U = A_mm(Q[:, k, :])                        # (mloc, R)
                W = B_mm(U)                                 # (nloc, R)
                IMG = IMG.at[:, k, :].set(U * gate)
            else:
                Sk = B_mm(Q[:, k, :])                       # (nloc, R)
                W = A_mm(Sk)                                # (mloc, R)
                IMG = IMG.at[:, k, :].set(W * gate)
                S = S.at[:, k, :].set(Sk * gate)
            Qn, Hn, breakdown = cgs2(Q, H, W, k, active)
            return Qn, Hn, IMG, S, breakdown

        if defer_histories:
            def body(carry, k):
                Q, H, IMG, S, active = carry
                Qn, Hn, IMG, S, breakdown = expand(Q, H, IMG, S, k, active,
                                                   mask_images=True)
                ok = active
                bkd_rec = active & breakdown
                active = active & ~breakdown
                return (Qn, Hn, IMG, S, active), (ok, bkd_rec)

            (Q, H, IMG, S, _), (oks, bkds) = jax.lax.scan(
                body, (Q0, H0, IMG0, S0, beta > 0),
                jnp.arange(maxit, dtype=jnp.int32))
            nsteps = jnp.sum(oks.astype(jnp.int32), axis=0)
            broke = jnp.any(bkds, axis=0)

            ks = jnp.arange(1, maxit + 1, dtype=jnp.int32)
            if select_lam is not None:
                from hybrid_gmres_tpu.krylov.projected import (
                    projected_tikhonov_solve)

                lam_r = select_lam(H, t, nsteps)
                solve_rl = jax.vmap(
                    lambda Hr, tr, l, kd: projected_tikhonov_solve(
                        Hr, tr, l, kd),
                    in_axes=(2, 1, 0, None), out_axes=1)
                Y = jax.vmap(lambda kd: solve_rl(H, t, lam_r, kd))(ks)
            else:
                Y = jax.vmap(lambda kd: solve_r(H, t, kd))(ks)

            hi = jax.lax.Precision.HIGHEST
            RES_loc = rhs_loc[:, None, :] - jnp.einsum(
                "mkr,jkr->mjr", IMG, Y, precision=hi)
            res_full = jnp.sqrt(jax.lax.psum(
                jnp.sum(RES_loc * RES_loc, axis=0), ar)) / b_norm
            basis = S if kind == "ab" else Q[:, :maxit, :]
            X_loc = jnp.einsum("nkr,jkr->njr", basis, Y, precision=hi)
            if have_x0:
                X_loc = X_loc + x0_loc[:, None, :]
            D_loc = X_loc - xt_loc[:, None, :]
            err_full = jnp.sqrt(jax.lax.psum(
                jnp.sum(D_loc * D_loc, axis=0), ac)) / xt_norm

            valid = ks[:, None] <= nsteps[None, :]
            hit = valid & (res_full <= tol)
            any_hit = jnp.any(hit, axis=0)
            first_hit = jnp.argmax(hit, axis=0) + 1
            niters = jnp.where(any_hit, first_hit.astype(jnp.int32),
                               nsteps)
            rec = ks[:, None] <= niters[None, :]
            nan = jnp.asarray(jnp.nan, dtype)
            res_hist = jnp.where(rec, res_full, nan)
            err_hist = jnp.where(rec, err_full, nan)
            slot = jnp.maximum(niters - 1, 0)
            x = jax.vmap(
                lambda Xr, sl, ok_, xf: jnp.where(ok_, Xr[:, sl], xf),
                in_axes=(2, 0, 0, 1), out_axes=1)(
                    X_loc, slot, niters > 0, x0_loc)
            active_f = (nsteps == maxit) & ~any_hit & ~broke
            return (x, err_hist, res_hist, niters, Q, H, beta, IMG, S,
                    active_f)

        def body(carry, k):
            Q, H, x, active, niters, IMG, S = carry
            Qn, Hn, IMG, S, breakdown = expand(Q, H, IMG, S, k, active)
            kdim = k + 1
            y = solve_r(Hn, t, kdim)
            if kind == "ab":
                xk = jnp.einsum("nkr,kr->nr", S, y)
            else:
                xk = jnp.einsum("nkr,kr->nr", Qn[:, :maxit, :], y)
            if have_x0:
                xk = x0_loc + xk
            r_loc = rhs_loc - jnp.einsum("mkr,kr->mr", IMG, y)
            res = pnorm_cols_m(r_loc) / b_norm
            err = pnorm_cols_n(xk - xt_loc) / xt_norm

            adopt = active
            x = jnp.where(adopt[None, :], xk, x)
            nan = jnp.asarray(jnp.nan, dtype)
            res_rec = jnp.where(adopt, res, nan)
            err_rec = jnp.where(adopt, err, nan)
            niters = jnp.where(adopt, kdim, niters)
            stop = breakdown | (res <= tol)
            active = active & ~stop
            return (Qn, Hn, x, active, niters, IMG, S), (res_rec, err_rec)

        carry0 = (Q0, H0, x0_loc, beta > 0, jnp.zeros((R,), jnp.int32),
                  IMG0, S0)
        (Q, H, x, active_f, niters, IMG, S), (res_rows, err_rows) = \
            jax.lax.scan(body, carry0, jnp.arange(maxit, dtype=jnp.int32))
        return (x, err_rows, res_rows, niters, Q, H, beta, IMG, S,
                active_f)

    sp_tiles = P((ar, ac))
    sp_m = P(ar, None)
    sp_n = P(ac, None)
    sp_basis = P(ac, None, None) if kind == "ba" else P(ar, None, None)
    in_specs = (sp_tiles, sp_tiles, sp_m, sp_n, sp_n)
    out_specs = (
        sp_n,                                # x (n, R)
        P(), P(), P(),                       # histories + niters
        sp_basis,                            # Q
        P(), P(),                            # H, beta
        P(ar, None, None),                   # IMG (m, maxit, R)
        P(ac, None, None),                   # S (n, maxit, R) (BA: None)
        P(),                                 # active
    )
    f = jax.shard_map(solver, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, check_vma=False)

    parts = []
    for sl in _chunk_slices(R_total, chunk_rhs):
        x10 = f(A_tiles, Bp, b[:, sl], x_true[:, sl], x0[:, sl])
        (x, err_hist, res_hist, niters, Q, H, beta, IMG, S, active_f) = x10
        parts.append(GMRESResult(
            x, err_hist, res_hist, niters, Q, H, beta, IMG=IMG,
            S=S if kind == "ab" else None, active=active_f))
    res = _concat_results(parts)
    if not have_xt:
        res = res._replace(err_hist=jnp.full_like(res.err_hist, jnp.nan))
    return res._replace(fp=fp)


def ba_gmres_sharded_batched_2d(
    A_tiles: TiledPanels,
    BT_tiles: TiledPanels | None,
    b,
    x_true=None,
    tol: float = 0.0,
    maxit: int = 50,
    lam=None,
    gcv_grid=None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
    x0=None,
    B_tiles: TiledPanels | None = None,
    chunk_rhs: int | None = 8,
    defer_histories: bool = False,
) -> GMRESResult:
    """2-D tiled multi-RHS (hybrid) BA-GMRES over R right-hand sides.

    ``b``: (m, R).  Per-RHS results match ``ba_gmres_batched``; collective
    count per iteration matches the single-RHS
    ``ba_gmres_sharded_pallas_2d`` with R-times the payload per psum.
    ``x0`` (n, R) per-RHS warm starts, ``chunk_rhs`` auto-chunking,
    ``defer_histories`` + ``lam="gcv-final"`` as in the 1-D sharded
    batched solver; ``B_tiles``: forward-layout back-projector
    (``tile_backprojector_forward``)."""
    return _sharded_batched_2d("ba", A_tiles, BT_tiles, b, x_true, tol,
                               maxit, lam, gcv_grid, mesh, axes, interpret,
                               x0, B_tiles, chunk_rhs, defer_histories)


def ab_gmres_sharded_batched_2d(
    A_tiles: TiledPanels,
    BT_tiles: TiledPanels | None,
    b,
    x_true=None,
    tol: float = 0.0,
    maxit: int = 50,
    lam=None,
    gcv_grid=None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
    x0=None,
    B_tiles: TiledPanels | None = None,
    chunk_rhs: int | None = 8,
    defer_histories: bool = False,
) -> GMRESResult:
    """2-D tiled multi-RHS (hybrid) AB-GMRES (row-sharded m-space bases,
    solutions composed from the col-sharded ``B Q`` images).  See
    :func:`ba_gmres_sharded_batched_2d`."""
    return _sharded_batched_2d("ab", A_tiles, BT_tiles, b, x_true, tol,
                               maxit, lam, gcv_grid, mesh, axes, interpret,
                               x0, B_tiles, chunk_rhs, defer_histories)
