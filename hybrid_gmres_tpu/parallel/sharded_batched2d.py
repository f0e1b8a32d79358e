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
layout.  ``resume_from`` continues every RHS's Arnoldi recurrence exactly
with the carried per-RHS active flags (in-scan mode, fingerprint-guarded),
the state kept tile-sharded — as on the 1-D sharded batched tier.
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
    _pad_batched,
    _slice_result,
)
from hybrid_gmres_tpu.parallel.panels2d import (
    TiledPanels,
    _validate_2d,
    tile_matmat,
    tiled_local_mms,
)
from hybrid_gmres_tpu.parallel.sharded_batched import _mesh_batched_core

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
                        chunk_rhs, defer_histories, resume_from=None):
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
    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    resume_fingerprint)

    fp = resume_fingerprint(x0 if have_x0 else None, lam)
    if resume_from is not None:
        if defer_histories:
            raise ValueError("defer_histories does not support resume_from")
        if resume_from.IMG is None or (kind == "ab" and
                                       resume_from.S is None):
            raise ValueError("resume_from must come from the sharded "
                             "batched solver (missing .IMG/.S)")
        check_fingerprint(resume_from, x0 if have_x0 else None, lam)
        if resume_from.active is None:
            raise ValueError("sharded batched resume needs the "
                             "checkpointed per-RHS active flags")
        resume_from = _pad_batched(resume_from, maxit)

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

    k0 = 0 if resume_from is None else resume_from.res_hist.shape[0]
    if resume_from is not None and k0 >= maxit:
        raise ValueError(f"resume needs maxit > {k0}")

    def solver(A_loc, B_loc, b_loc, xt_loc, x0_loc, *carry_in):
        nloc = n // pc
        mloc = m // pr

        def pnorm_cols_m(U_loc):
            return jnp.sqrt(jax.lax.psum(jnp.sum(U_loc * U_loc, axis=0),
                                         ar))

        def pnorm_cols_n(V_loc):
            return jnp.sqrt(jax.lax.psum(jnp.sum(V_loc * V_loc, axis=0),
                                         ac))

        A_mm, _ = tiled_local_mms(A_loc, axes, dtype, interpret)
        B_mm = _make_B_mm_2d(B_loc, b_forward, axes, dtype, interpret)

        # 2-D mesh: m-space reduces over rows, n-space over cols; the
        # Krylov basis lives in n-space (BA) or m-space (AB)
        sp_axis_name = ac if kind == "ba" else ar
        pnorm_sp = pnorm_cols_n if kind == "ba" else pnorm_cols_m
        psum_coeff = lambda c: jax.lax.psum(c, sp_axis_name)

        return _mesh_batched_core(
            kind, maxit, tol, dtype, nloc, mloc, A_mm, B_mm, psum_coeff,
            pnorm_cols_m, pnorm_sp, pnorm_cols_n, b_loc, xt_loc, x0_loc,
            have_x0, solve_r, select_lam, defer_histories,
            k0=k0, carry_in=carry_in)

    sp_tiles = P((ar, ac))
    sp_m = P(ar, None)
    sp_n = P(ac, None)
    sp_basis = P(ac, None, None) if kind == "ba" else P(ar, None, None)
    in_specs = (sp_tiles, sp_tiles, sp_m, sp_n, sp_n)
    carry_specs = (sp_basis, P(), sp_n, P(), P(), P(ar, None, None), P())
    if kind == "ab":
        carry_specs = carry_specs[:6] + (P(ac, None, None), P())
    if resume_from is not None:
        in_specs = in_specs + carry_specs
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
        args = (A_tiles, Bp, b[:, sl], x_true[:, sl], x0[:, sl])
        if resume_from is not None:
            rs = _slice_result(resume_from, sl)
            carry = (rs.Q, rs.H, rs.x, rs.active, rs.niters, rs.IMG)
            carry = (carry + (rs.S, rs.beta) if kind == "ab"
                     else carry + (rs.beta,))
            args = args + carry
        x10 = f(*args)
        (x, err_new, res_new, niters, Q, H, beta, IMG, S, active_f) = x10
        if resume_from is not None:
            res_hist = jnp.concatenate([rs.res_hist, res_new])
            err_hist = jnp.concatenate([rs.err_hist, err_new])
        else:
            res_hist, err_hist = res_new, err_new
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
    resume_from: GMRESResult | None = None,
) -> GMRESResult:
    """2-D tiled multi-RHS (hybrid) BA-GMRES over R right-hand sides.

    ``b``: (m, R).  Per-RHS results match ``ba_gmres_batched``; collective
    count per iteration matches the single-RHS
    ``ba_gmres_sharded_pallas_2d`` with R-times the payload per psum.
    ``x0`` (n, R) per-RHS warm starts, ``chunk_rhs`` auto-chunking,
    ``defer_histories`` + ``lam="gcv-final"`` as in the 1-D sharded
    batched solver; ``B_tiles``: forward-layout back-projector
    (``tile_backprojector_forward``).  ``resume_from``: a prior result of
    THIS solver — continues every RHS's recurrence exactly with the
    carried per-RHS active flags, state kept tile-sharded (same
    ``x0``/``lam``/``chunk_rhs``; fingerprint-guarded; in-scan mode
    only)."""
    return _sharded_batched_2d("ba", A_tiles, BT_tiles, b, x_true, tol,
                               maxit, lam, gcv_grid, mesh, axes, interpret,
                               x0, B_tiles, chunk_rhs, defer_histories,
                               resume_from)


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
    resume_from: GMRESResult | None = None,
) -> GMRESResult:
    """2-D tiled multi-RHS (hybrid) AB-GMRES (row-sharded m-space bases,
    solutions composed from the col-sharded ``B Q`` images).  See
    :func:`ba_gmres_sharded_batched_2d`."""
    return _sharded_batched_2d("ab", A_tiles, BT_tiles, b, x_true, tol,
                               maxit, lam, gcv_grid, mesh, axes, interpret,
                               x0, B_tiles, chunk_rhs, defer_histories,
                               resume_from)
