"""Golub–Kahan family over the 2-D (ray x pixel) tiled-panel mesh.

The 2-D twins of ``parallel/sharded_gkb.py`` (reference recurrences
``lsqr_solver.m:20-47``, ``hybrid_lsqr_solver.m:21-46``,
``lsmr_solver.m:32-77``, ``hybrid_lsmr_solver.m:26-45``), consuming
:class:`~hybrid_gmres_tpu.parallel.panels2d.TiledPanels` so the sparse
compression survives the 2-D layout (see DESIGN §7):

  * u-space (ray) vectors sharded over "rows" (replicated over cols),
    v-space (image) vectors sharded over "cols" (replicated over rows);
  * each GKB half-step costs ONE collective — the forward tile kernel's
    psum over the col axis (m/pr elements) or the transposed kernel's psum
    over the row axis (n/pc elements) — O(m/pr + n/pc) bytes per
    iteration, falling in BOTH mesh dimensions;
  * the rotation recurrences are scalar and replicated (free); norms psum
    over the vector's own axis only.

The exact adjoint pair both half-steps require is served by the SAME tiles
through the forward and transposed kernels (quantized tiles share one
global ``diag(s) Q``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.parallel.panels2d import TiledPanels, tiled_local_ops
from hybrid_gmres_tpu.solvers.common import GKBResult

__all__ = [
    "lsqr_sharded_2d",
    "hybrid_lsqr_sharded_2d",
    "lsmr_sharded_2d",
    "hybrid_lsmr_sharded_2d",
]


def _prep2d(A, b, maxit, mesh, axes):
    if mesh is None:
        raise ValueError("the 2-D GKB solvers require an explicit 2-D mesh "
                         "(make_mesh_2d)")
    if not isinstance(A, TiledPanels):
        raise TypeError("A must be TiledPanels (tile_bucketed_panels)")
    ar, ac = axes
    pr, pc = mesh.shape[ar], mesh.shape[ac]
    if (A.pr, A.pc) != (pr, pc):
        raise ValueError(f"tiles built for {A.pr}x{A.pc}, mesh is {pr}x{pc}")
    m, n = A.shape
    if maxit is None:
        maxit = min(m, n)
    return pr, pc, m, n, int(maxit)


def _collectives2d(axes, dtype):
    ar, ac = axes

    def pdot_m(u, v):
        return jax.lax.psum(jnp.dot(u, v), ar)

    def pdot_n(u, v):
        return jax.lax.psum(jnp.dot(u, v), ac)

    def _norm(pd):
        def f(x):
            return jnp.sqrt(pd(x, x))
        return f

    def _normalize(pd):
        def f(x):
            nrm = jnp.sqrt(pd(x, x))
            ok = nrm > 0
            safe = jnp.where(ok, nrm, jnp.ones((), dtype))
            return jnp.where(ok, x / safe, jnp.zeros_like(x)), nrm, ok
        return f

    return (pdot_m, pdot_n, _norm(pdot_m), _norm(pdot_n),
            _normalize(pdot_m), _normalize(pdot_n))


def _specs2d(axes):
    ar, ac = axes
    # A tiles (leading pd axis), b row-sharded, x_true col-sharded
    return (P((ar, ac)), P(ar), P(ac))


def lsqr_sharded_2d(
    A: TiledPanels,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
) -> GKBResult:
    """2-D tiled LSQR (``lsqr_solver.m:20-47`` semantics: cheap residual
    estimate per iteration, final entry patched with the true residual)."""
    ar, ac = axes
    pr, pc, m, n, maxit = _prep2d(A, b, maxit, mesh, axes)
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)

    def solver(A_loc, b_loc, xt_loc):
        matvec, rmatvec, _ = tiled_local_ops(A_loc, axes, dtype, interpret)
        (pdot_m, pdot_n, pnorm_m, pnorm_n, pnormalize_m,
         pnormalize_n) = _collectives2d(axes, dtype)
        nloc = n // pc

        b_norm = pnorm_m(b_loc)
        xt_norm = pnorm_n(xt_loc)
        u, beta, _ = pnormalize_m(b_loc)
        v, alpha, _ = pnormalize_n(rmatvec(u))
        w = v
        x0 = jnp.zeros((nloc,), dtype=dtype)

        def step(carry, k):
            x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters = carry
            u_n, beta_k, ok_u = pnormalize_m(matvec(v) - alpha_c * u)
            v_n, alpha_n, ok_v = pnormalize_n(rmatvec(u_n) - beta_k * v)

            rho = jnp.hypot(rho_bar, beta_k)
            c = rho_bar / rho
            s = beta_k / rho
            theta = s * alpha_n
            rho_bar_n = -c * alpha_n
            phi = c * phi_bar
            phi_bar_n = s * phi_bar

            x_n = x + (phi / rho) * w
            w_n = v_n - (theta / rho) * w

            res_k = jnp.abs(phi_bar_n) / b_norm
            err_k = pnorm_n(x_n - xt_loc) / xt_norm

            adopt = active & ok_u & ok_v
            nan = jnp.asarray(jnp.nan, dtype)
            x = jax.lax.select(adopt, x_n, x)
            u = jax.lax.select(adopt, u_n, u)
            v = jax.lax.select(adopt, v_n, v)
            w = jax.lax.select(adopt, w_n, w)
            phi_bar = jnp.where(adopt, phi_bar_n, phi_bar)
            rho_bar = jnp.where(adopt, rho_bar_n, rho_bar)
            alpha_c = jnp.where(adopt, alpha_n, alpha_c)
            res_rec = jnp.where(adopt, res_k, nan)
            err_rec = jnp.where(adopt, err_k, nan)
            niters = jnp.where(adopt, k + 1, niters)
            active = adopt & (res_k > tol)
            return (x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters), \
                (res_rec, err_rec)

        carry0 = (x0, u, v, w, beta, alpha, alpha, jnp.bool_(True),
                  jnp.int32(0))
        (x, *_rest, niters), (res_hist, err_hist) = jax.lax.scan(
            step, carry0, jnp.arange(maxit, dtype=jnp.int32))

        true_res = pnorm_m(b_loc - matvec(x)) / b_norm
        slot = jnp.maximum(niters - 1, 0)
        res_hist = res_hist.at[slot].set(
            jnp.where(niters > 0, true_res, res_hist[slot]))
        return x, err_hist, res_hist, niters

    f = jax.shard_map(
        solver, mesh=mesh, in_specs=_specs2d(axes),
        out_specs=(P(axes[1]), P(), P(), P()), check_vma=False)
    x, err_hist, res_hist, niters = f(A, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters)


def hybrid_lsqr_sharded_2d(
    A: TiledPanels,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    lam: float = 1e-3,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
) -> GKBResult:
    """2-D tiled LSQR on the augmented ``[A; sqrt(lam) I]``
    (``hybrid_lsqr_solver.m:5-6``): the sqrt(lam) I block is col-shard
    diagonal (no communication); the residual is tracked vs the unaugmented
    system (``:43``)."""
    ar, ac = axes
    pr, pc, m, n, maxit = _prep2d(A, b, maxit, mesh, axes)
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)

    def solver(A_loc, b_loc, xt_loc):
        matvec, rmatvec, _ = tiled_local_ops(A_loc, axes, dtype, interpret)
        (pdot_m, pdot_n, pnorm_m, pnorm_n, _pm,
         pnormalize_n) = _collectives2d(axes, dtype)
        nloc = n // pc
        sql = jnp.sqrt(jnp.asarray(lam, dtype))

        def aug_pnorm(um, un):
            return jnp.sqrt(pdot_m(um, um) + pdot_n(un, un))

        def aug_normalize(um, un):
            nrm = aug_pnorm(um, un)
            ok = nrm > 0
            safe = jnp.where(ok, nrm, jnp.ones((), dtype))
            z = jnp.zeros((), dtype)
            return (jnp.where(ok, um / safe, z),
                    jnp.where(ok, un / safe, z), nrm, ok)

        b_norm = pnorm_m(b_loc)
        xt_norm = pnorm_n(xt_loc)
        um, un, beta, _ = aug_normalize(b_loc, jnp.zeros((nloc,), dtype))
        v, alpha, _ = pnormalize_n(rmatvec(um) + sql * un)
        w = v
        x0 = jnp.zeros((nloc,), dtype=dtype)

        def step(carry, k):
            (x, um, un, v, w, phi_bar, rho_bar, alpha_c, active,
             niters) = carry
            u_nm, u_nn, beta_k, ok_u = aug_normalize(
                matvec(v) - alpha_c * um, sql * v - alpha_c * un)
            vhat = rmatvec(u_nm) + sql * u_nn - beta_k * v
            v_n, alpha_n, ok_v = pnormalize_n(vhat)

            rho = jnp.hypot(rho_bar, beta_k)
            c = rho_bar / rho
            s = beta_k / rho
            theta = s * alpha_n
            rho_bar_n = -c * alpha_n
            phi = c * phi_bar
            phi_bar_n = s * phi_bar

            x_n = x + (phi / rho) * w
            w_n = v_n - (theta / rho) * w

            res_k = pnorm_m(b_loc - matvec(x_n)) / b_norm
            err_k = pnorm_n(x_n - xt_loc) / xt_norm

            adopt = active & ok_u & ok_v
            nan = jnp.asarray(jnp.nan, dtype)
            x = jax.lax.select(adopt, x_n, x)
            um = jax.lax.select(adopt, u_nm, um)
            un = jax.lax.select(adopt, u_nn, un)
            v = jax.lax.select(adopt, v_n, v)
            w = jax.lax.select(adopt, w_n, w)
            phi_bar = jnp.where(adopt, phi_bar_n, phi_bar)
            rho_bar = jnp.where(adopt, rho_bar_n, rho_bar)
            alpha_c = jnp.where(adopt, alpha_n, alpha_c)
            res_rec = jnp.where(adopt, res_k, nan)
            err_rec = jnp.where(adopt, err_k, nan)
            niters = jnp.where(adopt, k + 1, niters)
            active = adopt & (res_k > tol)
            return (x, um, un, v, w, phi_bar, rho_bar, alpha_c, active,
                    niters), (res_rec, err_rec)

        carry0 = (x0, um, un, v, w, beta, alpha, alpha, jnp.bool_(True),
                  jnp.int32(0))
        (x, *_rest, niters), (res_hist, err_hist) = jax.lax.scan(
            step, carry0, jnp.arange(maxit, dtype=jnp.int32))
        return x, err_hist, res_hist, niters

    f = jax.shard_map(
        solver, mesh=mesh, in_specs=_specs2d(axes),
        out_specs=(P(axes[1]), P(), P(), P()), check_vma=False)
    x, err_hist, res_hist, niters = f(A, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters)


def lsmr_sharded_2d(
    A: TiledPanels,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
) -> GKBResult:
    """2-D tiled LSMR (``lsmr_solver.m:32-77``) with true residual and
    ``||A^T r||`` histories (exact ``||A||_F`` from the tile masses)."""
    ar, ac = axes
    pr, pc, m, n, maxit = _prep2d(A, b, maxit, mesh, axes)
    dtype = b.dtype
    eps = jnp.finfo(dtype).eps
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)

    def solver(A_loc, b_loc, xt_loc):
        matvec, rmatvec, fro_sq_loc = tiled_local_ops(A_loc, axes, dtype,
                                                      interpret)
        (pdot_m, pdot_n, pnorm_m, pnorm_n, pnormalize_m,
         pnormalize_n) = _collectives2d(axes, dtype)
        nloc = n // pc
        fro_norm = jnp.sqrt(jax.lax.psum(
            jax.lax.psum(fro_sq_loc, ar), ac))

        b_norm = pnorm_m(b_loc)
        xt_norm = pnorm_n(xt_loc)
        u, beta1, _ = pnormalize_m(b_loc)
        v, alpha1, _ = pnormalize_n(rmatvec(u))
        x0 = jnp.zeros((nloc,), dtype=dtype)
        h0 = v
        hbar0 = jnp.zeros((nloc,), dtype=dtype)

        def step(carry, k):
            (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar, cbar,
             sbar, active, niters) = carry

            u_n, beta_k, ok_u = pnormalize_m(matvec(v) - alpha * u)
            v_n, alpha_n, ok_v = pnormalize_n(rmatvec(u_n) - beta_k * v)

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

            hbar_n = h - (thetabar * rho_n) / (rhoold * rhobarold) * hbar
            x_n = x + (zeta / (rho_n * rhobar_n)) * hbar_n
            h_n = v_n - (thetanew / rho_n) * h

            r_loc = b_loc - matvec(x_n)
            r_norm = pnorm_m(r_loc)
            res_k = r_norm / (b_norm + eps)
            ar_k = pnorm_n(rmatvec(r_loc)) / (
                fro_norm * jnp.maximum(r_norm, eps))
            err_k = pnorm_n(x_n - xt_loc) / xt_norm

            adopt = active & ok_u & ok_v
            nan = jnp.asarray(jnp.nan, dtype)
            sel = lambda a, b_: jax.lax.select(adopt, a, b_)
            x, u, v, h, hbar = (sel(x_n, x), sel(u_n, u), sel(v_n, v),
                                sel(h_n, h), sel(hbar_n, hbar))
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
                (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
                 cbar, sbar, active, niters),
                (res_rec, err_rec, ar_rec),
            )

        one = jnp.ones((), dtype)
        carry0 = (
            x0, u, v, h0, hbar0, alpha1, alpha1 * beta1, alpha1, one, one,
            one, jnp.zeros((), dtype), jnp.bool_(True), jnp.int32(0),
        )
        (x, *_rest, niters), (res_hist, err_hist, ar_hist) = jax.lax.scan(
            step, carry0, jnp.arange(maxit, dtype=jnp.int32))
        return x, err_hist, res_hist, niters, ar_hist

    f = jax.shard_map(
        solver, mesh=mesh, in_specs=_specs2d(axes),
        out_specs=(P(axes[1]), P(), P(), P(), P()), check_vma=False)
    x, err_hist, res_hist, niters, ar_hist = f(A, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, ar_hist=ar_hist)


def hybrid_lsmr_sharded_2d(
    A: TiledPanels,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    lam=1e-3,
    rank1_mode: str = "last",
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
    gcv_grid=None,
) -> GKBResult:
    """2-D tiled hybrid LSMR: right basis V sharded over the col axis,
    bidiagonal B_k replicated, shifted projected solve
    (``hybrid_lsmr_solver.m:37-45``) replicated; ``lam`` scalar or "gcv"
    (HyBR-style per-iteration selection, zero extra collectives)."""
    if rank1_mode not in ("last", "first"):
        raise ValueError("rank1_mode must be 'last' or 'first'")
    ar, ac = axes
    pr, pc, m, n, maxit = _prep2d(A, b, maxit, mesh, axes)
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    from hybrid_gmres_tpu.solvers.lsmr import (
        _hybrid_lsmr_projected, make_hybrid_lsmr_lam_fn)

    lam_fn = make_hybrid_lsmr_lam_fn(lam, gcv_grid, n, maxit, dtype)

    def solver(A_loc, b_loc, xt_loc):
        matvec, rmatvec, _ = tiled_local_ops(A_loc, axes, dtype, interpret)
        (pdot_m, pdot_n, pnorm_m, pnorm_n, pnormalize_m,
         pnormalize_n) = _collectives2d(axes, dtype)
        nloc = n // pc

        b_norm = pnorm_m(b_loc)
        xt_norm = pnorm_n(xt_loc)
        u, beta1, _ = pnormalize_m(b_loc)
        v, alpha1, _ = pnormalize_n(rmatvec(u))
        V0 = jnp.zeros((nloc, maxit), dtype=dtype).at[:, 0].set(v)
        Bmat0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        x0 = jnp.zeros((nloc,), dtype=dtype)

        def step(carry, k):
            x, u, v, V, Bmat, alpha, active, niters = carry
            kdim = k + 1

            Bmat_n = Bmat.at[k, k].set(alpha)
            u_n, beta_k, ok_u = pnormalize_m(matvec(v) - alpha * u)
            Bmat_n = Bmat_n.at[k + 1, k].set(beta_k)

            v2, alpha2, ok2 = pnormalize_n(rmatvec(u_n) - beta_k * v)
            adv = k < maxit - 1
            v_n = jax.lax.select(adv, v2, v)
            alpha_n = jnp.where(adv, alpha2, alpha)
            ok_v = jnp.where(adv, ok2, jnp.bool_(True))
            V_n = jax.lax.select(
                adv, V.at[:, jnp.minimum(k + 1, maxit - 1)].set(v2), V)

            y = _hybrid_lsmr_projected(
                Bmat_n, alpha_n, beta_k, alpha1 * beta1,
                lam_fn(Bmat_n, kdim, b_norm), kdim, maxit, rank1_mode,
                dtype)
            x_n = V_n @ y

            res_k = pnorm_m(b_loc - matvec(x_n)) / b_norm
            err_k = pnorm_n(x_n - xt_loc) / xt_norm

            adopt = active & ok_u & ok_v
            nan = jnp.asarray(jnp.nan, dtype)
            x = jax.lax.select(adopt, x_n, x)
            u = jax.lax.select(adopt, u_n, u)
            v = jax.lax.select(adopt, v_n, v)
            V = jax.lax.select(adopt, V_n, V)
            Bmat = jax.lax.select(adopt, Bmat_n, Bmat)
            alpha = jnp.where(adopt, alpha_n, alpha)
            res_rec = jnp.where(adopt, res_k, nan)
            err_rec = jnp.where(adopt, err_k, nan)
            niters = jnp.where(adopt, kdim, niters)
            active = adopt & (res_k > tol)
            return (x, u, v, V, Bmat, alpha, active, niters), \
                (res_rec, err_rec)

        carry0 = (x0, u, v, V0, Bmat0, alpha1, jnp.bool_(True), jnp.int32(0))
        (x, *_rest, niters), (res_hist, err_hist) = jax.lax.scan(
            step, carry0, jnp.arange(maxit, dtype=jnp.int32))
        return x, err_hist, res_hist, niters

    f = jax.shard_map(
        solver, mesh=mesh, in_specs=_specs2d(axes),
        out_specs=(P(axes[1]), P(), P(), P()), check_vma=False)
    x, err_hist, res_hist, niters = f(A, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters)
