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

Mode parity with the 1-D tier: every solver takes ``x0`` (correction-space
warm start; EXACT Tikhonov restart on the hybrid LSQR), ``reorth`` (full
CGS2 purification against the tile-sharded stored bases — u-space psums
over the row axis, v-space over the col axis), and — except the hybrid
LSMR, matching 1-D — ``resume_from`` with the carry kept tile-sharded and
fingerprint-guarded (``resume(run(k), K) == run(K)`` exactly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.parallel.panels2d import TiledPanels, tiled_local_ops
from hybrid_gmres_tpu.parallel.sharded_gkb import (_grow_bases,
                                                   _make_purify)
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


# 2-D purify: ``sharded_gkb._make_purify`` parameterized by the basis's
# own mesh axis (u-space bases psum over rows, v-space over cols)
_make_purify2d = _make_purify


def _specs2d(axes):
    ar, ac = axes
    # A tiles (leading pd axis), b row-sharded, x_true col-sharded
    return (P((ar, ac)), P(ar), P(ac))


def _resume_prep(resume_from, maxit, x0, lam, tag=""):
    from hybrid_gmres_tpu.utils.checkpoint import check_fingerprint

    k0 = 0 if resume_from is None else resume_from.res_hist.shape[0]
    if resume_from is not None:
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        check_fingerprint(resume_from, x0, lam, tag=tag)
    return k0


def _check_resume_carry(rc, carry_specs, reorth):
    if len(rc) != len(carry_specs):
        raise ValueError(
            "resume_from state does not match reorth=; pass the same "
            "reorth as the original run"
            if reorth else
            "resume_from state carries reorth bases; pass reorth=True")


def lsqr_sharded_2d(
    A: TiledPanels,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
    x0=None,
    resume_from=None,
    reorth: bool = False,
) -> GKBResult:
    """2-D tiled LSQR (``lsqr_solver.m:20-47`` semantics: cheap residual
    estimate per iteration, final entry patched with the true residual).

    ``x0``: optional n-length (replicated) warm start — the GKB runs on
    ``b - A x0`` with the iterate carried in x-space (see the single-chip
    ``lsqr``).  ``resume_from``: a prior 2-D result's ``.state`` — the
    carry stays tile-sharded (x/v/w col-sharded, u row-sharded) and the
    state's histories are UNPATCHED (the true-residual patch is re-applied
    after resume).  ``reorth=True``: full CGS2 reorthogonalization against
    the stored bases (U row-sharded, V col-sharded; each purify pass psums
    over the basis's own mesh axis only)."""
    from hybrid_gmres_tpu.solvers.common import GKBState
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    ar, ac = axes
    pr, pc, m, n, maxit = _prep2d(A, b, maxit, mesh, axes)
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    k0 = _resume_prep(resume_from, maxit, x0, None)
    fp = resume_fingerprint(x0, None)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)

    def solver(A_loc, b_loc, xt_loc, x0_loc, *carry_in):
        matvec, rmatvec, _ = tiled_local_ops(A_loc, axes, dtype, interpret)
        (pdot_m, pdot_n, pnorm_m, pnorm_n, pnormalize_m,
         pnormalize_n) = _collectives2d(axes, dtype)
        purify_m = _make_purify2d(ar)
        purify_n = _make_purify2d(ac)
        nloc = n // pc
        mloc = m // pr

        b_norm = pnorm_m(b_loc)
        xt_norm = pnorm_n(xt_loc)
        if carry_in:
            carry0 = carry_in
        else:
            rhs_loc = b_loc - matvec(x0_loc) if have_x0 else b_loc
            u, beta, _ = pnormalize_m(rhs_loc)
            v, alpha, _ = pnormalize_n(rmatvec(u))
            w = v
            xc0 = x0_loc + jnp.zeros((nloc,), dtype=dtype)
            carry0 = (xc0, u, v, w, beta, alpha, alpha, jnp.bool_(True),
                      jnp.int32(0))
            if reorth:
                U0 = jnp.zeros((mloc, maxit + 1), dtype).at[:, 0].set(u)
                V0 = jnp.zeros((nloc, maxit + 1), dtype).at[:, 0].set(v)
                carry0 = carry0 + (U0, V0)

        def step(carry, k):
            if reorth:
                (x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters,
                 U, V) = carry
            else:
                x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters = carry
            uhat = matvec(v) - alpha_c * u
            if reorth:
                uhat = purify_m(U, uhat)
            u_n, beta_k, ok_u = pnormalize_m(uhat)
            vhat = rmatvec(u_n) - beta_k * v
            if reorth:
                vhat = purify_n(V, vhat)
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
            out = (x, u, v, w, phi_bar, rho_bar, alpha_c, active, niters)
            if reorth:
                U = jax.lax.select(adopt, U.at[:, k + 1].set(u_n), U)
                V = jax.lax.select(adopt, V.at[:, k + 1].set(v_n), V)
                out = out + (U, V)
            return out, (res_rec, err_rec)

        carry_out, (res_hist, err_hist) = jax.lax.scan(
            step, carry0, jnp.arange(k0, maxit, dtype=jnp.int32))
        x, niters = carry_out[0], carry_out[8]
        # True residual for the final-entry patch (lsqr_solver.m:52),
        # applied OUTSIDE after history concatenation.
        true_res = pnorm_m(b_loc - matvec(x)) / b_norm
        return x, err_hist, res_hist, niters, true_res, carry_out

    carry_specs = (P(ac), P(ar), P(ac), P(ac),  # x, u, v, w
                   P(), P(), P(), P(), P())     # scalars/flags
    if reorth:
        carry_specs = carry_specs + (P(ar, None), P(ac, None))
    in_specs = _specs2d(axes) + (P(ac),)
    args = (A, b, x_true, x0)
    if resume_from is not None:
        rc = resume_from.carry
        _check_resume_carry(rc, carry_specs, reorth)
        if reorth:
            rc = _grow_bases(rc, maxit, (9, 10))
        in_specs = in_specs + carry_specs
        args = args + tuple(rc)
    f = jax.shard_map(
        solver, mesh=mesh, in_specs=in_specs,
        out_specs=(P(ac), P(), P(), P(), P(), carry_specs),
        check_vma=False)
    x, err_new, res_new, niters, true_res, carry_out = f(*args)
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
    state = GKBState(carry=carry_out, res_hist=res_hist, err_hist=err_hist,
                     fp=fp)
    slot = jnp.maximum(niters - 1, 0)
    res_hist = res_hist.at[slot].set(
        jnp.where(niters > 0, true_res, res_hist[slot]))
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, state=state)


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
    x0=None,
    resume_from=None,
    reorth: bool = False,
) -> GKBResult:
    """2-D tiled LSQR on the augmented ``[A; sqrt(lam) I]``
    (``hybrid_lsqr_solver.m:5-6``): the sqrt(lam) I block is col-shard
    diagonal (no communication); the residual is tracked vs the unaugmented
    system (``:43``).

    ``x0``: EXACT Tikhonov warm start — augmented GKB on
    ``[b - A x0; -sqrt(lam) x0]`` with ``x = x0 + d`` (the regularizer
    still acts on the full ``x``), as in the single-chip ``hybrid_lsqr``.
    ``resume_from``: same ``x0``/``lam``/``reorth``, carry tile-sharded.
    ``reorth=True``: CGS2 on the augmented (Um, Un) pair (one psum per mesh
    axis per pass) and the V basis."""
    from hybrid_gmres_tpu.solvers.common import GKBState
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    ar, ac = axes
    pr, pc, m, n, maxit = _prep2d(A, b, maxit, mesh, axes)
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    k0 = _resume_prep(resume_from, maxit, x0, lam)
    fp = resume_fingerprint(x0, lam)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)

    def solver(A_loc, b_loc, xt_loc, x0_loc, *carry_in):
        matvec, rmatvec, _ = tiled_local_ops(A_loc, axes, dtype, interpret)
        (pdot_m, pdot_n, pnorm_m, pnorm_n, _pm,
         pnormalize_n) = _collectives2d(axes, dtype)
        purify_n = _make_purify2d(ac)
        nloc = n // pc
        mloc = m // pr
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

        def purify_pair(Um, Un, vm, vn):
            # CGS2 on the augmented pair: the block coefficients psum over
            # their own mesh axis (rows for Um, cols for Un) and add
            c1 = (jax.lax.psum(Um.T @ vm, ar) +
                  jax.lax.psum(Un.T @ vn, ac))
            vm, vn = vm - Um @ c1, vn - Un @ c1
            c2 = (jax.lax.psum(Um.T @ vm, ar) +
                  jax.lax.psum(Un.T @ vn, ac))
            return vm - Um @ c2, vn - Un @ c2

        b_norm = pnorm_m(b_loc)
        xt_norm = pnorm_n(xt_loc)
        if carry_in:
            carry0 = carry_in
        else:
            if have_x0:
                um0_loc = b_loc - matvec(x0_loc)
                un0_loc = -sql * x0_loc
            else:
                um0_loc = b_loc
                un0_loc = jnp.zeros((nloc,), dtype)
            um, un, beta, _ = aug_normalize(um0_loc, un0_loc)
            v, alpha, _ = pnormalize_n(rmatvec(um) + sql * un)
            w = v
            d0 = jnp.zeros((nloc,), dtype=dtype)
            carry0 = (d0, um, un, v, w, beta, alpha, alpha, jnp.bool_(True),
                      jnp.int32(0))
            if reorth:
                Um0 = jnp.zeros((mloc, maxit + 1), dtype).at[:, 0].set(um)
                Un0 = jnp.zeros((nloc, maxit + 1), dtype).at[:, 0].set(un)
                V0 = jnp.zeros((nloc, maxit + 1), dtype).at[:, 0].set(v)
                carry0 = carry0 + (Um0, Un0, V0)

        def step(carry, k):
            if reorth:
                (x, um, un, v, w, phi_bar, rho_bar, alpha_c, active,
                 niters, Um, Un, V) = carry
            else:
                (x, um, un, v, w, phi_bar, rho_bar, alpha_c, active,
                 niters) = carry
            uhat_m = matvec(v) - alpha_c * um
            uhat_n = sql * v - alpha_c * un
            if reorth:
                uhat_m, uhat_n = purify_pair(Um, Un, uhat_m, uhat_n)
            u_nm, u_nn, beta_k, ok_u = aug_normalize(uhat_m, uhat_n)
            vhat = rmatvec(u_nm) + sql * u_nn - beta_k * v
            if reorth:
                vhat = purify_n(V, vhat)
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

            res_k = pnorm_m(b_loc - matvec(x0_loc + x_n)) / b_norm
            err_k = pnorm_n(x0_loc + x_n - xt_loc) / xt_norm

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
            out = (x, um, un, v, w, phi_bar, rho_bar, alpha_c, active,
                   niters)
            if reorth:
                Um = jax.lax.select(adopt, Um.at[:, k + 1].set(u_nm), Um)
                Un = jax.lax.select(adopt, Un.at[:, k + 1].set(u_nn), Un)
                V = jax.lax.select(adopt, V.at[:, k + 1].set(v_n), V)
                out = out + (Um, Un, V)
            return out, (res_rec, err_rec)

        carry_out, (res_hist, err_hist) = jax.lax.scan(
            step, carry0, jnp.arange(k0, maxit, dtype=jnp.int32))
        x = x0_loc + carry_out[0]
        niters = carry_out[9]
        return x, err_hist, res_hist, niters, carry_out

    carry_specs = (P(ac), P(ar), P(ac), P(ac), P(ac),
                   P(), P(), P(), P(), P())
    if reorth:
        carry_specs = carry_specs + (P(ar, None), P(ac, None), P(ac, None))
    in_specs = _specs2d(axes) + (P(ac),)
    args = (A, b, x_true, x0)
    if resume_from is not None:
        rc = resume_from.carry
        _check_resume_carry(rc, carry_specs, reorth)
        if reorth:
            rc = _grow_bases(rc, maxit, (10, 11, 12))
        in_specs = in_specs + carry_specs
        args = args + tuple(rc)
    f = jax.shard_map(
        solver, mesh=mesh, in_specs=in_specs,
        out_specs=(P(ac), P(), P(), P(), carry_specs), check_vma=False)
    x, err_new, res_new, niters, carry_out = f(*args)
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
    state = GKBState(carry=carry_out, res_hist=res_hist, err_hist=err_hist,
                     fp=fp)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, state=state)


def lsmr_sharded_2d(
    A: TiledPanels,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
    x0=None,
    resume_from=None,
    reorth: bool = False,
) -> GKBResult:
    """2-D tiled LSMR (``lsmr_solver.m:32-77``) with true residual and
    ``||A^T r||`` histories (exact ``||A||_F`` from the tile masses).
    ``x0``: warm start (GKB on ``b - A x0``, iterate carried in x-space).
    ``resume_from``: tile-sharded carry, same ``x0``/``reorth``.
    ``reorth=True``: CGS2 against the stored row-/col-sharded bases."""
    from hybrid_gmres_tpu.solvers.common import GKBState
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    ar, ac = axes
    pr, pc, m, n, maxit = _prep2d(A, b, maxit, mesh, axes)
    dtype = b.dtype
    eps = jnp.finfo(dtype).eps
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    k0 = _resume_prep(resume_from, maxit, x0, None)
    fp = resume_fingerprint(x0, None)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)

    def solver(A_loc, b_loc, xt_loc, x0_loc, *carry_in):
        matvec, rmatvec, fro_sq_loc = tiled_local_ops(A_loc, axes, dtype,
                                                      interpret)
        (pdot_m, pdot_n, pnorm_m, pnorm_n, pnormalize_m,
         pnormalize_n) = _collectives2d(axes, dtype)
        purify_m = _make_purify2d(ar)
        purify_n = _make_purify2d(ac)
        nloc = n // pc
        mloc = m // pr
        fro_norm = jnp.sqrt(jax.lax.psum(
            jax.lax.psum(fro_sq_loc, ar), ac))

        b_norm = pnorm_m(b_loc)
        xt_norm = pnorm_n(xt_loc)

        def step(carry, k):
            if reorth:
                (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
                 cbar, sbar, active, niters, U, V) = carry
            else:
                (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
                 cbar, sbar, active, niters) = carry

            uhat = matvec(v) - alpha * u
            if reorth:
                uhat = purify_m(U, uhat)
            u_n, beta_k, ok_u = pnormalize_m(uhat)
            vhat = rmatvec(u_n) - beta_k * v
            if reorth:
                vhat = purify_n(V, vhat)
            v_n, alpha_n, ok_v = pnormalize_n(vhat)

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
            out = (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
                   cbar, sbar, active, niters)
            if reorth:
                U = jax.lax.select(adopt, U.at[:, k + 1].set(u_n), U)
                V = jax.lax.select(adopt, V.at[:, k + 1].set(v_n), V)
                out = out + (U, V)
            return out, (res_rec, err_rec, ar_rec)

        if carry_in:
            carry0 = carry_in
        else:
            rhs_loc = b_loc - matvec(x0_loc) if have_x0 else b_loc
            u, beta1, _ = pnormalize_m(rhs_loc)
            v, alpha1, _ = pnormalize_n(rmatvec(u))
            xc0 = x0_loc + jnp.zeros((nloc,), dtype=dtype)
            h0 = v
            hbar0 = jnp.zeros((nloc,), dtype=dtype)
            one = jnp.ones((), dtype)
            carry0 = (
                xc0, u, v, h0, hbar0, alpha1, alpha1 * beta1, alpha1, one,
                one, one, jnp.zeros((), dtype), jnp.bool_(True),
                jnp.int32(0),
            )
            if reorth:
                U0 = jnp.zeros((mloc, maxit + 1), dtype).at[:, 0].set(u)
                V0 = jnp.zeros((nloc, maxit + 1), dtype).at[:, 0].set(v)
                carry0 = carry0 + (U0, V0)
        carry_out, (res_hist, err_hist, ar_hist) = jax.lax.scan(
            step, carry0, jnp.arange(k0, maxit, dtype=jnp.int32))
        x, niters = carry_out[0], carry_out[13]
        return x, err_hist, res_hist, niters, ar_hist, carry_out

    carry_specs = (P(ac), P(ar), P(ac), P(ac), P(ac),
                   P(), P(), P(), P(), P(), P(), P(), P(), P())
    if reorth:
        carry_specs = carry_specs + (P(ar, None), P(ac, None))
    in_specs = _specs2d(axes) + (P(ac),)
    args = (A, b, x_true, x0)
    if resume_from is not None:
        rc = resume_from.carry
        _check_resume_carry(rc, carry_specs, reorth)
        if reorth:
            rc = _grow_bases(rc, maxit, (14, 15))
        in_specs = in_specs + carry_specs
        args = args + tuple(rc)
    f = jax.shard_map(
        solver, mesh=mesh, in_specs=in_specs,
        out_specs=(P(ac), P(), P(), P(), P(), carry_specs),
        check_vma=False)
    x, err_new, res_new, niters, ar_new, carry_out = f(*args)
    if resume_from is None:
        res_hist, err_hist, ar_hist = res_new, err_new, ar_new
    else:
        res_hist = jnp.concatenate([resume_from.res_hist, res_new])
        err_hist = jnp.concatenate([resume_from.err_hist, err_new])
        ar_hist = jnp.concatenate([resume_from.ar_hist, ar_new])
    state = GKBState(carry=carry_out, res_hist=res_hist, err_hist=err_hist,
                     ar_hist=ar_hist, fp=fp)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters, ar_hist=ar_hist, state=state)


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
    x0=None,
    x0_reg: str = "correction",
    reorth: bool = False,
) -> GKBResult:
    """2-D tiled hybrid LSMR: right basis V sharded over the col axis,
    bidiagonal B_k replicated, shifted projected solve
    (``hybrid_lsmr_solver.m:37-45``) replicated; ``lam`` scalar or "gcv"
    (HyBR-style per-iteration selection, zero extra collectives).

    ``x0``/``x0_reg``: warm start with the same two regularizer semantics
    as the single-chip ``hybrid_lsmr`` ("correction": ``lam ||y||^2``;
    "full": ``lam ||x0 + V y||^2`` — one extra col-axis psum per
    iteration for the replicated ``V^T x0``).  ``reorth=True``: full CGS2
    of both tile-sharded GKB bases — holds the hybrid equivalence oracles
    (``run_equivalence_plots.m:48-58``) to full depth on this layout."""
    if rank1_mode not in ("last", "first"):
        raise ValueError("rank1_mode must be 'last' or 'first'")
    if x0_reg not in ("correction", "full"):
        raise ValueError("x0_reg must be 'correction' or 'full'")
    ar, ac = axes
    pr, pc, m, n, maxit = _prep2d(A, b, maxit, mesh, axes)
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)
    from hybrid_gmres_tpu.solvers.lsmr import (
        _hybrid_lsmr_projected, make_hybrid_lsmr_lam_fn)

    lam_fn = make_hybrid_lsmr_lam_fn(lam, gcv_grid, n, maxit, dtype)

    def solver(A_loc, b_loc, xt_loc, x0_loc):
        matvec, rmatvec, _ = tiled_local_ops(A_loc, axes, dtype, interpret)
        (pdot_m, pdot_n, pnorm_m, pnorm_n, pnormalize_m,
         pnormalize_n) = _collectives2d(axes, dtype)
        purify_m = _make_purify2d(ar)
        purify_n = _make_purify2d(ac)
        nloc = n // pc
        mloc = m // pr

        b_norm = pnorm_m(b_loc)
        xt_norm = pnorm_n(xt_loc)
        rhs_loc = b_loc - matvec(x0_loc) if have_x0 else b_loc
        u, beta1, _ = pnormalize_m(rhs_loc)
        v, alpha1, _ = pnormalize_n(rmatvec(u))

        def roff(V_k, lam_k):
            # "full": replicated V^T x0 needs ONE col-axis psum
            if have_x0 and x0_reg == "full":
                return -lam_k * jax.lax.psum(V_k.T @ x0_loc, ac)
            return None

        V0 = jnp.zeros((nloc, maxit), dtype=dtype).at[:, 0].set(v)
        Bmat0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        d0 = jnp.zeros((nloc,), dtype=dtype)
        U0 = (jnp.zeros((mloc, maxit + 1), dtype).at[:, 0].set(u)
              if reorth else jnp.zeros((0, 0), dtype))

        def step(carry, k):
            x, u, v, V, Bmat, alpha, active, niters, U = carry
            kdim = k + 1

            Bmat_n = Bmat.at[k, k].set(alpha)
            uhat = matvec(v) - alpha * u
            if reorth:
                uhat = purify_m(U, uhat)
            u_n, beta_k, ok_u = pnormalize_m(uhat)
            Bmat_n = Bmat_n.at[k + 1, k].set(beta_k)

            # Always run the advance (collectives must execute on every
            # shard every iteration); the final iteration keeps the stale
            # alpha/v via selects (hybrid_lsmr_solver.m:26-33 semantics).
            vhat = rmatvec(u_n) - beta_k * v
            if reorth:
                vhat = purify_n(V, vhat)
            v2, alpha2, ok2 = pnormalize_n(vhat)
            adv = k < maxit - 1
            v_n = jax.lax.select(adv, v2, v)
            alpha_n = jnp.where(adv, alpha2, alpha)
            ok_v = jnp.where(adv, ok2, jnp.bool_(True))
            V_n = jax.lax.select(
                adv, V.at[:, jnp.minimum(k + 1, maxit - 1)].set(v2), V)
            U_n = U.at[:, k + 1].set(u_n) if reorth else U

            lam_k = lam_fn(Bmat_n, kdim, b_norm)
            y = _hybrid_lsmr_projected(
                Bmat_n, alpha_n, beta_k, alpha1 * beta1,
                lam_k, kdim, maxit, rank1_mode,
                dtype, rhs_offset=roff(V_n, lam_k))
            x_n = V_n @ y

            res_k = pnorm_m(rhs_loc - matvec(x_n)) / b_norm
            err_k = pnorm_n(x0_loc + x_n - xt_loc) / xt_norm

            adopt = active & ok_u & ok_v
            nan = jnp.asarray(jnp.nan, dtype)
            x = jax.lax.select(adopt, x_n, x)
            u = jax.lax.select(adopt, u_n, u)
            v = jax.lax.select(adopt, v_n, v)
            V = jax.lax.select(adopt, V_n, V)
            Bmat = jax.lax.select(adopt, Bmat_n, Bmat)
            if reorth:
                U = jax.lax.select(adopt, U_n, U)
            alpha = jnp.where(adopt, alpha_n, alpha)
            res_rec = jnp.where(adopt, res_k, nan)
            err_rec = jnp.where(adopt, err_k, nan)
            niters = jnp.where(adopt, kdim, niters)
            active = adopt & (res_k > tol)
            return (x, u, v, V, Bmat, alpha, active, niters, U), \
                (res_rec, err_rec)

        carry0 = (d0, u, v, V0, Bmat0, alpha1, jnp.bool_(True),
                  jnp.int32(0), U0)
        (d, *_rest), (res_hist, err_hist) = jax.lax.scan(
            step, carry0, jnp.arange(maxit, dtype=jnp.int32))
        niters = _rest[6]
        return x0_loc + d, err_hist, res_hist, niters

    f = jax.shard_map(
        solver, mesh=mesh, in_specs=_specs2d(axes) + (P(ac),),
        out_specs=(P(ac), P(), P(), P()), check_vma=False)
    x, err_hist, res_hist, niters = f(A, b, x_true, x0)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters)
