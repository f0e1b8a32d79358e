"""Row-sharded Golub–Kahan family: LSQR / LSMR and their hybrids.

Distributed twins of ``solvers/lsqr.py`` / ``solvers/lsmr.py`` (reference
recurrences ``lsqr_solver.m:20-47``, ``hybrid_lsqr_solver.m:21-46``,
``lsmr_solver.m:32-77``, ``hybrid_lsmr_solver.m:26-45``), completing the
reference's equivalence story (``run_equivalence_plots.m:12-22``) at scale:

  * A is row-partitioned over the mesh (dense (m/p, n) slabs or the tuned
    Pallas :class:`~hybrid_gmres_tpu.parallel.panels.ShardedPanels`);
  * u-space (ray) vectors are m-sharded, v-space (image) vectors n-sharded;
  * each GKB half-step costs ONE collective: the forward matvec gathers the
    n-sharded v (windowed ppermute hops or all_gather — the same exchange
    as the sharded GMRES path), the adjoint matvec reduce-scatters its
    partial straight onto the n-sharding;
  * the Givens/rotation recurrences are scalar and replicated (free).

The exact-adjoint pair both half-steps need (``lsqr_solver.m:22-28``) is
served by the SAME panel through the forward and transposed kernels, so
``<A v, u> == <v, A^T u>`` holds to float reassociation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.parallel.panels import (
    ComposedPanels,
    PanelsWithAdjoint,
    ShardedPanels,
    composed_local_ops,
    gather_window,
    local_matvec,
    local_rmatvec_window,
    scatter_window_to_full,
)
from hybrid_gmres_tpu.solvers.common import GKBResult

__all__ = [
    "lsqr_sharded",
    "hybrid_lsqr_sharded",
    "lsmr_sharded",
    "hybrid_lsmr_sharded",
]


def _prep(A, b, maxit, mesh, axis):
    if mesh is None:
        from hybrid_gmres_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis)
    p = mesh.devices.size
    is_panels = isinstance(A, (ShardedPanels, ComposedPanels,
                               PanelsWithAdjoint))
    m, n = A.shape
    if is_panels and A.p != p:
        raise ValueError(f"panels built for p={A.p}, mesh has {p}")
    if m % p or n % p:
        raise ValueError(f"mesh size {p} must divide m={m} and n={n}")
    if maxit is None:
        maxit = min(m, n)
    return mesh, p, m, n, int(maxit), is_panels


def _local_ops(A_loc, is_panels, axis, dtype, interpret):
    """(matvec, rmatvec, fro_sq_local) on the shard-local operator slab.

    matvec: n-sharded v -> m-sharded u rows (one gather collective).
    rmatvec: m-sharded u -> n-sharded v slab (one reduce_scatter).
    """
    if isinstance(A_loc, ComposedPanels):
        # composed M = A B / B A: both directions from the two panel sets;
        # ||M||_F is not cheaply available (matches the single-chip
        # matrix-free operators, which report NaN there too).
        matvec, rmatvec = composed_local_ops(A_loc, axis, dtype,
                                             interpret=interpret)
        fro_sq = jnp.asarray(jnp.nan, dtype)
    elif isinstance(A_loc, PanelsWithAdjoint):
        # forward-layout adjoint: rmatvec runs the FORWARD kernel of the
        # dedicated A^T panel (gather of the m-sharded u, no reduction) —
        # the GKB twin of the GMRES solvers' B_panels option (DESIGN §12)
        Ap, ATp = A_loc.A, A_loc.AT

        def matvec(v_loc):
            xw = gather_window(Ap, v_loc, axis)
            return local_matvec(Ap, xw, interpret=interpret).astype(dtype)

        def rmatvec(u_loc):
            u = u_loc
            if Ap.row_scale is not None:
                # shared-quantization int8 pair: A^T u = Q^T (s u) — the
                # AT panel stores raw Q^T, the scales ride the input
                u = Ap.row_scale[0] * u.astype(jnp.float32)
            uw = gather_window(ATp, u, axis)
            return local_matvec(ATp, uw, interpret=interpret).astype(dtype)

        fro_sq = Ap.fro_sq.reshape(-1)[0].astype(dtype)
    elif is_panels:
        def matvec(v_loc):
            xw = gather_window(A_loc, v_loc, axis)
            return local_matvec(A_loc, xw, interpret=interpret).astype(dtype)

        def rmatvec(u_loc):
            part = local_rmatvec_window(A_loc, u_loc, interpret=interpret)
            full = scatter_window_to_full(A_loc, part).astype(dtype)
            return jax.lax.psum_scatter(full, axis, scatter_dimension=0,
                                        tiled=True)

        # exact per-shard ||A_slab||_F^2 computed at build time — valid for
        # any storage dtype including int8-quantized panels
        fro_sq = A_loc.fro_sq.reshape(-1)[0].astype(dtype)
    else:
        def matvec(v_loc):
            v_full = jax.lax.all_gather(v_loc, axis, tiled=True)
            return A_loc @ v_full

        def rmatvec(u_loc):
            part = A_loc.T @ u_loc
            return jax.lax.psum_scatter(part, axis, scatter_dimension=0,
                                        tiled=True)

        fro_sq = jnp.sum(A_loc * A_loc)
    return matvec, rmatvec, fro_sq


def _collectives(axis, dtype):
    def pdot(u_loc, v_loc):
        return jax.lax.psum(jnp.dot(u_loc, v_loc), axis)

    def pnorm(u_loc):
        return jnp.sqrt(pdot(u_loc, u_loc))

    def pnormalize(v_loc):
        nrm = pnorm(v_loc)
        ok = nrm > 0
        safe = jnp.where(ok, nrm, jnp.ones((), dtype))
        return (jnp.where(ok, v_loc / safe, jnp.zeros_like(v_loc)), nrm, ok)

    return pdot, pnorm, pnormalize


def _make_purify(axis):
    """Distributed CGS2 purification against a stored sharded basis (the
    ``reorth=True`` mode): each pass is one fused psum of all stored
    coefficients — the sharded twin of the single-chip ``_purify``
    (solvers/lsqr.py)."""
    def purify(Basis_loc, vec_loc):
        vec_loc = vec_loc - Basis_loc @ jax.lax.psum(
            Basis_loc.T @ vec_loc, axis)
        return vec_loc - Basis_loc @ jax.lax.psum(
            Basis_loc.T @ vec_loc, axis)
    return purify


# Pad the stored reorth bases of a resumed carry (global arrays, applied
# OUTSIDE shard_map) out to the new ``maxit + 1`` budget — the shared
# rank-agnostic helper (also serves the 2-D tier and the batched GKB).
from hybrid_gmres_tpu.solvers.common import grow_stored_bases as _grow_bases


def _specs(is_panels, axis):
    A_spec = P(axis) if is_panels else P(axis, None)
    return (A_spec, P(axis), P(axis))


def lsqr_sharded(
    A,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
    resume_from=None,
    x0=None,
    reorth: bool = False,
) -> GKBResult:
    """Sharded LSQR (``lsqr_solver.m:20-47`` semantics: cheap per-iteration
    residual estimate ``|phi_bar|/||b||`` with the final entry patched to the
    true residual).  ``A``: dense (m, n) array or :class:`ShardedPanels`.

    ``resume_from``: a prior sharded result's ``.state`` — the carry's
    vectors stay sharded across the checkpoint (x/v/w n-sharded, u
    m-sharded); ``resume(run(k), K) == run(K)`` exactly.  The state's
    histories are UNPATCHED (the true-residual final patch is re-applied
    after resume), mirroring the single-chip ``solvers/lsqr.py``.
    ``x0``: optional n-length (replicated) warm start — the GKB runs on
    ``b - A x0`` with the iterate carried in x-space, so residual/error
    records and the final patch need no remapping (see the single-chip
    ``lsqr``).
    ``reorth=True``: full CGS2 reorthogonalization against the SHARDED
    stored bases (U m-sharded, V n-sharded; two fused psums per purify
    pass) — holds the full-depth equivalence oracles
    (``run_equivalence_plots.m:26-47``) at scale; pass the same ``reorth``
    when resuming."""
    from hybrid_gmres_tpu.solvers.common import GKBState

    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    resume_fingerprint)

    mesh, p, m, n, maxit, is_panels = _prep(A, b, maxit, mesh, axis)
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    k0 = 0 if resume_from is None else resume_from.res_hist.shape[0]
    if resume_from is not None:
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        check_fingerprint(resume_from, x0, None)
    fp = resume_fingerprint(x0, None)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=b.dtype)

    def solver(A_loc, b_loc, xt_loc, x0_loc, *carry_in):
        matvec, rmatvec, _ = _local_ops(A_loc, is_panels, axis, dtype,
                                        interpret)
        pdot, pnorm, pnormalize = _collectives(axis, dtype)
        purify = _make_purify(axis)
        nloc = n // p
        mloc = m // p

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)
        if carry_in:
            carry0 = carry_in
        else:
            rhs_loc = b_loc - matvec(x0_loc) if have_x0 else b_loc
            u, beta, _ = pnormalize(rhs_loc)
            v, alpha, _ = pnormalize(rmatvec(u))
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
                uhat = purify(U, uhat)
            u_n, beta_k, ok_u = pnormalize(uhat)
            vhat = rmatvec(u_n) - beta_k * v
            if reorth:
                vhat = purify(V, vhat)
            v_n, alpha_n, ok_v = pnormalize(vhat)

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
            err_k = pnorm(x_n - xt_loc) / xt_norm

            ok = ok_u & ok_v
            adopt = active & ok
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
        true_res = pnorm(b_loc - matvec(x)) / b_norm
        return x, err_hist, res_hist, niters, true_res, carry_out

    carry_specs = (P(axis), P(axis), P(axis), P(axis),  # x, u, v, w
                   P(), P(), P(), P(), P())             # scalars/flags
    if reorth:
        carry_specs = carry_specs + (P(axis, None), P(axis, None))
    in_specs = _specs(is_panels, axis) + (P(axis),)
    args = (A, b, x_true, x0)
    if resume_from is not None:
        rc = resume_from.carry
        if reorth:
            if len(rc) != len(carry_specs):
                raise ValueError("resume_from state was saved without "
                                 "reorth bases; pass the same reorth=")
            rc = _grow_bases(rc, maxit, (9, 10))
        elif len(rc) != len(carry_specs):
            raise ValueError("resume_from state carries reorth bases; "
                             "pass reorth=True")
        in_specs = in_specs + carry_specs
        args = args + tuple(rc)
    f = jax.shard_map(
        solver, mesh=mesh, in_specs=in_specs,
        out_specs=(P(axis), P(), P(), P(), P(), carry_specs),
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


def hybrid_lsqr_sharded(
    A,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    lam: float = 1e-3,
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
    x0=None,
    resume_from=None,
    reorth: bool = False,
) -> GKBResult:
    """Sharded LSQR on the Tikhonov-augmented system ``[A; sqrt(lam) I]``
    (``hybrid_lsqr_solver.m:5-6``).  The augmented u-vector lives as an
    (m-sharded, n-sharded) pair — the sqrt(lam)·I block is shard-diagonal so
    it costs no communication; the per-iteration residual is tracked against
    the UNAUGMENTED system (``hybrid_lsqr_solver.m:43``, one extra matvec).

    ``x0``: optional n-length (replicated) warm start — the EXACT Tikhonov
    restart of the single-chip ``hybrid_lsqr``: augmented GKB on
    ``[b - A x0; -sqrt(lam) x0]`` with ``x = x0 + d`` (the regularizer
    still acts on the full ``x``).  ``resume_from``: a prior sharded
    result's ``.state`` (same ``x0``/``lam``/``reorth``) — the carried
    correction stays sharded; ``resume(run(k), K) == run(K)`` exactly.
    ``reorth=True``: full CGS2 reorthogonalization of the augmented
    (Um, Un) and V bases (sharded, fused psums)."""
    from hybrid_gmres_tpu.solvers.common import GKBState

    mesh, p, m, n, maxit, is_panels = _prep(A, b, maxit, mesh, axis)
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
    k0 = 0 if resume_from is None else resume_from.res_hist.shape[0]
    if resume_from is not None:
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        check_fingerprint(resume_from, x0 if have_x0 else None, lam)

    def solver(A_loc, b_loc, xt_loc, x0_loc, *carry_in):
        matvec, rmatvec, _ = _local_ops(A_loc, is_panels, axis, dtype,
                                        interpret)
        pdot, pnorm, _ = _collectives(axis, dtype)
        nloc = n // p
        mloc = m // p
        sql = jnp.sqrt(jnp.asarray(lam, dtype))

        def aug_matvec(v_loc):
            return matvec(v_loc), sql * v_loc

        def aug_rmatvec(um_loc, un_loc):
            return rmatvec(um_loc) + sql * un_loc

        def aug_pnorm(um_loc, un_loc):
            return jnp.sqrt(pdot(um_loc, um_loc) + pdot(un_loc, un_loc))

        def aug_normalize(um_loc, un_loc):
            nrm = aug_pnorm(um_loc, un_loc)
            ok = nrm > 0
            safe = jnp.where(ok, nrm, jnp.ones((), dtype))
            z = jnp.zeros((), dtype)
            return (jnp.where(ok, um_loc / safe, z),
                    jnp.where(ok, un_loc / safe, z), nrm, ok)

        def v_normalize(v_loc):
            nrm = pnorm(v_loc)
            ok = nrm > 0
            safe = jnp.where(ok, nrm, jnp.ones((), dtype))
            return jnp.where(ok, v_loc / safe, jnp.zeros_like(v_loc)), nrm, ok

        def purify_pair(Um, Un, vm, vn):
            # CGS2 on the augmented basis pair: ONE fused psum carries both
            # block coefficients per pass
            c1 = jax.lax.psum(Um.T @ vm + Un.T @ vn, axis)
            vm, vn = vm - Um @ c1, vn - Un @ c1
            c2 = jax.lax.psum(Um.T @ vm + Un.T @ vn, axis)
            return vm - Um @ c2, vn - Un @ c2

        purify = _make_purify(axis)

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)
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
            v, alpha, _ = v_normalize(aug_rmatvec(um, un))
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
            mv_m, mv_n = aug_matvec(v)
            uhat_m, uhat_n = mv_m - alpha_c * um, mv_n - alpha_c * un
            if reorth:
                uhat_m, uhat_n = purify_pair(Um, Un, uhat_m, uhat_n)
            u_nm, u_nn, beta_k, ok_u = aug_normalize(uhat_m, uhat_n)
            vhat = aug_rmatvec(u_nm, u_nn) - beta_k * v
            if reorth:
                vhat = purify(V, vhat)
            v_n, alpha_n, ok_v = v_normalize(vhat)

            rho = jnp.hypot(rho_bar, beta_k)
            c = rho_bar / rho
            s = beta_k / rho
            theta = s * alpha_n
            rho_bar_n = -c * alpha_n
            phi = c * phi_bar
            phi_bar_n = s * phi_bar

            x_n = x + (phi / rho) * w
            w_n = v_n - (theta / rho) * w

            res_k = pnorm(b_loc - matvec(x0_loc + x_n)) / b_norm
            err_k = pnorm(x0_loc + x_n - xt_loc) / xt_norm

            ok = ok_u & ok_v
            adopt = active & ok
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

    carry_specs = (P(axis), P(axis), P(axis), P(axis), P(axis),
                   P(), P(), P(), P(), P())
    if reorth:
        carry_specs = carry_specs + (P(axis, None), P(axis, None),
                                     P(axis, None))
    in_specs = _specs(is_panels, axis) + (P(axis),)
    args = (A, b, x_true, x0)
    if resume_from is not None:
        rc = resume_from.carry
        if len(rc) != len(carry_specs):
            raise ValueError("resume_from state does not match reorth=; "
                             "pass the same reorth as the original run")
        if reorth:
            rc = _grow_bases(rc, maxit, (10, 11, 12))
        in_specs = in_specs + carry_specs
        args = args + tuple(rc)
    f = jax.shard_map(
        solver, mesh=mesh, in_specs=in_specs,
        out_specs=(P(axis), P(), P(), P(), carry_specs), check_vma=False)
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


def lsmr_sharded(
    A,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
    x0=None,
    resume_from=None,
    reorth: bool = False,
) -> GKBResult:
    """Sharded LSMR (``lsmr_solver.m:32-77``): GKB + double plane rotations,
    with the TRUE residual and ``||A^T r||`` histories per iteration.
    ``x0``: optional n-length (replicated) warm start — the GKB runs on
    ``b - A x0`` with the iterate carried in x-space (see the single-chip
    ``lsmr``).  ``resume_from``: a prior sharded result's ``.state`` (same
    ``x0``/``reorth``) — sharded carry, ``resume(run(k), K) == run(K)``
    exactly.  ``reorth=True``: full CGS2 reorthogonalization against the
    sharded stored bases."""
    from hybrid_gmres_tpu.solvers.common import GKBState

    mesh, p, m, n, maxit, is_panels = _prep(A, b, maxit, mesh, axis)
    dtype = b.dtype
    eps = jnp.finfo(dtype).eps
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    resume_fingerprint)

    fp = resume_fingerprint(x0, None)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)
    k0 = 0 if resume_from is None else resume_from.res_hist.shape[0]
    if resume_from is not None:
        if k0 >= maxit:
            raise ValueError(f"resume needs maxit > {k0}")
        check_fingerprint(resume_from, x0 if have_x0 else None, None)

    def solver(A_loc, b_loc, xt_loc, x0_loc, *carry_in):
        matvec, rmatvec, fro_sq_loc = _local_ops(A_loc, is_panels, axis,
                                                 dtype, interpret)
        pdot, pnorm, pnormalize = _collectives(axis, dtype)
        purify = _make_purify(axis)
        nloc = n // p
        mloc = m // p
        fro_norm = jnp.sqrt(jax.lax.psum(fro_sq_loc, axis))

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)

        def step(carry, k):
            if reorth:
                (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
                 cbar, sbar, active, niters, U, V) = carry
            else:
                (x, u, v, h, hbar, alpha, zetabar, alphabar, rho, rhobar,
                 cbar, sbar, active, niters) = carry

            uhat = matvec(v) - alpha * u
            if reorth:
                uhat = purify(U, uhat)
            u_n, beta_k, ok_u = pnormalize(uhat)
            vhat = rmatvec(u_n) - beta_k * v
            if reorth:
                vhat = purify(V, vhat)
            v_n, alpha_n, ok_v = pnormalize(vhat)

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
            r_norm = pnorm(r_loc)
            res_k = r_norm / (b_norm + eps)
            ar_k = pnorm(rmatvec(r_loc)) / (
                fro_norm * jnp.maximum(r_norm, eps))
            err_k = pnorm(x_n - xt_loc) / xt_norm

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
            u, beta1, _ = pnormalize(rhs_loc)
            v, alpha1, _ = pnormalize(rmatvec(u))
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

    carry_specs = (P(axis), P(axis), P(axis), P(axis), P(axis),
                   P(), P(), P(), P(), P(), P(), P(), P(), P())
    if reorth:
        carry_specs = carry_specs + (P(axis, None), P(axis, None))
    in_specs = _specs(is_panels, axis) + (P(axis),)
    args = (A, b, x_true, x0)
    if resume_from is not None:
        rc = resume_from.carry
        if len(rc) != len(carry_specs):
            raise ValueError("resume_from state does not match reorth=; "
                             "pass the same reorth as the original run")
        if reorth:
            rc = _grow_bases(rc, maxit, (14, 15))
        in_specs = in_specs + carry_specs
        args = args + tuple(rc)
    f = jax.shard_map(
        solver, mesh=mesh, in_specs=in_specs,
        out_specs=(P(axis), P(), P(), P(), P(), carry_specs),
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


def hybrid_lsmr_sharded(
    A,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int | None = None,
    lam=1e-3,
    rank1_mode: str = "last",
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
    gcv_grid=None,
    reorth: bool = False,
    x0=None,
    x0_reg: str = "correction",
) -> GKBResult:
    """Sharded hybrid LSMR: GKB with the right basis V row-sharded over the
    image axis, bidiagonal B_k replicated, and the per-iteration shifted
    projected solve (``hybrid_lsmr_solver.m:37-45``) replicated (tiny).

    ``x0``/``x0_reg``: warm start with the same two regularizer semantics
    as the single-chip ``hybrid_lsmr`` ("correction": ``lam ||y||^2``,
    matching the hybrid GMRES warm starts; "full": ``lam ||x0 + V y||^2``
    — one extra fused psum per iteration for the replicated ``V^T x0``).

    ``lam``: scalar, or ``"gcv"`` — HyBR-style per-iteration adaptive
    selection on the replicated projected bidiagonal problem (every shard
    picks the same lambda, zero extra collectives).

    ``reorth=True``: full CGS2 reorthogonalization of both sharded GKB
    bases — holds the hybrid BA-GMRES == hybrid LSMR equivalence
    (``run_equivalence_plots.m:48-58``) to FULL history depth at scale.

    Unlike the single-chip variant's ``lax.cond``, the final-iteration basis
    advance always executes (its collectives must run on every shard) and
    the stale-alpha semantics are recovered with selects."""
    if rank1_mode not in ("last", "first"):
        raise ValueError("rank1_mode must be 'last' or 'first'")
    if x0_reg not in ("correction", "full"):
        raise ValueError("x0_reg must be 'correction' or 'full'")
    mesh, p, m, n, maxit, is_panels = _prep(A, b, maxit, mesh, axis)
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
        matvec, rmatvec, _ = _local_ops(A_loc, is_panels, axis, dtype,
                                        interpret)
        pdot, pnorm, pnormalize = _collectives(axis, dtype)
        purify = _make_purify(axis)
        nloc = n // p
        mloc = m // p

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)
        rhs_loc = b_loc - matvec(x0_loc) if have_x0 else b_loc
        u, beta1, _ = pnormalize(rhs_loc)
        v, alpha1, _ = pnormalize(rmatvec(u))

        def roff(V_k, lam_k):
            # "full": replicated V^T x0 needs ONE fused psum
            if have_x0 and x0_reg == "full":
                return -lam_k * jax.lax.psum(V_k.T @ x0_loc, axis)
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
                uhat = purify(U, uhat)
            u_n, beta_k, ok_u = pnormalize(uhat)
            Bmat_n = Bmat_n.at[k + 1, k].set(beta_k)

            # Always run the advance (collectives must execute on every
            # shard every iteration); the final iteration keeps the stale
            # alpha/v via selects (hybrid_lsmr_solver.m:26-33 semantics).
            vhat = rmatvec(u_n) - beta_k * v
            if reorth:
                vhat = purify(V, vhat)
            v2, alpha2, ok2 = pnormalize(vhat)
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

            res_k = pnorm(rhs_loc - matvec(x_n)) / b_norm
            err_k = pnorm(x0_loc + x_n - xt_loc) / xt_norm

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
        solver, mesh=mesh, in_specs=_specs(is_panels, axis) + (P(axis),),
        out_specs=(P(axis), P(), P(), P()), check_vma=False)
    x, err_hist, res_hist, niters = f(A, b, x_true, x0)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GKBResult(x=x, err_hist=err_hist, res_hist=res_hist,
                     niters=niters)
