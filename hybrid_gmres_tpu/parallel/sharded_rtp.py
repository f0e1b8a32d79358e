"""Sharded regularize-then-project (RTP) hybrid GMRES — distributed twins
of ``solvers/rtp.py`` on the Pallas-panel schedule.

Both build the Krylov space on the SHIFTED operator ``B A + lam I``
(reference ``hybrid_ab_gmres_rtp.m:6-7``): the shift is shard-diagonal
(``+ lam * q_loc`` on the n-sharded slab), so RTP costs exactly the same
per-iteration communication as the PTR solvers in ``sharded_pallas.py`` —
one windowed/full x gather, one reduce_scatter(n), two fused psum(k+1)
CGS2 reductions, scalar psums.

The AB variant's inner solve ``y = (AQ' AQ + lam I)^{-1} AQ' b``
(``hybrid_ab_gmres_rtp.m:31-33``) is built INCREMENTALLY from the stored
image basis: each iteration's new column ``g_k = IMG^T img_k`` and scalar
``img_k . b`` ride ONE fused psum(maxit+1), instead of re-projecting the
full basis (the reference recomputes A*Q(:,1:k) every iteration).

The per-iteration TRUE residual ``||b - A x_k||`` comes from the stored
``A q_k`` images for both variants (no extra SpMV, the fused-residual
schedule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.krylov.projected import (
    projected_gram_tikhonov_solve,
    projected_ls_solve,
)
from hybrid_gmres_tpu.parallel.panels import (
    ShardedPanels,
    gather_window,
    local_matvec,
)
from hybrid_gmres_tpu.parallel.sharded_pallas import _make_B_mv, _validate
from hybrid_gmres_tpu.solvers.common import GMRESResult

__all__ = ["ba_gmres_rtp_sharded", "ab_gmres_rtp_sharded"]


def _rtp_core(kind, A_panels, BT_panels, b, x_true, tol, maxit, lam, mesh,
              axis, interpret, B_panels=None):
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
    lam_c = jnp.asarray(lam, dtype)

    def solver(A_loc, B_loc, b_loc, xt_loc):
        nloc = n // p
        mloc = m // p

        def pdot(u_loc, v_loc):
            return jax.lax.psum(jnp.dot(u_loc, v_loc), axis)

        def pnorm(u_loc):
            return jnp.sqrt(pdot(u_loc, u_loc))

        def A_mv(x_loc):
            x_win = gather_window(A_loc, x_loc, axis)
            return local_matvec(A_loc, x_win, interpret=interpret
                                ).astype(dtype)

        B_mv_scatter = _make_B_mv(B_loc, b_forward, axis, dtype,
                                  interpret)

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)

        r0_loc = B_mv_scatter(b_loc)   # d = B b (hybrid_ba_gmres_rtp.m:6)
        beta = pnorm(r0_loc)
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

        beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
        active0 = beta > 0
        Q0 = jnp.zeros((nloc, maxit + 1), dtype=dtype).at[:, 0].set(
            jnp.where(beta > 0, r0_loc / beta_safe, jnp.zeros_like(r0_loc)))
        H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        x0 = jnp.zeros((nloc,), dtype=dtype)
        IMG0 = jnp.zeros((mloc, maxit), dtype=dtype)
        # AB inner-solve accumulators (replicated, built one fused psum per
        # iteration): G = (A Q)'(A Q), rhs = (A Q)' b
        G0 = jnp.zeros((maxit, maxit), dtype=dtype)
        g0 = jnp.zeros((maxit,), dtype=dtype)

        def body(carry, k):
            Q, H, x, active, niters, IMG, G, g = carry
            img_loc = A_mv(Q[:, k])                  # A q_k rows
            IMG_n = IMG.at[:, k].set(img_loc)
            # shifted operator: w = B (A q) + lam q, shard-diagonal shift
            w_loc = B_mv_scatter(img_loc) + lam_c * Q[:, k]
            if kind == "ab":
                # one fused psum carries the new Gram column AND the rhs
                # entry: [IMG^T img_k ; img_k . b].  HIGHEST precision on
                # the local products: the Gram solve squares the
                # conditioning, and the TPU default f32 matmul (bf16
                # passes) was measured to cost ~1e-2 late-history drift
                # vs the recomputed dense Gram (VERDICT r3 #7)
                hi = jax.lax.Precision.HIGHEST
                loc = jnp.concatenate(
                    [jnp.matmul(IMG_n.T, img_loc, precision=hi),
                     jnp.dot(img_loc, b_loc, precision=hi)[None]])
                red = jax.lax.psum(loc, axis)
                col, rhs_k = red[:maxit], red[maxit]
                G_n = G.at[:, k].set(col).at[k, :].set(col)
                g_n = g.at[k].set(rhs_k)
            else:
                G_n, g_n = G, g
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
            IMG_n = jax.lax.select(active, IMG_n, IMG)
            G_n = jax.lax.select(active, G_n, G)
            g_n = jnp.where(active, g_n, g)

            kdim = k + 1
            if kind == "ab":
                # Tikhonov re-solve vs the ORIGINAL A, b restricted to Q_k
                # (hybrid_ab_gmres_rtp.m:31-33), replicated k x k compute
                y = projected_gram_tikhonov_solve(G_n, g_n, lam, kdim)
            else:
                # plain projected Hessenberg LS (hybrid_ba_gmres_rtp.m:28-30)
                y = projected_ls_solve(Hn, t, kdim)
            xk_loc = Qn[:, :maxit] @ y
            r_loc = b_loc - IMG_n @ y
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
            return (Qn, Hn, x, active, niters, IMG_n, G_n, g_n), \
                (res_rec, err_rec)

        (Q, H, x, _, niters, _, _, _), (res_hist, err_hist) = jax.lax.scan(
            body,
            (Q0, H0, x0, active0, jnp.int32(0), IMG0, G0, g0),
            jnp.arange(maxit, dtype=jnp.int32),
        )
        return x, err_hist, res_hist, niters, Q, H, beta

    f = jax.shard_map(
        solver,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(), P(), P(), P(axis, None), P(), P()),
        check_vma=False,
    )
    x, err_hist, res_hist, niters, Q, H, beta = f(
        A_panels, Bp, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta)


def ba_gmres_rtp_sharded(
    A_panels: ShardedPanels,
    BT_panels: ShardedPanels | None,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam: float = 1e-3,
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
    B_panels: ShardedPanels | None = None,
) -> GMRESResult:
    """Sharded BA-GMRES (RTP): Krylov on ``B A + lam I``, plain projected
    Hessenberg solve (``hybrid_ba_gmres_rtp.m:6-35`` at scale).
    ``B_panels``: optional forward-layout back-projector (``_make_B_mv``)."""
    return _rtp_core("ba", A_panels, BT_panels, b, x_true, tol, maxit, lam,
                     mesh, axis, interpret, B_panels=B_panels)


def ab_gmres_rtp_sharded(
    A_panels: ShardedPanels,
    BT_panels: ShardedPanels | None,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam: float = 1e-3,
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
    B_panels: ShardedPanels | None = None,
) -> GMRESResult:
    """Sharded AB-GMRES (RTP): Krylov on ``B A + lam I``; inner Tikhonov
    solve vs the original A, b via the incrementally-accumulated image Gram
    (``hybrid_ab_gmres_rtp.m:6-33`` at scale).
    ``B_panels``: optional forward-layout back-projector (``_make_B_mv``)."""
    return _rtp_core("ab", A_panels, BT_panels, b, x_true, tol, maxit, lam,
                     mesh, axis, interpret, B_panels=B_panels)
