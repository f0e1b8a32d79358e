"""Fully-sharded BA-GMRES: the Krylov basis itself is partitioned.

``ba_gmres_sharded`` (sharded.py) keeps the n-space basis replicated — fine
when the image is small.  Here the basis is **row-sharded over the mesh**
(the analog of sequence parallelism for Krylov bases, SURVEY.md §5): each
device owns an (n/p, maxit+1) slice of Q, and per iteration the collectives
are exactly:

  * one all_gather of the n-vector x for the A-side matvec,
  * one psum of the n-vector for the B-side product,
  * one fused psum of all maxit+1 CGS2 coefficients per orthogonalization
    pass (the reference's sequential MGS loop, ``BAgmres_hybrid_bounds.m:
    26-29``, would need k round-trips), with the basis never leaving its
    shard,
  * scalar psums for norms/residuals.

Operator placement matches ``shard_problem``: A row-partitioned over rays
P(axis, None), B column-partitioned P(None, axis); additionally B's *rows*
(image space) are sharded for the local basis update, handled here by
slicing the replicated psum result.  The projected k x k solves are
replicated compute on every device (tiny).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.krylov.projected import (
    projected_ls_solve,
    projected_tikhonov_solve,
)
from hybrid_gmres_tpu.solvers.common import GMRESResult


def ba_gmres_sharded_basis(
    A,
    B,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    mesh: Mesh | None = None,
    axis: str = "rows",
    residual: str = "true",
) -> GMRESResult:
    """BA-GMRES with a row-sharded Krylov basis over a 1-D mesh.

    ``residual="fused"`` keeps the per-step images ``(A q_k)`` (already
    computed by the Krylov matvec) in an m-sharded basis and forms the TRUE
    residual as ``||b - IMG y||`` via one scalar psum — dropping BOTH the
    per-iteration residual matmul against A and the all_gather of the
    n-vector iterate (identical values up to float reassociation).
    """
    if residual not in ("true", "fused"):
        raise ValueError("residual must be 'true' or 'fused'")
    if mesh is None:
        from hybrid_gmres_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis)
    maxit = int(maxit)
    p = mesh.devices.size
    m, n = A.shape
    if n % p or m % p:
        raise ValueError(
            f"mesh size {p} must divide both m={m} and n={n}")
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)

    def solver(A_loc, B_loc, b_loc, xt_loc):
        # A_loc: (m/p, n); B_loc: (n, m/p); b_loc, y-space vectors: (m/p,)
        nloc = n // p
        my = jax.lax.axis_index(axis)

        def pdot(u_loc, v_loc):
            return jax.lax.psum(jnp.dot(u_loc, v_loc), axis)

        def pnorm(u_loc):
            return jnp.sqrt(pdot(u_loc, u_loc))

        def my_slice(v_full):
            return jax.lax.dynamic_slice(v_full, (my * nloc,), (nloc,))

        def ba_mv_from_xfull(x_full):
            """(w_loc, y_loc): the BA shard product and the m-space image
            A x (kept for the fused residual), one psum of the n-vector."""
            y_loc = A_loc @ x_full
            w_full = jax.lax.psum(B_loc @ y_loc, axis)
            return my_slice(w_full), y_loc

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)

        r0_full = jax.lax.psum(B_loc @ b_loc, axis)
        r0_loc = my_slice(r0_full)
        beta = pnorm(r0_loc)
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

        beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
        active0 = beta > 0
        Q0 = jnp.zeros((nloc, maxit + 1), dtype=dtype).at[:, 0].set(
            jnp.where(beta > 0, r0_loc / beta_safe, jnp.zeros_like(r0_loc)))
        H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        x0 = jnp.zeros((nloc,), dtype=dtype)

        if lam is None:
            project_solve = lambda H, kdim: projected_ls_solve(H, t, kdim)
        else:
            project_solve = lambda H, kdim: projected_tikhonov_solve(
                H, t, lam, kdim
            )

        IMG0 = (jnp.zeros((m // p, maxit), dtype=dtype)
                if residual == "fused" else None)

        def body(carry, k):
            Q, H, x, active, niters, IMG = carry
            q_loc = Q[:, k]
            q_full = jax.lax.all_gather(q_loc, axis, tiled=True)
            w_loc, img_loc = ba_mv_from_xfull(q_full)
            if residual == "fused":
                IMG = IMG.at[:, k].set(img_loc)
            # CGS2: two passes, each ONE fused psum of all coefficients
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
                jnp.where(breakdown, jnp.zeros_like(w_loc), w_loc / hsafe)
            )
            Qn = jax.lax.select(active, Qn, Q)
            Hn = jax.lax.select(active, Hn, H)

            kdim = k + 1
            y = project_solve(Hn, kdim)        # replicated k x k solve
            xk_loc = Qn[:, :maxit] @ y
            if residual == "fused":
                r_loc = b_loc - IMG @ y        # m-sharded; no A matmul,
                res_k = pnorm(r_loc) / b_norm  # no all_gather of the iterate
            else:
                xk_full = jax.lax.all_gather(xk_loc, axis, tiled=True)
                r_loc = b_loc - A_loc @ xk_full
                res_k = jnp.sqrt(pdot(r_loc, r_loc)) / b_norm
            d_loc = xk_loc - xt_loc
            err_k = jnp.sqrt(pdot(d_loc, d_loc)) / xt_norm

            adopt = active  # lucky breakdown: the projected solve is exact
            x = jax.lax.select(adopt, xk_loc, x)
            nan = jnp.asarray(jnp.nan, dtype)
            res_rec = jnp.where(adopt, res_k, nan)
            err_rec = jnp.where(adopt, err_k, nan)
            niters = jnp.where(adopt, kdim, niters)
            stop = breakdown | (res_k <= tol)
            active = active & ~stop
            return (Qn, Hn, x, active, niters, IMG), (res_rec, err_rec)

        (Q, H, x, _, niters, _), (res_hist, err_hist) = jax.lax.scan(
            body,
            (Q0, H0, x0, active0, jnp.int32(0), IMG0),
            jnp.arange(maxit, dtype=jnp.int32),
        )
        return x, err_hist, res_hist, niters, Q, H, beta

    f = jax.shard_map(
        solver,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P(axis), P(axis)),
        out_specs=(P(axis), P(), P(), P(), P(axis, None), P(), P()),
        check_vma=False,
    )
    x, err_hist, res_hist, niters, Q, H, beta = f(A, B, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta)


def ab_gmres_sharded_basis(
    A,
    B,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    mesh: Mesh | None = None,
    axis: str = "rows",
    residual: str = "true",
) -> GMRESResult:
    """AB-GMRES with the m-space Krylov basis sharded over the ray axis.

    The natural big-data layout (m = rays >> n = pixels): each device owns
    an (m/p, maxit+1) slice of the m-space basis.  Per iteration: one psum(n)
    for the image intermediate x = B q, a local A-row matmul, one fused
    psum(k+1) per CGS2 pass, scalar psums for norms.  The solution back-map
    ``x = B (Q_k y)`` is one more psum(n).

    ``residual="fused"`` stores the replicated image basis ``S_k = B q_k``
    and the m-sharded raw images ``W_k = A B q_k``: the solution becomes
    ``x = S y`` (no back-map psum) and the TRUE residual ``||b - W y||``
    (no A matmul) — identical values up to float reassociation.
    """
    if residual not in ("true", "fused"):
        raise ValueError("residual must be 'true' or 'fused'")
    if mesh is None:
        from hybrid_gmres_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis)
    maxit = int(maxit)
    p = mesh.devices.size
    m, n = A.shape
    if m % p:
        raise ValueError(f"mesh size {p} must divide m={m}")
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)

    def solver(A_loc, B_loc, b_loc, xt_full):
        # A_loc: (m/p, n); B_loc: (n, m/p); m-space vectors: (m/p,)
        def pdot(u_loc, v_loc):
            return jax.lax.psum(jnp.dot(u_loc, v_loc), axis)

        def pnorm(u_loc):
            return jnp.sqrt(pdot(u_loc, u_loc))

        def back_map(q_loc):
            """x = B q for an m-sharded q: one psum of the n-vector."""
            return jax.lax.psum(B_loc @ q_loc, axis)

        b_norm = pnorm(b_loc)
        xt_norm = jnp.linalg.norm(xt_full)

        beta = pnorm(b_loc)
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)
        mloc = b_loc.shape[0]
        beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
        active0 = beta > 0
        Q0 = jnp.zeros((mloc, maxit + 1), dtype=dtype).at[:, 0].set(
            jnp.where(beta > 0, b_loc / beta_safe, jnp.zeros_like(b_loc)))
        H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        x0 = jnp.zeros((n,), dtype=dtype)

        if lam is None:
            project_solve = lambda H, kdim: projected_ls_solve(H, t, kdim)
        else:
            project_solve = lambda H, kdim: projected_tikhonov_solve(
                H, t, lam, kdim
            )

        if residual == "fused":
            S0 = jnp.zeros((n, maxit), dtype=dtype)
            W0 = jnp.zeros((mloc, maxit), dtype=dtype)
        else:
            S0, W0 = None, None

        def body(carry, k):
            Q, H, x, active, niters, S, W = carry
            q_loc = Q[:, k]
            ximg = back_map(q_loc)            # (n,) replicated
            w_loc = A_loc @ ximg              # local rows
            if residual == "fused":
                S = S.at[:, k].set(ximg)
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
                jnp.where(breakdown, jnp.zeros_like(w_loc), w_loc / hsafe)
            )
            Qn = jax.lax.select(active, Qn, Q)
            Hn = jax.lax.select(active, Hn, H)

            kdim = k + 1
            y = project_solve(Hn, kdim)
            if residual == "fused":
                xk = S @ y                    # x = (B Q) y, replicated (n,)
                r_loc = b_loc - W @ y         # no A matmul, no back-map psum
                res_k = pnorm(r_loc) / b_norm
            else:
                z_loc = Qn[:, :maxit] @ y
                xk = back_map(z_loc)          # x = B (Q y), replicated (n,)
                r_loc = b_loc - A_loc @ xk
                res_k = jnp.sqrt(pdot(r_loc, r_loc)) / b_norm
            err_k = jnp.linalg.norm(xk - xt_full) / xt_norm

            adopt = active  # lucky breakdown: the projected solve is exact
            x = jax.lax.select(adopt, xk, x)
            nan = jnp.asarray(jnp.nan, dtype)
            res_rec = jnp.where(adopt, res_k, nan)
            err_rec = jnp.where(adopt, err_k, nan)
            niters = jnp.where(adopt, kdim, niters)
            stop = breakdown | (res_k <= tol)
            active = active & ~stop
            return (Qn, Hn, x, active, niters, S, W), (res_rec, err_rec)

        (Q, H, x, _, niters, _, _), (res_hist, err_hist) = jax.lax.scan(
            body,
            (Q0, H0, x0, active0, jnp.int32(0), S0, W0),
            jnp.arange(maxit, dtype=jnp.int32),
        )
        return x, err_hist, res_hist, niters, Q, H, beta

    f = jax.shard_map(
        solver,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P(axis), P()),
        out_specs=(P(), P(), P(), P(), P(axis, None), P(), P()),
        check_vma=False,
    )
    x, err_hist, res_hist, niters, Q, H, beta = f(A, B, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta)
