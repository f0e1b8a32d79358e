"""2-D (ray x pixel) mesh BA-GMRES — SUMMA-style operator partitioning.

The 1-D schedules (``sharded_full.py`` / ``sharded_pallas.py``) move O(n)
bytes per iteration regardless of mesh size along the gather direction
(docs/DESIGN.md §7-8: the CT projector's full column support makes that the
information-theoretic minimum for a 1-D row partition).  A 2-D mesh breaks
that bound by splitting BOTH operator axes:

  * mesh (pr, pc) with axes ("rows", "cols") — rows partition rays,
    cols partition pixels;
  * A (m, n) is tiled P("rows", "cols"); B (n, m) is tiled
    P("cols", "rows") — the mismatched pair shares the tiling transposed;
  * n-space vectors (image, Krylov basis) live sharded over "cols" and
    REPLICATED over "rows"; m-space vectors (sinogram, images A q) sharded
    over "rows", replicated over "cols";
  * the BA matvec is two local block matmuls + two collectives:
    ``psum_cols(A_blk x_loc)`` -> y row-shard (m/pr elements moved),
    ``psum_rows(B_blk y_loc)`` -> x col-shard (n/pc elements moved).

Per-iteration collective bytes are O(m/pr + n/pc) per device — FALLING in
both mesh dimensions, vs O(n) fixed for the 1-D layout (DESIGN.md §7
table).  CGS2 and the projected solve run replicated over "rows" (free —
redundant flops on data already present, no extra comms); dot products of
n-space vectors psum over "cols" only.

Reference hot loop being distributed: ``BAgmres_hybrid_bounds.m:24-40``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hybrid_gmres_tpu.solvers.common import GMRESResult

__all__ = ["shard_problem_2d", "ba_gmres_sharded_2d"]


def shard_problem_2d(A, B, b, mesh: Mesh, axes=("rows", "cols")):
    """Place (A, B, b) with the 2-D tiling: A P(rows, cols), B P(cols,
    rows), b P(rows)."""
    ar, ac = axes
    A_s = jax.device_put(A, NamedSharding(mesh, P(ar, ac)))
    B_s = jax.device_put(B, NamedSharding(mesh, P(ac, ar)))
    b_s = jax.device_put(b, NamedSharding(mesh, P(ar)))
    return A_s, B_s, b_s


def ba_gmres_sharded_2d(
    A,
    B,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    gcv_grid=None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
) -> GMRESResult:
    """Hybrid/non-hybrid BA-GMRES over a 2-D device mesh.

    ``mesh``: a 2-D mesh from ``make_mesh_2d``.  ``A`` (m, n) and ``B``
    (n, m) dense (or GSPMD-placed via :func:`shard_problem_2d`).
    ``lam``: None / scalar / "gcv" (per-iteration GCV-optimal lambda over
    ``gcv_grid``, evaluated replicated with no extra collectives).  The
    fused exact residual (stored row-sharded images ``A q_k``) is used
    throughout.  Returns the n-sharded-over-cols solution gathered to a
    replicated array by the out_specs.
    """
    if mesh is None:
        raise ValueError("ba_gmres_sharded_2d requires an explicit 2-D mesh")
    ar, ac = axes
    pr, pc = mesh.shape[ar], mesh.shape[ac]
    maxit = int(maxit)
    m, n = A.shape
    if m % pr or n % pc:
        raise ValueError(f"mesh {pr}x{pc} must divide m={m}, n={n}")
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)

    def solver(A_blk, B_blk, b_loc, xt_loc):
        # A_blk (m/pr, n/pc); B_blk (n/pc, m/pr); b_loc (m/pr,) replicated
        # over cols; xt_loc (n/pc,) replicated over rows.
        nloc = n // pc
        mloc = m // pr

        def pdot_n(u, v):
            return jax.lax.psum(jnp.dot(u, v), ac)

        def pdot_m(u, v):
            return jax.lax.psum(jnp.dot(u, v), ar)

        def A_mv(x_loc):
            """row-sharded y = A x from col-sharded x: psum over cols."""
            return jax.lax.psum(A_blk @ x_loc, ac)

        def B_mv(y_loc):
            """col-sharded w = B y from row-sharded y: psum over rows."""
            return jax.lax.psum(B_blk @ y_loc, ar)

        b_norm = jnp.sqrt(pdot_m(b_loc, b_loc))
        xt_norm = jnp.sqrt(pdot_n(xt_loc, xt_loc))

        r0_loc = B_mv(b_loc)
        beta = jnp.sqrt(pdot_n(r0_loc, r0_loc))
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

        beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
        active0 = beta > 0
        Q0 = jnp.zeros((nloc, maxit + 1), dtype=dtype).at[:, 0].set(
            jnp.where(beta > 0, r0_loc / beta_safe, jnp.zeros_like(r0_loc)))
        H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        x0 = jnp.zeros((nloc,), dtype=dtype)
        IMG0 = jnp.zeros((mloc, maxit), dtype=dtype)

        from hybrid_gmres_tpu.solvers.gmres import _make_project_solve

        _ps = _make_project_solve(lam, n, gcv_grid)
        project_solve = lambda H, kdim: _ps(H, None, t, kdim)

        def body(carry, k):
            Q, H, x, active, niters, IMG = carry
            img_loc = A_mv(Q[:, k])              # (m/pr,), one psum over ac
            IMG = IMG.at[:, k].set(img_loc)
            w_loc = B_mv(img_loc)                # (n/pc,), one psum over ar
            c1 = jax.lax.psum(Q.T @ w_loc, ac)
            w_loc = w_loc - Q @ c1
            c2 = jax.lax.psum(Q.T @ w_loc, ac)
            w_loc = w_loc - Q @ c2
            h = c1 + c2
            hnorm = jnp.sqrt(pdot_n(w_loc, w_loc))
            breakdown = hnorm <= jnp.zeros((), dtype)
            hsafe = jnp.where(breakdown, jnp.ones((), dtype), hnorm)
            h = h.at[k + 1].set(hnorm)
            Hn = H.at[:, k].set(h)
            Qn = Q.at[:, k + 1].set(
                jnp.where(breakdown, jnp.zeros_like(w_loc), w_loc / hsafe))
            Qn = jax.lax.select(active, Qn, Q)
            Hn = jax.lax.select(active, Hn, H)

            kdim = k + 1
            y = project_solve(Hn, kdim)          # replicated everywhere
            xk_loc = Qn[:, :maxit] @ y
            r_loc = b_loc - IMG @ y
            res_k = jnp.sqrt(pdot_m(r_loc, r_loc)) / b_norm
            d_loc = xk_loc - xt_loc
            err_k = jnp.sqrt(pdot_n(d_loc, d_loc)) / xt_norm

            adopt = active
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
        in_specs=(P(ar, ac), P(ac, ar), P(ar), P(ac)),
        out_specs=(P(ac), P(), P(), P(), P(ac, None), P(), P()),
        check_vma=False,
    )
    x, err_hist, res_hist, niters, Q, H, beta = f(A, B, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta)
