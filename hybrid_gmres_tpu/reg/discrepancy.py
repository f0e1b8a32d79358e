"""Morozov discrepancy-principle lambda selection on the projected problem.

No reference counterpart (the reference selects lambda by GCV,
``gcv_function.m``, or by oracle sweeps, ``analyze_regularization.m:22-33``);
this is the standard alternative when a noise-level estimate ``delta =
||e||`` is available: pick the LARGEST lambda whose Tikhonov-regularized
iterate still fits the data to ``tau * delta`` (residuals increase
monotonically with lambda, so that is the crossing of
``||b - A x_lam|| = tau * delta``).

TPU shape: ONE Arnoldi factorization, then the whole lambda grid is solved
on the projected k x k system under ``vmap`` and the candidate solutions'
true residuals are formed as a single batched matmul — the
``plot_gcv_surface.m:58-102`` factor-once pattern applied to a different
selection functional.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.krylov.arnoldi import arnoldi
from hybrid_gmres_tpu.krylov.projected import projected_tikhonov_solve
from hybrid_gmres_tpu.ops.linear_operator import as_operator


def discrepancy_lambda(
    variant: str,
    A,
    B,
    b,
    delta,
    tau: float = 1.02,
    k: int = 20,
    lam_grid=None,
):
    """(lam, info): largest grid lambda with ``||b - A x_lam|| <= tau*delta``.

    ``variant``: "ab" (Krylov on A B, x = B Q y) or "ba" (Krylov on B A with
    r0 = B b, x = Q y).  Falls back to the smallest-residual lambda if no
    grid point satisfies the bound (delta too optimistic).  ``info`` carries
    the grid and residual curve for diagnostics.
    """
    A = as_operator(A)
    B = as_operator(B)
    if lam_grid is None:
        import numpy as np

        lam_grid = np.logspace(-9, 0, 80)
    if variant == "ab":
        mv = lambda q: A.matvec(B.matvec(q))
        r0 = b
    elif variant == "ba":
        mv = lambda q: B.matvec(A.matvec(q))
        r0 = B.matvec(b)
    else:
        raise ValueError("variant must be 'ab' or 'ba'")
    k = int(k)
    Q, H, beta, nsteps = arnoldi(mv, r0, k, breakdown_tol=1e-12)
    t = jnp.zeros((k + 1,), dtype=H.dtype).at[0].set(beta)
    lam_grid = jnp.asarray(lam_grid, dtype=H.dtype)

    ys = jax.vmap(lambda lam: projected_tikhonov_solve(H, t, lam, nsteps))(
        lam_grid)                                    # (L, k)
    X = Q[:, :k] @ ys.T                              # (n_or_m, L)
    if variant == "ab":
        X = B.matvec_mat(X) if hasattr(B, "matvec_mat") else jax.vmap(
            B.matvec, in_axes=1, out_axes=1)(X)
    R = jax.vmap(A.matvec, in_axes=1, out_axes=1)(X)  # (m, L)
    res = jnp.linalg.norm(b[:, None] - R, axis=0)     # (L,)

    bound = jnp.asarray(tau, res.dtype) * jnp.asarray(delta, res.dtype)
    ok = res <= bound
    # largest feasible lambda; else the smallest-residual one
    idx_feasible = jnp.where(ok, jnp.arange(res.shape[0]), -1).max()
    idx = jnp.where(idx_feasible >= 0, idx_feasible, jnp.argmin(res))
    lam = lam_grid[idx]
    return lam, {"lam_grid": lam_grid, "res": res, "feasible": ok,
                 "bound": bound, "nsteps": nsteps}
