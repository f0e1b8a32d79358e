"""L-curve / error-vs-lambda sweeps for the hybrid solvers.

The reference sweeps 100 lambdas by re-running the full solver per lambda
(``analyze_regularization.m:22-33`` — 200 dense solver runs including a fresh
eig(M) each).  Here the whole sweep is one ``vmap`` of the jitted solver over
the lambda grid: the Arnoldi recurrence is re-run per lambda only for the RTP
variants (whose Krylov space depends on lambda); for PTR solvers the sweep
batches on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.ops.linear_operator import as_operator
from hybrid_gmres_tpu.solvers.gmres import ab_gmres, ba_gmres


class LCurveSweep(NamedTuple):
    lam_grid: jax.Array
    res_norms: jax.Array  # ||b - A x_lam|| / ||b||   (at final iteration)
    sol_norms: jax.Array  # ||x_lam||
    err_norms: jax.Array  # final relative error
    lam_true_opt: jax.Array  # argmin of err_norms
    err_min: jax.Array


def lcurve_sweep(
    variant: str,
    A,
    B,
    b,
    x_true,
    lam_grid,
    tol: float = 1e-6,
    maxit: int = 32,
) -> LCurveSweep:
    """Sweep a hybrid PTR solver over ``lam_grid``; returns L-curve data."""
    A = as_operator(A)
    B = as_operator(B)
    solver = {"ab": ab_gmres, "ba": ba_gmres}[variant]
    lam_grid = jnp.asarray(lam_grid)
    b_norm = jnp.linalg.norm(b)

    def run(lam):
        r = solver(A, B, b, x_true, tol=tol, maxit=maxit, lam=lam)
        res = jnp.linalg.norm(b - A.matvec(r.x)) / b_norm
        sol = jnp.linalg.norm(r.x)
        err = r.err_hist[r.niters - 1]
        return res, sol, err

    res_norms, sol_norms, err_norms = jax.jit(jax.vmap(run))(lam_grid)
    idx = jnp.argmin(err_norms)
    return LCurveSweep(
        lam_grid=lam_grid,
        res_norms=res_norms,
        sol_norms=sol_norms,
        err_norms=err_norms,
        lam_true_opt=lam_grid[idx],
        err_min=err_norms[idx],
    )
