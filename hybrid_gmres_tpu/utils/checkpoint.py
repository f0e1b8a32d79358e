"""Krylov-state checkpoint / resume.

The reference recomputes everything from scratch (no save/load anywhere —
SURVEY.md §5).  Here a solver result (which carries the full padded Krylov
factorization Q, H) can be saved and a GMRES solve *continued* from it with
a larger iteration budget: the Arnoldi recurrence restarts exactly where it
stopped, so ``resume(save(run(maxit=k)), maxit=K)`` equals ``run(maxit=K)``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hybrid_gmres_tpu.solvers.common import GMRESResult


def save_state(path: str, result: GMRESResult) -> None:
    np.savez_compressed(
        path,
        x=np.asarray(result.x),
        err_hist=np.asarray(result.err_hist),
        res_hist=np.asarray(result.res_hist),
        niters=int(result.niters),
        Q=np.asarray(result.Q),
        H=np.asarray(result.H),
        beta=np.asarray(result.beta),
    )


def load_state(path: str) -> GMRESResult:
    z = np.load(path)
    return GMRESResult(
        x=jnp.asarray(z["x"]),
        err_hist=jnp.asarray(z["err_hist"]),
        res_hist=jnp.asarray(z["res_hist"]),
        niters=jnp.int32(int(z["niters"])),
        Q=jnp.asarray(z["Q"]),
        H=jnp.asarray(z["H"]),
        beta=jnp.asarray(z["beta"]),
    )


def pad_state(result: GMRESResult, maxit: int) -> GMRESResult:
    """Grow the padded factorization to a larger iteration budget."""
    old = result.H.shape[1]
    if maxit < old:
        raise ValueError(f"cannot shrink state: maxit={maxit} < {old}")
    if maxit == old:
        return result
    extra = maxit - old
    dt = result.Q.dtype
    Q = jnp.pad(result.Q, ((0, 0), (0, extra)))
    H = jnp.pad(result.H, ((0, extra), (0, extra)))
    nan = jnp.full((extra,), jnp.nan, dtype=dt)
    return GMRESResult(
        x=result.x,
        err_hist=jnp.concatenate([result.err_hist, nan]),
        res_hist=jnp.concatenate([result.res_hist, nan]),
        niters=result.niters,
        Q=Q,
        H=H,
        beta=result.beta,
    )
