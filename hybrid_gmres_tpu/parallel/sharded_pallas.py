"""Row-sharded Pallas block-ELL SpMV + the fully-sharded BA-GMRES on top.

Completes SURVEY.md §2.4's "sharded SpMV (Pallas kernel)" row: the dense
local matmuls of ``sharded_full.py`` are replaced by per-shard block-ELL
panels driven through the same Pallas kernels as the single-chip path
(``ops/spmv_pallas.py``):

  * A is row-partitioned over rays: shard i owns a block-ELL panel of its
    (m/p, n) row slab; the local ``A_loc @ x`` is the forward kernel with
    the full (replicated after all_gather) x resident in VMEM.
  * B is column-partitioned over rays, stored as the block-ELL of the
    TRANSPOSED slab (ray-major — denser blocking for the CT back-projector,
    see ``ops/ordering.py``); the local ``B_loc @ u`` is the transposed
    kernel, whose VMEM-resident (ncb, 128) output is exactly the per-shard
    partial sum that the following ``psum`` reduces over the mesh.

Panels are padded to a mesh-uniform ``maxb`` and stacked on a leading
device axis so they flow through ``shard_map`` in_specs ``P(axis, ...)``
like any other array.  Communication per iteration is identical to
``ba_gmres_sharded_basis`` (one all_gather, one psum(n), two fused psum(k)
CGS2 reductions, scalar psums); only the local compute changes.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.krylov.projected import (
    projected_ls_solve,
    projected_tikhonov_solve,
)
from hybrid_gmres_tpu.ops.sparse import block_ell_from_csr
from hybrid_gmres_tpu.ops.spmv_pallas import (
    _ROW_GROUP,
    _bucket_matvec,
    _bucket_rmatvec,
)
from hybrid_gmres_tpu.solvers.common import GMRESResult


class ShardedBlockELL(NamedTuple):
    """Mesh-uniform stacked block-ELL: one padded panel per row shard."""

    blocks: jax.Array   # (p, nbr_loc, maxb, 8, 128)
    bcols: jax.Array    # (p, nbr_loc * maxb) int32, flattened for SMEM
    shape: tuple        # logical (m, n) of the WHOLE matrix
    ncb: int            # block columns of the padded column space


def shard_block_ell(csr, p: int, block=(8, 128), dtype=np.float32
                    ) -> ShardedBlockELL:
    """Split CSR rows into p contiguous slabs and pack each as block-ELL,
    padded to a common maxb so the stack shards cleanly over the mesh."""
    m, n = csr.shape
    if m % p:
        raise ValueError(f"rows {m} not divisible by {p} shards")
    mloc = m // p
    panels = [
        block_ell_from_csr(csr[i * mloc:(i + 1) * mloc], block=block,
                           dtype=dtype, row_group=_ROW_GROUP)
        for i in range(p)
    ]
    maxb = max(pl.blocks.shape[1] for pl in panels)
    nbr = panels[0].blocks.shape[0]
    br, bc = block
    blocks = np.zeros((p, nbr, maxb, br, bc), dtype)
    bcols = np.zeros((p, nbr, maxb), np.int32)
    for i, pan in enumerate(panels):
        mb = pan.blocks.shape[1]
        blocks[i, :, :mb] = np.asarray(pan.blocks)
        bcols[i, :, :mb] = np.asarray(pan.bcols)
    ncb = -(-n // bc)
    return ShardedBlockELL(
        jnp.asarray(blocks), jnp.asarray(bcols.reshape(p, -1)), (m, n), ncb
    )


def _local_matvec(bell: ShardedBlockELL, blocks_loc, bcols_loc, x_full,
                  interpret):
    """Forward kernel on this shard's panel: (m/p,) = A_loc @ x_full."""
    bc = blocks_loc.shape[-1]
    n = bell.shape[1]
    n_pad = bell.ncb * bc
    x2d = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        x_full.astype(jnp.float32)).reshape(bell.ncb, bc)
    y = _bucket_matvec(bcols_loc, blocks_loc, x2d, interpret=interpret)
    return y.reshape(-1)


def _local_rmatvec(bell: ShardedBlockELL, blocks_loc, bcols_loc, u_loc,
                   interpret):
    """Transposed kernel: (n,) partial = (A_loc)^T u_loc (pre-psum)."""
    br = blocks_loc.shape[-2]
    nbr = blocks_loc.shape[0]
    u_rows = jnp.zeros((nbr * br,), jnp.float32).at[:u_loc.shape[0]].set(
        u_loc.astype(jnp.float32))
    y2d = _bucket_rmatvec(bcols_loc, blocks_loc, u_rows, bell.ncb,
                          interpret=interpret)
    return y2d.reshape(-1)[: bell.shape[1]]


def ba_gmres_sharded_pallas(
    A_bell: ShardedBlockELL,
    BT_bell: ShardedBlockELL,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    mesh: Mesh | None = None,
    axis: str = "rows",
    interpret: bool = False,
) -> GMRESResult:
    """Fully-sharded hybrid BA-GMRES with Pallas local SpMV on every shard.

    ``A_bell``: sharded panels of A (m x n, ray rows).  ``BT_bell``: sharded
    panels of B^T's ray-major row slabs, i.e. ``shard_block_ell(B.T.tocsr(),
    p)`` — B itself is applied through the transposed kernel.  Uses the
    fused exact-residual form throughout (stored A q_k image basis).
    ``interpret=True`` runs the kernels in Pallas interpret mode (CPU mesh
    tests).
    """
    if mesh is None:
        from hybrid_gmres_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(axis_name=axis)
    maxit = int(maxit)
    p = mesh.devices.size
    m, n = A_bell.shape
    if BT_bell.shape != (m, n):
        raise ValueError(
            f"BT panels must cover the transposed back-projector as (m, n)="
            f"{(m, n)}; got {BT_bell.shape}")
    if m % p or n % p:
        raise ValueError(f"mesh size {p} must divide m={m} and n={n}")
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)

    def solver(Ablk, Acol, Bblk, Bcol, b_loc, xt_loc):
        nloc = n // p
        mloc = m // p
        my = jax.lax.axis_index(axis)
        Ablk, Acol = Ablk[0], Acol[0]
        Bblk, Bcol = Bblk[0], Bcol[0]

        def pdot(u_loc, v_loc):
            return jax.lax.psum(jnp.dot(u_loc, v_loc), axis)

        def pnorm(u_loc):
            return jnp.sqrt(pdot(u_loc, u_loc))

        def my_slice(v_full):
            return jax.lax.dynamic_slice(v_full, (my * nloc,), (nloc,))

        def A_mv(x_full):
            y = _local_matvec(A_bell, Ablk, Acol, x_full, interpret)
            return y[:mloc].astype(dtype)

        def B_mv_psum(u_loc):
            part = _local_rmatvec(BT_bell, Bblk, Bcol, u_loc, interpret)
            return jax.lax.psum(part.astype(dtype), axis)

        b_norm = pnorm(b_loc)
        xt_norm = pnorm(xt_loc)

        r0_full = B_mv_psum(b_loc)
        r0_loc = my_slice(r0_full)
        beta = pnorm(r0_loc)
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

        Q0 = jnp.zeros((nloc, maxit + 1), dtype=dtype).at[:, 0].set(
            r0_loc / beta)
        H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
        x0 = jnp.zeros((nloc,), dtype=dtype)
        IMG0 = jnp.zeros((mloc, maxit), dtype=dtype)

        if lam is None:
            project_solve = lambda H, kdim: projected_ls_solve(H, t, kdim)
        else:
            project_solve = lambda H, kdim: projected_tikhonov_solve(
                H, t, lam, kdim)

        def body(carry, k):
            Q, H, x, active, niters, IMG = carry
            q_full = jax.lax.all_gather(Q[:, k], axis, tiled=True)
            img_loc = A_mv(q_full)
            IMG = IMG.at[:, k].set(img_loc)
            w_loc = my_slice(B_mv_psum(img_loc))
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

            kdim = k + 1
            y = project_solve(Hn, kdim)
            xk_loc = Qn[:, :maxit] @ y
            r_loc = b_loc - IMG @ y
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
            return (Qn, Hn, x, active, niters, IMG), (res_rec, err_rec)

        (Q, H, x, _, niters, _), (res_hist, err_hist) = jax.lax.scan(
            body,
            (Q0, H0, x0, jnp.bool_(True), jnp.int32(0), IMG0),
            jnp.arange(maxit, dtype=jnp.int32),
        )
        return x, err_hist, res_hist, niters, Q, H, beta

    f = jax.shard_map(
        solver,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(), P(), P(), P(axis, None), P(), P()),
        check_vma=False,
    )
    x, err_hist, res_hist, niters, Q, H, beta = f(
        A_bell.blocks, A_bell.bcols, BT_bell.blocks, BT_bell.bcols, b, x_true)
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta)
