"""2-D (ray x pixel) tiled bucketed block-ELL panels + Pallas solvers.

DESIGN.md §8: a 1-D row partition of the CT pair cannot move fewer than
O(n) gather bytes per iteration (every fan of rays crosses the whole
image), and the round-2 2-D mesh escaped that bound only by abandoning the
sparse format for dense block matmuls (VERDICT r2 missing#2 — 531 MB dense
vs 37 MB panels).  This module closes the gap: the operator is tiled over a
(pr x pc) mesh — ray slabs x block-aligned pixel slabs — and every tile is
packed with the SAME tuned bucketed block-ELL machinery as the 1-D path
(``ops/sparse.py``), so the ~14x panel compression survives the 2-D
layout.

Placement (device (i, j) of mesh axes (rows=pr, cols=pc)):

  * ``A_tiles``: per-tile panels of A[rows_i, cols_j] — applied with the
    FORWARD kernel; block columns are tile-local, so the kernel input is
    exactly this device's x col-shard (no gather at all — the point of the
    2-D layout).
  * ``BT_tiles``: per-tile panels of (B^T)[rows_i, cols_j] = B[cols_j,
    rows_i]^T — ray-major blocks (the compressible direction), applied with
    the TRANSPOSED kernel.
  * n-space vectors sharded over "cols" (replicated over "rows"); m-space
    vectors sharded over "rows" (replicated over "cols").

Per-iteration collectives of the BA solver: one ``psum_ac(m/pr)`` (A
product), one ``psum_ar(n/pc)`` (B product), two fused ``psum_ac(k+1)``
CGS2 reductions, scalar psums — O(m/pr + n/pc) bytes per device, falling
in BOTH mesh dimensions, with the sparse compression retained (the DESIGN
§7 2-D row).  Quantized tiles share ONE global per-row quantization
``A ~= diag(s) Q`` so the cross-tile psum reductions are exact.

Reference hot loop at scale: ``BAgmres_hybrid_bounds.m:24-40``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from hybrid_gmres_tpu.ops.sparse import bucketed_block_ell_from_csr
from hybrid_gmres_tpu.ops.spmv_pallas import (
    _bucket_matmat,
    _bucket_matvec,
    _bucket_rmatmat,
    _bucket_rmatvec,
)
from hybrid_gmres_tpu.solvers.common import GMRESResult

__all__ = [
    "TiledPanels",
    "tile_bucketed_panels",
    "tile_backprojector_forward",
    "ba_gmres_sharded_pallas_2d",
    "ab_gmres_sharded_pallas_2d",
    "ba_gmres_sharded_pallas_2d_restarted",
    "ab_gmres_sharded_pallas_2d_restarted",
    "comms_bytes_per_iteration_2d",
]


@jax.tree_util.register_pytree_node_class
class TiledPanels:
    """Stacked per-tile bucketed block-ELL panels, leading axis ``pr*pc``
    in (row, col)-major order so ``PartitionSpec((ar, ac))`` places tile
    (i, j) on mesh device (i, j).

    Fields mirror :class:`~hybrid_gmres_tpu.parallel.panels.ShardedPanels`
    minus the windowing machinery (tile columns are device-local by
    construction): ``buckets`` [(blocks (pd, nbr_b, maxb_b, br, bc),
    bcols (pd, nbr_b*maxb_b*cw) int32 tile-local)], ``inv_perm`` /
    ``fwd_perm`` row sorts, ``row_scale`` (pd, m/pr) f32 per-GLOBAL-row
    quantization scales (int8/int4; identical across a row of tiles),
    ``fro_sq`` (pd,) exact per-tile squared Frobenius mass."""

    def __init__(self, buckets, inv_perm, fwd_perm, shape, ncb_tile,
                 row_group, pr, pc, packed4=False, row_scale=None,
                 fro_sq=None):
        self.buckets = tuple(buckets)
        self.inv_perm = inv_perm
        self.fwd_perm = fwd_perm
        self.shape = tuple(shape)
        self.ncb_tile = int(ncb_tile)
        self.row_group = int(row_group)
        self.pr = int(pr)
        self.pc = int(pc)
        self.packed4 = bool(packed4)
        self.row_scale = row_scale
        self.fro_sq = fro_sq

    @property
    def block_shape(self):
        return self.buckets[0][0].shape[3], self.buckets[0][0].shape[4]

    @property
    def nbytes(self) -> int:
        return sum(int(b.size) * b.dtype.itemsize for b, _ in self.buckets)

    def tree_flatten(self):
        children = (self.buckets, self.inv_perm, self.fwd_perm,
                    self.row_scale, self.fro_sq)
        aux = (self.shape, self.ncb_tile, self.row_group, self.pr, self.pc,
               self.packed4)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        buckets, inv_perm, fwd_perm, row_scale, fro_sq = children
        return cls(buckets, inv_perm, fwd_perm, *aux, row_scale=row_scale,
                   fro_sq=fro_sq)


def tile_bucketed_panels(csr, pr: int, pc: int, block=(8, 128),
                         dtype=np.float32, n_buckets: int = 4,
                         row_group: int = 8) -> TiledPanels:
    """Tile ``csr`` (m, n) over a (pr x pc) grid and pack every tile with
    the tuned single-chip bucketed format, padded to mesh-uniform shapes.

    int8/"int4" storage quantizes per GLOBAL row first (one ``diag(s) Q``
    shared by every tile in a row block), then packs the integer tiles —
    the psum over column tiles then reduces exact integers images."""
    m, n = csr.shape
    if m % pr or n % pc:
        raise ValueError(f"grid {pr}x{pc} must divide m={m}, n={n}")
    csr = csr.tocsr()
    mloc, nloc = m // pr, n // pc
    br, bc = block
    pd = pr * pc

    is_int4 = (isinstance(dtype, str) and dtype.lower() == "int4") or (
        not isinstance(dtype, str) and np.dtype(dtype).name == "int4")
    if is_int4:
        dtype = np.int8
    # exact per-tile ||A_tile||_F^2 of the SOURCE matrix, recorded BEFORE
    # any quantization (mirrors shard_bucketed_panels / from_csr — the
    # quantized integer matrix would overestimate by ~qmax/max|row|)
    fro = np.zeros(pd, np.float32)
    for i in range(pr):
        row_slab = csr[i * mloc:(i + 1) * mloc].tocsc()
        for j in range(pc):
            tile = row_slab[:, j * nloc:(j + 1) * nloc]
            fro[i * pc + j] = float((tile.multiply(tile)).sum())
    row_scale = None
    if is_int4 or np.dtype(dtype) == np.int8:
        from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr

        csr, s = _row_quantize_csr(csr, qmax=7 if is_int4 else 127)
        # device (i, j) carries the scales of its row slab (same for all j)
        row_scale = jnp.asarray(
            np.broadcast_to(s.reshape(pr, 1, mloc), (pr, pc, mloc))
            .reshape(pd, mloc).copy())

    tiles = []
    for i in range(pr):
        row_slab = csr[i * mloc:(i + 1) * mloc].tocsc()
        for j in range(pc):
            tile = row_slab[:, j * nloc:(j + 1) * nloc].tocsr()
            tiles.append(bucketed_block_ell_from_csr(
                tile, block=block, dtype=dtype, n_buckets=n_buckets,
                row_group=row_group, pack_int4=is_int4))
    nb = len(tiles[0].buckets)
    if any(len(t.buckets) != nb for t in tiles):
        raise AssertionError("bucket count must be mesh-uniform")
    ncb_tile = tiles[0].ncb

    cw = 2 if is_int4 else 1
    buckets = []
    for bkt in range(nb):
        nbr_b = max(t.buckets[bkt][0].shape[0] for t in tiles)
        maxb_b = max(t.buckets[bkt][0].shape[1] for t in tiles)
        nbr_b = -(-nbr_b // row_group) * row_group
        blocks = np.zeros((pd, nbr_b, maxb_b, br, bc), dtype)
        bcols = np.zeros((pd, nbr_b, cw * maxb_b), np.int32)
        for d, t in enumerate(tiles):
            blk, bcl = t.buckets[bkt]
            nb_i, mb_i = blk.shape[0], blk.shape[1]
            blocks[d, :nb_i, :mb_i] = np.asarray(blk)
            bcols[d, :nb_i, :cw * mb_i] = np.asarray(bcl)
        buckets.append((jnp.asarray(blocks),
                        jnp.asarray(bcols.reshape(pd, -1))))

    nbr = -(-mloc // br)
    total = sum(blocks.shape[1] for blocks, _ in buckets)
    inv_perm = np.zeros((pd, nbr), np.int32)
    fwd_perm = np.full((pd, total), -1, np.int32)
    for d, t in enumerate(tiles):
        off_pad = 0
        off_orig = 0
        for bkt in range(nb):
            nbr_b_orig = t.buckets[bkt][0].shape[0]
            ip = np.asarray(t.inv_perm)
            sel = (ip >= off_orig) & (ip < off_orig + nbr_b_orig)
            rows = np.nonzero(sel)[0]
            pos = ip[sel] - off_orig + off_pad
            inv_perm[d, rows] = pos
            fwd_perm[d, pos] = rows
            off_orig += nbr_b_orig
            off_pad += buckets[bkt][0].shape[1]
    return TiledPanels(
        buckets, jnp.asarray(inv_perm), jnp.asarray(fwd_perm), (m, n),
        ncb_tile, row_group, pr, pc, packed4=is_int4, row_scale=row_scale,
        fro_sq=jnp.asarray(fro))


def tile_backprojector_forward(B_csr, pr: int, pc: int,
                               **kw) -> TiledPanels:
    """Forward-layout back-projector tiles for a (pr x pc) ray x pixel
    mesh: device (i, j) holds B[pixel slab j, ray slab i], so ``B u`` runs
    the FORWARD kernel on the local tile (its columns are exactly this
    device's u row-shard) followed by the SAME ``psum(rows)`` the
    transposed layout uses — a pure kernel-speed trade with no extra
    collectives, the 2-D form of DESIGN §12's ``B_panels`` option.

    Implementation: tile B (n, m) on its own (pc, pr) grid, then permute
    the leading device axis from (j, i)- to (i, j)-major so
    ``PartitionSpec((rows, cols))`` places tile (j, i) on device (i, j).
    The returned metadata keeps B's OWN grid (``pr`` field == mesh pc):
    the tile-local kernels only use per-tile shapes.
    """
    tp = tile_bucketed_panels(B_csr, pc, pr, **kw)

    def reorder(a):
        arr = np.asarray(a)
        out = arr.reshape((pc, pr) + arr.shape[1:]).swapaxes(0, 1)
        return jnp.asarray(out.reshape((pr * pc,) + arr.shape[1:]))

    return jax.tree_util.tree_map(reorder, tp)


# ---------------------------------------------------------------------------
# shard_map-local tile kernels (leaves pre-sliced to leading axis 1).
# Scaling for quantized tiles happens OUTSIDE (after/before the cross-tile
# psum) — see the solver bodies.
# ---------------------------------------------------------------------------

def tile_matvec(tp: TiledPanels, x_loc, interpret: bool = False):
    """UNSCALED partial (m/pr,) = Q_tile @ x_loc for this device's
    (n/pc,) x col-shard; psum over the col axis completes the row."""
    br, bc = tp.block_shape
    mloc = tp.shape[0] // tp.pr
    x2d = jnp.zeros((tp.ncb_tile * bc,), jnp.float32).at[
        : x_loc.shape[0]].set(x_loc.astype(jnp.float32)).reshape(
        tp.ncb_tile, bc)
    ys = []
    for blocks, bcols in tp.buckets:
        ys.append(_bucket_matvec(bcols[0], blocks[0], x2d,
                                 interpret=interpret,
                                 row_group=tp.row_group,
                                 packed4=tp.packed4))
    y_sorted = jnp.concatenate(ys, axis=0).reshape(-1, br)
    return y_sorted[tp.inv_perm[0]].reshape(-1)[:mloc]


def tile_rmatvec(tp: TiledPanels, u_loc, interpret: bool = False):
    """Partial (n/pc,) = Q_tile^T @ u_loc for this device's (m/pr,) row
    shard (u pre-scaled by the caller for quantized tiles); psum over the
    row axis completes the column."""
    br, bc = tp.block_shape
    mloc = tp.shape[0] // tp.pr
    nloc = tp.shape[1] // tp.pc
    nbr = -(-mloc // br)
    perm = tp.fwd_perm[0]
    u_pad = jnp.zeros((nbr * br,), jnp.float32).at[:mloc].set(
        u_loc.astype(jnp.float32)).reshape(nbr, br)
    u_sorted = jnp.where((perm >= 0)[:, None], u_pad[jnp.clip(perm, 0)], 0.0)
    y2d = jnp.zeros((tp.ncb_tile, bc), jnp.float32)
    off = 0
    for blocks, bcols in tp.buckets:
        nbr_b = blocks.shape[1]
        y2d = y2d + _bucket_rmatvec(
            bcols[0], blocks[0], u_sorted[off:off + nbr_b], tp.ncb_tile,
            interpret=interpret, row_group=tp.row_group, packed4=tp.packed4)
        off += nbr_b
    return y2d.reshape(-1)[:nloc]


def tile_matmat(tp: TiledPanels, X_loc, interpret: bool = False):
    """Multi-RHS forward tile kernel: UNSCALED partial (m/pr, R) =
    Q_tile @ X_loc for this device's (n/pc, R) col-shard — one tile read
    serves all R columns (the 2-D serving-batch primitive); psum over the
    col axis completes the rows."""
    br, bc = tp.block_shape
    mloc = tp.shape[0] // tp.pr
    R = X_loc.shape[1]
    x3d = jnp.zeros((tp.ncb_tile * bc, R), jnp.float32).at[
        : X_loc.shape[0]].set(X_loc.astype(jnp.float32)).reshape(
        tp.ncb_tile, bc, R).transpose(0, 2, 1)
    ys = []
    for blocks, bcols in tp.buckets:
        ys.append(_bucket_matmat(bcols[0], blocks[0], x3d,
                                 interpret=interpret,
                                 row_group=tp.row_group,
                                 packed4=tp.packed4))
    y_sorted = jnp.concatenate(ys, axis=0).reshape(-1, br, R)
    return y_sorted[tp.inv_perm[0]].reshape(-1, R)[:mloc]


def tile_rmatmat(tp: TiledPanels, U_loc, interpret: bool = False):
    """Multi-RHS transposed tile kernel: partial (n/pc, R) =
    Q_tile^T @ U_loc for this device's (m/pr, R) row shard (pre-scaled by
    the caller for quantized tiles); psum over the row axis completes the
    columns."""
    br, bc = tp.block_shape
    mloc = tp.shape[0] // tp.pr
    nloc = tp.shape[1] // tp.pc
    R = U_loc.shape[1]
    nbr = -(-mloc // br)
    perm = tp.fwd_perm[0]
    u_pad = jnp.zeros((nbr * br, R), jnp.float32).at[:mloc].set(
        U_loc.astype(jnp.float32)).reshape(nbr, br, R)
    u_sorted = jnp.where((perm >= 0)[:, None, None],
                         u_pad[jnp.clip(perm, 0)], 0.0)
    y3d = jnp.zeros((tp.ncb_tile, R, bc), jnp.float32)
    off = 0
    for blocks, bcols in tp.buckets:
        nbr_b = blocks.shape[1]
        y3d = y3d + _bucket_rmatmat(
            bcols[0], blocks[0], u_sorted[off:off + nbr_b], tp.ncb_tile,
            interpret=interpret, row_group=tp.row_group,
            packed4=tp.packed4)
        off += nbr_b
    return y3d.transpose(0, 2, 1).reshape(-1, R)[:nloc]


def tiled_local_mms(tp: TiledPanels, axes, dtype, interpret: bool = False):
    """(matmat, rmatmat) multi-RHS twins of :func:`tiled_local_ops`: one
    psum per application (col axis forward, row axis transposed), global
    row scales outside the kernels for quantized tiles."""
    ar, ac = axes

    def matmat(V_loc):
        part = tile_matmat(tp, V_loc, interpret=interpret)
        Y = jax.lax.psum(part, ac)
        if tp.row_scale is not None:
            Y = tp.row_scale[0][:, None] * Y
        return Y.astype(dtype)

    def rmatmat(U_loc):
        U = U_loc
        if tp.row_scale is not None:
            U = tp.row_scale[0][:, None] * U.astype(jnp.float32)
        part = tile_rmatmat(tp, U, interpret=interpret)
        return jax.lax.psum(part, ar).astype(dtype)

    return matmat, rmatmat


def tiled_local_ops(tp: TiledPanels, axes, dtype, interpret: bool = False):
    """(matvec, rmatvec, fro_sq_local) for the shard-local tile of a
    :class:`TiledPanels` under a 2-D mesh — the exact-adjoint pair the GKB
    family needs, served by the SAME tiles through the forward and
    transposed kernels.

    matvec: col-sharded v (n/pc,) -> row-sharded u (m/pr,), one psum over
    the col axis; rmatvec: row-sharded u -> col-sharded v, one psum over
    the row axis.  Quantized tiles apply the global row scales outside the
    kernels (``A = diag(s) Q``), keeping ``<A v, u> == <v, A^T u>`` exact.
    """
    ar, ac = axes

    def matvec(v_loc):
        part = tile_matvec(tp, v_loc, interpret=interpret)
        y = jax.lax.psum(part, ac)
        if tp.row_scale is not None:
            y = tp.row_scale[0] * y
        return y.astype(dtype)

    def rmatvec(u_loc):
        u = u_loc
        if tp.row_scale is not None:
            u = tp.row_scale[0] * u.astype(jnp.float32)
        part = tile_rmatvec(tp, u, interpret=interpret)
        return jax.lax.psum(part, ar).astype(dtype)

    # per-TILE mass; the caller psums over BOTH axes for ||A||_F^2
    fro_sq = tp.fro_sq.reshape(-1)[0].astype(dtype)
    return matvec, rmatvec, fro_sq


def comms_bytes_per_iteration_2d(A_tiles: TiledPanels,
                                 itemsize: int = 4,
                                 kdim: int = 0) -> dict:
    """Analytic per-iteration bytes per device of the 2-D BA schedule
    (ring all-reduce ~= 2 (p-1)/p bytes/elem): O(m/pr + n/pc), falling in
    BOTH mesh dimensions — the DESIGN §7 2-D row.

    Scalar reductions are priced PER AXIS (ADVICE r3): the loop body
    issues 2 col-axis scalar psums (hnorm, err) and 1 row-axis psum (the
    m-space residual norm via ``pdot_m``) — a single shared ring factor
    would mis-count them on non-square meshes.
    """
    m, n = A_tiles.shape
    pr, pc = A_tiles.pr, A_tiles.pc
    red_m = 2.0 * (pc - 1) / pc * (m // pr) * itemsize
    red_n = 2.0 * (pr - 1) / pr * (n // pc) * itemsize
    allred_ac = 2.0 * (pc - 1) / pc * itemsize   # col-axis ring factor
    allred_ar = 2.0 * (pr - 1) / pr * itemsize   # row-axis ring factor
    cgs2 = 2 * (kdim + 1) * allred_ac            # CGS2 rides the col axis
    scalars_ac = 2 * allred_ac                   # hnorm, err_k
    scalars_ar = 1 * allred_ar                   # res_k (m-space)
    return {
        "pr": pr, "pc": pc,
        "A_reduce_bytes": red_m,
        "B_reduce_bytes": red_n,
        "cgs2_bytes": cgs2,
        "scalar_bytes_col_axis": scalars_ac,
        "scalar_bytes_row_axis": scalars_ar,
        "scalar_bytes": scalars_ac + scalars_ar,
        "total_bytes": red_m + red_n + cgs2 + scalars_ac + scalars_ar,
    }


def _validate_2d(A_tiles, BT_tiles, mesh, axes, B_tiles=None):
    ar, ac = axes
    pr, pc = mesh.shape[ar], mesh.shape[ac]
    m, n = A_tiles.shape
    if BT_tiles is None and B_tiles is None:
        raise ValueError("need BT_tiles (transposed layout) or B_tiles "
                         "(forward layout, tile_backprojector_forward)")
    if BT_tiles is not None and BT_tiles.shape != (m, n):
        raise ValueError(
            f"BT tiles must cover B^T as (m, n)={(m, n)}; got "
            f"{BT_tiles.shape}")
    if A_tiles.pr != pr or A_tiles.pc != pc or (
            BT_tiles is not None and
            (BT_tiles.pr, BT_tiles.pc) != (pr, pc)):
        raise ValueError(
            f"tiles built for {A_tiles.pr}x{A_tiles.pc}"
            + (f" / {BT_tiles.pr}x{BT_tiles.pc}" if BT_tiles is not None
               else "")
            + f", mesh is {pr}x{pc}")
    if B_tiles is not None:
        # forward tiles carry B's OWN grid: (pc, pr) of the mesh
        if B_tiles.shape != (n, m) or (B_tiles.pr, B_tiles.pc) != (pc, pr):
            raise ValueError(
                f"B tiles must cover B as (n, m)={(n, m)} on a "
                f"{pc}x{pr} grid (tile_backprojector_forward); got "
                f"{B_tiles.shape} on {B_tiles.pr}x{B_tiles.pc}")
    return pr, pc, m, n


def _make_B_mv_2d(B_or_BT_loc, b_forward, axes, dtype, interpret):
    """Shard-local ``u (row-sharded) -> B u (col-sharded)``: forward
    kernel on a :func:`tile_backprojector_forward` tile, or transposed
    kernel on the BT tile — both complete with ONE psum over the row
    axis (the forward layout is a pure kernel-speed trade here)."""
    ar, ac = axes
    if b_forward:
        def B_mv(u_loc):
            part = tile_matvec(B_or_BT_loc, u_loc, interpret=interpret)
            y = jax.lax.psum(part, ar)
            if B_or_BT_loc.row_scale is not None:
                y = B_or_BT_loc.row_scale[0] * y
            return y.astype(dtype)
        return B_mv
    _, B_mv, _ = tiled_local_ops(B_or_BT_loc, axes, dtype, interpret)
    return B_mv


def _resume_setup_2d(resume_from, maxit, need_S, x0, lam):
    """Shared resume validation/padding for the 2-D solvers (mirrors the
    1-D ``sharded_pallas`` resume semantics)."""
    from hybrid_gmres_tpu.utils.checkpoint import (check_fingerprint,
                                                    check_resumable,
                                                    pad_state)

    if resume_from.IMG is None or (need_S and resume_from.S is None):
        raise ValueError("resume_from must come from this 2-D sharded "
                         "solver (missing .IMG" +
                         ("/.S)" if need_S else ")"))
    check_resumable(resume_from)
    check_fingerprint(resume_from, x0, lam)
    k0 = int(resume_from.niters)
    if k0 >= maxit:
        raise ValueError(f"resume needs maxit > {k0}")
    resumed_active = (bool(resume_from.active)
                      if resume_from.active is not None
                      else k0 == resume_from.res_hist.shape[0])
    return k0, resumed_active, pad_state(resume_from, maxit)


def ba_gmres_sharded_pallas_2d(
    A_tiles: TiledPanels,
    BT_tiles: TiledPanels | None,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    gcv_grid=None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
    B_tiles: TiledPanels | None = None,
    x0=None,
    resume_from: GMRESResult | None = None,
) -> GMRESResult:
    """(Hybrid) BA-GMRES over a 2-D mesh with per-tile Pallas SpMV.

    ``A_tiles``: :func:`tile_bucketed_panels` of A.  ``BT_tiles``: tiles of
    ``B.T.tocsr()`` (ray-major — the compressible direction), applied with
    the transposed kernel.  ``lam``: None / scalar / "gcv" (per-iteration
    GCV-optimal lambda, replicated evaluation, zero extra collectives).
    ``x0``: optional n-length warm start (``r0 = B (b - A x0)``,
    ``x = x0 + Q y`` — the restart building block; one extra tile SpMV at
    setup).  ``resume_from``: a prior result of THIS solver — the
    col-sharded basis, Hessenberg, iterate and row-sharded image basis
    (``.IMG``) continue the Arnoldi recurrence exactly (pass the same
    ``x0``/``lam``); state stays tile-sharded across the checkpoint
    boundary.  Returns the solution sharded over the col axis."""
    from hybrid_gmres_tpu.solvers.gmres import _make_project_solve

    if mesh is None:
        raise ValueError("requires an explicit 2-D mesh (make_mesh_2d)")
    ar, ac = axes
    maxit = int(maxit)
    pr, pc, m, n = _validate_2d(A_tiles, BT_tiles, mesh, axes, B_tiles)
    b_forward = B_tiles is not None
    Bp = B_tiles if b_forward else BT_tiles
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    fp = resume_fingerprint(x0, lam)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)
    if resume_from is None:
        k0 = 0
    else:
        k0, resumed_active, rs = _resume_setup_2d(
            resume_from, maxit, False, x0 if have_x0 else None, lam)

    def solver(A_loc, BT_loc, b_loc, xt_loc, x0_loc, *carry_in):
        nloc = n // pc
        mloc = m // pr

        def pdot_n(u, v):
            return jax.lax.psum(jnp.dot(u, v), ac)

        def pdot_m(u, v):
            return jax.lax.psum(jnp.dot(u, v), ar)

        # A applied forward through its own tiles; B through the
        # TRANSPOSED kernel of the BT tiles (B u = Q^T (s u)) — both from
        # the shared tiled_local_ops (one source for the quantized-scale
        # placement).
        A_mv, _, _ = tiled_local_ops(A_loc, axes, dtype, interpret)
        B_mv = _make_B_mv_2d(BT_loc, b_forward, axes, dtype, interpret)

        b_norm = jnp.sqrt(pdot_m(b_loc, b_loc))
        xt_norm = jnp.sqrt(pdot_n(xt_loc, xt_loc))

        # warm start: residual image space shifts to rhs = b - A x0 (one
        # extra tile SpMV at setup only)
        rhs_loc = b_loc - A_mv(x0_loc) if have_x0 else b_loc
        if carry_in:
            Q0, H0, xc0, niters0, IMG0, beta = carry_in
            active0 = jnp.bool_(resumed_active)
        else:
            r0_loc = B_mv(rhs_loc)
            beta = jnp.sqrt(pdot_n(r0_loc, r0_loc))
            beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
            active0 = beta > 0
            Q0 = jnp.zeros((nloc, maxit + 1), dtype=dtype).at[:, 0].set(
                jnp.where(beta > 0, r0_loc / beta_safe,
                          jnp.zeros_like(r0_loc)))
            H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
            xc0 = x0_loc + jnp.zeros((nloc,), dtype=dtype)
            niters0 = jnp.int32(0)
            IMG0 = jnp.zeros((mloc, maxit), dtype=dtype)
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

        _ps = _make_project_solve(lam, n, gcv_grid)
        project_solve = lambda H, kdim: _ps(H, None, t, kdim)

        def body(carry, k):
            Q, H, x, active, niters, IMG = carry
            img_loc = A_mv(Q[:, k])
            IMG = IMG.at[:, k].set(img_loc)
            w_loc = B_mv(img_loc)
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
            y = project_solve(Hn, kdim)
            xk_loc = x0_loc + Qn[:, :maxit] @ y
            r_loc = rhs_loc - IMG @ y
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

        (Q, H, x, active_f, niters, IMG), (res_hist, err_hist) = \
            jax.lax.scan(
                body,
                (Q0, H0, xc0, active0, niters0, IMG0),
                jnp.arange(k0, maxit, dtype=jnp.int32),
            )
        return x, err_hist, res_hist, niters, Q, H, beta, IMG, active_f

    base_specs = (P((ar, ac)), P((ar, ac)), P(ar), P(ac), P(ac))
    carry_specs = (P(ac, None), P(), P(ac), P(), P(ar, None), P())
    args = (A_tiles, Bp, b, x_true, x0)
    in_specs = base_specs
    if resume_from is not None:
        in_specs = base_specs + carry_specs
        args = args + (rs.Q, rs.H, rs.x, rs.niters, rs.IMG, rs.beta)
    f = jax.shard_map(
        solver,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(ac), P(), P(), P(), P(ac, None), P(), P(),
                   P(ar, None), P()),
        check_vma=False,
    )
    x, err_new, res_new, niters, Q, H, beta, IMG, active_f = f(*args)
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([rs.res_hist[:k0], res_new])
        err_hist = jnp.concatenate([rs.err_hist[:k0], err_new])
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta, IMG=IMG,
                       active=active_f, fp=fp)


def ab_gmres_sharded_pallas_2d(
    A_tiles: TiledPanels,
    BT_tiles: TiledPanels | None,
    b,
    x_true=None,
    tol: float = 1e-6,
    maxit: int = 50,
    lam=None,
    gcv_grid=None,
    mesh: Mesh | None = None,
    axes=("rows", "cols"),
    interpret: bool = False,
    B_tiles: TiledPanels | None = None,
    x0=None,
    resume_from: GMRESResult | None = None,
) -> GMRESResult:
    """(Hybrid) AB-GMRES over the 2-D tiled panels: m-space basis sharded
    over the row axis (replicated over cols), image intermediates
    ``s_k = B q_k`` col-sharded and raw images ``w_k = A s_k`` row-sharded
    (fused-residual schedule, no extra SpMVs or collectives).
    ``x0``: optional warm start (``r0 = b - A x0``, ``x = x0 + S y``).
    ``resume_from``: a prior result of this solver (row-sharded W images in
    ``.IMG``, col-sharded solution images in ``.S``); same semantics as
    the BA twin's resume."""
    from hybrid_gmres_tpu.solvers.gmres import _make_project_solve

    if mesh is None:
        raise ValueError("requires an explicit 2-D mesh (make_mesh_2d)")
    ar, ac = axes
    maxit = int(maxit)
    pr, pc, m, n = _validate_2d(A_tiles, BT_tiles, mesh, axes, B_tiles)
    b_forward = B_tiles is not None
    Bp = B_tiles if b_forward else BT_tiles
    dtype = b.dtype
    have_xt = x_true is not None
    if not have_xt:
        x_true = jnp.zeros((n,), dtype=dtype)
    from hybrid_gmres_tpu.utils.checkpoint import resume_fingerprint

    fp = resume_fingerprint(x0, lam)
    have_x0 = x0 is not None
    if not have_x0:
        x0 = jnp.zeros((n,), dtype=dtype)
    if resume_from is None:
        k0 = 0
    else:
        k0, resumed_active, rs = _resume_setup_2d(
            resume_from, maxit, True, x0 if have_x0 else None, lam)

    def solver(A_loc, BT_loc, b_loc, xt_loc, x0_loc, *carry_in):
        nloc = n // pc
        mloc = m // pr

        def pdot_n(u, v):
            return jax.lax.psum(jnp.dot(u, v), ac)

        def pdot_m(u, v):
            return jax.lax.psum(jnp.dot(u, v), ar)

        A_mv, _, _ = tiled_local_ops(A_loc, axes, dtype, interpret)
        B_mv = _make_B_mv_2d(BT_loc, b_forward, axes, dtype, interpret)

        b_norm = jnp.sqrt(pdot_m(b_loc, b_loc))
        xt_norm = jnp.sqrt(pdot_n(xt_loc, xt_loc))

        rhs_loc = b_loc - A_mv(x0_loc) if have_x0 else b_loc
        if carry_in:
            Q0, H0, xc0, niters0, W0, S0, beta = carry_in
            active0 = jnp.bool_(resumed_active)
        else:
            beta = jnp.sqrt(pdot_m(rhs_loc, rhs_loc))
            beta_safe = jnp.where(beta > 0, beta, jnp.ones((), dtype))
            active0 = beta > 0
            Q0 = jnp.zeros((mloc, maxit + 1), dtype=dtype).at[:, 0].set(
                jnp.where(beta > 0, rhs_loc / beta_safe,
                          jnp.zeros_like(rhs_loc)))
            H0 = jnp.zeros((maxit + 1, maxit), dtype=dtype)
            xc0 = x0_loc + jnp.zeros((nloc,), dtype=dtype)
            niters0 = jnp.int32(0)
            S0 = jnp.zeros((nloc, maxit), dtype=dtype)
            W0 = jnp.zeros((mloc, maxit), dtype=dtype)
        t = jnp.zeros((maxit + 1,), dtype=dtype).at[0].set(beta)

        _ps = _make_project_solve(lam, m, gcv_grid)
        project_solve = lambda H, kdim: _ps(H, None, t, kdim)

        def body(carry, k):
            Q, H, x, active, niters, S, W = carry
            s_loc = B_mv(Q[:, k])
            w_loc = A_mv(s_loc)
            S = S.at[:, k].set(s_loc)
            W = W.at[:, k].set(w_loc)
            c1 = jax.lax.psum(Q.T @ w_loc, ar)
            w_loc = w_loc - Q @ c1
            c2 = jax.lax.psum(Q.T @ w_loc, ar)
            w_loc = w_loc - Q @ c2
            h = c1 + c2
            hnorm = jnp.sqrt(pdot_m(w_loc, w_loc))
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
            xk_loc = x0_loc + S @ y
            r_loc = rhs_loc - W @ y
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
            return (Qn, Hn, x, active, niters, S, W), (res_rec, err_rec)

        (Q, H, x, active_f, niters, S, W), (res_hist, err_hist) = \
            jax.lax.scan(
                body,
                (Q0, H0, xc0, active0, niters0, S0, W0),
                jnp.arange(k0, maxit, dtype=jnp.int32),
            )
        return x, err_hist, res_hist, niters, Q, H, beta, W, S, active_f

    base_specs = (P((ar, ac)), P((ar, ac)), P(ar), P(ac), P(ac))
    carry_specs = (P(ar, None), P(), P(ac), P(), P(ar, None),
                   P(ac, None), P())
    args = (A_tiles, Bp, b, x_true, x0)
    in_specs = base_specs
    if resume_from is not None:
        in_specs = base_specs + carry_specs
        args = args + (rs.Q, rs.H, rs.x, rs.niters, rs.IMG, rs.S, rs.beta)
    f = jax.shard_map(
        solver,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(ac), P(), P(), P(), P(ar, None), P(), P(),
                   P(ar, None), P(ac, None), P()),
        check_vma=False,
    )
    x, err_new, res_new, niters, Q, H, beta, W, S, active_f = f(*args)
    if resume_from is None:
        res_hist, err_hist = res_new, err_new
    else:
        res_hist = jnp.concatenate([rs.res_hist[:k0], res_new])
        err_hist = jnp.concatenate([rs.err_hist[:k0], err_new])
    if not have_xt:
        err_hist = jnp.full_like(err_hist, jnp.nan)
    return GMRESResult(x, err_hist, res_hist, niters, Q, H, beta, IMG=W,
                       S=S, active=active_f, fp=fp)


def ba_gmres_sharded_pallas_2d_restarted(
    A_tiles, BT_tiles, b, x_true=None, tol: float = 1e-6,
    restart: int = 20, max_restarts: int = 10, lam=None, gcv_grid=None,
    mesh: Mesh | None = None, axes=("rows", "cols"),
    interpret: bool = False, B_tiles=None,
) -> GMRESResult:
    """Restarted 2-D tiled BA-GMRES(restart): memory-bounded Krylov cycles
    on the 2-D layout; each cycle warm-starts from the previous col-sharded
    solution with no resharding.  The outer loop is the SAME
    ``solvers/gmres._restarted`` every other restarted wrapper uses
    (the ``run_2D_phantom.m:121`` restarted surface on the scalable
    layout)."""
    from hybrid_gmres_tpu.solvers.gmres import _restarted

    return _restarted(
        lambda x0: ba_gmres_sharded_pallas_2d(
            A_tiles, BT_tiles, b, x_true, tol=tol, maxit=int(restart),
            lam=lam, gcv_grid=gcv_grid, mesh=mesh, axes=axes,
            interpret=interpret, B_tiles=B_tiles, x0=x0),
        max_restarts, tol)


def ab_gmres_sharded_pallas_2d_restarted(
    A_tiles, BT_tiles, b, x_true=None, tol: float = 1e-6,
    restart: int = 20, max_restarts: int = 10, lam=None, gcv_grid=None,
    mesh: Mesh | None = None, axes=("rows", "cols"),
    interpret: bool = False, B_tiles=None,
) -> GMRESResult:
    """Restarted 2-D tiled AB-GMRES(restart) (see the BA twin)."""
    from hybrid_gmres_tpu.solvers.gmres import _restarted

    return _restarted(
        lambda x0: ab_gmres_sharded_pallas_2d(
            A_tiles, BT_tiles, b, x_true, tol=tol, maxit=int(restart),
            lam=lam, gcv_grid=gcv_grid, mesh=mesh, axes=axes,
            interpret=interpret, B_tiles=B_tiles, x0=x0),
        max_restarts, tol)
