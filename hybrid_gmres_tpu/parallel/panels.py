"""Mesh-uniform bucketed block-ELL panels + static-window vector exchange.

This is the distributed counterpart of the single-chip production format
(``ops/sparse.py`` ``BucketedBlockELL`` + the Pallas kernels in
``ops/spmv_pallas.py``): each shard's row slab is packed with the SAME
bucketing/row-group machinery the single-chip path uses, then padded to
mesh-uniform per-bucket shapes so the whole structure flows through
``shard_map`` with a leading device axis.

Two communication upgrades over the round-1 sharded path (VERDICT r1 #1):

  * **Static column windows.**  At build time we record, per shard, the
    contiguous window of x-slabs its panel actually touches.  When the
    union of needed exchange shifts is smaller than the mesh, the matvec
    input is assembled from ``ppermute`` hops instead of a full
    ``all_gather`` — per-matvec gather bytes become ``L * n/p`` (L = number
    of distinct shifts) instead of ``(p-1) * n/p``, i.e. *constant* in mesh
    size for banded operators instead of linear.  Block-column indices are
    stored window-relative so the kernels never see global coordinates.
  * **Reduce-scatter instead of all-reduce.**  The n-space product of the
    column-partitioned operator (the reference's ``B*(A*q)``,
    ``BAgmres_hybrid_bounds.m:25``) was psum-then-slice; the solvers in
    ``sharded_pallas.py`` now use ``psum_scatter``, halving those bytes.

``comms_bytes_per_iteration`` reports the resulting analytic per-iteration
communication volume (recorded in DESIGN.md).

No reference counterpart: the reference is single-process MATLAB
(SURVEY.md §2.4); this layer is the TPU-native scaling design.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.ops.sparse import bucketed_block_ell_from_csr
from hybrid_gmres_tpu.ops.spmv_pallas import (
    _bucket_matmat,
    _bucket_matvec,
    _bucket_rmatmat,
    _bucket_rmatvec,
)


@jax.tree_util.register_pytree_node_class
class ShardedPanels:
    """Stacked per-shard bucketed block-ELL panels (leading device axis).

    Array leaves all carry a leading ``p`` axis so a pytree-wide
    ``PartitionSpec(axis)`` shards the whole structure:

      * ``buckets``: tuple of ``(blocks (p, nbr_b, maxb_b, br, bc),
        bcols (p, nbr_b * maxb_b) int32)`` — bcols are WINDOW-RELATIVE.
      * ``inv_perm`` (p, nbr): original block-row -> position in the
        concatenated sorted order (forward kernel output un-sort).
      * ``fwd_perm`` (p, total): position -> original block-row (-1 for
        bucket padding rows; transposed-kernel input sort).
      * ``win_start`` (p,) int32: first x-slab of each shard's window.

    Static aux: ``shape`` (global m, n), ``ncb`` (global block columns),
    ``win_slabs`` (uniform window width, in slabs of n/p), ``slab_blocks``
    (block columns per slab; 0 = windowing disabled, window is the whole
    padded column space), ``shifts`` (dmin, L): the ppermute shift range
    ``dmin .. dmin+L-1`` covering every shard's window (L == p means use
    all_gather), ``row_group``, ``p``.
    """

    def __init__(self, buckets, inv_perm, fwd_perm, win_start, shape, ncb,
                 win_slabs, slab_blocks, shifts, row_group, p,
                 packed4=False, row_scale=None, fro_sq=None):
        self.buckets = tuple(buckets)
        self.inv_perm = inv_perm
        self.fwd_perm = fwd_perm
        self.win_start = win_start
        self.shape = tuple(shape)
        self.ncb = int(ncb)
        self.win_slabs = int(win_slabs)
        self.slab_blocks = int(slab_blocks)
        self.shifts = tuple(shifts)
        self.row_group = int(row_group)
        self.p = int(p)
        # int4 panels: nibble pairs packed in int8 bytes along the block
        # axis (see ops/sparse.py BucketedBlockELL.packed4)
        self.packed4 = bool(packed4)
        # int8 panels: per-row f32 scales (p, m/p) with A ~= diag(s) Q
        # (same scheme as the single-chip PallasBSROperator); None for
        # float panels.  fro_sq (p,): exact per-shard ||A_slab||_F^2,
        # computed at build time (valid for any storage dtype).
        self.row_scale = row_scale
        self.fro_sq = fro_sq

    @property
    def block_shape(self):
        return self.buckets[0][0].shape[3], self.buckets[0][0].shape[4]

    @property
    def windowed(self) -> bool:
        return self.slab_blocks > 0

    @property
    def win_blocks(self) -> int:
        """Block columns visible to the local kernels."""
        return (self.win_slabs * self.slab_blocks if self.windowed
                else self.ncb)

    @property
    def nbytes(self) -> int:
        return sum(int(b.size) * b.dtype.itemsize for b, _ in self.buckets)

    def tree_flatten(self):
        children = (self.buckets, self.inv_perm, self.fwd_perm,
                    self.win_start, self.row_scale, self.fro_sq)
        aux = (self.shape, self.ncb, self.win_slabs, self.slab_blocks,
               self.shifts, self.row_group, self.p, self.packed4)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        buckets, inv_perm, fwd_perm, win_start, row_scale, fro_sq = children
        return cls(buckets, inv_perm, fwd_perm, win_start, *aux,
                   row_scale=row_scale, fro_sq=fro_sq)


def shard_bucketed_panels(csr, p: int, block=(8, 128), dtype=np.float32,
                          n_buckets: int = 4, row_group: int = 8,
                          window: bool = True,
                          quantize: bool = True) -> ShardedPanels:
    """Split CSR rows into ``p`` contiguous slabs, pack each with the tuned
    single-chip bucketed format, pad to mesh-uniform shapes, and compute the
    static column windows.

    ``window=True`` enables the windowed exchange when the column slabs are
    block-aligned (``(n/p) % bc == 0``); otherwise the panel falls back to
    global coordinates + all_gather (still with bucketed local compute).
    ``quantize=False`` with an int8 dtype stores the csr values RAW (they
    must already be integers in [-127, 127]) with no per-row scales — used
    by :func:`build_panels_with_adjoint` to store ``Q^T`` of an
    already-quantized ``A ~= diag(s) Q`` so the adjoint pair shares ONE
    quantization.
    """
    m, n = csr.shape
    if m % p:
        raise ValueError(f"rows {m} not divisible by {p} shards")
    csr = csr.tocsr()
    mloc = m // p
    br, bc = block
    row_scale = None
    fro = np.zeros(p, np.float32)
    for i in range(p):
        slab = csr[i * mloc:(i + 1) * mloc]
        fro[i] = float((slab.multiply(slab)).sum())
    is_int4 = (isinstance(dtype, str) and dtype.lower() == "int4") or (
        not isinstance(dtype, str) and np.dtype(dtype).name == "int4")
    if is_int4:
        dtype = np.int8
    if (is_int4 or np.dtype(dtype) == np.int8) and quantize:
        # Per-row symmetric quantization A ~= diag(s) Q, one quantization
        # shared by forward and transposed application (exact adjoint pair,
        # same as the single-chip PallasBSROperator).
        from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr

        csr, s = _row_quantize_csr(csr, qmax=7 if is_int4 else 127)
        row_scale = jnp.asarray(s.reshape(p, mloc))
    panels = [
        bucketed_block_ell_from_csr(
            csr[i * mloc:(i + 1) * mloc], block=block, dtype=dtype,
            n_buckets=n_buckets, row_group=row_group, pack_int4=is_int4)
        for i in range(p)
    ]
    nb = len(panels[0].buckets)
    if any(len(pl.buckets) != nb for pl in panels):
        raise AssertionError("bucket count must be mesh-uniform")
    ncb = panels[0].ncb

    # --- static column windows (in slabs of n/p columns) ---
    nloc = n // p if n % p == 0 else 0
    windowed = window and nloc > 0 and nloc % bc == 0
    if windowed:
        slab_blocks = nloc // bc
        smin = np.zeros(p, np.int64)
        smax = np.zeros(p, np.int64)
        def _nonzero_block_mask(blocks_):
            arr = np.asarray(blocks_)
            if is_int4:
                # per-NIBBLE nonzero mask, interleaved lo/hi to match the
                # 2x-length bcols (a byte with a padded hi nibble must not
                # mark the padding's bcol-0 and drag the window to slab 0)
                a32 = arr.astype(np.int32)
                lo = ((a32 & 15) ^ 8) - 8
                hi = (((a32 >> 4) & 15) ^ 8) - 8
                nbr_, mb_ = arr.shape[:2]
                mlo = lo.reshape(nbr_, mb_, -1).any(axis=2)
                mhi = hi.reshape(nbr_, mb_, -1).any(axis=2)
                return np.stack([mlo, mhi], axis=2).reshape(nbr_, 2 * mb_)
            return arr.reshape(arr.shape[0], arr.shape[1], -1).any(axis=2)

        for i, pl in enumerate(panels):
            cols = [np.asarray(bcols_)[_nonzero_block_mask(blocks_)]
                    for blocks_, bcols_ in pl.buckets]
            cols = (np.concatenate(cols) if cols else
                    np.zeros(0, np.int64))
            if cols.size == 0:
                smin[i] = smax[i] = 0
            else:
                smin[i] = cols.min() // slab_blocks
                smax[i] = cols.max() // slab_blocks
        S = int((smax - smin + 1).max())
        # Window starts may run NEGATIVE or past p (slabs are fetched mod p):
        # choose per-shard starts  start_i = i + e_i  with
        # e_i = clamp(e, smax_i - S + 1 - i, smin_i - i)  for the common
        # offset e that minimizes the global shift range L — without this,
        # clamping edge windows into [0, p-S] inflates L past p for any
        # operator whose band wraps near the boundary shards.
        ids = np.arange(p)
        lo = smax - S + 1 - ids
        hi = smin - ids
        best = None
        for e in range(int(lo.min()), int(hi.max()) + 1):
            ei = np.clip(e, lo, hi)
            Le = int(ei.max() - ei.min()) + S
            if best is None or Le < best[0]:
                best = (Le, ei)
        L, e_i = best
        start = (ids + e_i).astype(np.int64)
        dmin = int(e_i.min())
        if L >= p:  # no savings: one all_gather beats p ppermutes
            windowed = False
    if not windowed:
        slab_blocks = 0
        S = 0
        start = np.zeros(p, np.int64)
        dmin, L = 0, p

    # --- mesh-uniform padding of the per-shard buckets ---
    cw = 2 if is_int4 else 1  # bcols entries per stored block-axis slot
    buckets = []
    for b in range(nb):
        nbr_b = max(pl.buckets[b][0].shape[0] for pl in panels)
        maxb_b = max(pl.buckets[b][0].shape[1] for pl in panels)
        nbr_b = -(-nbr_b // row_group) * row_group
        blocks = np.zeros((p, nbr_b, maxb_b, br, bc), dtype)
        bcols = np.zeros((p, nbr_b, cw * maxb_b), np.int32)
        for i, pl in enumerate(panels):
            blk, bcl = pl.buckets[b]
            nb_i, mb_i = blk.shape[0], blk.shape[1]
            blocks[i, :nb_i, :mb_i] = np.asarray(blk)
            c = np.asarray(bcl)
            if windowed:
                # window-relative; real blocks never precede the window
                # start, so the clip only touches zero-padding slots.
                c = np.maximum(c - start[i] * slab_blocks, 0)
            bcols[i, :nb_i, :cw * mb_i] = c
        buckets.append((jnp.asarray(blocks),
                        jnp.asarray(bcols.reshape(p, -1))))

    # --- row permutations, mesh-uniform ---
    nbr = -(-mloc // br)
    total = sum(blocks.shape[1] for blocks, _ in buckets)
    inv_perm = np.zeros((p, nbr), np.int32)
    fwd_perm = np.full((p, total), -1, np.int32)
    for i, pl in enumerate(panels):
        # re-derive positions in the PADDED concatenated order
        off_pad = 0
        off_orig = 0
        for b in range(nb):
            nbr_b_orig = pl.buckets[b][0].shape[0]
            ip = np.asarray(pl.inv_perm)  # orig row -> pos in orig concat
            sel = (ip >= off_orig) & (ip < off_orig + nbr_b_orig)
            rows = np.nonzero(sel)[0]
            pos = ip[sel] - off_orig + off_pad
            inv_perm[i, rows] = pos
            fwd_perm[i, pos] = rows
            off_orig += nbr_b_orig
            off_pad += buckets[b][0].shape[1]
    return ShardedPanels(
        buckets, jnp.asarray(inv_perm), jnp.asarray(fwd_perm),
        jnp.asarray(start.astype(np.int32)), (m, n), ncb,
        S, slab_blocks, (dmin, L), row_group, p,
        packed4=is_int4, row_scale=row_scale, fro_sq=jnp.asarray(fro),
    )


# ---------------------------------------------------------------------------
# shard_map-local primitives.  All take the LOCAL slices (leading axis 1)
# of a ShardedPanels pytree, as produced by in_specs=P(axis).
# ---------------------------------------------------------------------------

def _wire_codec(comm_dtype):
    """(encode, decode) for the gather wire.  With a narrow ``comm_dtype``
    the slab moves as its RAW BITS: a plain astype lets XLA's simplifier
    reorder the convert past the collective and gather f32 anyway
    (verified in the optimized HLO — even through an
    optimization_barrier); converts cannot be folded through a bitcast,
    so the wire provably carries the narrow words
    (tests/test_parallel.py wire-dtype oracle)."""
    if comm_dtype is None:
        ident = lambda a: a
        return ident, ident
    cd = jnp.dtype(comm_dtype)
    ui = jnp.dtype(f"uint{cd.itemsize * 8}")

    def enc(a):
        return jax.lax.bitcast_convert_type(a.astype(cd), ui)

    def dec(a):
        return jax.lax.bitcast_convert_type(a, cd).astype(jnp.float32)

    return enc, dec


def _gather_exchange(sp: ShardedPanels, x_loc, axis: str, comm_dtype):
    """The exchange schedule shared by the vector and multi-RHS gathers:
    windowed panels do L ppermute hops + a dynamic slice of the received
    stack (L*n/p bytes on the wire, returning (win_slabs, nloc, ...));
    full panels one all_gather ((p-1)*n/p bytes, returning (n, ...)).
    ``x_loc`` is this device's row slab, (nloc,) or (nloc, R)."""
    enc, dec = _wire_codec(comm_dtype)
    x_loc = enc(x_loc.astype(jnp.float32))
    if not sp.windowed:
        return dec(jax.lax.all_gather(x_loc, axis, tiled=True))
    dmin, L = sp.shifts
    p = sp.p
    slabs = []
    for idx in range(L):
        d = dmin + idx
        if d == 0:
            slabs.append(x_loc)
        else:
            perm = [((j + d) % p, j) for j in range(p)]
            slabs.append(jax.lax.ppermute(x_loc, axis, perm))
    stack = dec(jnp.stack(slabs))                 # (L, nloc[, R])
    my = jax.lax.axis_index(axis)
    start_rel = sp.win_start.reshape(-1)[0] - my - dmin
    zero = jnp.zeros((), start_rel.dtype)
    starts = (start_rel,) + (zero,) * (stack.ndim - 1)
    return jax.lax.dynamic_slice(
        stack, starts, (sp.win_slabs,) + stack.shape[1:])


def gather_window(sp: ShardedPanels, x_loc, axis: str, comm_dtype=None):
    """Assemble this shard's x window (win_blocks, bc) f32 from the sharded
    x (one slab per device) — see :func:`_gather_exchange` for the wire
    schedule and :func:`_wire_codec` for the narrow-``comm_dtype`` option
    (halves the dominant gather bytes, DESIGN §8 lever (a); local kernels
    still run f32, the exchanged vector is rounded ~4e-3 relative — assert
    a tolerance band, not bit parity)."""
    bc = sp.block_shape[1]
    n = sp.shape[1]
    out = _gather_exchange(sp, x_loc, axis, comm_dtype)
    if not sp.windowed:
        n_pad = sp.ncb * bc
        return jnp.zeros((n_pad,), jnp.float32).at[:n].set(out).reshape(
            sp.ncb, bc)
    return out.reshape(-1).reshape(sp.win_blocks, bc)


def local_matvec(sp: ShardedPanels, x_win2d, interpret: bool = False):
    """Forward kernel over this shard's buckets: (m/p,) = A_loc @ x_win.

    int8 panels apply the per-row scales outside the kernel
    (``A x = s * (Q x)``)."""
    br = sp.block_shape[0]
    mloc = sp.shape[0] // sp.p
    ys = []
    for blocks, bcols in sp.buckets:
        ys.append(_bucket_matvec(bcols[0], blocks[0], x_win2d,
                                 interpret=interpret,
                                 row_group=sp.row_group,
                                 packed4=sp.packed4))
    y_sorted = jnp.concatenate(ys, axis=0).reshape(-1, br)
    y_rows = y_sorted[sp.inv_perm[0]]
    y = y_rows.reshape(-1)[:mloc]
    if sp.row_scale is not None:
        y = sp.row_scale[0] * y
    return y


def local_rmatvec_window(sp: ShardedPanels, u_loc, interpret: bool = False):
    """Transposed kernel over this shard's buckets: window-relative partial
    ``(A_loc)^T u_loc`` of shape (win_blocks, bc) — reduce over the mesh and
    (for windowed panels) scatter into global coordinates afterwards."""
    br, bc = sp.block_shape
    mloc = sp.shape[0] // sp.p
    nbr = -(-mloc // br)
    perm = sp.fwd_perm[0]
    u_loc = u_loc.astype(jnp.float32)
    if sp.row_scale is not None:
        # A = diag(s) Q  =>  A^T u = Q^T (s u): one quantization, exact
        # adjoint pair (mirrors PallasBSROperator.rmatvec).
        u_loc = sp.row_scale[0] * u_loc
    u_pad = jnp.zeros((nbr * br,), jnp.float32).at[:mloc].set(
        u_loc).reshape(nbr, br)
    u_sorted = jnp.where((perm >= 0)[:, None], u_pad[jnp.clip(perm, 0)], 0.0)
    y2d = jnp.zeros((sp.win_blocks, bc), jnp.float32)
    off = 0
    for blocks, bcols in sp.buckets:
        nbr_b = blocks.shape[1]
        y2d = y2d + _bucket_rmatvec(
            bcols[0], blocks[0], u_sorted[off:off + nbr_b], sp.win_blocks,
            interpret=interpret, row_group=sp.row_group,
            packed4=sp.packed4)
        off += nbr_b
    return y2d


def gather_window_mat(sp: ShardedPanels, X_loc, axis: str, comm_dtype=None):
    """Multi-RHS twin of :func:`gather_window`: assemble this shard's
    window of the row-sharded X (nloc, R) as (win_blocks, R, bc) f32 — the
    input layout of the SpMM kernel (``_bucket_matmat``).  The SAME
    :func:`_gather_exchange` schedule as the vector form, R times the
    payload per hop (one exchange serves all R columns)."""
    bc = sp.block_shape[1]
    n = sp.shape[1]
    R = X_loc.shape[1]
    out = _gather_exchange(sp, X_loc, axis, comm_dtype)
    if not sp.windowed:
        n_pad = sp.ncb * bc
        X2d = jnp.zeros((n_pad, R), jnp.float32).at[:n].set(out)
        return X2d.reshape(sp.ncb, bc, R).transpose(0, 2, 1)
    return out.reshape(-1, R).reshape(sp.win_blocks, bc, R).transpose(
        0, 2, 1)


def local_matmat(sp: ShardedPanels, x_win3d, interpret: bool = False):
    """Multi-RHS forward kernel over this shard's buckets:
    (m/p, R) = A_loc @ X_win — one panel read serves all R columns."""
    br = sp.block_shape[0]
    mloc = sp.shape[0] // sp.p
    R = x_win3d.shape[1]
    ys = []
    for blocks, bcols in sp.buckets:
        ys.append(_bucket_matmat(bcols[0], blocks[0], x_win3d,
                                 interpret=interpret,
                                 row_group=sp.row_group,
                                 packed4=sp.packed4))
    y_sorted = jnp.concatenate(ys, axis=0).reshape(-1, br, R)
    y_rows = y_sorted[sp.inv_perm[0]]
    y = y_rows.reshape(-1, R)[:mloc]
    if sp.row_scale is not None:
        y = sp.row_scale[0][:, None] * y
    return y


def local_rmatmat_window(sp: ShardedPanels, U_loc, interpret: bool = False):
    """Multi-RHS transposed kernel: window-relative partial
    ``(A_loc)^T U_loc`` of shape (win_blocks, R, bc) for U_loc (m/p, R)."""
    br, bc = sp.block_shape
    mloc = sp.shape[0] // sp.p
    R = U_loc.shape[1]
    nbr = -(-mloc // br)
    perm = sp.fwd_perm[0]
    U_loc = U_loc.astype(jnp.float32)
    if sp.row_scale is not None:
        U_loc = sp.row_scale[0][:, None] * U_loc
    u_pad = jnp.zeros((nbr * br, R), jnp.float32).at[:mloc].set(
        U_loc).reshape(nbr, br, R)
    u_sorted = jnp.where((perm >= 0)[:, None, None],
                         u_pad[jnp.clip(perm, 0)], 0.0)
    y3d = jnp.zeros((sp.win_blocks, R, bc), jnp.float32)
    off = 0
    for blocks, bcols in sp.buckets:
        nbr_b = blocks.shape[1]
        y3d = y3d + _bucket_rmatmat(
            bcols[0], blocks[0], u_sorted[off:off + nbr_b], sp.win_blocks,
            interpret=interpret, row_group=sp.row_group,
            packed4=sp.packed4)
        off += nbr_b
    return y3d


def scatter_window_to_full_mat(sp: ShardedPanels, y_win3d):
    """Place a window-relative multi-RHS partial (win_blocks, R, bc) into
    the global (n, R) frame (local zero-pad + roll, no communication)."""
    n = sp.shape[1]
    R = y_win3d.shape[1]
    flat = y_win3d.transpose(0, 2, 1).reshape(-1, R)
    if not sp.windowed:
        return flat[:n]
    p = sp.p
    nloc = n // p
    full = jnp.zeros((n, R), flat.dtype).at[:flat.shape[0]].set(flat)
    off = sp.win_start.reshape(-1)[0] * nloc
    return jnp.roll(full, off, axis=0)


def scatter_window_to_full(sp: ShardedPanels, y_win2d):
    """Place a window-relative partial (win_blocks, bc) into the global
    (n,) coordinate frame (local zero-pad, no communication)."""
    n = sp.shape[1]
    bc = sp.block_shape[1]
    flat = y_win2d.reshape(-1)
    if not sp.windowed:
        return flat[:n]
    p = sp.p
    nloc = n // p
    # windows may start negative / wrap past n (mod-p slab fetch), so place
    # at 0 and roll — jnp.roll wraps for any (traced) shift sign.
    full = jnp.zeros((n,), flat.dtype).at[: flat.shape[0]].set(flat)
    off = sp.win_start.reshape(-1)[0] * nloc
    return jnp.roll(full, off)


def shard_view(sp: ShardedPanels, i: int) -> ShardedPanels:
    """A p=1-style view of shard ``i``: every leaf sliced to ``[i:i+1]`` so
    the shard_map-local primitives (``local_matvec``/``local_rmatvec_window``,
    which index leaf ``[0]``) can be driven directly — used by the real-TPU
    Mosaic tests (tests_tpu/test_sharded_tpu.py) to exercise window-relative
    panels of a p>1 build on a single chip, and for kernel debugging."""
    return jax.tree_util.tree_map(lambda a: a[i:i + 1], sp)


def host_window_x(sp: ShardedPanels, i: int, x) -> jnp.ndarray:
    """Host-side replica of ``gather_window`` for shard ``i`` of a FULL
    (replicated) x — what the ppermute exchange would deliver.  Test/debug
    only (no communication)."""
    import numpy as np

    bc = sp.block_shape[1]
    x = np.asarray(x, np.float32)
    n = sp.shape[1]
    if not sp.windowed:
        pad = np.zeros(sp.ncb * bc, np.float32)
        pad[:n] = x
        return jnp.asarray(pad.reshape(sp.ncb, bc))
    p = sp.p
    nloc = n // p
    start = int(np.asarray(sp.win_start)[i])
    slabs = [x[((start + s) % p) * nloc:((start + s) % p) * nloc + nloc]
             for s in range(sp.win_slabs)]
    return jnp.asarray(np.concatenate(slabs).reshape(sp.win_blocks, bc))


def comms_bytes_per_iteration(A_panels: ShardedPanels,
                              itemsize: int = 4,
                              kdim: int = 0,
                              B_panels: ShardedPanels | None = None,
                              comm_itemsize: int | None = None) -> dict:
    """Analytic per-iteration communication volume (bytes per device) of the
    sharded-Pallas GMRES schedule, for DESIGN.md and scaling sanity checks.

    Per iteration: one x gather (windowed ppermutes or all_gather), two
    fused psum(kdim+1) CGS2 reductions, ~4 scalar psums (ring all-reduce
    ~= 2 (p-1)/p bytes/elem), and the back-projector's collective:

      * transposed layout (``B_panels=None``): one reduce_scatter of the
        n-vector, (p-1)*n/p bytes;
      * forward layout: one gather of the m-sharded intermediate through
        ``B_panels``'s own window (L*m/p windowed, (p-1)*m/p full) and no
        reduction — more wire bytes when m >> n, traded for the faster
        forward kernel (see ``sharded_pallas._make_B_mv``).

    ``comm_itemsize``: wire bytes per element of the GATHER terms when the
    exchange runs in a narrower dtype (``comm_dtype=jnp.bfloat16`` → 2);
    the reduce_scatter/psum terms stay at ``itemsize`` (they accumulate in
    the working dtype).
    """
    p = A_panels.p
    n = A_panels.shape[1]
    nloc = n // p
    g_item = itemsize if comm_itemsize is None else comm_itemsize

    def _gather_bytes(sp: ShardedPanels) -> int:
        xloc = sp.shape[1] // p
        if sp.windowed:
            _, L = sp.shifts
            return L * xloc * g_item
        return (p - 1) * xloc * g_item

    gather = _gather_bytes(A_panels)
    if B_panels is None:
        b_collective = (p - 1) * nloc * itemsize
        b_key = "reduce_scatter_bytes"
    else:
        b_collective = _gather_bytes(B_panels)
        b_key = "b_gather_bytes"
    allred = 2.0 * (p - 1) / p * itemsize
    cgs2 = 2 * (kdim + 1) * allred
    scalars = 4 * allred
    return {
        "p": p,
        "gather_bytes": gather,
        b_key: b_collective,
        "cgs2_bytes": cgs2,
        "scalar_bytes": scalars,
        "total_bytes": gather + b_collective + cgs2 + scalars,
    }


def _require_exact_values(name: str, sp: ShardedPanels) -> None:
    """Forward-layout adjoint/back panels must store EXACT (or elementwise-
    rounded bf16) values: per-row quantization of A^T is per-COLUMN
    quantization of A, so an int8/int4 forward-adjoint panel would silently
    break the exact adjoint pair ``<A v, u> == <v, A^T u>`` the GKB
    recurrences rely on (``lsqr_solver.m:22-28``)."""
    if sp.row_scale is not None or sp.packed4:
        raise ValueError(
            f"{name} panels are quantized (int8/int4): forward-layout "
            "adjoint panels must be f32/bf16 — per-row scales of the "
            "transpose are per-column scales of the operator, which breaks "
            "the exact adjoint pair; use the transposed-kernel layout for "
            "quantized operators")


@jax.tree_util.register_pytree_node_class
class PanelsWithAdjoint:
    """``A`` panels plus a DEDICATED forward-layout panel of ``A^T``.

    The sharded GKB family applies ``A^T`` through the transposed kernel
    of the A panel by default (exact adjoint, fewest panels) — measured
    ~25% slower than a forward kernel (DESIGN §12).  Wrapping the pair
    ``PanelsWithAdjoint(A_panels, AT_panels)`` (with ``AT_panels =
    shard_bucketed_panels(A_csr.T.tocsr(), p)``) makes ``rmatvec`` run the
    forward kernel of the A^T panel instead: one gather of the m-sharded
    u ((p-1)*m/p bytes or windowed) and NO reduction, trading wire bytes
    for the faster kernel exactly like the GMRES solvers' ``B_panels``
    option.  Both panels must be f32/bf16 (elementwise storage — the
    adjoint pair stays exact); quantized panels are rejected.
    """

    def __init__(self, A: ShardedPanels, AT: ShardedPanels):
        m, n = A.shape
        if AT.shape != (n, m):
            raise ValueError(
                f"AT panels must cover A^T as (n, m)={(n, m)}; got "
                f"{AT.shape}")
        if AT.p != A.p:
            raise ValueError(f"AT panels built for p={AT.p}, A has {A.p}")
        if A.row_scale is not None and not A.packed4:
            # shared-quantization int8 pair (build_panels_with_adjoint):
            # AT must hold the RAW Q^T values (no second quantization) so
            # A^T u = Q^T (s u) is the exact adjoint of A x = s (Q x)
            if AT.row_scale is not None or AT.packed4 or \
                    AT.buckets[0][0].dtype != jnp.int8:
                raise ValueError(
                    "int8 A panels need a shared-quantization AT panel "
                    "(raw int8 Q^T, no scales) — build the pair with "
                    "build_panels_with_adjoint")
        else:
            _require_exact_values("AT", AT)
            _require_exact_values("A", A)
            if A.buckets[0][0].dtype != AT.buckets[0][0].dtype:
                raise ValueError(
                    f"A/AT storage dtypes differ "
                    f"({A.buckets[0][0].dtype} vs {AT.buckets[0][0].dtype})"
                    ": a bf16-rounded panel paired with an f32 transpose is "
                    "not an exact adjoint pair")
        self.A = A
        self.AT = AT

    @property
    def shape(self):
        return self.A.shape

    @property
    def p(self):
        return self.A.p

    @property
    def fro_sq(self):
        return self.A.fro_sq

    def tree_flatten(self):
        return (self.A, self.AT), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_panels_with_adjoint(csr, p: int, block=(8, 128),
                              block_T=(8, 128), dtype=np.float32,
                              n_buckets: int = 4, row_group: int = 8,
                              window: bool = True) -> PanelsWithAdjoint:
    """Build an EXACT-adjoint (A, A^T) forward-panel pair, including int8.

    f32/bf16: both panels store elementwise(-rounded) values — exact pair.
    int8: A is quantized ONCE (``A ~= diag(s) Q``); the AT panel stores the
    raw integer ``Q^T`` with no scales of its own, and the GKB rmatvec
    pre-scales the m-sharded input (``A^T u = Q^T (s u)``) — the same
    exact pair the transposed kernel realizes, now through the faster
    forward kernel.  int4 nibble packing of the transpose is not supported.
    """
    import scipy.sparse as sp_

    is_int4 = (isinstance(dtype, str) and dtype.lower() == "int4") or (
        not isinstance(dtype, str) and np.dtype(dtype).name == "int4")
    if is_int4:
        raise ValueError("int4 forward-adjoint panels are not supported; "
                         "use int8 or the transposed-kernel layout")
    A = shard_bucketed_panels(csr, p, block=block, dtype=dtype,
                              n_buckets=n_buckets, row_group=row_group,
                              window=window)
    if not isinstance(dtype, str) and np.dtype(dtype) == np.int8:
        from hybrid_gmres_tpu.ops.spmv_pallas import _row_quantize_csr

        csr_q, _ = _row_quantize_csr(sp_.csr_matrix(csr), qmax=127)
        AT = shard_bucketed_panels(csr_q.T.tocsr(), p, block=block_T,
                                   dtype=np.int8, n_buckets=n_buckets,
                                   row_group=row_group, window=window,
                                   quantize=False)
    else:
        AT = shard_bucketed_panels(sp_.csr_matrix(csr).T.tocsr(), p,
                                   block=block_T, dtype=dtype,
                                   n_buckets=n_buckets, row_group=row_group,
                                   window=window)
    return PanelsWithAdjoint(A, AT)


@jax.tree_util.register_pytree_node_class
class ComposedPanels:
    """Sharded composed operator ``M = A B`` ("ab", m-space) or ``M = B A``
    ("ba", n-space) built from two panel sets — the distributed twin of
    ``ProductOperator`` for the reference's composed hybrid path
    (``run_2D_phantom.m:150-176``: LSQR on the Tikhonov-augmented M).

    ``A``: panels of A (m x n) over ray rows; ``BT``: panels of B^T (m x n)
    over ray rows.  Both M directions come from the two kernels of each
    panel: M v and M^T v each cost two collectives (one windowed/full
    gather + one reduce_scatter) — see ``composed_local_ops``.

    ``B``: optional FORWARD-layout panels of B itself (B's pixel rows,
    ``shard_bucketed_panels(B_csr, p)``) — the ``B u`` direction then runs
    the forward kernel (gather of the m-sharded u, no reduction) instead
    of the BT panel's transposed kernel, the same trade as the GMRES
    solvers' ``B_panels`` (DESIGN §12).  Requires f32/bf16 panels on both
    B and BT so M's matvec/rmatvec stay an exact adjoint pair.
    """

    def __init__(self, A: ShardedPanels, BT: ShardedPanels, kind: str,
                 B: ShardedPanels | None = None):
        if kind not in ("ab", "ba"):
            raise ValueError("kind must be 'ab' or 'ba'")
        if A.shape != BT.shape or A.p != BT.p:
            raise ValueError(
                f"panel mismatch: A {A.shape}/p={A.p}, BT {BT.shape}/p={BT.p}")
        if B is not None:
            m, n = A.shape
            if B.shape != (n, m) or B.p != A.p:
                raise ValueError(
                    f"B panels must cover B as (n, m)={(n, m)} at p={A.p}; "
                    f"got {B.shape}/p={B.p}")
            _require_exact_values("B", B)
            _require_exact_values("BT", BT)
            if B.buckets[0][0].dtype != BT.buckets[0][0].dtype:
                raise ValueError(
                    f"B/BT storage dtypes differ "
                    f"({B.buckets[0][0].dtype} vs "
                    f"{BT.buckets[0][0].dtype}): M's matvec/rmatvec would "
                    "not be an exact adjoint pair")
        self.A = A
        self.BT = BT
        self.B = B
        self.kind = kind

    @property
    def shape(self):
        m, n = self.A.shape
        return (m, m) if self.kind == "ab" else (n, n)

    @property
    def p(self):
        return self.A.p

    def tree_flatten(self):
        return (self.A, self.BT, self.B), self.kind

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux, B=children[2])


def composed_local_ops(cp: ComposedPanels, axis: str, dtype,
                       interpret: bool = False):
    """(matvec, rmatvec) on the shard-local composed operator, both taking
    and returning vectors sharded over ``axis`` in M's own space."""
    A_loc, BT_loc, B_loc = cp.A, cp.BT, cp.B

    def _rs(full):
        return jax.lax.psum_scatter(full, axis, scatter_dimension=0,
                                    tiled=True)

    def A_fwd(x_loc):                  # n-sharded -> m-sharded rows of A
        xw = gather_window(A_loc, x_loc, axis)
        return local_matvec(A_loc, xw, interpret=interpret).astype(dtype)

    def At_rs(v_loc):                  # m-sharded -> n-sharded A^T v
        part = local_rmatvec_window(A_loc, v_loc, interpret=interpret)
        return _rs(scatter_window_to_full(A_loc, part).astype(dtype))

    def Bt_fwd(x_loc):                 # n-sharded -> m-sharded rows of B^T
        xw = gather_window(BT_loc, x_loc, axis)
        return local_matvec(BT_loc, xw, interpret=interpret).astype(dtype)

    if B_loc is not None:
        def B_rs(u_loc):               # m-sharded -> n-sharded B u (forward)
            uw = gather_window(B_loc, u_loc, axis)
            return local_matvec(B_loc, uw, interpret=interpret).astype(dtype)
    else:
        def B_rs(u_loc):               # m-sharded -> n-sharded B u
            part = local_rmatvec_window(BT_loc, u_loc, interpret=interpret)
            return _rs(scatter_window_to_full(BT_loc, part).astype(dtype))

    if cp.kind == "ab":
        matvec = lambda u: A_fwd(B_rs(u))      # M u   = A (B u)
        rmatvec = lambda v: Bt_fwd(At_rs(v))   # M^T v = B^T (A^T v)
    else:
        matvec = lambda x: B_rs(A_fwd(x))      # M x   = B (A x)
        rmatvec = lambda x: At_rs(Bt_fwd(x))   # M^T x = A^T (B^T x)
    return matvec, rmatvec
