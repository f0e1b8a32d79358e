"""TPU-oriented sparse-matrix containers (ELL and block-ELL/BSR).

Format-selection rationale (measured on the CT operator, v5e):
  * XLA's element gather is ~50x slower than dense matmul on TPU, so
    classic CSR/ELL gather SpMV cannot win — public Mosaic exposes no
    irregular vector gather either (only same-shape 2D shuffles).
  * Dense f32 matvec reaches ~680 GB/s (~83% of v5e HBM peak): the baseline
    to beat is memory traffic, not FLOPs.
  * Block-sparse (8 x 128 blocks) covers the CT band structure at ~49% of
    dense traffic and needs only *dynamic 128-wide slices* of x (supported
    in Mosaic via scalar-prefetched block-column indices) — no gathers.
    bf16 block storage halves traffic again.

So the accelerated path is block-ELL (padded BSR) via the Pallas kernel in
``spmv_pallas.py``; ELL with jnp gather is kept as a portable reference
implementation (fine on CPU, correctness oracle for the kernel).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class ELLMatrix:
    """Padded row-major ELL: ``A[i, idx[i, j]] = vals[i, j]``."""

    idx: jax.Array    # (rows, width) int32, padded entries point at col 0
    vals: jax.Array   # (rows, width), padded entries are 0
    shape: tuple

    def matvec(self, x):
        return jnp.sum(self.vals * x[self.idx], axis=1)

    def tree_flatten(self):
        return (self.idx, self.vals), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


def ell_from_csr(csr, dtype=np.float32) -> ELLMatrix:
    rows = csr.shape[0]
    width = int(np.diff(csr.indptr).max()) if rows else 0
    idx = np.zeros((rows, width), np.int32)
    vals = np.zeros((rows, width), dtype)
    # vectorized fill: position-within-row for every nnz
    counts = np.diff(csr.indptr)
    r = np.repeat(np.arange(rows), counts)
    within = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], counts)
    idx[r, within] = csr.indices
    vals[r, within] = csr.data.astype(dtype)
    return ELLMatrix(jnp.asarray(idx), jnp.asarray(vals), tuple(csr.shape))


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockELLMatrix:
    """Block-ELL (padded BSR): dense (BR x BC) blocks, per-block-row padded
    list of block-column indices.  Padded slots have bcol = 0 and zero block
    data, so unconditional accumulation is exact."""

    blocks: jax.Array   # (nbr, maxb, BR, BC)
    bcols: jax.Array    # (nbr, maxb) int32 (block-column index, padded: 0)
    nblocks: jax.Array  # (nbr,) int32 (valid blocks per block-row)
    shape: tuple        # logical (m, n) before padding

    @property
    def block_shape(self):
        return self.blocks.shape[2], self.blocks.shape[3]

    @property
    def padded_shape(self):
        nbr, maxb, br, bc = self.blocks.shape
        return (nbr * br, self.bcols_cols * bc)

    @property
    def bcols_cols(self):
        # number of block columns in the padded matrix
        return -(-self.shape[1] // self.blocks.shape[3])

    def matvec(self, x):
        """Reference jnp implementation (used on CPU and as kernel oracle)."""
        nbr, maxb, br, bc = self.blocks.shape
        ncb = self.bcols_cols
        n_pad = ncb * bc
        acc_dtype = jnp.promote_types(jnp.float32, self.blocks.dtype)
        x_pad = jnp.zeros((n_pad,), acc_dtype).at[: self.shape[1]].set(
            x.astype(acc_dtype))
        xg = x_pad.reshape(ncb, bc)[self.bcols]        # (nbr, maxb, bc)
        y = jnp.einsum("rbij,rbj->ri", self.blocks.astype(acc_dtype), xg)
        return y.reshape(nbr * br)[: self.shape[0]].astype(x.dtype)

    def tree_flatten(self):
        return (self.blocks, self.bcols, self.nblocks), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux)


def unpack_nibbles(packed):
    """Decode an int8 array of packed two's-complement nibbles into the
    (lo, hi) signed int32 pair.  The zero byte decodes to (0, 0), so packed
    padding needs no special casing."""
    raw = packed.astype(jnp.int32)
    lo = (raw << 28) >> 28   # arithmetic shifts: signed low nibble
    hi = (raw << 24) >> 28   # signed high nibble
    return lo, hi


@jax.tree_util.register_pytree_node_class
@dataclass
class BucketedBlockELL:
    """Sliced block-ELL: block-rows sorted by block count and partitioned
    into buckets, each padded only to its own max count — removes the ~2x
    padding a single global maxb costs on the CT operator.

    ``inv_perm[orig_block_row] = position in the sorted/concatenated order``.

    ``packed4``: blocks hold PAIRS of int4 values packed in int8 bytes along
    the block axis — byte j of a block-row carries logical block ``2j`` in
    its low nibble and ``2j+1`` in its high nibble (two's complement, so a
    zero byte is two zero blocks and bucket padding stays valid).  ``bcols``
    keeps one entry per LOGICAL block (2x the packed block axis).
    """

    buckets: tuple            # of (blocks (nbr_b, maxb_b, BR, BC), bcols (nbr_b, maxb_b))
    inv_perm: jax.Array       # (nbr_total,) int32
    shape: tuple              # logical (m, n)
    ncb: int                  # number of block columns (padded)
    row_group: int = 8        # block-rows per Pallas grid step (static)
    packed4: bool = False     # int4 pairs packed in int8 bytes

    @property
    def block_shape(self):
        return self.buckets[0][0].shape[2], self.buckets[0][0].shape[3]

    @property
    def nbytes(self):
        return sum(int(b.size) * b.dtype.itemsize for b, _ in self.buckets)

    def matvec(self, x):
        """Reference jnp implementation (CPU path / kernel oracle)."""
        br, bc = self.block_shape
        n_pad = self.ncb * bc
        store_dtype = self.buckets[0][0].dtype
        acc_dtype = (jnp.float32 if self.packed4
                     else jnp.promote_types(jnp.float32, store_dtype))
        x_pad = jnp.zeros((n_pad,), acc_dtype).at[: self.shape[1]].set(
            x.astype(acc_dtype)
        )
        xg2 = x_pad.reshape(self.ncb, bc)
        ys = []
        for blocks, bcols in self.buckets:
            if self.packed4:
                lo, hi = unpack_nibbles(blocks)      # (nbr_b, maxb_pk, br, bc)
                blocks = jnp.stack([lo, hi], axis=2).reshape(
                    lo.shape[0], 2 * lo.shape[1], br, bc)
            xg = xg2[bcols]  # (nbr_b, maxb_b, bc)
            ys.append(jnp.einsum(
                "rbij,rbj->ri", blocks.astype(acc_dtype), xg
            ))
        y_sorted = jnp.concatenate(ys, axis=0)       # (nbr_total, br)
        y_rows = y_sorted[self.inv_perm]             # back to original order
        return y_rows.reshape(-1)[: self.shape[0]].astype(x.dtype)

    def tree_flatten(self):
        children = (tuple(self.buckets), self.inv_perm)
        return children, (self.shape, self.ncb, self.row_group, self.packed4)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


def _pack_int4(blocks, bcols):
    """Pack int8-valued blocks (entries in [-7, 7]) into nibble pairs along
    the block axis; pads the block axis to even first."""
    nbr_b, maxb_b = blocks.shape[:2]
    if maxb_b % 2:
        blocks = np.concatenate(
            [blocks, np.zeros_like(blocks[:, :1])], axis=1)
        bcols = np.concatenate(
            [bcols, np.zeros_like(bcols[:, :1])], axis=1)
        maxb_b += 1
    lo = blocks[:, 0::2].astype(np.int32) & 15
    hi = blocks[:, 1::2].astype(np.int32) & 15
    packed = (lo | (hi << 4)).astype(np.uint8).view(np.int8)
    return packed, bcols


def bucketed_block_ell_from_csr(csr, block=(8, 128), dtype=np.float32,
                                n_buckets: int = 4,
                                row_group: int = 8,
                                pack_int4: bool = False) -> BucketedBlockELL:
    """Host conversion CSR -> sliced/bucketed block-ELL.

    ``pack_int4``: the CSR values must already be integers in [-7, 7]
    (per-row quantized); blocks are packed two-per-byte (``packed4`` layout).
    """
    import scipy.sparse as sp

    if pack_int4:
        dtype = np.int8

    br, bc = block
    m, n = csr.shape
    m_pad = -(-m // br) * br
    n_pad = -(-n // bc) * bc
    csr_pad = sp.csr_matrix((csr.data, csr.indices, csr.indptr), shape=(m, n))
    csr_pad.resize((m_pad, n_pad))
    bsr = csr_pad.tobsr(blocksize=block)
    bsr.sort_indices()
    nbr = m_pad // br
    counts = np.diff(bsr.indptr)

    # Keep >= ~16 grid steps per bucket: tiny per-bucket grids leave the
    # pallas pipeline no room to double-buffer (measured: the pixel-major
    # back-projector at 8 buckets ran at ~60% of the ray-major throughput).
    max_buckets = max(1, nbr // (row_group * 16))
    n_buckets = min(n_buckets, max_buckets)

    order = np.argsort(-counts, kind="stable")  # descending block count
    # equal-size buckets over the sorted order, each padded to row_group rows
    bounds = np.linspace(0, nbr, n_buckets + 1).astype(int)
    buckets = []
    sorted_rows = []
    for bi in range(n_buckets):
        rows = order[bounds[bi]:bounds[bi + 1]]
        if len(rows) == 0:
            continue
        nbr_b = -(-len(rows) // row_group) * row_group
        maxb_b = max(int(counts[rows].max()), 1)
        blocks = np.zeros((nbr_b, maxb_b, br, bc), dtype)
        bcols = np.zeros((nbr_b, maxb_b), np.int32)
        # vectorized scatter of each row's block segment
        lens = counts[rows]
        total = int(lens.sum())
        if total:
            dest_r = np.repeat(np.arange(len(rows)), lens)
            offs = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
            )
            src = np.repeat(bsr.indptr[rows], lens) + offs
            blocks[dest_r, offs] = bsr.data[src].astype(dtype)
            bcols[dest_r, offs] = bsr.indices[src]
        if pack_int4:
            blocks, bcols = _pack_int4(blocks, bcols)
        buckets.append((jnp.asarray(blocks), jnp.asarray(bcols)))
        sorted_rows.append(np.concatenate(
            [rows, np.full(nbr_b - len(rows), -1, dtype=np.int64)]
        ))
    sorted_rows = np.concatenate(sorted_rows)  # position -> orig row (-1 pad)
    inv_perm = np.zeros(nbr, np.int32)
    valid = sorted_rows >= 0
    inv_perm[sorted_rows[valid]] = np.nonzero(valid)[0].astype(np.int32)
    return BucketedBlockELL(
        tuple(buckets), jnp.asarray(inv_perm), (m, n), n_pad // bc,
        int(row_group), packed4=bool(pack_int4),
    )


def block_ell_from_csr(csr, block=(8, 128), dtype=np.float32,
                       row_group: int = 1) -> BlockELLMatrix:
    """Convert CSR to padded block-ELL on host.

    ``row_group``: pad the number of block-rows to this multiple (the Pallas
    kernel processes groups of block-rows per grid step).
    """
    import scipy.sparse as sp

    br, bc = block
    m, n = csr.shape
    m_pad = -(-m // (br * row_group)) * (br * row_group)
    n_pad = -(-n // bc) * bc
    csr_pad = sp.csr_matrix((csr.data, csr.indices, csr.indptr), shape=(m, n))
    csr_pad.resize((m_pad, n_pad))
    bsr = csr_pad.tobsr(blocksize=block)
    bsr.sort_indices()
    nbr = m_pad // br
    counts = np.diff(bsr.indptr)
    maxb = int(counts.max()) if nbr else 0
    blocks = np.zeros((nbr, maxb, br, bc), dtype)
    bcols = np.zeros((nbr, maxb), np.int32)
    r = np.repeat(np.arange(nbr), counts)
    within = np.arange(bsr.indptr[-1]) - np.repeat(bsr.indptr[:-1], counts)
    blocks[r, within] = bsr.data.astype(dtype)
    bcols[r, within] = bsr.indices
    return BlockELLMatrix(
        jnp.asarray(blocks), jnp.asarray(bcols),
        jnp.asarray(counts.astype(np.int32)), (m, n),
    )
