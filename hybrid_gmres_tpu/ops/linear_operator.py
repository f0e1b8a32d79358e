"""Linear-operator protocol for the matvec substrate (SURVEY.md L0/L1).

The reference uses dense MATLAB ``*`` for every matvec (e.g.
``ABgmres_hybrid_bounds.m:25``, ``lsqr_solver.m:22-26``).  Here operators are
small pytree classes exposing ``matvec``/``rmatvec`` so that the same Krylov
cores run over dense jnp matrices, Pallas sparse kernels, matrix-free CT
projectors, or mesh-sharded operators without change.  Mismatched pairs
``(A, B)`` with ``B != A^T`` are first-class: ``B`` is passed wherever the
math calls for a back-projector, never derived from ``A``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class LinearOperator:
    """Minimal protocol: ``shape``, ``dtype``, ``matvec``, ``rmatvec``.

    Subclasses are registered as pytrees so operators can be closed over by /
    passed through ``jax.jit``, ``vmap`` and ``shard_map``.
    """

    shape: tuple
    dtype: jnp.dtype

    def matvec(self, v):
        raise NotImplementedError

    def rmatvec(self, u):
        """Action of the (declared) adjoint.  For a mismatched pair this is
        the back-projector's action, which need not equal ``A^T u``."""
        raise NotImplementedError

    def matmat(self, X):
        """Multi-RHS action Y (m, R) = A @ X (n, R).  Default: vmapped
        matvec (one operator application per column); kernel-backed
        operators override with a true SpMM (one panel read for all R —
        ``PallasBSROperator.matmat``)."""
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(X)

    def rmatmat(self, U):
        """Multi-RHS adjoint action Y (n, R) = A' @ U (m, R)."""
        return jax.vmap(self.rmatvec, in_axes=1, out_axes=1)(U)

    def __call__(self, v):
        return self.matvec(v)

    @property
    def T(self):
        return _TransposedOperator(self)

    def todense(self):
        """Materialize as a dense matrix (columns = images of basis vectors).

        Only for analysis / testing at small sizes.
        """
        n = self.shape[1]
        eye = jnp.eye(n, dtype=self.dtype)
        return jax.vmap(self.matvec, in_axes=1, out_axes=1)(eye)


@jax.tree_util.register_pytree_node_class
class _TransposedOperator(LinearOperator):
    def __init__(self, op):
        self.op = op

    @property
    def shape(self):
        return (self.op.shape[1], self.op.shape[0])

    @property
    def dtype(self):
        return self.op.dtype

    def matvec(self, v):
        return self.op.rmatvec(v)

    def rmatvec(self, u):
        return self.op.matvec(u)

    def tree_flatten(self):
        return (self.op,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


@jax.tree_util.register_pytree_node_class
class DenseOperator(LinearOperator):
    """Dense matrix operator; matvec hits the MXU as a (m,n)@(n,) contraction.

    ``precision``: optional ``jax.lax.Precision`` for the contractions —
    the TPU DEFAULT f32 matmul runs in bf16 passes (~3 digits); pass
    ``jax.lax.Precision.HIGHEST`` when the operator feeds a
    conditioning-squaring path (e.g. RTP Gram solves) or serves as a
    numerical reference against f64/CPU truth."""

    def __init__(self, mat, precision=None):
        self.mat = mat
        self.precision = precision

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype

    def matvec(self, v):
        return jnp.matmul(self.mat, v, precision=self.precision)

    def rmatvec(self, u):
        return jnp.matmul(self.mat.T, u, precision=self.precision)

    def matmat(self, X):
        return jnp.matmul(self.mat, X, precision=self.precision)

    def rmatmat(self, U):
        return jnp.matmul(self.mat.T, U, precision=self.precision)

    def todense(self):
        return self.mat

    def tree_flatten(self):
        return (self.mat,), self.precision

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], precision=aux)


@jax.tree_util.register_pytree_node_class
class AugmentedOperator(LinearOperator):
    """Tikhonov-augmented operator ``[A; sqrt(lam) I]`` of shape (m+n, n).

    Used by hybrid LSQR (reference ``hybrid_lsqr_solver.m:5-6`` forms the
    augmented matrix explicitly; here it stays matrix-free).  ``rmatvec`` is
    the exact adjoint ``A^T u[:m] + sqrt(lam) u[m:]`` as in the reference.
    """

    def __init__(self, op, lam):
        self.op = op
        self.lam = lam

    @property
    def shape(self):
        m, n = self.op.shape
        return (m + n, n)

    @property
    def dtype(self):
        return self.op.dtype

    def matvec(self, v):
        # lam is cast to the VECTOR dtype, never the operator's: a quantized
        # operator's storage dtype would truncate lam (int8(1e-2) == 0,
        # silently dropping the regularization — ADVICE r1 high).
        sqlam = jnp.sqrt(jnp.asarray(self.lam, dtype=v.dtype))
        return jnp.concatenate([self.op.matvec(v), sqlam * v])

    def rmatvec(self, u):
        m, n = self.op.shape
        sqlam = jnp.sqrt(jnp.asarray(self.lam, dtype=u.dtype))
        return self.op.rmatvec(u[:m]) + sqlam * u[m:]

    def augment_rhs(self, b):
        n = self.op.shape[1]
        return jnp.concatenate([b, jnp.zeros((n,), dtype=b.dtype)])

    def tree_flatten(self):
        return (self.op, self.lam), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class ShiftedOperator(LinearOperator):
    """``op + lam * I`` for square operators.

    The regularize-then-project GMRES variants build their Krylov space on the
    shifted operator ``B A + lam I`` (reference ``hybrid_ba_gmres_rtp.m:6``).
    """

    def __init__(self, op, lam):
        self.op = op
        self.lam = lam

    @property
    def shape(self):
        return self.op.shape

    @property
    def dtype(self):
        return self.op.dtype

    def matvec(self, v):
        # vector dtype, not operator dtype (see AugmentedOperator.matvec)
        return self.op.matvec(v) + jnp.asarray(self.lam, dtype=v.dtype) * v

    def rmatvec(self, u):
        return self.op.rmatvec(u) + jnp.asarray(self.lam, dtype=u.dtype) * u

    def tree_flatten(self):
        return (self.op, self.lam), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
class ProductOperator(LinearOperator):
    """``left @ right`` kept matrix-free (e.g. M = A B without forming the
    m x m product the reference materializes at ``run_2D_phantom.m:120``)."""

    def __init__(self, left, right):
        self.left = left
        self.right = right

    @property
    def shape(self):
        return (self.left.shape[0], self.right.shape[1])

    @property
    def dtype(self):
        return self.left.dtype

    def matvec(self, v):
        return self.left.matvec(self.right.matvec(v))

    def rmatvec(self, u):
        return self.right.rmatvec(self.left.rmatvec(u))

    def tree_flatten(self):
        return (self.left, self.right), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def as_operator(a) -> LinearOperator:
    """Coerce an array (or operator) to a LinearOperator."""
    if isinstance(a, LinearOperator):
        return a
    return DenseOperator(jnp.asarray(a))
