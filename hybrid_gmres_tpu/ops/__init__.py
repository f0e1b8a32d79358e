from hybrid_gmres_tpu.ops.ordering import (
    inverse_perm,
    morton_perm,
    reorder_pair,
)
from hybrid_gmres_tpu.ops.linear_operator import (
    LinearOperator,
    DenseOperator,
    AugmentedOperator,
    ShiftedOperator,
    as_operator,
)

__all__ = [
    "LinearOperator",
    "DenseOperator",
    "AugmentedOperator",
    "ShiftedOperator",
    "as_operator",
]
