"""hybrid_gmres_tpu — a TPU-native iterative-regularization framework.

A from-scratch JAX / XLA / Pallas implementation of the capabilities of the
MATLAB research code luisayang-malaxiangguo/Hybrid-GMRES: AB-/BA-GMRES
(hybrid and non-hybrid, project-then-regularize and regularize-then-project),
LSQR/LSMR and their hybrid Tikhonov forms, GCV-based lambda selection,
filter-factor analysis and first-order perturbation bounds, for linear
ill-posed problems ``A x ~= b`` with a (possibly mismatched) back-projector
``B != A^T``.

Design (see SURVEY.md):
  * the Krylov iteration (matvecs, CGS2 orthogonalization, basis updates)
    runs on device as a single ``lax.scan`` with static shapes;
  * the small projected k x k regularized solves run inside the same scan on
    padded/masked matrices, so the whole solver jits, vmaps over lambda
    grids, and shards over a device mesh;
  * O(n^3) spectral analysis (filter factors, perturbation bounds) is a
    separate host-side instrumentation layer.
"""

from hybrid_gmres_tpu.ops.linear_operator import (
    DenseOperator,
    AugmentedOperator,
    ProductOperator,
    ShiftedOperator,
    as_operator,
)
from hybrid_gmres_tpu.problems.onedim import generate_test_problem, shaw, heat, deriv2
from hybrid_gmres_tpu.solvers.gmres import (
    ab_gmres,
    ab_gmres_restarted,
    ba_gmres,
    ba_gmres_restarted,
)
from hybrid_gmres_tpu.solvers.rtp import ab_gmres_rtp, ba_gmres_rtp
from hybrid_gmres_tpu.solvers.batched import (
    ab_gmres_batched,
    ba_gmres_batched,
)
from hybrid_gmres_tpu.solvers.lsqr import lsqr, hybrid_lsqr
from hybrid_gmres_tpu.solvers.lsmr import lsmr, hybrid_lsmr
from hybrid_gmres_tpu.solvers.gkb_batched import (
    hybrid_lsqr_batched,
    lsmr_batched,
    lsqr_batched,
)

__version__ = "0.1.0"

__all__ = [
    "DenseOperator",
    "AugmentedOperator",
    "ProductOperator",
    "ShiftedOperator",
    "as_operator",
    "generate_test_problem",
    "shaw",
    "heat",
    "deriv2",
    "ab_gmres",
    "ab_gmres_restarted",
    "ba_gmres_restarted",
    "ba_gmres_batched",
    "ab_gmres_batched",
    "ba_gmres",
    "ab_gmres_rtp",
    "ba_gmres_rtp",
    "lsqr",
    "hybrid_lsqr",
    "lsmr",
    "hybrid_lsmr",
    "lsqr_batched",
    "hybrid_lsqr_batched",
    "lsmr_batched",
]
