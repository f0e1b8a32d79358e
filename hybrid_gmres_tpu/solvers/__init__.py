from hybrid_gmres_tpu.solvers.common import GMRESResult, GKBResult
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

__all__ = [
    "GMRESResult",
    "GKBResult",
    "ab_gmres",
    "ba_gmres",
    "ab_gmres_restarted",
    "ba_gmres_restarted",
    "ba_gmres_batched",
    "ab_gmres_batched",
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
