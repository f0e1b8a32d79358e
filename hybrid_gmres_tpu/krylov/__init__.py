from hybrid_gmres_tpu.krylov.arnoldi import arnoldi, arnoldi_step
from hybrid_gmres_tpu.krylov.projected import (
    projected_ls_solve,
    projected_tikhonov_solve,
)

__all__ = [
    "arnoldi",
    "arnoldi_step",
    "projected_ls_solve",
    "projected_tikhonov_solve",
]
