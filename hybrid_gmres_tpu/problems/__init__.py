from hybrid_gmres_tpu.problems.onedim import generate_test_problem, shaw, heat, deriv2
from hybrid_gmres_tpu.problems.noise import add_noise, perturb_backprojector

__all__ = [
    "generate_test_problem",
    "shaw",
    "heat",
    "deriv2",
    "add_noise",
    "perturb_backprojector",
]
