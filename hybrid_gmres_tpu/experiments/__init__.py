"""Experiment drivers reproducing the reference's L5 scripts (SURVEY.md §2
rows 13-22), with the same constants and seeding conventions, as importable
modules returning structured results (figures optional).

| module                | reference script                      |
|-----------------------|---------------------------------------|
| equivalence           | run_equivalence_plots.m               |
| ptr_rtp               | run_ptr_rtp_comparison.m              |
| regularization        | analyze_regularization.m              |
| gcv_surface_exp       | plot_gcv_surface.m                    |
| error_surface         | plot_error_surface.m                  |
| filter_factors_exp    | plot_filter_factors.m                 |
| perturbation_bounds   | plot_perturbation_bound_validation.m  |
| noise_sweep           | plot_error_vs_noise_level.m           |
| mismatch_sweep        | plot_error_vs_mismatch_norm.m         |
| phantom2d             | run_2D_phantom.m                      |
"""

from hybrid_gmres_tpu.experiments import (
    equivalence,
    ptr_rtp,
    regularization,
    gcv_surface_exp,
    error_surface,
    filter_factors_exp,
    perturbation_bounds,
    noise_sweep,
    mismatch_sweep,
    phantom2d,
)

__all__ = [
    "equivalence",
    "ptr_rtp",
    "regularization",
    "gcv_surface_exp",
    "error_surface",
    "filter_factors_exp",
    "perturbation_bounds",
    "noise_sweep",
    "mismatch_sweep",
    "phantom2d",
]
