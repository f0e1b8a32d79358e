"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

The reference is float64 MATLAB; the numerical oracles (equivalence,
filter-factor, GCV — SURVEY.md §4) need f64 to hold to tight tolerances, so
tests run on CPU with x64 enabled.  The virtual 8-device CPU platform lets
the distributed tests exercise real mesh sharding without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The harness environment pins JAX_PLATFORMS=axon (TPU tunnel) and pre-imports
# jax, so the env var alone is not enough — override via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
