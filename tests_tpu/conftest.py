"""Real-TPU test tier (VERDICT r1 #5): Mosaic-compiled kernels, no
interpret mode, no CPU forcing.

Run on a machine with a TPU attached:  ``python -m pytest tests_tpu -q``
(~15 min total incl. CT assembly + kernel compiles — run the two files
separately to stay under a 10-min command timeout).  Kept OUTSIDE tests/
so the
default CPU/x64 suite (tests/conftest.py forces the cpu platform for f64
parity oracles) is untouched; every test here auto-skips when the backend
is not a TPU.  This tier exists because interpret-mode Pallas cannot catch
Mosaic-specific behavior — layout, unroll limits, SMEM padding — the
things that actually bit during kernel bring-up (CLAUDE.md perf notes).
"""

import jax
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU backend (auto-skipped on CPU)")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason=f"needs TPU backend, have "
                                   f"{jax.default_backend()}")
    for item in items:
        item.add_marker(skip)
