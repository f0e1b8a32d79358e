"""Native C++ CT builder parity vs the numpy reference implementation."""

import numpy as np
import pytest

from hybrid_gmres_tpu.utils.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain"
)


def test_native_matches_numpy():
    from hybrid_gmres_tpu.problems.ct import ct_mismatched

    p_np = ct_mismatched(n=16, n_angles=36, n_det=24, dense=False,
                         backend="numpy")
    p_nat = ct_mismatched(n=16, n_angles=36, n_det=24, dense=False,
                          backend="native")
    assert p_np.A_csr.nnz == p_nat.A_csr.nnz
    assert p_np.B_csr.nnz == p_nat.B_csr.nnz
    assert abs(p_np.A_csr - p_nat.A_csr).max() < 1e-12
    assert abs(p_np.B_csr - p_nat.B_csr).max() < 1e-12


def test_native_csr_canonical():
    from hybrid_gmres_tpu.utils.native import build_fan_projector_native

    A = build_fan_projector_native(16, 12, 16, 32.0)
    # strictly increasing, sorted columns per row (canonical CSR)
    assert np.all(np.diff(A.indptr) >= 0)
    for r in range(A.shape[0]):
        cols = A.indices[A.indptr[r]:A.indptr[r + 1]]
        assert np.all(np.diff(cols) > 0)
