"""Build + ctypes bindings for the native C++ components
(hybrid_gmres_tpu/native/*.cpp).

The shared library is compiled on first use with g++ -O3 and cached next to
the sources; a stale .so (older than its .cpp) is rebuilt.  No pybind11 —
plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LOCK = threading.Lock()
_LIBS: dict = {}


def _out_dir() -> str:
    """Build next to the sources when writable (repo checkout), else a
    user cache dir (read-only site-packages install)."""
    if os.access(_NATIVE_DIR, os.W_OK):
        return _NATIVE_DIR
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "hybrid_gmres_tpu")
    os.makedirs(cache, exist_ok=True)
    return cache


def _build(name: str) -> str:
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    # Key the artifact by a content hash of the source, not mtime alone:
    # two installed versions sharing the user cache dir must never reuse a
    # stale build (mtime ordering across installs is meaningless).
    import hashlib

    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out = os.path.join(_out_dir(), f"lib{name}-{digest}.so")
    if not os.path.exists(out):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", out, src],
            check=True, capture_output=True, text=True,
        )
    return out


def load(name: str) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name))
        return _LIBS[name]


def native_available() -> bool:
    try:
        load("ct_builder")
        return True
    except Exception:
        return False


_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _csr_call(fn, rows, cols, cap, args):
    import scipy.sparse as sp

    indptr = np.zeros(rows + 1, np.int64)
    indices = np.zeros(cap, np.int32)
    data = np.zeros(cap, np.float64)
    nnz = fn(*args, indptr, indices, data, ctypes.c_int64(cap))
    if nnz < 0 or nnz > cap:
        raise RuntimeError("native builder capacity exceeded")
    return sp.csr_matrix(
        (data[:nnz].copy(), indices[:nnz].copy(), indptr), shape=(rows, cols)
    )


def build_fan_projector_native(n, n_angles, n_det, source_radius,
                               fan_margin=1.05, step=0.5):
    lib = load("ct_builder")
    fn = lib.build_fan_projector
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_double, ctypes.c_double, ctypes.c_double,
                   _i64p, _i32p, _f64p, ctypes.c_int64]
    rows = n_angles * n_det
    # each sample touches <= 4 pixels; ~2*sqrt(2)*n/step in-image samples/ray
    cap = int(rows * (4 * (3.0 * n / step) + 16))
    return _csr_call(
        fn, rows, n * n, cap,
        (ctypes.c_int32(n), ctypes.c_int32(n_angles), ctypes.c_int32(n_det),
         ctypes.c_double(source_radius), ctypes.c_double(fan_margin),
         ctypes.c_double(step)),
    )


def build_pixel_backprojector_native(n, n_angles, n_det, source_radius,
                                     fan_margin=1.05):
    lib = load("ct_builder")
    fn = lib.build_pixel_backprojector
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                   ctypes.c_double, ctypes.c_double,
                   _i64p, _i32p, _f64p, ctypes.c_int64]
    rows = n * n
    cap = rows * (2 * n_angles + 8)
    return _csr_call(
        fn, rows, n_angles * n_det, cap,
        (ctypes.c_int32(n), ctypes.c_int32(n_angles), ctypes.c_int32(n_det),
         ctypes.c_double(source_radius), ctypes.c_double(fan_margin)),
    )
