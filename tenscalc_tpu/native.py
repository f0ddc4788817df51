"""ctypes bindings to the native (C++) planning kernels.

Builds native/libtcordering.so on first use (g++, cached next to the
source); falls back to scipy transparently when the toolchain or build
is unavailable.  See native/ordering.cpp for role parity notes.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libtcordering.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime
            < (_NATIVE_DIR / "ordering.cpp").stat().st_mtime
        ):
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.tc_version.restype = ctypes.c_int64
        if lib.tc_version() != 1:
            return None
        I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.tc_rcm.argtypes = [ctypes.c_int64, I64P, I64P, I64P]
        lib.tc_rcm.restype = ctypes.c_int
        lib.tc_bandwidth.argtypes = [ctypes.c_int64, I64P, I64P, I64P]
        lib.tc_bandwidth.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _to_csr(pattern: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Boolean adjacency (diagonal ignored) -> CSR indptr/indices."""
    adj = pattern.copy()
    np.fill_diagonal(adj, False)
    indptr = np.zeros(pattern.shape[0] + 1, dtype=np.int64)
    counts = adj.sum(axis=1)
    np.cumsum(counts, out=indptr[1:])
    indices = np.nonzero(adj)[1].astype(np.int64)
    return indptr, indices


def rcm(pattern: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee permutation of a boolean symmetric pattern.

    Uses the native library when available, else scipy.
    """
    lib = _load()
    n = pattern.shape[0]
    if lib is not None:
        indptr, indices = _to_csr(pattern)
        perm = np.empty(n, dtype=np.int64)
        rc = lib.tc_rcm(n, indptr, indices, perm)
        if rc == 0:
            return perm
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(
        reverse_cuthill_mckee(sp.csr_matrix(pattern), symmetric_mode=True),
        dtype=np.int64,
    )


def bandwidth(pattern: np.ndarray, perm: np.ndarray) -> int:
    lib = _load()
    n = pattern.shape[0]
    if lib is not None:
        indptr, indices = _to_csr(pattern)
        return int(lib.tc_bandwidth(n, indptr, indices, np.ascontiguousarray(perm, np.int64)))
    P = pattern[perm][:, perm]
    ii, jj = np.nonzero(P)
    return int(np.abs(ii - jj).max()) if len(ii) else 0
