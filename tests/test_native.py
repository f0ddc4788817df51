"""Native C++ ordering library: build, load, and parity with scipy
(the build's native-layer analog of the reference's
lib/csparse/instructionsTableUTHash.c build + symamd usage)."""

import numpy as np
import pytest

from tenscalc_tpu import native


def _banded_pattern(rng, n, bw):
    A = np.zeros((n, n), dtype=bool)
    for k in range(-bw, bw + 1):
        mask = rng.random(n - abs(k)) < 0.7
        idx = np.arange(n - abs(k))
        if k >= 0:
            A[idx[mask], idx[mask] + k] = True
        else:
            A[idx[mask] - k, idx[mask]] = True
    A |= A.T
    np.fill_diagonal(A, True)
    return A


def test_native_builds_and_loads():
    assert native.available(), "native ordering library failed to build"


def test_rcm_reduces_bandwidth(rng):
    n, bw = 200, 5
    A = _banded_pattern(rng, n, bw)
    p = rng.permutation(n)
    Ap = A[p][:, p]
    perm = native.rcm(Ap)
    assert sorted(perm) == list(range(n))
    bw_after = native.bandwidth(Ap, perm)
    assert bw_after <= 3 * bw  # scrambled band recovered to a small band


def test_native_matches_scipy_quality(rng):
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    n, bw = 150, 6
    A = _banded_pattern(rng, n, bw)
    p = rng.permutation(n)
    Ap = A[p][:, p]
    perm_native = native.rcm(Ap)
    perm_scipy = np.asarray(
        reverse_cuthill_mckee(sp.csr_matrix(Ap), symmetric_mode=True)
    )
    bw_native = native.bandwidth(Ap, perm_native)
    bw_scipy = native.bandwidth(Ap, perm_scipy)
    # same ballpark (tie-breaking differs)
    assert bw_native <= 2 * max(bw_scipy, 1)


def test_bandwidth_identity(rng):
    A = _banded_pattern(rng, 80, 4)
    ident = np.arange(80, dtype=np.int64)
    assert native.bandwidth(A, ident) <= 4


def test_disconnected_graph(rng):
    n = 60
    A = np.zeros((n, n), dtype=bool)
    # two disconnected banded components
    A[:30, :30] = _banded_pattern(rng, 30, 3)
    A[30:, 30:] = _banded_pattern(rng, 30, 2)
    perm = native.rcm(A)
    assert sorted(perm) == list(range(n))
