"""KKT structure planner.

The reference obtains efficient factorizations implicitly: a
fill-reducing symamd ordering over a *numerically instantiated* sparsity
pattern, then fully-unrolled symbolic LDL (lib/@csparse/
sparsity_ldl.m:40-62).  Here the same role is played explicitly: probe
the KKT sparsity pattern once at build time (random parameter/primal
values — structurally generic), compute a bandwidth-reducing reverse
Cuthill-McKee ordering, and decide whether a block-banded elimination
beats dense LU.  MPC horizons make the KKT block-banded in the stage
index (dynamics couple x_k, x_{k+1} — SURVEY.md §2.9), which is what
this detects.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class BandedPlan:
    """Static factorization plan: permutation + block partition."""

    perm: np.ndarray          # permutation: WWp = WW[perm][:, perm]
    iperm: np.ndarray         # inverse permutation
    block: int                # block size s (>= half bandwidth)
    n_blocks: int             # number of s-blocks (padded)
    n: int                    # original dimension
    bandwidth: int            # half bandwidth after permutation
    worthwhile: bool          # whether banded beats dense


def probe_pattern(assemble_fn, n: int, trials: int = 2, tol: float = 0.0) -> np.ndarray:
    """Union of |WW| > tol over a few random probes -> boolean pattern."""
    pat = np.zeros((n, n), dtype=bool)
    for t in range(trials):
        WW = np.asarray(assemble_fn(t))
        pat |= np.abs(WW) > tol
    return pat | pat.T  # symmetrize (quasi-definite KKT is structurally sym)


def plan_banded(
    pattern: np.ndarray,
    min_blocks: int = 4,
    max_block: Optional[int] = None,
) -> BandedPlan:
    """Compute an RCM ordering and decide on a block-tridiagonal plan.

    Returns worthwhile=False when the bandwidth is too large relative to
    n for block elimination to pay off (fallback: dense LU) — the analog
    of the build plan's "fall back to dense blocks when unsure"
    (SURVEY.md §7 hard parts (d)).

    The ordering runs in the native C++ library (native/ordering.cpp)
    when available, else scipy.
    """
    from .. import native

    n = pattern.shape[0]
    perm = native.rcm(pattern)
    bw = native.bandwidth(pattern, perm)
    block = max(bw, 1)
    n_blocks = -(-n // block)
    worthwhile = (
        n_blocks >= min_blocks
        and (max_block is None or block <= max_block)
        # flops: dense ~ n^3/3 vs banded ~ n_blocks * (7/3) * block^3
        and n_blocks * 7 * block**3 < n**3
    )
    iperm = np.empty(n, dtype=np.int64)
    iperm[perm] = np.arange(n)
    return BandedPlan(
        perm=perm,
        iperm=iperm,
        block=block,
        n_blocks=n_blocks,
        n=n,
        bandwidth=bw,
        worthwhile=worthwhile,
    )
