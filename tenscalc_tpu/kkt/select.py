"""Structured-KKT backend selection for the game solvers.

Mirrors OptimizeSolver._plan_structure (tenscalc_tpu/api.py) for the
minmax / equilibrium IPMs: probe the KKT pattern at build time, compute
the RCM banded plan, and pick the best kernel for the hardware.  The
difference is symmetry: the minmax saddle KKT is symmetric (banded LDL
fleet kernel / block-tridiagonal LDL), while the equilibrium
two-Lagrangian KKT is unsymmetric (reference default useLDL=false,
lib/private/parameters4equilibrium.m:149-150) and routes to the banded
LU variants (kkt/banded_lu.py).
"""

from __future__ import annotations

import jax
import numpy as np


def compute_banded_plan(assemble_trial, nK):
    """Probe |WW| over random trials on the host CPU -> BandedPlan (or
    None when probing fails — structure is then best-effort)."""
    from .structure import plan_banded, probe_pattern

    try:
        # local devices only: under jax.distributed, devices("cpu")[0]
        # may belong to another process and is not addressable here
        cpus = jax.local_devices(backend="cpu")
        if cpus:
            with jax.default_device(cpus[0]):
                pattern = probe_pattern(assemble_trial, nK)
        else:  # pragma: no cover
            pattern = probe_pattern(assemble_trial, nK)
    except Exception as exc:
        # never silent (reference planner errors loudly,
        # lib/@csparse/sparsity_ldl.m:188): a broken assemble would
        # otherwise degrade to the dense path with zero signal
        import warnings

        warnings.warn(
            "game-solver KKT structure probe failed "
            f"({type(exc).__name__}: {exc}); falling back to the dense "
            "backend",
            RuntimeWarning,
            stacklevel=2,
        )
        return None
    return plan_banded(pattern)


def select_game_backend(opts, nK, plan_fn, symmetric: bool):
    """Return ``(kkt_solver, resolved_name, plan)`` for a game solver.

    ``plan_fn``: lazy () -> BandedPlan|None (probing cost is only paid
    when a structured backend is requested or 'auto' wants one).
    """
    from ..api import _prefer_fleet

    kb = opts.kkt_backend
    if kb in ("dense", "ldl"):
        return None, "dense", None
    allowed = ("auto", "tridiag", "fleet", "fleet_banded")
    if kb not in allowed:
        raise ValueError(
            f"kkt_backend={kb!r} is not supported for the game solvers; "
            f"use one of {('dense',) + allowed}"
        )
    fleet = kb in ("fleet", "fleet_banded") or (
        kb == "auto" and _prefer_fleet()
    )
    if kb == "fleet":
        if not symmetric:
            raise ValueError(
                "kkt_backend='fleet' (dense LDL fleet kernel) needs a "
                "symmetric KKT; the equilibrium system is unsymmetric — "
                "use 'fleet_banded' (banded LU) or 'dense'"
            )
        return _fleet_dense(opts), "fleet", None
    if nK < 64:  # too small for a structured path to matter
        if fleet and symmetric:
            return _fleet_dense(opts), "fleet", None
        return None, "dense", None
    plan = plan_fn()
    if plan is None or not plan.worthwhile:
        if kb == "tridiag":
            raise ValueError(
                "kkt_backend='tridiag' requested but the probed KKT "
                "pattern has no worthwhile band structure"
            )
        if fleet and symmetric:
            return _fleet_dense(opts), "fleet", None
        return None, "dense", None
    if fleet:
        from .band_assemble import BandedOperator

        n_ref = opts.refine_for("fleet_banded")
        if symmetric:
            from .fleet_banded import (
                FleetBandedFromBand,
                fleet_banded_kkt_factorize,
            )

            def _kkt_sym(WW, _plan=plan, _n=n_ref):
                # band mode (fully-hoisted games) hands over the
                # directly-assembled band; otherwise the dense matrix
                if isinstance(WW, BandedOperator):
                    return FleetBandedFromBand(WW, _plan, n_refine=_n)
                return fleet_banded_kkt_factorize(WW, _plan, n_refine=_n)

            return _kkt_sym, "fleet_banded", plan
        from .banded_lu import (
            FleetBandedLUFromBand,
            fleet_banded_lu_kkt_factorize,
        )

        n_ref_lu = opts.refine_for("fleet_banded_lu")

        def _kkt_lu(WW, _plan=plan, _n=n_ref_lu):
            if isinstance(WW, BandedOperator):
                return FleetBandedLUFromBand(WW, _plan, n_refine=_n)
            return fleet_banded_lu_kkt_factorize(WW, _plan, n_refine=_n)

        return _kkt_lu, "fleet_banded_lu", plan
    # pure-XLA structured path (CPU / explicit 'tridiag')
    if symmetric:
        from .tridiag import tridiag_factorize

        return (lambda WW: tridiag_factorize(WW, plan), "tridiag", plan)
    from .banded_lu import tridiag_lu_factorize

    return (lambda WW: tridiag_lu_factorize(WW, plan), "tridiag_lu", plan)


def _fleet_dense(opts):
    from .fleet import fleet_kkt_factorize

    n_ref = opts.refine_for("fleet")
    return lambda WW: fleet_kkt_factorize(WW, n_refine=n_ref)
