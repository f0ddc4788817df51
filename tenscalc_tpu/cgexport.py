"""Computation-graph export — the analog of the reference's
lib/@csparse/saveVectorized.m / saveScalarized.m / lib/CGregistration.m,
which serialize the csparse dataflow graph (.cg/.cgc/.cgio/.cgs files)
for external consumers (doc/computationgraphs.tex:84-190).

In this framework the computation graph IS the traced jax program, so
export writes:

* ``<stem>.jaxpr.txt``  — the solver's jaxpr (typed dataflow graph)
* ``<stem>.hlo.txt``    — the lowered StableHLO module (portable IR any
  XLA consumer can compile)
* ``<stem>.meta.json``  — problem metadata: variable/parameter names and
  shapes, dimensions, options, and per-primitive operation counts (the
  analog of the CGregistration op-code table)
"""

from __future__ import annotations

import collections
import json
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _example_args(solver):
    dt = solver.opts.np_dtype
    u0 = jnp.zeros((solver.nU,), dt)
    penv = {p.name: jnp.zeros(p.shape, dt) for p in solver.parameters}
    return (
        u0,
        penv,
        jnp.asarray(1.0, dt),
        jnp.asarray(solver.opts.maxIter, jnp.int32),
        jnp.asarray(1e-9, dt),
        jnp.asarray(1e-9, dt),
    )


def _count_primitives(jaxpr) -> dict:
    from jax.extend.core import ClosedJaxpr, Jaxpr

    counts: collections.Counter = collections.Counter()

    def walk(jp):
        for eqn in jp.eqns:
            counts[eqn.primitive.name] += 1
            for sub in eqn.params.values():
                if isinstance(sub, ClosedJaxpr):
                    walk(sub.jaxpr)
                elif isinstance(sub, Jaxpr):
                    walk(sub)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if isinstance(s, ClosedJaxpr):
                            walk(s.jaxpr)
                        elif isinstance(s, Jaxpr):
                            walk(s)

    walk(jaxpr.jaxpr)
    return dict(counts)


def export_computation_graph(solver, stem, include_hlo: bool = True) -> dict:
    """Serialize the solver's computation graph; returns the metadata."""
    stem = Path(stem)
    stem.parent.mkdir(parents=True, exist_ok=True)
    args = _example_args(solver)

    closed = jax.make_jaxpr(solver._solve_raw)(*args)
    (stem.parent / (stem.name + ".jaxpr.txt")).write_text(
        closed.pretty_print()
    )

    if include_hlo:
        lowered = jax.jit(solver._solve_raw).lower(*args)
        (stem.parent / (stem.name + ".hlo.txt")).write_text(
            lowered.as_text()
        )

    meta = {
        "format": "tenscalc_tpu-cg-v1",
        "nU": solver.nU,
        "nF": solver.nF,
        "nG": solver.nG,
        "variables": {
            v.name: list(v.shape) for v in solver.variables
        },
        "parameters": {
            p.name: list(p.shape) for p in solver.parameters
        },
        "options": {
            k: v
            for k, v in solver.opts.__dict__.items()
            if isinstance(v, (bool, int, float, str))
        },
        "primitive_counts": _count_primitives(closed),
        "kkt_plan": (
            {
                "block": int(solver.kkt_plan.block),
                "n_blocks": int(solver.kkt_plan.n_blocks),
                "bandwidth": int(solver.kkt_plan.bandwidth),
            }
            if getattr(solver, "kkt_plan", None) is not None
            else None
        ),
    }
    (stem.parent / (stem.name + ".meta.json")).write_text(
        json.dumps(meta, indent=2)
    )
    return meta
