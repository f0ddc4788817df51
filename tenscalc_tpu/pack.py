"""Variable packing: flatten a list of named tensor variables into one
primal vector u and back (reference: lib/private/packVariables.m:36-67,
which reshapes each variable to a column and stacks + substitutes).

Here packing is just ravel+concatenate of environment entries; "substitution"
is environment rebinding (see tenscalc_tpu.expr.substitute).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .expr import Variable


class Packing:
    """Mapping between {name: tensor} environments and a packed vector."""

    def __init__(self, variables: Sequence[Variable]):
        self.names: List[str] = [v.name for v in variables]
        if len(set(self.names)) != len(self.names):
            raise ValueError(f"duplicate variable names: {self.names}")
        self.shapes: List[Tuple[int, ...]] = [v.shape for v in variables]
        self.sizes: List[int] = [int(np.prod(s)) if s else 1 for s in self.shapes]
        self.offsets: List[int] = list(np.cumsum([0] + self.sizes[:-1]))
        self.total: int = int(sum(self.sizes))

    def pack(self, env: Dict[str, jax.Array], dtype=None) -> jax.Array:
        parts = []
        for name, shape, size in zip(self.names, self.shapes, self.sizes):
            v = jnp.asarray(env[name])
            if tuple(v.shape) != shape:
                raise ValueError(
                    f"variable {name!r}: expected shape {shape}, got {tuple(v.shape)}"
                )
            parts.append(jnp.ravel(v))
        u = (
            jnp.concatenate(parts)
            if parts
            else jnp.zeros((0,), dtype or jnp.float64)
        )
        return u.astype(dtype) if dtype is not None else u

    def unpack(self, u: jax.Array) -> Dict[str, jax.Array]:
        env = {}
        for name, shape, size, off in zip(
            self.names, self.shapes, self.sizes, self.offsets
        ):
            env[name] = jnp.reshape(u[off : off + size], shape)
        return env

    def slice_of(self, name: str) -> slice:
        i = self.names.index(name)
        return slice(self.offsets[i], self.offsets[i] + self.sizes[i])
