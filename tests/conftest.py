"""Test config: run on CPU with 8 virtual devices and float64 enabled.

Multi-device tests use the virtual CPU mesh the same way the reference's
generated solvers could not (SURVEY.md §4): sharding semantics are
identical to a real TPU slice, only the interconnect differs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU-tunnel sitecustomize force-sets jax_platforms="axon,cpu"
# programmatically; override it back to CPU for the test suite
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_variables():
    """Reset the declared-variable registry between tests
    (reference: Tcalculus.clear)."""
    from tenscalc_tpu.expr import clear_variables

    clear_variables()
    yield
    clear_variables()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
