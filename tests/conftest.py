"""Test harness config: force CPU backend with 8 virtual devices.

Must run before any jax import: the axon sitecustomize pins
JAX_PLATFORMS=axon (tunneled single TPU, high per-op latency), which would
make eager test code crawl and break multi-device mesh tests. All
mesh/sharding/collective tests run on the 8 fake CPU devices
(SURVEY.md §4 "Distributed without a cluster").
"""

import os
import sys

# NOTE: the axon sitecustomize imports jax at interpreter start, so jax is
# already in sys.modules here — but backends initialize lazily, so flipping
# the platform config before the first device access still takes effect.
if "jax" in sys.modules:
    import jax as _jax
    assert not _jax._src.xla_bridge._backends, (
        "jax backend already initialized before conftest; platform override too late"
    )

# ST_TPU_PERF_GATE=1 keeps the real TPU backend so the perf-regression
# gate (tests/test_perf_gate.py) can run on the chip:
#   ST_TPU_PERF_GATE=1 python -m pytest tests/test_perf_gate.py -q
if not os.environ.get("ST_TPU_PERF_GATE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not os.environ.get("ST_TPU_PERF_GATE"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
