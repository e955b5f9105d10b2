"""Test configuration: single CPU device + persistent compile cache.

Mirrors the reference's "fake backend" testing discipline (SURVEY.md §4):
MockProver-style checks on CPU. Multi-chip sharding is validated in a
SUBPROCESS (tests/test_multichip.py) with XLA's host-platform device
simulation — NEVER set --xla_force_host_platform_device_count in this
process: that flag (at any value, even 1) switches XLA:CPU into a
drastically slower compilation path (~30x on this box) for the
limb-arithmetic graphs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU platform and
# overrides JAX_PLATFORMS; pin the config back to CPU so tests never touch
# the (single, tunneled) real chip.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are expensive for
# XLA:CPU to compile (seconds per field-mul chain); cache them across test
# runs so only the first invocation pays.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zkevm_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
