"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
initializes, so sharding/pjit paths are exercised without TPU hardware.

Mirrors the reference's "CPU-runnable random-tensor smoke suite" property
(/root/reference/test_implementation.py) — every test here runs on CPU with
synthetic tensors, no dataset or pretrained weights needed.
"""

import os

# Force-override: the ambient environment pins JAX_PLATFORMS=axon (TPU
# tunnel); tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the TPU tunnel and overrides
# jax_platforms via jax.config — override it back before any device use.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by XLA CPU compiles of
# model-sized programs; cache them across runs (same dir as the TPU cache —
# entries are keyed by platform).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np
import pytest

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
