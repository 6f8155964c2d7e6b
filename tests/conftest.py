"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic is exercised the TPU-native way: a fake mesh via
``xla_force_host_platform_device_count`` (the jax equivalent of a fake
cluster; SURVEY.md section 4 implication list).
"""
import os

# Force CPU with 8 virtual devices. The environment presets
# JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize that imports jax at
# interpreter startup, so env vars are already latched -- use config.update.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
# XLA:CPU's fusion emitter miscompiles error-free transforms (the double-float
# fp64-emulation core): values computed inside kLoop fusions lose the EFT
# error terms (~fp32 accuracy instead of ~fp64). TPU is unaffected. Disabling
# the fusion pass on CPU restores exact semantics; CPU test speed is
# irrelevant. See respatpu.precision.eft_selfcheck.
if "--xla_disable_hlo_passes=fusion" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_disable_hlo_passes=fusion").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """XLA:CPU with the fusion pass disabled accumulates per-test compiled
    executables; past a few hundred the runtime has crashed mid-suite
    (observed round 3).  Dropping the jit caches between modules keeps the
    executable count bounded without hiding cross-test cache bugs."""
    yield
    jax.clear_caches()
