"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real-TPU runs happen via bench.py / the driver; unit and parity tests must be
hermetic and exercise the multi-chip sharding path on host, per SURVEY.md
section 4 (multi-node analog).
"""

import os

# Force-override: the environment presets JAX_PLATFORMS=axon (the TPU).
# BASISU_TPU_TESTS=1 opts out, keeping the real TPU for
# tests/test_tpu_hardware.py (the on-hardware parity half).
_TPU_RUN = bool(os.environ.get("BASISU_TPU_TESTS"))
if not _TPU_RUN:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the per-mode kernels are compiled once and
# reused across test runs.  (Env vars are ignored once the axon sitecustomize
# has initialized config, so set via the config API below.)
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")

from pathlib import Path

import numpy as np
import pytest

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; override the config before any backend initializes so tests
# stay hermetic on the virtual 8-device CPU mesh.
import jax

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

FIXTURES = Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def golden():
    return np.load(FIXTURES / "golden_blocks.npz")
