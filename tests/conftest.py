"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no TPU required), mirroring the
reference's strategy of keeping correctness tests service-free
(SURVEY.md §4): the NumPy oracle plays the role the mocked Qdrant/Memgraph
clients play in the reference tests.
"""

import os
import sys
from pathlib import Path

# Must be set before the jax backend initializes. NOTE: this environment's
# site hook (axon) overrides the JAX_PLATFORMS env var at interpreter start,
# so the config must be forced through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Persistent compilation cache: re-running the suite skips XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lattice_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sample_project_path() -> Path:
    """Polyglot fixture mini-repo (analog of reference tests/fixtures/sample_project)."""
    return Path(__file__).parent / "fixtures" / "sample_project"
