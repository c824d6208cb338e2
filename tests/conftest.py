"""Test configuration.

Tests run on a virtual 8-device CPU mesh (mirrors the reference's MockPool
philosophy for testing parallelism without a cluster, SURVEY.md §4); the real
TPU chip is exercised by ``bench.py`` instead so the suite stays fast and
deterministic.
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent XLA compilation cache: the device-engine tests compile a
# handful of scan programs; caching them across runs keeps the suite fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")


def pytest_configure(config):
    import jax

    # Force the virtual 8-device CPU mesh even when a TPU plugin's
    # sitecustomize has pinned jax_platforms to the accelerator.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_SAMPLE_DATA = "/root/reference/pyctcdecode/tests/sample_data"


@pytest.fixture(scope="session")
def libri_logits():
    """Real 371x29 Wav2Vec2-style log-prob matrix (reference fixture)."""
    import json

    path = os.path.join(REFERENCE_SAMPLE_DATA, "libri_logits.json")
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    with open(path) as fh:
        return np.array(json.load(fh))


@pytest.fixture(scope="session")
def bugs_bunny_arpa_path():
    """Tiny handwritten 2-gram ARPA model (reference fixture)."""
    path = os.path.join(REFERENCE_SAMPLE_DATA, "bugs_bunny_kenlm.arpa")
    if not os.path.exists(path):
        pytest.skip("reference sample data not available")
    return path
