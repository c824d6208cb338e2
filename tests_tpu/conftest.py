"""Real-TPU test shard configuration.

Unlike ``tests/`` (which forces a virtual 8-device CPU mesh so the suite
is fast and cluster-free), this shard runs the SAME golden fixtures
against the actual accelerator: XLA:TPU lowers reductions and layouts
differently from XLA:CPU, so a TPU-only numeric or tie-order divergence
would otherwise surface only as a bench ``device_matches_host: false``
after a 4-minute run instead of a red test (round-4 review, weak item 4).

Run separately (its own process — the main suite pins jax to CPU
process-wide): ``python -m pytest tests_tpu/ -q``. The whole shard skips
when no accelerator is visible, so it is safe to run anywhere. The main
suite launches it automatically through
``tests/test_tpu_shard.py`` when a real chip is present.
"""
import os

import numpy as np
import pytest

# Persistent compile cache shared with bench.py / scripts (same programs).
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".cache",
    "jax",
)

REFERENCE_SAMPLE_DATA = "/root/reference/pyctcdecode/tests/sample_data"


def pytest_configure(config):
    import jax

    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session", autouse=True)
def require_accelerator():
    """Skip the whole shard unless a non-CPU jax backend is live."""
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception as err:  # pragma: no cover - backend init failure
        pytest.skip(f"no jax backend available: {err!r}")
    if platform == "cpu":
        pytest.skip("no accelerator visible; TPU shard is chip-only")


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
