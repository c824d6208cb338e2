"""Launch the real-TPU shard (tests_tpu/) from the main suite.

The main suite pins jax to a virtual CPU mesh process-wide
(tests/conftest.py), so the on-chip goldens run in a SUBPROCESS with that
pin stripped. On boxes without an accelerator the probe skips quickly —
the shard itself also self-skips, so this stays safe everywhere.
"""
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SHARD = os.path.join(_ROOT, "tests_tpu")


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # strip only the virtual-device forcing, keep any other XLA flags
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    if flags:
        env["XLA_FLAGS"] = " ".join(flags)
    else:
        env.pop("XLA_FLAGS", None)
    return env


def _accelerator_present(env) -> bool:
    probe = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; print(jax.devices()[0].platform)",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    return probe.returncode == 0 and probe.stdout.strip() not in ("", "cpu")


def test_tpu_shard_green_on_chip():
    env = _clean_env()
    try:
        if not _accelerator_present(env):
            pytest.skip("no accelerator visible; on-chip shard not runnable")
    except subprocess.TimeoutExpired:
        pytest.skip("backend probe timed out; on-chip shard not runnable")
    run = subprocess.run(
        [sys.executable, "-m", "pytest", _SHARD, "-q", "--no-header"],
        env=env,
        cwd=_ROOT,
        capture_output=True,
        text=True,
        timeout=840,
    )
    assert run.returncode == 0, (
        f"on-chip shard failed:\n{run.stdout[-4000:]}\n{run.stderr[-2000:]}"
    )
