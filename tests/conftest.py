"""Test configuration: force LOCAL CPU with a virtual 8-device mesh.

This image boots every Python process through an axon sitecustomize that
registers a remote-TPU PJRT plugin and overrides ``JAX_PLATFORMS`` — so env
vars alone are not enough; we must also flip ``jax_platforms`` after import.
Tests must run on the local CPU (deterministic float64, no tunnel latency,
and they must not hold the single TPU chip that bench.py needs).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.default_backend() == "cpu"

import sys  # noqa: E402
from pathlib import Path  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (long end-to-end solves; the default "
             "tier must finish in <5 min on a 1-core host)")
    parser.addoption(
        "--runtpu", action="store_true", default=False,
        help="run tests marked tpu (on-device smoke checks in a clean "
             "subprocess; needs the TPU idle)")


def pytest_collection_modifyitems(config, items):
    mexpr = config.getoption("-m") or ""
    run_slow = config.getoption("--runslow") or "slow" in mexpr
    run_tpu = config.getoption("--runtpu") or "tpu" in mexpr
    skip_slow = pytest.mark.skip(
        reason="slow tier: pass --runslow (or -m slow)")
    skip_tpu = pytest.mark.skip(reason="tpu tier: pass --runtpu (or -m tpu)")
    for item in items:
        if not run_slow and "slow" in item.keywords:
            item.add_marker(skip_slow)
        if not run_tpu and "tpu" in item.keywords:
            item.add_marker(skip_tpu)


@pytest.fixture(scope="session")
def repo_root() -> Path:
    return REPO_ROOT
