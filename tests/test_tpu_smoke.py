"""On-device TPU smoke self-verification (scripts/tpu_smoke.py).

tests/conftest.py pins every in-process test to the local CPU, so the
device checks run in a SUBPROCESS with a clean environment (the axon
sitecustomize routes it to the TPU). Marked ``tpu``: excluded from the
default tier (the device may be busy with benchmarks); run with
``pytest --runtpu`` or directly via ``python scripts/tpu_smoke.py``.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py"),
         *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)


def test_tpu_smoke_fast():
    r = _run(["--fast"], timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OK (fast)" in r.stdout


@pytest.mark.slow
def test_tpu_smoke_full():
    r = _run([], timeout=1800)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "OK" in r.stdout
