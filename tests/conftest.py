"""Test harness config: hardware-free, CPU-only, 8 virtual devices.

The reference test suite needs two physical RTL-SDRs plugged in just to
construct its fixture (SURVEY.md §4); ours runs anywhere.  Sharding tests
use an 8-device virtual CPU mesh via xla_force_host_platform_device_count.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The zero-copy ingest tests assert the NATIVE ring is the production
# path; on a fresh checkout/machine libfxring.so doesn't exist yet and
# the transparent Python fallback would fail those asserts.  Build it
# here (2 s) rather than skip — the point is to exercise the real path.
import pathlib  # noqa: E402
import subprocess  # noqa: E402

_native = pathlib.Path(__file__).resolve().parent.parent / "native"
if (_native / "Makefile").exists() and not (_native / "libfxring.so").exists():
    subprocess.run(["make", "-C", str(_native)], check=False,
                   capture_output=True)

import matplotlib  # noqa: E402

matplotlib.use("Agg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    # Seed parity with the reference suite (test_effex.py:10).
    return np.random.default_rng(77777)


@pytest.fixture
def tmp_csv(tmp_path):
    return str(tmp_path / "visibilities_test.csv")
