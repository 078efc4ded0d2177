"""Test configuration: force an 8-device virtual CPU platform.

Sharding/collective tests run on a virtual 8-device CPU mesh; kernel parity
tests compare the XLA/Pallas implementations (interpreted or CPU-lowered)
against the NumPy oracles.  The real-TPU benchmarks live in bench.py, not in
the test suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the env var alone is not honored when a TPU platform plugin is present
jax.config.update("jax_platforms", "cpu")

import pathlib
import shutil
import subprocess

# build the C++ host-ops library up front so its parity tests always run
# (skipped only when no compiler is available)
_repo = pathlib.Path(__file__).resolve().parent.parent
_lib = _repo / "seismic_bpmf_tpu" / "lib" / "libhost_ops.so"
_src = _repo / "csrc" / "host_ops.cpp"
if shutil.which("make") and shutil.which("g++") and (
    not _lib.exists() or _lib.stat().st_mtime < _src.stat().st_mtime
):
    subprocess.run(
        ["make", "-C", str(_repo / "csrc")], check=False,
        capture_output=True,
    )

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
