"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware (the driver dry-runs the same way).  The env
vars must be set before JAX is imported anywhere in the test process.
"""

import os
import subprocess
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
# Device-count scoping: the virtual multi-device mesh is only needed by the
# parallel/mesh tests, and every extra virtual device costs real time on
# this 1-core box.  Default to 1 device; run the mesh tests with
# ``NAT_TPU_TEST_DEVICES=8 pytest tests/ -m mesh`` (they skip otherwise).
_N_DEVICES = os.environ.get("NAT_TPU_TEST_DEVICES", "1")
# Raised collective-rendezvous deadlines (8 device threads share ONE
# physical core here — XLA's default 40 s termination timeout aborts the
# process when straggler threads can't be scheduled).
os.environ.setdefault(
    "XLA_FLAGS",
    f"--xla_force_host_platform_device_count={_N_DEVICES}"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
    " --xla_cpu_collective_timeout_seconds=1800")
# Keep test runs from reading/writing the user-level param/executable
# caches (tests cover the cache machinery explicitly with tmp dirs).
os.environ.setdefault("NAT_TPU_PARAM_CACHE", "0")
os.environ.setdefault("NAT_TPU_AOT_CACHE", "0")
# Stream-stdin prefetch slurps in-memory test streams instantly, which
# would void the byte-arrival assertions (frames-before-EOF contracts);
# tests that exercise prefetch/grouping opt back in per-test.
os.environ.setdefault("NAT_TPU_STREAM_PREFETCH", "0")

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; pin the default platform so
# unit tests are CPU-deterministic and see the 8 virtual devices.
jax.config.update("jax_platform_name", "cpu")

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
FIXTURES = Path(__file__).resolve().parent / "fixtures"

sys.path.insert(0, str(REPO_ROOT))


def _ensure_fixture(path: Path, freq: float, duration_s: float, sr: int = 22050):
    if path.exists():
        return
    from nat_tpu.io.audio import write_wav

    t = np.arange(int(sr * duration_s)) / sr
    write_wav(str(path), (np.sin(2 * np.pi * freq * t) * 0.5).astype(np.float32), sr)


@pytest.fixture(scope="session")
def simple_wav() -> Path:
    FIXTURES.mkdir(exist_ok=True)
    path = FIXTURES / "test_simple.wav"
    _ensure_fixture(path, 440.0, 1.0)
    return path


@pytest.fixture(scope="session")
def simple_wav2() -> Path:
    FIXTURES.mkdir(exist_ok=True)
    path = FIXTURES / "test_simple2.wav"
    _ensure_fixture(path, 220.0, 2.0)
    return path


def run_cli(args, stdin_bytes: bytes = b"", timeout: int = 120,
            extra_env=None):
    """Run the CLI as a subprocess with CPU JAX, capturing streams separately."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single virtual device is fine for CLI runs
    if extra_env:
        env.update(extra_env)
    cmd = [sys.executable, "-m", "nat_tpu"] + args
    result = subprocess.run(
        cmd, input=stdin_bytes, capture_output=True, timeout=timeout,
        cwd=str(REPO_ROOT), env=env,
    )
    return result.returncode, result.stdout.decode(), result.stderr.decode()


@pytest.fixture(scope="session")
def cli():
    return run_cli
