"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; per SURVEY.md §4 the fake
distributed backend is JAX's host-platform device multiplication. Must run
before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test compiles fast and deterministic.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend at interpreter startup,
# so the env var alone doesn't stick; force the platform through the config.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xD5B)


def make_interleaved(rng, frames: int, channels: int) -> np.ndarray:
    """Random int16 interleaved stream covering the full dynamic range."""
    return rng.integers(-32768, 32768, size=frames * channels, dtype=np.int16)
