"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's plan: CPU-backend JAX for kernel oracles, and
XLA_FLAGS host-device multiplication so shard_map/psum paths are exercised
without a pod.  Must set env vars before jax initializes.
"""

import os

# Force CPU even when the session env pins JAX_PLATFORMS to a TPU platform
# (tests must be fast + deterministic; the driver benches on real TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A site-installed TPU plugin may call jax.config.update("jax_platforms", ...)
# at interpreter start, overriding the env var — undo that here, before any
# backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2024)


@pytest.fixture
def image_u8(rng):
    return rng.integers(0, 256, size=(48, 64)).astype(np.uint8)


@pytest.fixture
def image_f32(rng):
    return rng.uniform(0, 255, size=(48, 64)).astype(np.float32)
