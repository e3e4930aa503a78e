"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
without multi-chip hardware (SURVEY §4).  The container's sitecustomize
force-registers the axon TPU backend and pins ``jax_platforms="axon,cpu"``,
so plain JAX_PLATFORMS env vars are ignored; we re-pin to cpu via
jax.config *before any backend is initialized* (XLA_FLAGS must also be set
before first use for the host-device-count flag to take effect).

Run individual tests on the real chip with SPLAT_TPU_TEST_BACKEND=tpu.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("SPLAT_TPU_TEST_BACKEND", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def naive_scene():
    from splat_tpu.utils.fixtures import naive_gaussians
    return naive_gaussians()


@pytest.fixture(scope="session")
def demo_camera():
    """The reference demo camera (src/bin/01_naive_gaussian.rs:6-8): 1280x720
    at the fixed position, scaled down to 256x144 for test speed."""
    from splat_tpu.camera import Camera
    return Camera.create(h=144, w=256,
                         position=(-0.57651054, 2.99040512, -0.03924271))


@pytest.fixture(scope="session")
def small_random_scene():
    from splat_tpu.utils.fixtures import random_scene
    return random_scene(512, seed=7, extent=2.0,
                        scale_range=(0.02, 0.12))
