"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective paths are
validated on a virtual CPU mesh (jax.sharding.Mesh over 8 host devices), per
the build protocol. Env vars must be set before jax initializes.
"""

import os

# Force CPU: the session may have an 'axon' TPU backend registered at
# interpreter start (sitecustomize sets jax_platforms="axon,cpu"), where every
# compile goes through a tunnel (~10s each). Unit tests run on the host CPU;
# the env var alone is not enough because the plugin overrides jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if jax.devices()[0].platform != "cpu":  # backend already initialized on axon
    from jax.extend.backend import clear_backends
    clear_backends()
assert jax.devices()[0].platform == "cpu"
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cubemapslam_tpu.config import SlamConfig  # noqa: E402
from cubemapslam_tpu.camera import CubemapCamera  # noqa: E402


@pytest.fixture(scope="session")
def lafida_cfg() -> SlamConfig:
    """Lafida cam0 calibration (defaults mirror Config/lafida_cam0_params.yaml),
    with a small cube face to keep tests fast."""
    return SlamConfig()


@pytest.fixture(scope="session")
def small_cfg() -> SlamConfig:
    """Tiny configuration for fast unit tests."""
    return SlamConfig(cube_face_w=128, cube_face_h=128, n_features=256,
                      n_levels=4, max_keyframes=16, max_landmarks=2048)


@pytest.fixture(scope="session")
def lafida_cam(lafida_cfg) -> CubemapCamera:
    return CubemapCamera.from_config(lafida_cfg)


@pytest.fixture(scope="session")
def small_cam(small_cfg) -> CubemapCamera:
    return CubemapCamera.from_config(small_cfg)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="module", autouse=True)
def _clear_jit_caches_per_module():
    """Drop compiled programs between test modules.

    The e2e/system modules each compile dozens of per-config programs;
    accumulated executables previously aborted the suite mid-run with
    'Fatal Python error: Aborted' inside backend_compile (round-3
    verdict #5 / weak #5). Clearing at module boundaries caps resident
    compile memory at one module's worth."""
    yield
    jax.clear_caches()
