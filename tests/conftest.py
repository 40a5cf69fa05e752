"""Test env: 8 virtual CPU devices so mesh/DP semantics are exercised
without a pod (SURVEY.md section 4 test strategy, item c).

Note: this image's libtpu registers an 'axon' TPU platform that ignores
JAX_PLATFORMS, so we pin the CPU backend explicitly (default device +
CPU-device meshes) rather than via the env var alone.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which overrides the env var above and
# makes the first backends() call try to initialize the (possibly down)
# axon tunnel — blocking every test process for minutes. Re-override to
# cpu-only AFTER import; config.update wins over sitecustomize's update.
jax.config.update("jax_platforms", "cpu")

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(scope="session")
def mesh8(cpu_devices):
    from open_pandora_tpu.core.config import MeshConfig
    from open_pandora_tpu.parallel.mesh import build_mesh

    return build_mesh(MeshConfig(), devices=cpu_devices)
