"""Test environment: CPU backend with 8 virtual devices and x64 enabled.

Numerics parity with the complex128 reference is validated on the CPU
backend (cf. SURVEY.md section 7 dtype policy); multi-device tests use the
forced-host-device mesh.  Must run before jax is imported anywhere.
"""

import os

# force CPU even when the ambient environment points JAX at a TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402
import pytest  # noqa: E402

# The container's sitecustomize force-registers the axon TPU plugin and pins
# JAX_PLATFORMS=axon; the config update below out-ranks it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full suite compiles several hundred distinct XLA:CPU programs in one
    process; past ~100 accumulated executables the LLVM backend segfaults
    inside ``backend_compile_and_load`` (reproduced deterministically at the
    same suite position, while any module subset passes).  Cross-module
    executable reuse is ~nil (different shapes), so clearing per module
    costs little and keeps the process well under the crash threshold.
    """
    yield
    jax.clear_caches()
