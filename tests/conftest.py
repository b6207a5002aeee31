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

# The container's sitecustomize force-registers the axon TPU plugin and pins
# JAX_PLATFORMS=axon; the config update below out-ranks it.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
