"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on host CPU devices
(``xla_force_host_platform_device_count``); numerical oracles (scipy) demand
float64, which the CPU backend supports natively.
"""
import os

# force CPU for tests even when the session env points at a TPU platform
# (oracle tests need float64, which the TPU backend doesn't serve)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag
# reliably pins the backend
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
