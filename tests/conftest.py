"""Test configuration: run hermetically on a virtual 8-device CPU mesh.

jax is pre-imported at interpreter startup in this environment (axon TPU
integration), so env vars alone are too late — use jax.config.update.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
