"""Test configuration: force an 8-device CPU platform.

Sharding logic is validated on a virtual CPU mesh (no TPU needed); the env
vars must be set before JAX initializes its backends, which is why they live
here at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's site customization (axon TPU tunnel) pins
# jax_platforms to "axon,cpu"; override it after import — backends are not
# initialized yet at conftest time, so this reliably selects the virtual
# 8-device CPU platform for every test.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
