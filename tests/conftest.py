"""Test harness: force an 8-device virtual CPU mesh.

Note: the axon TPU plugin on this machine overrides JAX_PLATFORMS=cpu at
import time (it prepends itself), so the env var alone is not enough —
jax.config.update('jax_platforms', 'cpu') after import is required.
Pallas kernels run through the interpreter on CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
