"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding tests run on this virtual mesh; the driver separately
dry-runs the multi-chip path (see __graft_entry__.py). Pallas kernels run
through the interpreter on CPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
