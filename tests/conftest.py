"""Test harness: force JAX onto an 8-device virtual CPU platform.

This must run before `import jax` anywhere — pytest loads conftest
first. Kernel tests run Pallas in interpret mode; sharding tests get a
real 8-device mesh without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Keep the engine's Pallas kernels in interpret mode on CPU.
os.environ.setdefault("VLLM_TPU_INTERPRET", "1")
