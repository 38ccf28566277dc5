"""Test harness: force JAX onto an 8-device virtual CPU platform.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon before any conftest runs, so the env-var route is
dead — instead import jax and flip the config before backends
initialize. Kernel tests then run Pallas in interpret mode; sharding
tests get a real 8-device mesh without touching the TPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Keep the engine's Pallas kernels in interpret mode on CPU.
os.environ.setdefault("VLLM_TPU_INTERPRET", "1")
os.environ["VLLM_TPU_FORCE_XLA_OPS"] = os.environ.get(
    "VLLM_TPU_FORCE_XLA_OPS", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
