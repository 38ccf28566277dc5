"""AOT step-program cache: compiled executables serialized to disk so a
warm restart loads binaries instead of re-trace/lower/compile.

The reference has no analog (its CUDA kernels are compiled at
pip-install time; startup only runs a profiling forward —
/root/reference/vllm/worker/worker.py:59-118). A jit-based TPU engine
re-pays trace + lower + XLA compile in every process: ~110 s for the
two 7B step-program families through a tunneled backend, and the XLA
persistent cache only skips the backend-compile stage (trace/lower
still run, with 24-380 s observed load variance). Here the compiled
executable itself is serialized (`jax.experimental.serialize_executable`)
keyed by a digest of (package source, configs, jax version, platform,
mesh, process), so a warm start deserializes and loads in seconds,
deterministically — no tracing, no lowering, no XLA.

Safety: the digest covers every ``vllm_tpu`` source file, so ANY code
edit invalidates the cache (same rule the XLA persistent cache applies
via HLO metadata). Entries are pickles of
``(payload_bytes, in_tree, out_tree)``; loading is wrapped so a corrupt
or incompatible entry falls back to a cold compile instead of failing
startup.
"""

import hashlib
import os
import pickle
import time
from typing import Any, Optional

from vllm_tpu.logger import init_logger

logger = init_logger(__name__)


def resolve_cache_dir() -> Optional[str]:
    """Cache directory, or None when AOT caching is disabled.

    `VLLM_TPU_AOT_CACHE` overrides: ``0``/``off`` disables,
    ``1``/``on``/``true`` force-enables at the default directory (even
    on CPU — the caller accepts the cross-machine SIGILL risk), and
    anything else is the cache directory path. By default the cache is
    on for real TPU backends and OFF for CPU runs: CPU AOT executables
    embed host-machine features and reloading them on a different
    machine can SIGILL (tests opt in with an explicit tmp dir).
    """
    env = os.environ.get("VLLM_TPU_AOT_CACHE")
    if env is not None:
        flag = env.strip().lower()
        if flag in ("", "0", "off", "none", "false"):
            return None
        if flag in ("1", "on", "true"):
            return os.path.expanduser("~/.cache/vllm_tpu/aot")
        return os.path.expanduser(env)
    import jax
    if jax.devices()[0].platform == "cpu":
        return None
    return os.path.expanduser("~/.cache/vllm_tpu/aot")


class AOTProgramCache:
    """Disk store of serialized compiled step programs.

    One entry per (config digest, program variant, argument-aval
    signature); the digest is the filename prefix so stale entries from
    other sources/configs never collide.
    """

    def __init__(self, cache_dir: str, key_material: str,
                 execution_devices=None) -> None:
        self.dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self.prefix = hashlib.sha256(
            key_material.encode()).hexdigest()[:20]
        # The mesh's devices: deserialize_and_load defaults to ALL
        # local devices, which mis-spans executables compiled on a
        # submesh (e.g. tp=1 on an 8-device host).
        self.execution_devices = (tuple(execution_devices)
                                  if execution_devices is not None else None)
        self.hits = 0
        self.misses = 0
        self.load_s = 0.0
        self.save_s = 0.0
        self.disabled = False

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, f"{self.prefix}-{name}.aot")

    @staticmethod
    def entry_name(key_sig: Any, aval_sig: Any) -> str:
        return hashlib.sha256(
            repr((key_sig, aval_sig)).encode()).hexdigest()[:24]

    def load(self, name: str) -> Optional[Any]:
        """Deserialize + device-load one executable, or None."""
        path = self._path(name)
        if self.disabled or not os.path.exists(path):
            self.misses += 1
            return None
        t0 = time.perf_counter()
        try:
            from jax.experimental.serialize_executable import (
                deserialize_and_load)
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            prog = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=self.execution_devices)
            self.hits += 1
            self.load_s += time.perf_counter() - t0
            return prog
        except Exception as e:  # corrupt / jax+backend mismatch
            logger.warning("AOT cache load failed for %s (%s); falling "
                           "back to cold compile.", path, e)
            self.misses += 1
            return None

    def save(self, name: str, compiled: Any) -> None:
        """Serialize one executable; atomic rename so a crashed writer
        never leaves a truncated entry."""
        if self.disabled:
            return
        t0 = time.perf_counter()
        try:
            from jax.experimental.serialize_executable import serialize
            payload, in_tree, out_tree = serialize(compiled)
            path = self._path(name)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
            self.save_s += time.perf_counter() - t0
        except Exception as e:  # backend without serialization support
            logger.warning("AOT cache save failed (%s); disabling the "
                           "AOT cache for this run.", e)
            self.disabled = True

    def stats(self) -> str:
        return (f"{self.hits} loaded ({self.load_s:.1f} s), "
                f"{self.misses} cold (serialize {self.save_s:.1f} s)")
