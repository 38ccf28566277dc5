"""Quick TPU health probe: raw MXU TFLOPs + HBM GB/s.

The axon-tunneled v5e is shared infrastructure; round-5 observed it
degraded to ~3% MXU / ~12% HBM for extended periods (2026-08-20).
Run this BEFORE any measured benchmark — numbers taken on a degraded
chip are not comparable to anything.

Healthy v5e: ~150+ TFLOPs bf16 (peak 197), ~600+ GB/s (peak ~820).
"""

import os
import time

os.environ.setdefault("VLLM_TPU_AOT_CACHE", "/tmp/vllm_tpu_aot_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vllm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def probe():
    @jax.jit
    def mxu(a, b):
        def body(i, x):
            return jnp.tanh(x @ b)  # dependency chain, no collapse
        return jax.lax.fori_loop(0, 32, body, a)

    a = jnp.ones((4096, 4096), jnp.bfloat16)
    b = jnp.ones((4096, 4096), jnp.bfloat16) * 0.001
    np.asarray(mxu(a, b))
    t0 = time.perf_counter()
    np.asarray(mxu(a, b))
    dt = (time.perf_counter() - t0) / 32
    tflops = 2 * 4096 ** 3 / dt / 1e12

    big = [jnp.ones((128, 1024, 1024), jnp.bfloat16) for _ in range(4)]

    @jax.jit
    def hbm(arrs):
        def body(i, acc):
            return acc + jax.lax.switch(
                i % 4,
                [lambda a=x: jnp.sum(a, dtype=jnp.float32) for x in arrs])
        return jax.lax.fori_loop(0, 16, body, jnp.zeros((), jnp.float32))

    np.asarray(hbm(big))
    t0 = time.perf_counter()
    np.asarray(hbm(big))
    dt = (time.perf_counter() - t0) / 16
    gbs = 268435456 / dt / 1e9
    return tflops, gbs


if __name__ == "__main__":
    tflops, gbs = probe()
    healthy = tflops > 100 and gbs > 400
    print(f"MXU {tflops:.1f} TFLOPs (peak ~197) | "
          f"HBM {gbs:.0f} GB/s (peak ~820) | "
          f"{'HEALTHY' if healthy else 'DEGRADED — do not benchmark'}")
