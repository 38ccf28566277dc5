"""Microbench: where does the int4 (w4a8) matmul kernel's time go?

Times, at the 7B serving shapes, per matmul:
  - bf16 dot (the dtype ceiling XLA gets for free),
  - int8-weight dot with folded column scales (the w8 serving path the
    int4 kernel must beat — same bytes/2 target),
  - the Pallas int4 kernel (current),
and prints effective weight-bandwidth (weight bytes / time) per
variant so the "is it DMA-bound yet?" question has a number.

Run on the real chip: python tools/int4_matmul_microbench.py
"""

import os
import sys
import time

os.environ.setdefault("VLLM_TPU_AOT_CACHE", "/tmp/vllm_tpu_aot_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vllm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vllm_tpu.ops.pallas.int4_matmul import pallas_int4_matmul
from vllm_tpu.ops.quant import (quantize_linear_int4,
                                quantize_linear_weight, quantized_matmul)

# (T, in, out): decode qkv/o, decode mlp, prefill qkv/o, prefill mlp.
SHAPES = [
    (64, 4096, 4096),
    (64, 4096, 11008),
    (64, 11008, 4096),
    (1024, 4096, 4096),
    (1024, 4096, 11008),
    (1024, 11008, 4096),
]

ITERS = 20


def timed(fn, *args):
    jax.tree_util.tree_leaves(fn(*args))[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  iters/shape: {ITERS}")
    print(f"{'shape':>22} | {'bf16':>9} | {'int8w':>9} | {'int4w':>9} | "
          f"int4 eff GB/s (vs int8w GB/s)")
    for (T, IN, OUT) in SHAPES:
        w = jnp.asarray(rng.standard_normal((IN, OUT)), jnp.float32)
        x = jnp.asarray(rng.standard_normal((T, IN)), jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)
        q8 = quantize_linear_weight(w)
        q4 = quantize_linear_int4(w)

        t_bf16 = timed(jax.jit(lambda x, w: x @ w), x, wb)
        t_int8 = timed(jax.jit(quantized_matmul), x, q8)
        t_int4 = timed(pallas_int4_matmul, x, q4)

        by4 = IN * OUT / 2
        by8 = IN * OUT
        print(f"{T:>5}x{IN:>5}x{OUT:>5} | {t_bf16*1e6:7.0f}us | "
              f"{t_int8*1e6:7.0f}us | {t_int4*1e6:7.0f}us | "
              f"{by4/t_int4/1e9:6.0f} GB/s (int8w {by8/t_int8/1e9:6.0f})")


if __name__ == "__main__":
    main()
