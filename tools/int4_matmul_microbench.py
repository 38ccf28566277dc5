"""Microbench: where does the int4 (w4a8) matmul kernel's time go?

Honest-timing harness: each variant runs R on-device iterations via
lax.fori_loop over a STACK of S distinct weights, indexed i % S — the
dynamic index defeats loop hoisting/CSE and S copies exceed any
on-chip buffering, so weight bytes genuinely stream from HBM every
iteration (a naive `for _ in range(20): f(x, w)` with one resident
weight measured 1.7 TB/s "effective bandwidth" on a v5e — above the
chip's HBM roofline, i.e. the runtime collapsed the repeats).

Variants at the 7B serving shapes (T=64 decode rows, T=1024 prefill):
  - bf16 dot (dtype ceiling XLA gets for free)
  - int8-weight serving path (quantized_matmul: w8a8 when T is large,
    folded-scale bf16 dot otherwise)
  - the Pallas int4 kernel
Prints per-matmul time and effective weight bandwidth.

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

# (T, in, out): decode attn/o + mlp shapes, then prefill.
SHAPES = [
    (64, 4096, 4096),
    (64, 4096, 11008),
    (64, 11008, 4096),
    (128, 4096, 11008),  # decode at max_num_seqs 128 (bucket rows)
    (1024, 4096, 11008),
    (1024, 11008, 4096),
]

S = 8   # distinct weight copies in the stack
R = 64  # on-device iterations


def bench(mm, x, wstack_leaves):
    """Time R runs of mm(x, w_i) with w_i cycling through S stacked
    weights via dynamic_index_in_dim (defeats hoisting)."""

    @jax.jit
    def run(x, stack):
        def body(i, acc):
            w = jax.tree_util.tree_map(
                lambda s: jax.lax.dynamic_index_in_dim(
                    s, i % S, axis=0, keepdims=False), stack)
            y = mm(x, w)
            # max, not sum: a [:1, :1] slice would let XLA dead-code
            # the rest of the dot (compute 1 element from 1 row), and
            # sum(x @ w) reassociates into a rank-1 dot of row/col
            # sums. max needs every output element and simplifies into
            # neither.
            return acc + jnp.max(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, R, body, jnp.zeros((), jnp.float32))

    # Time via an actual VALUE transfer (np.asarray), not
    # block_until_ready: on the axon platform block_until_ready was
    # observed returning early (19 TB/s "bandwidths"); a device_get
    # cannot complete before the computation has.
    np.asarray(run(x, wstack_leaves))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(x, wstack_leaves))
    return (time.perf_counter() - t0) / R


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}  stack={S} iters={R}")
    print(f"{'shape':>20} | {'bf16':>8} | {'int8w':>8} | {'int4w':>8} | "
          f"eff GB/s int4 (int8)")
    for (T, IN, OUT) in SHAPES:
        ws = jnp.asarray(rng.standard_normal((S, IN, OUT)) * 0.02,
                         jnp.float32)
        x = jnp.asarray(rng.standard_normal((T, IN)), jnp.bfloat16)
        wb = ws.astype(jnp.bfloat16)
        # Both quantizers handle layer-stacked [S, in, out] natively.
        q8 = quantize_linear_weight(ws)
        q4 = quantize_linear_int4(ws)
        del ws

        t_bf16 = bench(lambda x, w: x @ w, x, wb)
        t_int8 = bench(quantized_matmul, x, q8)
        t_int4 = bench(pallas_int4_matmul, x, q4)

        by4 = IN * OUT / 2
        by8 = IN * OUT
        print(f"{T:>4}x{IN:>5}x{OUT:>5} | {t_bf16*1e6:6.0f}us | "
              f"{t_int8*1e6:6.0f}us | {t_int4*1e6:6.0f}us | "
              f"{by4/t_int4/1e9:5.0f} ({by8/t_int8/1e9:5.0f})")


if __name__ == "__main__":
    main()
