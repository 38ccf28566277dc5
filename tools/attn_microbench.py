"""Standalone decode-attention kernel microbench at 7B serving shapes.

Decomposes the decode step's KV-attention cost on the real chip:
bytes moved vs DMA issue count vs nibble-unpack VPU work. Run variants:

  python tools/attn_microbench.py --kv int8 --block-size 16
  python tools/attn_microbench.py --kv int4 --block-size 32 --ppc 8

Prints ms per simulated decode step (32 layers of paged attention,
B sequences), the page-DMA count per step, and effective KV GB/s.
Keep runs serial — the chip is single-tenant.
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/vllm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kv", choices=["bf16", "int8", "int4"], default="int8")
    p.add_argument("--block-size", type=int, default=16)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--ctx", type=int, default=400)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--kvh", type=int, default=32)
    p.add_argument("--ppc", type=int, default=None,
                   help="pages per chunk (env override)")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    if args.ppc is not None:
        import os
        os.environ["VLLM_TPU_PAGES_PER_CHUNK"] = str(args.ppc)

    from vllm_tpu.ops.cache import (SCALE_DTYPE, KVCache, kv_cache_shape,
                                    kv_scales_shape)
    from vllm_tpu.ops.pallas.paged_attention import (
        pallas_paged_decode_attention)

    L, KVH, BS, D, B = args.layers, args.kvh, args.block_size, 128, args.batch
    ctx = args.ctx
    pages_per_seq = -(-ctx // BS)
    # Enough distinct blocks that pages don't alias in any cache.
    NB = B * pages_per_seq + 8
    planes = 1 if args.kv == "int4" else 2
    dtype = jnp.bfloat16 if args.kv == "bf16" else jnp.int8
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.integers(-7, 8, kv_cache_shape(L, KVH, NB, BS, D, planes)),
        dtype)
    scales = None
    if args.kv != "bf16":
        scales = jnp.asarray(
            rng.uniform(0.01, 0.1, kv_scales_shape(L, KVH, NB, BS)),
            SCALE_DTYPE)
    cache = KVCache(data, scales)
    q = jnp.asarray(rng.standard_normal((B, KVH, D)), jnp.bfloat16)
    tables = jnp.asarray(
        rng.permutation(NB - 8)[:B * pages_per_seq].reshape(
            B, pages_per_seq).astype(np.int32))
    lens = jnp.full((B,), ctx, jnp.int32)

    @jax.jit
    def step(q, cache, tables, lens):
        def body(layer, acc):
            out = pallas_paged_decode_attention(q, cache, layer, tables,
                                                lens, 0.0883)
            return acc + out.astype(jnp.float32)

        return jax.lax.fori_loop(0, L, body,
                                 jnp.zeros(q.shape, jnp.float32))

    # Time via an actual VALUE transfer (np.asarray), not
    # block_until_ready: on the axon platform block_until_ready was
    # observed returning early (TB/s "bandwidths"); a device_get
    # cannot complete before the computation has. TPU executions run
    # in order, so fetching the last step's output waits for all.
    np.asarray(step(q, cache, tables, lens))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(q, cache, tables, lens)
    np.asarray(out)
    ms = (time.perf_counter() - t0) / args.iters * 1000

    from vllm_tpu.ops.pallas.paged_attention import _pages_per_chunk
    # packed= must match the kernel's own dispatch or the reported
    # chunk accounting (and GB fetched) is wrong for int4.
    ppc = min(_pages_per_chunk(packed=(args.kv == "int4")), pages_per_seq)
    chunks = -(-pages_per_seq // ppc)
    pages_fetched = B * chunks * ppc * L
    page_bytes = planes * KVH * BS * D * data.dtype.itemsize
    scale_bytes = (0 if scales is None
                   else 2 * 1 * BS * 128 * scales.dtype.itemsize)
    dmas = pages_fetched * (1 if scales is None else 2)
    gb = pages_fetched * (page_bytes + scale_bytes) / 1e9
    print(f"kv={args.kv} BS={BS} B={B} ctx={ctx} ppc={ppc} "
          f"L={L} KVH={KVH}")
    print(f"per-step: {ms:.2f} ms | page DMAs {dmas} "
          f"({ms * 1e3 / dmas:.2f} us/DMA) | {gb:.2f} GB read "
          f"-> {gb / (ms / 1e3):.0f} GB/s effective")


if __name__ == "__main__":
    main()
