"""Pallas TPU kernel: paged decode attention (+fused INT8 KV dequant).

Capability parity: /root/reference/csrc/attention/attention_kernels.cu
(single_query_cached_kv_attention) — one query token per sequence
attending over KV pages scattered in HBM through a block table, fp32
softmax/accumulation. The CUDA kernel maps (head, seq) to thread
blocks with shared-memory logits (attention_kernels.cu:66-91).

TPU design notes (what made this fast):
- Cache layout [L, 2, NB, KVH, BS, D]: a page is contiguous across ALL
  kv heads, so one DMA moves kv_heads*block_size*head_dim bytes
  (128 KiB for 7B-class models) instead of a latency-bound 4 KiB per
  (page, head).
- DMA destinations are fully contiguous page buffers [KVH, BS, D] —
  a strided destination (interleaving pages into a [KVH, C, D] chunk)
  costs one descriptor per kv-head stripe and was measured 20x slower.
- Pages stream HBM->VMEM in chunks of 8 through a double-buffered
  async pipeline; the online (flash) softmax runs in fp32 on the VPU
  in the buffer's native [P, KVH, BS, D] layout (for MHA a batched
  matmul would be KVH MXU issues of M=1 — pure launch overhead).
- Block tables / context lengths ride in via scalar prefetch so DMA
  addresses are known ahead of compute.
- INT8 KV (north star): the per-token-per-head dequant scales fold
  into the score matrix (q·k_int8 * k_scale) and the softmax weights
  (p * v_scale before the PV sum) — per-token scalar multiplies
  instead of rescaling the [BS, D] payloads, so dequant adds ~1/128th
  of the payload FLOPs and halves the HBM traffic that dominates
  decode.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.ops.cache import KVCache, SCALE_LANES

_NEG_INF = -1e30
_N_BUF = 2  # in-flight chunk buffers per K/V stream
_PAGES_PER_CHUNK = 8  # pages fetched + processed per loop iteration


def _interpret() -> bool:
    return bool(os.environ.get("VLLM_TPU_INTERPRET"))


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, MB] i32 (SMEM)
    context_lens_ref,  # [B] i32 (SMEM)
    # inputs
    q_ref,  # [1, KVH, G, D] VMEM block for this sequence
    kv_hbm,  # [L, 2, NB, KVH, BS, D] full cache in HBM/ANY
    *rest,  # quantized: (scales_hbm, o_ref, k_buf, v_buf, sems[, s_buf, s_sems])
    layer: int,
    scale: float,
    block_size: int,
    pages_per_chunk: int,
    quantized: bool,
):
    if quantized:
        (scales_hbm, o_ref, k_buf, v_buf, sems, sk_buf, sv_buf,
         s_sems) = rest
    else:
        (o_ref, k_buf, v_buf, sems) = rest
        scales_hbm = sk_buf = sv_buf = s_sems = None

    b = pl.program_id(0)
    mb = block_tables_ref.shape[1]
    ctx = context_lens_ref[b]
    num_pages = pl.cdiv(ctx, block_size)
    chunk_tokens = pages_per_chunk * block_size
    num_chunks = pl.cdiv(num_pages, pages_per_chunk)

    def page_of(chunk_idx, j):
        # Tail-chunk lanes clamp to a valid page; garbage tokens are
        # masked in compute.
        page_idx = jnp.minimum(chunk_idx * pages_per_chunk + j, mb - 1)
        return block_tables_ref[b, page_idx]

    def dma(slot, chunk_idx, j, kv):
        page = page_of(chunk_idx, j)
        buf = k_buf if kv == 0 else v_buf
        return pltpu.make_async_copy(kv_hbm.at[layer, kv, page],
                                     buf.at[slot, j], sems.at[slot, j, kv])

    def scale_dma(slot, chunk_idx, j, kv):
        page = page_of(chunk_idx, j)
        buf = sk_buf if kv == 0 else sv_buf
        return pltpu.make_async_copy(scales_hbm.at[layer, kv, page],
                                     buf.at[slot, j],
                                     s_sems.at[slot, j, kv])

    def start_chunk(slot, chunk_idx):
        for j in range(pages_per_chunk):
            dma(slot, chunk_idx, j, 0).start()
            dma(slot, chunk_idx, j, 1).start()
            if quantized:
                scale_dma(slot, chunk_idx, j, 0).start()
                scale_dma(slot, chunk_idx, j, 1).start()

    def wait_chunk(slot, chunk_idx):
        for j in range(pages_per_chunk):
            dma(slot, chunk_idx, j, 0).wait()
            dma(slot, chunk_idx, j, 1).wait()
            if quantized:
                scale_dma(slot, chunk_idx, j, 0).wait()
                scale_dma(slot, chunk_idx, j, 1).wait()

    # Warm the pipeline.
    for s0 in range(_N_BUF):
        @pl.when(s0 < num_chunks)
        def _():
            start_chunk(s0, s0)

    q = q_ref[0].astype(jnp.float32) * scale  # [KVH, G, D]
    kvh, g, d = q.shape

    def body(i, carry):
        m, l, acc = carry  # [KVH, G], [KVH, G], [KVH, G, D]
        slot = jax.lax.rem(i, _N_BUF)
        wait_chunk(slot, i)
        k = k_buf[slot].astype(jnp.float32)  # [P, KVH, BS, D]
        v = v_buf[slot].astype(jnp.float32)

        # Scores in the buffer's native layout: [P, KVH, G, BS].
        # Elementwise-broadcast + lane reduction on the VPU — a batched
        # matmul would be KVH tiny MXU issues for G==1.
        s = jnp.sum(q[None, :, :, None, :] * k[:, :, None, :, :],
                    axis=-1)  # [P, KVH, G, BS]
        if quantized:
            # Dequant K as a per-(page, head, token) scalar on scores.
            sk = sk_buf[slot, :, :, :block_size]  # load [P, KVH, BS]
            s = s * sk[:, :, None, :]
        pos = (i * chunk_tokens +
               jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) * block_size +
               jax.lax.broadcasted_iota(jnp.int32, s.shape, 3))
        s = jnp.where(pos < ctx, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=(0, 3)))  # [KVH, G]
        p = jnp.exp(s - m_new[None, :, :, None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=(0, 3))
        if quantized:
            # Dequant V by folding its scale into the softmax weights.
            sv = sv_buf[slot, :, :, :block_size]  # load [P, KVH, BS]
            p = p * sv[:, :, None, :]
        pv = jnp.sum(p[..., None] * v[:, :, None, :, :],
                     axis=(0, 3))  # [KVH, G, D]
        acc_new = acc * corr[..., None] + pv

        @pl.when(i + _N_BUF < num_chunks)
        def _():
            start_chunk(slot, i + _N_BUF)

        return m_new, l_new, acc_new

    m0 = jnp.full((kvh, g), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((kvh, g), jnp.float32)
    acc0 = jnp.zeros((kvh, g, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

    # Pad rows (ctx == 0) never loop; keep them finite.
    o_ref[0] = (acc / jnp.maximum(l, 1e-9)[..., None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer", "scale"))
def pallas_paged_decode_attention(
    q: jnp.ndarray,  # [B, H, D]
    kv_cache: KVCache,  # payload [L, 2, NB, KVH, BS, D] (+scales)
    layer: int,
    block_tables: jnp.ndarray,  # [B, MB] i32
    context_lens: jnp.ndarray,  # [B] i32
    scale: float,
) -> jnp.ndarray:
    B, H, D = q.shape
    data, scales = kv_cache
    _, _, NB, KVH, BS, _ = data.shape
    G = H // KVH
    quantized = scales is not None

    q_grouped = q.reshape(B, KVH, G, D)
    pages = min(_PAGES_PER_CHUNK, block_tables.shape[1])

    in_specs = [
        pl.BlockSpec((1, KVH, G, D), lambda b, *_: (b, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch_shapes = [
        pltpu.VMEM((_N_BUF, pages, KVH, BS, D), data.dtype),
        pltpu.VMEM((_N_BUF, pages, KVH, BS, D), data.dtype),
        pltpu.SemaphoreType.DMA((_N_BUF, pages, 2)),
    ]
    operands = [q_grouped, data]
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes += [
            pltpu.VMEM((_N_BUF, pages, KVH, SCALE_LANES), jnp.float32),
            pltpu.VMEM((_N_BUF, pages, KVH, SCALE_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF, pages, 2)),
        ]
        operands.append(scales)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KVH, G, D), lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=scratch_shapes,
    )

    kernel = pl.pallas_call(
        functools.partial(_decode_kernel, layer=layer, scale=scale,
                          block_size=BS, pages_per_chunk=pages,
                          quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, G, D), q.dtype),
        interpret=_interpret(),
    )

    out = kernel(block_tables.astype(jnp.int32),
                 context_lens.astype(jnp.int32), *operands)
    return out.reshape(B, H, D)
