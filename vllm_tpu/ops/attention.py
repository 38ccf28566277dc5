"""Attention for the paged KV cache.

Capability parity:
- decode: /root/reference/csrc/attention/attention_kernels.cu
  (single_query_cached_kv_attention — one query token per sequence
  reading scattered KV pages through a block table, fp32 softmax).
- prefill: xformers memory_efficient_attention with a block-diagonal
  causal mask over packed variable-length prompts
  (/root/reference/vllm/model_executor/layers/attention.py:50-70).

Two implementations each: a pure-XLA reference (used for testing and
as the fallback path) and a Pallas TPU kernel (vllm_tpu/ops/pallas/*)
selected by ``impl``. Group-query attention is supported throughout
(H == KVH for all v0.1.0-era models).

Padding conventions (static shapes):
- decode: padded batch rows carry context_len == 0 and garbage block
  tables; their outputs are finite garbage, discarded by the caller.
- prefill: padding tokens carry seq_id == -1; they only attend among
  themselves, outputs discarded.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_tpu.ops.cache import KVCache

_NEG_INF = -1e30

_HEAD_SPEC = P(None, "model", None)  # [tokens/batch, heads, head_dim]


def _use_pallas(impl: str) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    # "auto": pallas on TPU, xla elsewhere (tests force xla/interpret).
    if os.environ.get("VLLM_TPU_FORCE_XLA_OPS"):
        return False
    if os.environ.get("VLLM_TPU_FORCE_PALLAS_OPS"):
        # Tests: exercise the Pallas path (interpret mode) off-TPU.
        return True
    return jax.default_backend() == "tpu"


def shard_map_tp(fn, mesh, in_specs, out_specs):
    """shard_map over the ``model`` axis with replication checking off
    (Pallas calls aren't analyzable), tolerant of the jax API move."""
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def paged_decode_attention(
    q: jnp.ndarray,
    kv_cache: KVCache,
    layer: int,
    block_tables: jnp.ndarray,
    context_lens: jnp.ndarray,
    scale: float,
    impl: str = "auto",
) -> jnp.ndarray:
    """One query token per sequence against its paged KV history.

    q: [B, H, D]; kv_cache: the full engine cache — payload
    [L, 2, NB, KVH, BS, D] plus optional int8 dequant scales (passed
    whole so the Pallas kernel DMAs pages straight from the live
    buffer — a per-layer slice would materialize a copy at the
    custom-call boundary); block_tables: [B, MAX_BLOCKS] physical block
    ids (padded rows arbitrary); context_lens: [B] number of valid keys
    (including the token written this step). Returns [B, H, D].

    The cache may store head_dim padded to 128 lanes (Mosaic DMA
    alignment — see ops/cache.py LANES): q pads to match and the extra
    output lanes (exact zeros) are sliced away.
    """
    from vllm_tpu.ops.cache import pad_head
    D = q.shape[-1]
    Dc = kv_cache.data.shape[-1]
    if D != Dc:
        return paged_decode_attention(pad_head(q, Dc), kv_cache, layer,
                                      block_tables, context_lens, scale,
                                      impl)[..., :D]
    from vllm_tpu.ops.cache import int4_kv_pallas_ok
    if _use_pallas(impl) and (kv_cache.kv_planes == 2
                              or int4_kv_pallas_ok()):
        from vllm_tpu.ops.pallas.paged_attention import (
            pallas_paged_decode_attention)
        from vllm_tpu.parallel.mesh import (KV_CACHE_SPEC, KV_SCALES_SPEC,
                                            current_tp_mesh)
        mesh = current_tp_mesh()
        if mesh is None:
            return pallas_paged_decode_attention(q, kv_cache, layer,
                                                 block_tables, context_lens,
                                                 scale)

        # Tensor parallel: each shard runs the kernel on ITS kv heads —
        # q sharded on the head axis, the cache payload on its head
        # axis, the scales on their tp-group axis; block tables /
        # context lengths replicate. No collective is needed (heads are
        # independent); GSPMD would otherwise replicate the whole
        # sharded cache into the kernel (reference analog: the CUDA
        # grid runs over LOCAL heads, attention_kernels.cu:66-91).
        def local(q, data, scales, tables, ctx):
            return pallas_paged_decode_attention(q, KVCache(data, scales),
                                                 layer, tables, ctx, scale)

        if kv_cache.scales is None:
            fn = shard_map_tp(
                lambda q, d, t, c: local(q, d, None, t, c), mesh,
                (_HEAD_SPEC, KV_CACHE_SPEC, P(None, None), P(None)),
                _HEAD_SPEC)
            return fn(q, kv_cache.data, block_tables, context_lens)
        fn = shard_map_tp(
            local, mesh,
            (_HEAD_SPEC, KV_CACHE_SPEC, KV_SCALES_SPEC, P(None, None),
             P(None)), _HEAD_SPEC)
        return fn(q, kv_cache.data, kv_cache.scales, block_tables,
                  context_lens)
    return _xla_paged_decode_attention(q, kv_cache, layer, block_tables,
                                       context_lens, scale)


def _xla_paged_decode_attention(q, kv_cache, layer, block_tables,
                                context_lens, scale):
    B, H, D = q.shape
    data, scales = kv_cache
    _, NB, _, KVH, BS, _ = data.shape
    G = H // KVH
    MB = block_tables.shape[1]
    S = MB * BS

    from vllm_tpu.ops.cache import dequantize_pages
    tables = jnp.clip(block_tables, 0, NB - 1)
    # [B, MB, 2, KVH, BS, D] f32 (dequantized)
    pages = dequantize_pages(
        data[layer][tables],
        None if scales is None else scales[layer][tables])

    def fetch(kv: int) -> jnp.ndarray:
        # [B, MB, KVH, BS, D] -> [B, KVH, MB*BS, D]
        return pages[:, :, kv].transpose(0, 2, 1, 3,
                                         4).reshape(B, KVH, S, D)

    k = fetch(0)
    v = fetch(1)

    qg = q.reshape(B, KVH, G, D).astype(jnp.float32)
    scores = jnp.einsum("bkgd,bksd->bkgs", qg, k,
                        preferred_element_type=jnp.float32) * scale
    positions = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, S), 3)
    mask = positions < context_lens[:, None, None, None]
    scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,bksd->bkgd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, H, D).astype(q.dtype)


def prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    seq_ids: jnp.ndarray,
    scale: float,
    impl: str = "auto",
) -> jnp.ndarray:
    """Causal attention over packed variable-length prompts.

    q: [T, H, D]; k/v: [T, KVH, D]; seq_ids: [T] segment id per token
    (-1 for padding). Token i attends to token j iff they share a
    segment and j <= i. Returns [T, H, D].

    head_dim pads to 128 lanes for the kernel (Mosaic DMA alignment);
    zero lanes are exact and sliced away.
    """
    from vllm_tpu.ops.cache import pad_head, padded_head_dim
    D = q.shape[-1]
    Dp = padded_head_dim(D)
    if D != Dp and _use_pallas(impl):
        return prefill_attention(pad_head(q, Dp), pad_head(k, Dp),
                                 pad_head(v, Dp), seq_ids, scale,
                                 impl)[..., :D]
    if _use_pallas(impl):
        from vllm_tpu.ops.pallas.flash_prefill import pallas_prefill_attention
        from vllm_tpu.parallel.mesh import current_tp_mesh
        mesh = current_tp_mesh()
        if mesh is None:
            return pallas_prefill_attention(q, k, v, seq_ids, scale)
        # Tensor parallel: heads are independent — each shard flashes
        # over its local q/k/v heads; segment ids replicate.
        fn = shard_map_tp(
            lambda q, k, v, s: pallas_prefill_attention(q, k, v, s, scale),
            mesh, (_HEAD_SPEC, _HEAD_SPEC, _HEAD_SPEC, P(None)), _HEAD_SPEC)
        return fn(q, k, v, seq_ids)
    return _xla_prefill_attention(q, k, v, seq_ids, scale)


def _xla_prefill_attention(q, k, v, seq_ids, scale):
    T, H, D = q.shape
    KVH = k.shape[1]
    G = H // KVH

    qg = q.reshape(T, KVH, G, D).astype(jnp.float32)
    scores = jnp.einsum("qkgd,skd->kgqs", qg, k.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
    same_seq = seq_ids[:, None] == seq_ids[None, :]
    causal = (jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
              >= jax.lax.broadcasted_iota(jnp.int32, (T, T), 1))
    mask = same_seq & causal
    scores = jnp.where(mask[None, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("kgqs,skd->qkgd", probs, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.reshape(T, H, D).astype(q.dtype)
