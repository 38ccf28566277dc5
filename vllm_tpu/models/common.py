"""Shared substrate for the functional model zoo.

Models here are not nn.Module graphs (the reference's
torch/Megatron-layer design, /root/reference/vllm/model_executor/) but
pure functions over parameter pytrees — the idiomatic JAX shape:
``forward(params, batch, kv_cache) -> (hidden, kv_cache)`` traced once
per static batch bucket by the executor, with tensor parallelism
expressed as PartitionSpecs on the param tree (GSPMD inserts the
collectives the reference hand-wires in
parallel_utils/tensor_parallel/).

Batch descriptors (parity: InputMetadata,
/root/reference/vllm/model_executor/input_metadata.py):

- PrefillBatch: packed variable-length prompts, one flat token axis.
- DecodeBatch: one token per running sequence + paged-KV lookup state.

Both are fully padded/bucketed; padding tokens carry PAD_SLOT slot ids
(KV writes dropped) and seq_id -1 / context_len 0 (attention masked).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vllm_tpu.ops import paged_decode_attention, prefill_attention, write_kv
from vllm_tpu.ops.cache import write_kv_pages
from vllm_tpu.ops.quant import Int4Linear, QuantizedLinear, quantized_matmul


class PrefillBatch(NamedTuple):
    token_ids: jnp.ndarray  # [T] i32
    positions: jnp.ndarray  # [T] i32
    seq_ids: jnp.ndarray  # [T] i32 segment ids, -1 = padding
    slot_mapping: jnp.ndarray  # [T] i32 flat KV slots, PAD_SLOT = padding
    logits_indices: jnp.ndarray  # [S] i32 last-token index per sequence
    # Page-granularity KV-write plan (engine fast path): page i copies
    # token_ids[page_src[i]:+BS] into block page_dst[i] (-1 = padding).
    # None -> token-granularity writes via slot_mapping.
    page_src: Optional[jnp.ndarray] = None  # [NP] i32
    page_dst: Optional[jnp.ndarray] = None  # [NP] i32


class DecodeBatch(NamedTuple):
    token_ids: jnp.ndarray  # [B] i32
    positions: jnp.ndarray  # [B] i32
    slot_mapping: jnp.ndarray  # [B] i32
    block_tables: jnp.ndarray  # [B, MAX_BLOCKS] i32
    context_lens: jnp.ndarray  # [B] i32, 0 = padding row


class MixedBatch(NamedTuple):
    """A packed prefill batch and a decode batch fused into ONE
    program: tokens concatenate ([T prefill | B decode]) so the
    matmuls run over T+B rows — decode tokens ride the prefill's
    weight reads nearly free, and running sequences never stall behind
    prompt admission. This is the reference's mixed prompt+generation
    batch (worker.py:128-237) in bucketed, static-shape form.
    """
    prefill: PrefillBatch
    decode: DecodeBatch

    @property
    def num_prefill_tokens(self) -> int:
        return self.prefill.token_ids.shape[0]

    @property
    def token_ids(self) -> jnp.ndarray:
        return jnp.concatenate(
            [self.prefill.token_ids, self.decode.token_ids])

    @property
    def positions(self) -> jnp.ndarray:
        return jnp.concatenate(
            [self.prefill.positions, self.decode.positions])


def dense(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x @ w (+ b). Weights stored [in, out] (transposed from torch);
    w may be a weight-only-INT8 QuantizedLinear or a group-scaled
    Int4Linear (fused-dequant Pallas matmul)."""
    if isinstance(w, Int4Linear):
        from vllm_tpu.ops.pallas.int4_matmul import pallas_int4_matmul
        y = pallas_int4_matmul(x, w)
    elif isinstance(w, QuantizedLinear):
        y = quantized_matmul(x, w)
    else:
        y = x @ w
    if b is not None:
        y = y + b
    return y


def attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_cache: jnp.ndarray,
    layer_idx: int,
    batch,
    scale: float,
):
    """Write this step's K/V into the paged cache, then attend.

    q: [T, H, D]; k/v: [T, KVH, D]. Prefill attends within the packed
    batch (fresh prompts have no prior context); decode reads the
    paged cache, which now includes the token written this step. A
    MixedBatch does both over its concatenated token axis (the
    prefilling and decoding sequences are disjoint, so write order
    between the parts is irrelevant).
    Returns ([T, H, D], new kv_cache).
    """
    if isinstance(batch, MixedBatch):
        T = batch.num_prefill_tokens
        kp, vp = k[:T], v[:T]
        kv_cache = write_kv_pages(kv_cache, layer_idx, kp, vp,
                                  batch.prefill.page_src,
                                  batch.prefill.page_dst)
        kv_cache = write_kv(kv_cache, layer_idx, k[T:], v[T:],
                            batch.decode.slot_mapping)
        out_p = prefill_attention(q[:T], kp, vp, batch.prefill.seq_ids,
                                  scale)
        out_d = paged_decode_attention(q[T:], kv_cache, layer_idx,
                                       batch.decode.block_tables,
                                       batch.decode.context_lens, scale)
        return jnp.concatenate([out_p, out_d]), kv_cache
    if isinstance(batch, PrefillBatch) and batch.page_src is not None:
        kv_cache = write_kv_pages(kv_cache, layer_idx, k, v, batch.page_src,
                                  batch.page_dst)
    else:
        kv_cache = write_kv(kv_cache, layer_idx, k, v, batch.slot_mapping)
    if isinstance(batch, PrefillBatch):
        out = prefill_attention(q, k, v, batch.seq_ids, scale)
    else:
        out = paged_decode_attention(q, kv_cache, layer_idx,
                                     batch.block_tables, batch.context_lens,
                                     scale)
    return out, kv_cache


def maybe_quantize(model, params, w8a8_min_rows: Optional[int] = None):
    """Apply the model's weight quantization mode to a loaded param
    tree (shared by all model families). "int8-w8a8" stores the same
    weight-only-INT8 params and additionally quantizes activations for
    matmuls with >= ``w8a8_min_rows`` rows at trace time (the caller
    derives the threshold from its decode batch buckets so decode
    steps always keep weight-only numerics; see ops/quant.py)."""
    if model.quantization is None:
        return params
    if model.quantization in ("int8", "int8-w8a8", "int4"):
        from vllm_tpu.ops.quant import (quantize_model_params,
                                        set_w8a8_min_rows)
        if model.quantization == "int8-w8a8":
            set_w8a8_min_rows(w8a8_min_rows
                              if w8a8_min_rows is not None else 257)
        else:
            set_w8a8_min_rows(None)
        if model.quantization == "int4":
            # One standalone tiny compile: if Mosaic rejects the int4
            # kernel on this backend, flip to the XLA formulation now
            # instead of failing the fused step-program compile later.
            from vllm_tpu.ops.pallas.int4_matmul import probe_int4_kernel
            probe_int4_kernel()
        return quantize_model_params(params, model.QUANT_LAYER_KEYS,
                                     model.QUANT_TOP_KEYS,
                                     int4=model.quantization == "int4")
    raise ValueError(f"Unknown quantization: {model.quantization}")


def maybe_quantize_shardings(model, shardings):
    if model.quantization is None:
        return shardings
    from vllm_tpu.ops.quant import quantize_model_shardings
    return quantize_model_shardings(shardings, model.QUANT_LAYER_KEYS,
                                    model.QUANT_TOP_KEYS,
                                    int4=model.quantization == "int4")


def stack_layers(layers: list) -> dict:
    """List of per-layer param dicts -> one dict of [L, ...]-stacked
    leaves, the shape ``lax.scan`` slices per iteration. Tracing and
    lowering a 7B model UNROLLED (32 inlined layers) cost ~56 s + 54 s
    per step program; scanning one traced layer cuts both ~10-20x
    (startup, and every new program variant)."""
    out = {}
    for key in layers[0]:
        leaves = [lp[key] for lp in layers]
        out[key] = jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)
    return out


def stack_layer_specs(spec: dict) -> dict:
    """Prepend the stacked-layer axis (replicated) to each leaf spec."""
    from jax.sharding import PartitionSpec as P

    def one(s):
        return P(*((None,) + tuple(s)))

    return {k: jax.tree.map(one, v,
                            is_leaf=lambda x: isinstance(x, P))
            for k, v in spec.items()}


def scan_layers(layer_fn, num_layers: int, params_layers, h, batch,
                kv_cache):
    """Run ``layer_fn(lp, idx, h, batch, kv_cache)`` over the stacked
    layer params with a single traced body."""

    def body(carry, xs):
        h, kv = carry
        lp, idx = xs
        h, kv = layer_fn(lp, idx, h, batch, kv)
        return (h, kv), None

    # unroll=1 deliberately: unroll=4 measured 2.6x SLOWER decode
    # chunks (378 vs 144 ms — multiple layers' weight slices live at
    # once defeats XLA's streaming of the int8 weights), for only
    # ~1.5 ms/step of loop overhead saved.
    (h, kv_cache), _ = jax.lax.scan(
        body, (h, kv_cache),
        (params_layers, jnp.arange(num_layers, dtype=jnp.int32)))
    return h, kv_cache


def gather_last_hidden(hidden: jnp.ndarray, batch) -> jnp.ndarray:
    """Rows whose next token gets sampled: every row for decode, the
    per-sequence last prompt token for prefill; a mixed batch yields
    [S prompt rows | B decode rows]."""
    if isinstance(batch, MixedBatch):
        T = batch.num_prefill_tokens
        B = batch.decode.token_ids.shape[0]
        rows = jnp.concatenate([
            batch.prefill.logits_indices,
            T + jnp.arange(B, dtype=jnp.int32)
        ])
        return hidden[rows]
    if isinstance(batch, PrefillBatch):
        return hidden[batch.logits_indices]
    return hidden
