"""Compute ops for the TPU serving engine.

Capability parity with the reference's five CUDA extension modules
(/root/reference/csrc/: attention, cache, pos_encoding, layernorm,
activation kernels) — re-designed as JAX/XLA ops plus Pallas TPU
kernels for the two genuinely bandwidth-bound paths (paged decode
attention and packed prefill flash attention). Elementwise ops
(RoPE/RMSNorm/SwiGLU) stay in jnp: XLA fuses them into the surrounding
matmuls, which is what the reference's hand-written CUDA kernels were
for.
"""

from vllm_tpu.ops.activation import get_act_fn, silu_and_mul
from vllm_tpu.ops.attention import paged_decode_attention, prefill_attention
from vllm_tpu.ops.cache import (KVCache, copy_blocks, dequantize_pages,
                                gather_blocks, quantize_kv, scatter_blocks,
                                write_kv)
from vllm_tpu.ops.norm import layer_norm, rms_norm
from vllm_tpu.ops.rotary import apply_rope, compute_rope_cache

__all__ = [
    "KVCache",
    "apply_rope",
    "compute_rope_cache",
    "copy_blocks",
    "dequantize_pages",
    "gather_blocks",
    "get_act_fn",
    "layer_norm",
    "paged_decode_attention",
    "prefill_attention",
    "quantize_kv",
    "rms_norm",
    "scatter_blocks",
    "silu_and_mul",
    "write_kv",
]
