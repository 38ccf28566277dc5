"""Rotary position embeddings (GPT-NeoX layout).

Capability parity: /root/reference/csrc/pos_encoding_kernels.cu:7-47
(rotary_embedding_neox: in-place RoPE on flattened q/k via gathered
cos/sin rows) and the cos/sin cache precompute in
/root/reference/vllm/model_executor/layers/attention.py:159-215.
On TPU this is pure jnp — XLA fuses the gather + elementwise rotation
into the QKV projection's epilogue.

Supports partial rotary (rotary_dim < head_dim, GPT-NeoX's rotary_pct)
by rotating only the leading ``rotary_dim`` lanes.
"""

from typing import Tuple

import jax.numpy as jnp


def compute_rope_cache(
    rotary_dim: int,
    max_position: int,
    base: float = 10000.0,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (cos, sin), each [max_position, rotary_dim // 2]."""
    inv_freq = 1.0 / (base**(
        jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    t = jnp.arange(max_position, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def apply_rope(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    cos_cache: jnp.ndarray,
    sin_cache: jnp.ndarray,
    rotary_dim: int,
) -> jnp.ndarray:
    """Rotate the leading ``rotary_dim`` lanes of x.

    x: [num_tokens, num_heads, head_dim]; positions: [num_tokens].
    NeoX ("rotate half") layout: the rotary slice is split into
    [first_half, second_half], not interleaved pairs.
    """
    cos = cos_cache[positions][:, None, :]  # [T, 1, rot/2]
    sin = sin_cache[positions][:, None, :]
    x_rot = x[..., :rotary_dim]
    x_pass = x[..., rotary_dim:]
    half = rotary_dim // 2
    x1 = x_rot[..., :half].astype(jnp.float32)
    x2 = x_rot[..., half:].astype(jnp.float32)
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
    if rotary_dim == x.shape[-1]:
        return out
    return jnp.concatenate([out, x_pass], axis=-1)
