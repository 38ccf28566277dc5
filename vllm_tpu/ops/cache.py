"""Paged KV-cache block operations.

Capability parity: /root/reference/csrc/cache_kernels.cu —
reshape_and_cache (scatter new K/V into the paged layout via
slot_mapping, :142-224), copy_blocks (batched copy-on-write, :52-137),
and swap_blocks (device<->host, :9-47). Re-designed for TPU/XLA:

- The whole KV cache is ONE logical object per engine, a ``KVCache``
  of payload ``[num_layers, 2, num_blocks, num_kv_heads, block_size,
  head_dim]`` plus (when quantized) per-vector scales
  ``[num_layers, 2, num_blocks, num_kv_heads, block_size]``.
  Donated buffers -> every update below compiles to an in-place
  scatter; a page is contiguous across ALL kv heads (kv_heads x
  block_size x head_dim, e.g. 128 KiB for a 7B model), so the decode
  kernel moves one big DMA per page instead of a latency-bound 4 KiB
  DMA per (page, head). The kv-head axis shards over the ``model``
  mesh axis.
- INT8 KV quantization (north star beyond the reference): symmetric
  per-token-per-head scales computed on write (max|x|/127), dequant
  fused into the attention kernels' fp32 compute. The write path
  quantizes for free inside the same jitted step program.
- Padding uses out-of-bounds indices with scatter mode="drop" — the
  XLA-native equivalent of the reference kernels' bounds checks, which
  lets every op take fixed-size padded index vectors (static shapes).
- Swap is a gather to a staging buffer + host transfer (TPUs have no
  pinned-memory stream; jax async dispatch overlaps the DMA).
"""

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

# Out-of-bounds sentinel for padded index slots; with mode="drop" the
# scatter discards these lanes.
PAD_SLOT = jnp.iinfo(jnp.int32).max

# Symmetric int8 range.
_INT8_MAX = 127.0

# The scales' token axis pads to a full 128-lane tile: Mosaic requires
# HBM DMA slices to be lane-aligned, so a [KVH, block_size] scale page
# with block_size 16 is not fetchable, while [KVH, 128] is — and the
# padded layout needs no in-kernel relayout to broadcast over scores.
SCALE_LANES = 128


class KVCache(NamedTuple):
    """The engine's paged KV state (a single donated pytree).

    data: [L, 2, NB, KVH, BS, D] payload (bf16/f32, or int8 quantized)
    scales: [L, 2, NB, KVH, SCALE_LANES] f32 per-vector dequant scales
        (token offset in the lane axis, first BS lanes used), or None
    """
    data: jnp.ndarray
    scales: Optional[jnp.ndarray]

    @property
    def quantized(self) -> bool:
        return self.scales is not None


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-vector int8 quantization of [T, KVH, D] K or V.

    Returns (int8 values, f32 scales [T, KVH])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / _INT8_MAX, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -_INT8_MAX, _INT8_MAX).astype(jnp.int8)
    return q, scale


def write_kv(
    kv_cache: KVCache,
    layer: int,
    k: jnp.ndarray,
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,
) -> KVCache:
    """Scatter this step's new K/V vectors into their pages
    (quantizing on the way if the cache is int8).

    k, v: [T, KVH, D]; slot_mapping: [T] flat slot ids
    (block * block_size + offset), PAD_SLOT for padding tokens.
    """
    data, scales = kv_cache
    kvh = data.shape[3]
    block_size = data.shape[4]
    block_ids = slot_mapping // block_size
    offsets = slot_mapping % block_size

    # Per-(token, head) row scatter: [T, KVH] index arrays over the
    # adjacent (block, head, offset) dims leave only the minor-most D
    # axis as the scatter window. A strided window (indexing offsets
    # with the head dim in between) makes XLA's layout assignment
    # prefer a KVH<->BS-swapped operand layout, inserting TWO
    # full-cache layout copies around EVERY layer's scatter — measured
    # 120 ms/step on a 7B cache vs ~0 for this form.
    b2 = jnp.broadcast_to(block_ids[:, None], block_ids.shape + (kvh,))
    o2 = jnp.broadcast_to(offsets[:, None], offsets.shape + (kvh,))
    h2 = jnp.broadcast_to(jnp.arange(kvh, dtype=slot_mapping.dtype)[None],
                          block_ids.shape + (kvh,))

    if scales is not None:
        k, k_scale = quantize_kv(k)
        v, v_scale = quantize_kv(v)
        scales = scales.at[layer, 0, b2, h2, o2].set(k_scale, mode="drop")
        scales = scales.at[layer, 1, b2, h2, o2].set(v_scale, mode="drop")
    data = data.at[layer, 0, b2, h2, o2, :].set(k.astype(data.dtype),
                                                mode="drop")
    data = data.at[layer, 1, b2, h2, o2, :].set(v.astype(data.dtype),
                                                mode="drop")
    return KVCache(data, scales)


def copy_blocks(
    kv_cache: KVCache,
    src_blocks: jnp.ndarray,
    dst_blocks: jnp.ndarray,
) -> KVCache:
    """Copy-on-write block duplication across ALL layers at once.

    src_blocks/dst_blocks: [P] padded with PAD_SLOT. A padded source
    gathers garbage (clipped index) but its paired destination is
    dropped, so padding is a no-op.
    """
    data, scales = kv_cache
    src = jnp.minimum(src_blocks, data.shape[2] - 1)
    data = data.at[:, :, dst_blocks].set(data[:, :, src], mode="drop")
    if scales is not None:
        scales = scales.at[:, :, dst_blocks].set(scales[:, :, src],
                                                 mode="drop")
    return KVCache(data, scales)


def gather_blocks(kv_cache: KVCache, block_ids: jnp.ndarray) -> KVCache:
    """Pull blocks out for swap-out: payload [L, 2, P, KVH, BS, D]
    (+scales [L, 2, P, KVH, BS])."""
    data, scales = kv_cache
    return KVCache(data[:, :, block_ids],
                   None if scales is None else scales[:, :, block_ids])


def scatter_blocks(
    kv_cache: KVCache,
    block_ids: jnp.ndarray,
    blocks: KVCache,
) -> KVCache:
    """Push swapped-in blocks back: blocks as from gather_blocks."""
    data, scales = kv_cache
    data = data.at[:, :, block_ids].set(blocks.data.astype(data.dtype),
                                        mode="drop")
    if scales is not None:
        scales = scales.at[:, :, block_ids].set(blocks.scales, mode="drop")
    return KVCache(data, scales)


def dequantize_pages(data: jnp.ndarray,
                     scales: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[..., KVH, BS, D] int8 pages + [..., KVH, SCALE_LANES] scales ->
    f32 (testing / XLA fallback path; the Pallas kernels fuse this into
    attention)."""
    x = data.astype(jnp.float32)
    if scales is None:
        return x
    bs = data.shape[-2]
    return x * scales.astype(jnp.float32)[..., :bs, None]


def kv_cache_shape(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
    head_dim: int,
) -> Tuple[int, int, int, int, int, int]:
    return (num_layers, 2, num_blocks, num_kv_heads, block_size, head_dim)


def kv_scales_shape(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
) -> Tuple[int, int, int, int, int]:
    assert block_size <= SCALE_LANES
    return (num_layers, 2, num_blocks, num_kv_heads, SCALE_LANES)
