"""Paged KV-cache block operations.

Capability parity: /root/reference/csrc/cache_kernels.cu —
reshape_and_cache (scatter new K/V into the paged layout via
slot_mapping, :142-224), copy_blocks (batched copy-on-write, :52-137),
and swap_blocks (device<->host, :9-47). Re-designed for TPU/XLA:

- The whole KV cache is ONE logical object per engine, a ``KVCache``
  of payload ``[num_layers, 2, num_blocks, block_size, num_kv_heads,
  head_dim]`` plus (when quantized) per-vector scales
  ``[num_layers, 2, num_blocks, block_size, SCALE_LANES]``.
  Donated buffers -> every update below compiles to an in-place
  scatter. Two layout rules, both measured:
  * a page is contiguous across ALL kv heads (one big DMA per page
    for the decode kernel, not a latency-bound per-head transfer);
  * a TOKEN's row ``[kv_heads, head_dim]`` is contiguous (block_size
    outside kv_heads), so write_kv scatters T clean rows — the
    head-outside layout needed a [T*KVH]-row strided scatter that
    cost 364 ms per 1024-token prefill on a 7B cache.
  The kv-head axis shards over the ``model`` mesh axis.
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

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    if os.environ.get("VLLM_TPU_FORCE_XLA_OPS"):
        return False
    return jax.default_backend() == "tpu"

# Out-of-bounds sentinel for padded index slots; with mode="drop" the
# scatter discards these lanes.
PAD_SLOT = jnp.iinfo(jnp.int32).max

# Symmetric int8 range.
_INT8_MAX = 127.0

# The scales' kv-head axis pads to a full 128-lane tile: Mosaic
# requires HBM DMA slices to be lane-aligned, so a [BS, kv_heads]
# scale page with 32 heads is not fetchable, while [BS, 128] is — and
# the padded layout broadcasts straight onto the page payload with no
# in-kernel relayout.
SCALE_LANES = 128


class KVCache(NamedTuple):
    """The engine's paged KV state (a single donated pytree).

    data: [L, 2, NB, BS, KVH, D] payload (bf16/f32, or int8 quantized)
    scales: [L, 2, NB, BS, SCALE_LANES] f32 per-vector dequant scales
        (kv head in the lane axis, first KVH lanes used), or None
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
    if _use_pallas():
        from vllm_tpu.ops.pallas.kv_write import pallas_write_kv_tokens
        return pallas_write_kv_tokens(kv_cache, layer, k, v, slot_mapping)
    data, scales = kv_cache
    kvh = data.shape[4]
    num_blocks = data.shape[2]
    block_size = data.shape[3]
    block_ids = jnp.clip(slot_mapping // block_size, 0, num_blocks - 1)
    offsets = jnp.clip(slot_mapping % block_size, 0, block_size - 1)
    pad = slot_mapping == PAD_SLOT

    # dynamic-update-slice per token (XLA's scatter runs ~6 us PER ROW
    # on TPU regardless of window size — a 1024-token prefill's writes
    # cost 400 ms as scatters). PAD rows write back what was already
    # there (a read-modify keeps the drop semantics without a
    # sacrificial block).
    if scales is not None:
        k, k_scale = quantize_kv(k)
        v, v_scale = quantize_kv(v)
        lanes = scales.shape[-1]
        k_scale = _pad_lanes(k_scale, lanes)
        v_scale = _pad_lanes(v_scale, lanes)
    k = k.astype(data.dtype)
    v = v.astype(data.dtype)

    def body(i, carry):
        data, scales = carry
        idx = (layer, 0, block_ids[i], offsets[i], 0, 0)
        idx_v = (layer, 1, block_ids[i], offsets[i], 0, 0)
        for kv_i, (idx_i, new) in enumerate(((idx, k), (idx_v, v))):
            cur = jax.lax.dynamic_slice(data, idx_i,
                                        (1, 1, 1, 1, kvh, data.shape[5]))
            upd = jnp.where(pad[i], cur, new[i][None, None, None, None])
            data = jax.lax.dynamic_update_slice(data, upd, idx_i)
        if scales is not None:
            for kv_i, new in ((0, k_scale), (1, v_scale)):
                sidx = (layer, kv_i, block_ids[i], offsets[i], 0)
                cur = jax.lax.dynamic_slice(scales, sidx,
                                            (1, 1, 1, 1, scales.shape[-1]))
                upd = jnp.where(pad[i], cur, new[i][None, None, None, None])
                scales = jax.lax.dynamic_update_slice(scales, upd, sidx)
        return data, scales

    data, scales = jax.lax.fori_loop(0, k.shape[0], body, (data, scales))
    return KVCache(data, scales)


def _pad_lanes(x: jnp.ndarray, lanes: int) -> jnp.ndarray:
    """Pad the trailing axis of [T, KVH] scales to the lane width."""
    return jnp.pad(x, ((0, 0), (0, lanes - x.shape[-1])))


def write_kv_pages(
    kv_cache: KVCache,
    layer: int,
    k: jnp.ndarray,
    v: jnp.ndarray,
    page_src: jnp.ndarray,
    page_dst: jnp.ndarray,
) -> KVCache:
    """Page-granularity prefill writes: packed prompts fill their pages
    contiguously from offset 0, so page i copies
    ``k[page_src[i] : page_src[i]+BS]`` into block ``page_dst[i]`` as
    ONE dynamic-update-slice (a token-wise scatter costs ~6 us/row on
    TPU). A partial tail page writes whatever follows it in the packed
    batch into its own (exclusively owned) block — those slots are
    masked by context_len and overwritten by later decode steps.
    Entries with ``page_dst < 0`` are padding (write-back no-op).

    k, v: [T, KVH, D]; page_src/page_dst: [NP] i32.
    """
    data, scales = kv_cache
    num_blocks = data.shape[2]
    block_size = data.shape[3]
    num_tokens = k.shape[0]
    if scales is not None:
        k, k_scale = quantize_kv(k)
        v, v_scale = quantize_kv(v)
        lanes = scales.shape[-1]
        k_scale = _pad_lanes(k_scale, lanes)
        v_scale = _pad_lanes(v_scale, lanes)
    # One page of zero slack so a tail page at the very end of the
    # packed batch still reads at its own offset alignment.
    k = jnp.pad(k.astype(data.dtype), ((0, block_size), (0, 0), (0, 0)))
    v = jnp.pad(v.astype(data.dtype), ((0, block_size), (0, 0), (0, 0)))
    if scales is not None:
        k_scale = jnp.pad(k_scale, ((0, block_size), (0, 0)))
        v_scale = jnp.pad(v_scale, ((0, block_size), (0, 0)))

    def body(i, carry):
        data, scales = carry
        invalid = page_dst[i] < 0
        blk = jnp.clip(page_dst[i], 0, num_blocks - 1)
        src = jnp.clip(page_src[i], 0, num_tokens)
        for kv_i, new in ((0, k), (1, v)):
            page = jax.lax.dynamic_slice_in_dim(new, src, block_size, 0)
            idx = (layer, kv_i, blk, 0, 0, 0)
            cur = jax.lax.dynamic_slice(
                data, idx, (1, 1, 1) + data.shape[3:])
            upd = jnp.where(invalid, cur, page[None, None, None])
            data = jax.lax.dynamic_update_slice(data, upd, idx)
        if scales is not None:
            for kv_i, new in ((0, k_scale), (1, v_scale)):
                spage = jax.lax.dynamic_slice_in_dim(new, src, block_size, 0)
                sidx = (layer, kv_i, blk, 0, 0)
                cur = jax.lax.dynamic_slice(scales, sidx,
                                            (1, 1, 1) + scales.shape[3:])
                upd = jnp.where(invalid, cur, spage[None, None, None])
                scales = jax.lax.dynamic_update_slice(scales, upd, sidx)
        return data, scales

    data, scales = jax.lax.fori_loop(0, page_dst.shape[0], body,
                                     (data, scales))
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
    """[..., BS, KVH, D] int8 pages + [..., BS, SCALE_LANES] scales ->
    f32 (testing / XLA fallback path; the Pallas kernels fuse this into
    attention)."""
    x = data.astype(jnp.float32)
    if scales is None:
        return x
    kvh = data.shape[-2]
    return x * scales.astype(jnp.float32)[..., :kvh, None]


def kv_cache_shape(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
    head_dim: int,
) -> Tuple[int, int, int, int, int, int]:
    return (num_layers, 2, num_blocks, block_size, num_kv_heads, head_dim)


def kv_scales_shape(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
) -> Tuple[int, int, int, int, int]:
    assert num_kv_heads <= SCALE_LANES
    return (num_layers, 2, num_blocks, block_size, SCALE_LANES)
