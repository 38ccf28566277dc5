"""Paged KV-cache block operations.

Capability parity: /root/reference/csrc/cache_kernels.cu —
reshape_and_cache (scatter new K/V into the paged layout via
slot_mapping, :142-224), copy_blocks (batched copy-on-write, :52-137),
and swap_blocks (device<->host, :9-47). Re-designed for TPU/XLA:

- The whole KV cache is ONE array per engine,
  ``[num_layers, 2, num_blocks, num_kv_heads, block_size, head_dim]``.
  One donated buffer -> every update below compiles to an in-place
  scatter; a page is contiguous across ALL kv heads (kv_heads x
  block_size x head_dim, e.g. 128 KiB for a 7B model), so the decode
  kernel moves one big DMA per page instead of a latency-bound 4 KiB
  DMA per (page, head). The kv-head axis shards over the ``model``
  mesh axis.
- Padding uses out-of-bounds indices with scatter mode="drop" — the
  XLA-native equivalent of the reference kernels' bounds checks, which
  lets every op take fixed-size padded index vectors (static shapes).
- Swap is a gather to a staging buffer + host transfer (TPUs have no
  pinned-memory stream; jax async dispatch overlaps the DMA).
"""

from typing import Tuple

import jax.numpy as jnp

# Out-of-bounds sentinel for padded index slots; with mode="drop" the
# scatter discards these lanes.
PAD_SLOT = jnp.iinfo(jnp.int32).max


def write_kv(
    kv_cache: jnp.ndarray,
    layer: int,
    k: jnp.ndarray,
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,
) -> jnp.ndarray:
    """Scatter this step's new K/V vectors into their pages.

    kv_cache: [L, 2, NB, KVH, BS, D]; k, v: [T, KVH, D];
    slot_mapping: [T] flat slot ids (block * block_size + offset),
    PAD_SLOT for padding tokens.
    """
    block_size = kv_cache.shape[4]
    block_ids = slot_mapping // block_size
    offsets = slot_mapping % block_size
    # Mixed basic/advanced indexing: the (layer, kv, block, offset)
    # advanced dims are non-adjacent, so the batched token dim lands in
    # front — updates are [T, KVH, D], exactly k/v's layout.
    kv_cache = kv_cache.at[layer, 0, block_ids, :, offsets, :].set(
        k.astype(kv_cache.dtype), mode="drop")
    kv_cache = kv_cache.at[layer, 1, block_ids, :, offsets, :].set(
        v.astype(kv_cache.dtype), mode="drop")
    return kv_cache


def copy_blocks(
    kv_cache: jnp.ndarray,
    src_blocks: jnp.ndarray,
    dst_blocks: jnp.ndarray,
) -> jnp.ndarray:
    """Copy-on-write block duplication across ALL layers at once.

    src_blocks/dst_blocks: [P] padded with PAD_SLOT. A padded source
    gathers garbage (clipped index) but its paired destination is
    dropped, so padding is a no-op.
    """
    src = jnp.minimum(src_blocks, kv_cache.shape[2] - 1)
    gathered = kv_cache[:, :, src]  # [L, 2, P, KVH, BS, D]
    return kv_cache.at[:, :, dst_blocks].set(gathered, mode="drop")


def gather_blocks(kv_cache: jnp.ndarray,
                  block_ids: jnp.ndarray) -> jnp.ndarray:
    """Pull blocks out for swap-out: returns [L, 2, P, KVH, BS, D]."""
    return kv_cache[:, :, block_ids]


def scatter_blocks(
    kv_cache: jnp.ndarray,
    block_ids: jnp.ndarray,
    blocks: jnp.ndarray,
) -> jnp.ndarray:
    """Push swapped-in blocks back: blocks [L, 2, P, KVH, BS, D]."""
    return kv_cache.at[:, :, block_ids].set(blocks.astype(kv_cache.dtype),
                                            mode="drop")


def kv_cache_shape(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
    head_dim: int,
) -> Tuple[int, int, int, int, int, int]:
    return (num_layers, 2, num_blocks, num_kv_heads, block_size, head_dim)
