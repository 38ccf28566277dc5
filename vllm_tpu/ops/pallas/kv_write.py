"""Pallas TPU kernel: scatter decode-step K/V rows into the paged cache.

Capability parity: /root/reference/csrc/cache_kernels.cu
reshape_and_cache (:142-224) — one thread block per token scattering
its K/V vectors through slot_mapping. XLA has no fast path for this
(scatter runs ~6 us/row, per-row dynamic-update-slices ~4 us/row);
here the kernel is a batched page read-modify-write: DMA every
written page into VMEM (one copy per page — the layout keeps a page's
K, V and heads contiguous), merge each token's column in with ONE
vectorized sublane mask over the whole batch, and DMA the pages back.
All reads pipeline together, then all writes — no per-token latency.

Safety: tokens in one call must target DISTINCT blocks. Decode steps
satisfy this by construction (every running sequence exclusively owns
its tail block after copy-on-write). Quantization happens vectorized
in XLA before the kernel; the cache is aliased in place.

Prefill uses page-granularity writes instead (ops/cache.py
write_kv_pages).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return bool(os.environ.get("VLLM_TPU_INTERPRET"))


def _write_kernel(
    # scalar prefetch
    layer_ref,  # [1] i32 (SMEM) — traced (scanned over layers)
    slots_ref,  # [B] i32 (SMEM)
    # inputs
    kv_ref,  # [B, 2, KVH, D] VMEM (K and V stacked per token)
    kv_in,  # [L, NB, 2, KVH, BS, D] HBM (aliased to data_out)
    *rest,  # [scale_ref, scales_in,] data_out [, scales_out], page_buf
            # [, spage_buf], sems
    block_size: int,
    num_blocks: int,
    quantized: bool,
    pad_slot: int,
):
    del kv_in  # aliased: reads/writes go through the output ref
    if quantized:
        (scale_ref, _scales_in, data_out, scales_out, page_buf, spage_buf,
         sems) = rest
    else:
        (data_out, page_buf, sems) = rest
        scale_ref = scales_out = spage_buf = None
    B = kv_ref.shape[0]
    layer = layer_ref[0]

    def page_copies(direction):
        out = []
        for i in range(B):
            slot = slots_ref[i]
            blk = jnp.clip(slot // block_size, 0, num_blocks - 1)
            hbm = data_out.at[layer, blk]
            vmem = page_buf.at[i]
            pair = ([pltpu.make_async_copy(hbm, vmem, sems.at[0])]
                    if direction == 0 else
                    [pltpu.make_async_copy(vmem, hbm, sems.at[0])])
            if quantized:
                shbm = scales_out.at[layer, blk]
                svmem = spage_buf.at[i]
                pair.append(
                    pltpu.make_async_copy(shbm, svmem, sems.at[1])
                    if direction == 0 else
                    pltpu.make_async_copy(svmem, shbm, sems.at[1]))
            out.append((slot, pair))
        return out

    def run(direction):
        copies = page_copies(direction)
        for slot, pair in copies:
            @pl.when(slot != pad_slot)
            def _start(pair=pair):
                for c in pair:
                    c.start()
        for slot, pair in copies:
            @pl.when(slot != pad_slot)
            def _wait(pair=pair):
                for c in pair:
                    c.wait()

    run(0)  # pages in

    # Merge each token's column with a sublane mask (scalar offsets
    # broadcast fine; a batched [B]-major broadcast is an unsupported
    # Mosaic shape cast).
    for i in range(B):
        slot = slots_ref[i]
        off = jax.lax.rem(jnp.minimum(slot, pad_slot - 1),
                          jnp.int32(block_size))
        is_pad = slot == pad_slot
        page = page_buf[i][...]  # [2, KVH, BS, D]
        tok = jax.lax.broadcasted_iota(jnp.int32, page.shape, 2)
        keep = jnp.logical_or(is_pad, tok != off)
        page_buf[i] = jnp.where(keep, page, kv_ref[i][...][:, :, None, :])
        if quantized:
            spage = spage_buf[i][...]  # [SP, TPG(=1), BS, LPG] (one tp group)
            tok = jax.lax.broadcasted_iota(jnp.int32, spage.shape, 2)
            keep = jnp.logical_or(is_pad, tok != off)
            # scale_ref[i]: [SP, TPG, LPG] -> broadcast over the BS axis.
            spage_buf[i] = jnp.where(keep, spage,
                                     scale_ref[i][...][:, :, None, :])

    run(1)  # pages back out


@jax.jit
def pallas_write_kv_tokens(kv_cache, layer, k, v, slot_mapping):
    """Token-granularity paged KV write (decode path).

    kv_cache: KVCache; k, v: [B, KVH, D] (float — quantized here when
    the cache is int8); slot_mapping: [B] i32, PAD_SLOT rows skipped;
    layer: i32 scalar (may be traced — scanned over layers).
    """
    from vllm_tpu.ops.cache import PAD_SLOT, KVCache, _combine_quantize

    data, scales = kv_cache
    _, NB, _, KVH, BS, D = data.shape
    B = k.shape[0]
    quantized = scales is not None
    # [B, C, KVH, D] — C = kv_planes (1 for nibble-packed int4); the
    # kernel's page merge broadcasts over whatever C the payload has.
    kv, kv_scales = _combine_quantize(kv_cache, k, v)

    operands = []
    out_shapes = [jax.ShapeDtypeStruct(data.shape, data.dtype)]
    if quantized:
        operands = [kv_scales, scales]
        out_shapes.append(jax.ShapeDtypeStruct(scales.shape, scales.dtype))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # kv rows
        pl.BlockSpec(memory_space=pl.ANY),  # cache data
    ]
    scratch_shapes = [pltpu.VMEM((B,) + data.shape[2:], data.dtype)]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kv scale rows
            pl.BlockSpec(memory_space=pl.ANY),  # cache scales
        ]
        # Scales are [L, NB, SP, TPG, BS, LPG] (SP = 1 packed K+V lane
        # tile or 2 separate planes — the merge below is generic over
        # SP); the kernel merges one tp group's scale page, so the TPG
        # axis must be local (size 1).
        assert scales.shape[-3] == 1, (
            f"kv-write kernel needs a single-tp-group scale view, got "
            f"{scales.shape} — wrap the call in shard_map for tp>1")
        scratch_shapes.append(
            pltpu.VMEM((B,) + scales.shape[2:], scales.dtype))
    scratch_shapes.append(pltpu.SemaphoreType.DMA((2,)))
    # Alias indices count flattened inputs INCLUDING the scalar-prefetch
    # args: layer=0, slots=1, kv=2, data=3[, kv_scales=4, scales=5].
    aliases = {3: 0}
    if quantized:
        aliases[5] = 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shapes),
        scratch_shapes=scratch_shapes,
    )
    kernel = pl.pallas_call(
        functools.partial(_write_kernel, block_size=BS,
                          num_blocks=NB, quantized=quantized,
                          pad_slot=int(PAD_SLOT)),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        # The page RMW buffers one page per token: B * page_bytes of
        # scratch (16 MB at B=128, block_size 32) — over the ~25 MB
        # default scoped-VMEM ceiling Mosaic applies.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )
    outs = kernel(jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
                  slot_mapping.astype(jnp.int32), kv, data, *operands)
    if quantized:
        return KVCache(outs[0], outs[1])
    return KVCache(outs[0], None)
