"""Pallas TPU kernel: scatter decode-step K/V rows into the paged cache.

Capability parity: /root/reference/csrc/cache_kernels.cu
reshape_and_cache (:142-224) — one thread block per token scattering
its K/V vectors through slot_mapping. XLA has no fast path for this
(scatter runs ~6 us/row; a per-row dynamic-update-slice loop ~4 us/row
≈ 9 ms/step for a 64-row decode on a 32-layer model); here each token
row is ONE async VMEM->HBM copy (~0.2 us to issue), with quantization
done vectorized in XLA before the kernel.

The cache is passed in HBM and aliased to the output, so the copies
mutate it in place. Prefill uses page-granularity writes instead
(ops/cache.py write_kv_pages).
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
    slots_ref,  # [B] i32 (SMEM)
    # inputs
    k_ref,  # [B, KVH, D] VMEM
    v_ref,  # [B, KVH, D] VMEM
    kv_in,  # [L, 2, NB, BS, KVH, D] HBM (aliased to data_out)
    *rest,  # [ks, vs, scales_in,] data_out [, scales_out], sems
    layer: int,
    block_size: int,
    num_blocks: int,
    quantized: bool,
    pad_slot: int,
):
    del kv_in  # aliased: writes go through the output ref
    if quantized:
        k_scale_ref, v_scale_ref, _scales_in, data_out, scales_out, sems = rest
    else:
        (data_out, sems) = rest
        k_scale_ref = v_scale_ref = scales_out = None
    B = k_ref.shape[0]

    copies = []
    for i in range(B):
        slot = slots_ref[i]
        blk = jnp.clip(slot // block_size, 0, num_blocks - 1)
        off = jnp.clip(slot % block_size, 0, block_size - 1)
        copies.append((slot, [
            pltpu.make_async_copy(k_ref.at[i],
                                  data_out.at[layer, 0, blk, off],
                                  sems.at[0]),
            pltpu.make_async_copy(v_ref.at[i],
                                  data_out.at[layer, 1, blk, off],
                                  sems.at[1]),
        ] + ([
            pltpu.make_async_copy(k_scale_ref.at[i],
                                  scales_out.at[layer, 0, blk, off],
                                  sems.at[2]),
            pltpu.make_async_copy(v_scale_ref.at[i],
                                  scales_out.at[layer, 1, blk, off],
                                  sems.at[3]),
        ] if quantized else [])))

    for slot, row_copies in copies:
        @pl.when(slot != pad_slot)
        def _start(row_copies=row_copies):
            for c in row_copies:
                c.start()
    for slot, row_copies in copies:
        @pl.when(slot != pad_slot)
        def _wait(row_copies=row_copies):
            for c in row_copies:
                c.wait()


@functools.partial(jax.jit, static_argnames=("layer",))
def pallas_write_kv_tokens(kv_cache, layer: int, k, v, slot_mapping):
    """Token-granularity paged KV write (decode path).

    kv_cache: KVCache; k, v: [B, KVH, D] (float — quantized here when
    the cache is int8); slot_mapping: [B] i32, PAD_SLOT rows skipped.
    """
    from vllm_tpu.ops.cache import PAD_SLOT, KVCache, quantize_kv, _pad_lanes

    data, scales = kv_cache
    _, _, NB, BS, KVH, D = data.shape
    B = k.shape[0]
    quantized = scales is not None

    operands = []
    out_shapes = [jax.ShapeDtypeStruct(data.shape, data.dtype)]
    if quantized:
        k, k_scale = quantize_kv(k)
        v, v_scale = quantize_kv(v)
        lanes = scales.shape[-1]
        k_scale = _pad_lanes(k_scale, lanes)
        v_scale = _pad_lanes(v_scale, lanes)
        operands = [k_scale, v_scale, scales]
        out_shapes.append(jax.ShapeDtypeStruct(scales.shape, scales.dtype))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # k
        pl.BlockSpec(memory_space=pltpu.VMEM),  # v
        pl.BlockSpec(memory_space=pl.ANY),  # cache data
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_scale
            pl.BlockSpec(memory_space=pl.ANY),  # cache scales
        ]
    # Alias indices count flattened inputs INCLUDING the scalar-prefetch
    # arg: slots=0, k=1, v=2, data=3[, k_scale=4, v_scale=5, scales=6].
    aliases = {3: 0}
    if quantized:
        aliases[6] = 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(out_shapes),
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
    )
    kernel = pl.pallas_call(
        functools.partial(_write_kernel, layer=layer, block_size=BS,
                          num_blocks=NB, quantized=quantized,
                          pad_slot=int(PAD_SLOT)),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=_interpret(),
    )
    outs = kernel(slot_mapping.astype(jnp.int32), k.astype(data.dtype),
                  v.astype(data.dtype), data, *operands)
    if quantized:
        return KVCache(outs[0], outs[1])
    return KVCache(outs[0], None)
