"""Paged KV-cache block operations.

Capability parity: /root/reference/csrc/cache_kernels.cu —
reshape_and_cache (scatter new K/V into the paged layout via
slot_mapping, :142-224), copy_blocks (batched copy-on-write, :52-137),
and swap_blocks (device<->host, :9-47). Re-designed for TPU/XLA:

- The whole KV cache is ONE logical object per engine, a ``KVCache``
  of payload ``[num_layers, num_blocks, 2, num_kv_heads, block_size,
  head_dim]`` plus (when quantized) per-vector scales
  ``[num_layers, num_blocks, 2, block_size, SCALE_LANES]`` (kv head in
  the lane axis). Donated buffers -> every update compiles in place.
  The layout encodes three measured rules:
  * K and V share a page (the ``2`` axis): ONE DMA per page (plus one
    for its scales) — the decode kernel is issue-rate-sensitive, and
    separate K/V/scale fetches quadrupled the DMA count;
  * heads-outside-tokens ([KVH, BS, D]): the decode kernel merges a
    chunk's pages into [KVH, CHUNK, D] as a free shape cast — the
    token-major order needed a real [CHUNK, KVH, D] transpose per
    page chunk that was >half the kernel's time;
  * writes are page-granularity read-modify-writes (decode: a Pallas
    kernel DMAs the page in, lane/sublane-masks the token column in,
    and DMAs it back; prefill: whole-page dynamic-update-slices from
    a once-transposed token batch). XLA's scatter costs ~6 us PER ROW
    on TPU — a 1024-token prefill's writes alone were 400 ms.
- INT8 KV quantization (north star beyond the reference): symmetric
  per-token-per-head scales computed on write (max|x|/127); the decode
  kernel feeds int8 payloads STRAIGHT into the MXU and folds scales
  into the score matrix / softmax weights (payload-sized dequant
  passes made the kernel VPU-bound).
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
    if os.environ.get("VLLM_TPU_FORCE_PALLAS_OPS"):
        return True  # tests: interpret-mode kernels off-TPU
    return jax.default_backend() == "tpu"


# Set by probe_int4_kv_kernels() when the nibble-packed cache trips a
# Mosaic lowering failure on the real backend: int4-KV calls then take
# the numerically-identical XLA paths instead of aborting the step
# compile (int8/bf16 caches are unaffected).
_INT4_KV_BROKEN = [False]


def int4_kv_pallas_ok() -> bool:
    return not _INT4_KV_BROKEN[0]


def _is_lowering_error(exc: Exception) -> bool:
    """True for Mosaic/XLA compile- or run-time failures (the errors
    the int4 probe may legitimately downgrade on); False for Python-
    side bugs (stale asserts, shape errors in wrapper code), which must
    propagate — swallowing those once hid a broken layout migration
    behind a single warning line."""
    if isinstance(exc, NotImplementedError):
        return True  # missing Mosaic lowering rule
    mod = type(exc).__module__ or ""
    return mod.startswith("jax") or mod.startswith("jaxlib")


def probe_int4_kv_kernels() -> bool:
    """Compile-and-run the kv-write + paged-decode kernels once on a
    tiny nibble-packed cache, standalone.

    The int4-KV kernel variants are the newest Mosaic code paths; a
    lowering failure inside the fused step program would abort startup.
    One isolated tiny compile turns that into a logged XLA fallback
    (the bandwidth win is lost, correctness is not). Only backend
    failures (Mosaic/XLA lowering or runtime errors) and numerics
    mismatches downgrade; Python-side exceptions re-raise — those are
    code bugs, not hardware limitations. Returns True if the Pallas
    int4-KV path is live."""
    if not _use_pallas():
        return False
    import numpy as np

    from vllm_tpu.logger import init_logger
    logger = init_logger(__name__)

    def fallback(why: str) -> bool:
        logger.warning(
            "int4 KV Pallas kernels failed their startup probe (%s); "
            "falling back to the XLA paged-KV paths for this process.",
            why)
        _INT4_KV_BROKEN[0] = True
        return False

    from vllm_tpu.ops.attention import _xla_paged_decode_attention
    from vllm_tpu.ops.pallas.kv_write import pallas_write_kv_tokens
    from vllm_tpu.ops.pallas.paged_attention import (
        pallas_paged_decode_attention)
    L, NB, KVH, BS, D, B = 1, 8, 2, 16, 128, 4
    cache = KVCache(
        jnp.zeros((L, NB, 1, KVH, BS, D), jnp.int8),
        jnp.zeros(kv_scales_shape(L, KVH, NB, BS), SCALE_DTYPE))
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((B, KVH, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, KVH, D)), jnp.bfloat16)
    slots = jnp.asarray([0, BS, 2 * BS, 3 * BS], jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, KVH, D)), jnp.bfloat16)
    tables = jnp.arange(B * 2, dtype=jnp.int32).reshape(B, 2)
    ctx = jnp.ones((B,), jnp.int32)
    try:
        written = pallas_write_kv_tokens(cache, 0, k, v, slots)
        got = np.asarray(
            pallas_paged_decode_attention(q, written, 0, tables, ctx, 1.0),
            np.float32)
    except Exception as exc:
        if _is_lowering_error(exc):
            return fallback(f"{type(exc).__name__}: {exc}")
        raise
    # Reference: the same tokens through the XLA write + attention
    # fallbacks (identical quantization; only the accumulation
    # order differs). A mismatch here means the backend miscompiled
    # the kernels — downgrade with a distinct message.
    ref_c = _xla_write_kv(cache, 0, k, v, slots)
    want = np.asarray(
        _xla_paged_decode_attention(q, ref_c, 0, tables, ctx, 1.0),
        np.float32)
    try:
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    except AssertionError as exc:
        return fallback(f"numerics mismatch vs XLA reference: {exc}")
    return True


# Out-of-bounds sentinel for padded index slots (writes become no-ops).
PAD_SLOT = jnp.iinfo(jnp.int32).max

# Mosaic requires HBM DMA slices to end on a 128-lane-aligned axis, so
# the CACHE stores head_dim padded up to 128 lanes (zeros) for models
# with head_dim 64/96 (OPT, GPT-2, GPT-NeoX) — without it the page
# DMAs fail to compile on real TPUs. Zero lanes are exact: they add 0
# to every QK dot and produce 0 output lanes that the attention
# wrappers slice away. head_dim==128 models pay nothing.
LANES = 128


def padded_head_dim(head_dim: int) -> int:
    return head_dim + (-head_dim) % LANES


def pad_head(x: jnp.ndarray, target: int) -> jnp.ndarray:
    """Zero-pad the trailing (head_dim) axis up to ``target`` lanes."""
    pad = target - x.shape[-1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))

# Symmetric int8 range.
_INT8_MAX = 127.0
# Symmetric int4 range ([-7, 7]; matches the int4 weight codes).
_INT4_MAX = 7.0

# The scales' kv-head axis pads to a full 128-lane tile: Mosaic
# requires HBM DMA slices to be lane-aligned, and [CHUNK, lanes]
# reshapes stay free shape casts in the decode kernel. Under tensor
# parallelism the trailing axes are a [TPG, SCALE_LANES] pair sharded
# on TPG (one full lane tile PER shard — see kv_scales_shape), so each
# shard's local scale page keeps ITS kv heads in the first kvh/tp
# lanes — the head axis of the payload and the lane group of the
# scales shard on the SAME mesh axis.
SCALE_LANES = 128

# Packed K+V scale tiles: when a shard's kv heads fit in half a lane
# tile (kvh/tp <= 64 — true for every supported model family at 7B to
# 65B scale), K and V scales share ONE [BS, 128] tile per page: K in
# lanes [0, kvh_g), V in lanes [V_SCALE_LANE, V_SCALE_LANE + kvh_g).
# This halves scale-page HBM (an int4-KV block drops from 11.1% to
# 5.9% scale overhead -> ~+5.9% blocks per chip) and halves the scale
# bytes each decode chunk DMAs. Caches with kvh_g > 64 keep the
# two-plane layout; both are detected by scales.shape[-4] (1 = packed,
# 2 = separate K/V planes).
V_SCALE_LANE = SCALE_LANES // 2

# Scales store as bf16: the lane padding above makes scale pages 12.5%
# of the int8 payload's HBM (most of it dead lanes — packing them is
# blocked by Mosaic's 128-lane whole-page DMA alignment), so halving
# the element size buys back ~6% of KV HBM (~+100 blocks on 7B) for a
# bounded cost: dequant multiplies upcast to f32 in the kernels, and a
# bf16 scale is exact to 8 mantissa bits — under half the int8
# payload's own 1/254 quantization step. (Measured Δppl on the eval
# harness: see README quality gate.)
SCALE_DTYPE = jnp.bfloat16


class KVCache(NamedTuple):
    """The engine's paged KV state (a single donated pytree).

    data: [L, NB, 2, KVH, BS, D] payload (bf16/f32, or int8 quantized);
        index 0 of the ``2`` axis is K, 1 is V. INT4 caches collapse
        that axis to 1 ([L, NB, 1, KVH, BS, D] int8): each byte packs
        the token's K code in its LOW nibble and its V code in the HIGH
        nibble, so a page keeps the full 128-lane tile (Mosaic DMA
        alignment rules out packing along head_dim) and every shape,
        sharding spec, swap slice and copy below stays axis-compatible
        with the int8 layout. Detection is by that axis
        (``kv_planes``), never by dtype — both store int8.
    scales: [L, NB, SP, TPG, BS, SCALE_LANES] per-vector dequant
        scales (SCALE_DTYPE = bf16), or None. SP = scale planes: 1
        when the shard's kv heads fit half a lane tile (K scales in
        lanes [0, kvh_g), V at [V_SCALE_LANE, ...) of ONE shared tile
        — half the scale HBM and DMA bytes), else 2 separate K/V
        planes. K and V always scale independently; int4 payload
        packing does not change SP. TPG = tensor-parallel group
        count; group g holds the scales for kv heads
        [g*KVH/TPG, (g+1)*KVH/TPG) in its first KVH/TPG lanes of a
        full 128-lane tile (see kv_scales_shape for why every group
        stays lane-tile-sized). TPG sits OUTSIDE the trailing
        [BS, SCALE_LANES] pair so the tiled (sublane, lane) dims are
        always (block_size, 128) — a TPG-sized (usually 1) sublane
        axis under bf16's (2, 128) tiling is un-sliceable in Mosaic
        ("Slice shape along dimension 4 must be aligned to tiling
        (2)", measured on v5e).
    """
    data: jnp.ndarray
    scales: Optional[jnp.ndarray]

    @property
    def quantized(self) -> bool:
        return self.scales is not None

    @property
    def kv_planes(self) -> int:
        """2 = separate K/V planes (bf16/f32/int8); 1 = nibble-packed
        int4 (K low, V high)."""
        return self.data.shape[2]


def quantize_kv(x: jnp.ndarray,
                scale_dtype=jnp.float32,
                qmax: float = _INT8_MAX
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-vector quantization over the trailing D axis
    (qmax=127 -> int8 codes; qmax=7 -> int4 codes in an int8 carrier).

    Returns (int8 values, scales with D dropped). The scale is rounded
    to ``scale_dtype`` BEFORE quantizing, so the codes are optimal
    for the scale that actually gets stored (quantize-then-round would
    compound both errors)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / qmax, 1e-10).astype(scale_dtype)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) /
                  scale[..., None].astype(jnp.float32)),
        -qmax, qmax).astype(jnp.int8)
    return q, scale


def pack_kv_int4(k_codes: jnp.ndarray, v_codes: jnp.ndarray) -> jnp.ndarray:
    """Pack per-token K/V int4 codes (int8 carriers in [-7, 7]) into
    one byte each: K+8 (unsigned, [1, 15]) in the low nibble, V in the
    high nibble.

    The bias makes the byte read as signed int8 EXACTLY 16*v + (k+8),
    which the decode kernel exploits to skip nibble sign-extension:
    one bitwise AND recovers the K codes (biased; corrected by a
    per-sequence scalar), and V never unpacks at all — the raw bytes
    feed the MXU and the kernel subtracts the low-nibble contribution
    with a second dot (ops/pallas/paged_attention.py)."""
    return jnp.bitwise_or(jnp.bitwise_and(k_codes + 8, 0xF),
                          jnp.left_shift(v_codes, 4)).astype(jnp.int8)


def unpack_kv_int4(packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of pack_kv_int4 -> (k_codes, v_codes) as int8."""
    p = packed.astype(jnp.int32)
    k = (jnp.bitwise_and(p, 0xF) - 8).astype(jnp.int8)
    v = jnp.right_shift(p, 4).astype(jnp.int8)  # arithmetic: floors to v
    return k, v


def _combine_quantize(kv_cache: KVCache, k: jnp.ndarray, v: jnp.ndarray):
    """Stack K/V rows into page-order ([T, C, KVH, D], C = the cache's
    kv_planes) and quantize if the cache is int8/int4. Returns
    (payload [T, C, KVH, D], scales [T, SP, TPG, LPG] | None) — head
    h's scale goes to group h // (KVH/TPG), local lane h % (KVH/TPG),
    matching the cache's tp-grouped scale layout. SP mirrors the
    cache's scale-plane count: 2 = separate K/V rows, 1 = K and V
    packed into one lane tile (V at lane offset V_SCALE_LANE)."""
    data, scales = kv_cache
    kv = jnp.stack([k, v], axis=1)  # [T, 2, KVH, D]
    if scales is None:
        return kv.astype(data.dtype), None
    int4 = kv_cache.kv_planes == 1
    q, s = quantize_kv(kv, scale_dtype=scales.dtype,
                       qmax=_INT4_MAX if int4 else _INT8_MAX)
    if int4:  # [T, 2, KVH, D] codes -> [T, 1, KVH, D] packed bytes
        q = pack_kv_int4(q[:, 0], q[:, 1])[:, None]
    tpg, lpg = scales.shape[-3], scales.shape[-1]
    kvh = s.shape[-1]
    kvh_g = kvh // tpg
    s = s.reshape(s.shape[0], 2, tpg, kvh_g)
    if scales.shape[2] == 1:
        # Packed tile: K scales in lanes [0, kvh_g), V scales at
        # [V_SCALE_LANE, V_SCALE_LANE + kvh_g) — disjoint zero-padded
        # halves, so a single add merges them.
        sk = jnp.pad(s[:, 0], ((0, 0), (0, 0), (0, lpg - kvh_g)))
        sv = jnp.pad(s[:, 1], ((0, 0), (0, 0),
                               (V_SCALE_LANE, lpg - V_SCALE_LANE - kvh_g)))
        return q, (sk + sv)[:, None]
    s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, lpg - kvh_g)))
    return q, s


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

    Tokens written in one call must target DISTINCT blocks (true for
    decode steps: every running sequence owns its tail block) — the
    page read-modify-write would race otherwise. PAD rows are no-ops.
    """
    Dp = kv_cache.data.shape[-1]
    if k.shape[-1] != Dp:
        k = pad_head(k, Dp)
        v = pad_head(v, Dp)
    if _use_pallas() and (kv_cache.kv_planes == 2 or int4_kv_pallas_ok()):
        from vllm_tpu.ops.pallas.kv_write import pallas_write_kv_tokens
        from vllm_tpu.parallel.mesh import current_tp_mesh
        mesh = current_tp_mesh()
        if mesh is None:
            return pallas_write_kv_tokens(kv_cache, layer, k, v,
                                          slot_mapping)
        # Tensor parallel: each shard RMWs its own kv-head slice of the
        # written pages (and its scale group); slot ids replicate.
        from jax.sharding import PartitionSpec as P

        from vllm_tpu.ops.attention import shard_map_tp
        from vllm_tpu.parallel.mesh import KV_CACHE_SPEC, KV_SCALES_SPEC
        head = P(None, "model", None)
        if kv_cache.scales is None:
            fn = shard_map_tp(
                lambda d, k, v, s: tuple(
                    pallas_write_kv_tokens(KVCache(d, None), layer, k, v,
                                           s))[:1],
                mesh, (KV_CACHE_SPEC, head, head, P(None)),
                (KV_CACHE_SPEC,))
            (data,) = fn(kv_cache.data, k, v, slot_mapping)
            return KVCache(data, None)
        fn = shard_map_tp(
            lambda d, sc, k, v, s: tuple(
                pallas_write_kv_tokens(KVCache(d, sc), layer, k, v, s)),
            mesh, (KV_CACHE_SPEC, KV_SCALES_SPEC, head, head, P(None)),
            (KV_CACHE_SPEC, KV_SCALES_SPEC))
        data, scales = fn(kv_cache.data, kv_cache.scales, k, v,
                          slot_mapping)
        return KVCache(data, scales)
    return _xla_write_kv(kv_cache, layer, k, v, slot_mapping)


def _xla_write_kv(
    kv_cache: KVCache,
    layer: int,
    k: jnp.ndarray,
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,
) -> KVCache:
    """write_kv's XLA body (fallback path; also the reference the
    int4-KV probe compares the Pallas kernel against — callable
    directly, so the probe never has to steer dispatch through global
    state)."""
    data, scales = kv_cache
    num_blocks, _, kvh, block_size, d = data.shape[1:]
    block_ids = jnp.clip(slot_mapping // block_size, 0, num_blocks - 1)
    offsets = jnp.clip(slot_mapping % block_size, 0, block_size - 1)
    pad = slot_mapping == PAD_SLOT
    kv, kv_scales = _combine_quantize(kv_cache, k, v)

    # Page-granularity read-modify-write per token: load the page,
    # lane/sublane-mask the token's column in, store the page back
    # (one full-window dynamic-update-slice; XLA's scatter and
    # column-strided updates are orders of magnitude slower).
    def body(i, carry):
        data, scales = carry
        idx = (layer, block_ids[i], 0, 0, 0, 0)
        page = jax.lax.dynamic_slice(data, idx, (1, 1) + data.shape[2:])
        tok = jax.lax.broadcasted_iota(jnp.int32, page.shape, 4)
        keep = jnp.logical_or(pad[i], tok != offsets[i])
        page = jnp.where(keep, page, kv[i][None, None, :, :, None, :])
        data = jax.lax.dynamic_update_slice(data, page, idx)
        if scales is not None:
            sidx = (layer, block_ids[i], 0, 0, 0, 0)
            spage = jax.lax.dynamic_slice(scales, sidx,
                                          (1, 1) + scales.shape[2:])
            tok = jax.lax.broadcasted_iota(jnp.int32, spage.shape, 4)
            keep = jnp.logical_or(pad[i], tok != offsets[i])
            spage = jnp.where(keep, spage,
                              kv_scales[i][None, None, :, :, None, :])
            scales = jax.lax.dynamic_update_slice(scales, spage, sidx)
        return data, scales

    data, scales = jax.lax.fori_loop(0, k.shape[0], body, (data, scales))
    return KVCache(data, scales)


def write_kv_pages(
    kv_cache: KVCache,
    layer: int,
    k: jnp.ndarray,
    v: jnp.ndarray,
    page_src: jnp.ndarray,
    page_dst: jnp.ndarray,
) -> KVCache:
    """Page-granularity prefill writes: packed prompts fill their pages
    contiguously from offset 0, so page i copies tokens
    ``[page_src[i] : page_src[i]+BS]`` into block ``page_dst[i]`` as
    ONE dynamic-update-slice. The token batch is transposed to page
    order ([2, KVH, T, D]) once up front, so per-page work is a slice +
    DUS. A partial tail page writes whatever follows it in the packed
    batch into its own (exclusively owned) block — those slots are
    masked by context_len and overwritten by later decode steps.
    Entries with ``page_dst < 0`` are padding (write-back no-op).

    k, v: [T, KVH, D]; page_src/page_dst: [NP] i32.
    """
    data, scales = kv_cache
    if k.shape[-1] != data.shape[-1]:
        k = pad_head(k, data.shape[-1])
        v = pad_head(v, data.shape[-1])
    num_blocks = data.shape[1]
    block_size = data.shape[4]
    num_tokens = k.shape[0]
    kv, kv_scales = _combine_quantize(kv_cache, k, v)
    # One page of zero slack so a tail page at the very end of the
    # packed batch still reads at its own offset alignment; then to
    # page order: [2, KVH, T+BS, D] / [2, T+BS, SCALE_LANES].
    kv = jnp.pad(kv, ((0, block_size),) + ((0, 0),) * 3)
    kv_t = kv.transpose(1, 2, 0, 3)
    if kv_scales is not None:
        # [T, 2, TPG, LPG] -> zero-slack pad -> page order [2, TPG, T+BS, LPG]
        kv_scales = jnp.pad(kv_scales, ((0, block_size),) + ((0, 0),) * 3)
        scales_t = kv_scales.transpose(1, 2, 0, 3)

    def body(i, carry):
        data, scales = carry
        invalid = page_dst[i] < 0
        blk = jnp.clip(page_dst[i], 0, num_blocks - 1)
        src = jnp.clip(page_src[i], 0, num_tokens)
        page = jax.lax.dynamic_slice_in_dim(kv_t, src, block_size, 2)
        idx = (layer, blk, 0, 0, 0, 0)
        cur = jax.lax.dynamic_slice(data, idx, (1, 1) + data.shape[2:])
        upd = jnp.where(invalid, cur, page[None, None])
        data = jax.lax.dynamic_update_slice(data, upd, idx)
        if scales is not None:
            spage = jax.lax.dynamic_slice_in_dim(scales_t, src, block_size,
                                                 2)
            sidx = (layer, blk, 0, 0, 0, 0)
            cur = jax.lax.dynamic_slice(scales, sidx,
                                        (1, 1) + scales.shape[2:])
            upd = jnp.where(invalid, cur, spage[None, None])
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
    src = jnp.minimum(src_blocks, data.shape[1] - 1)
    data = data.at[:, dst_blocks].set(data[:, src], mode="drop")
    if scales is not None:
        scales = scales.at[:, dst_blocks].set(scales[:, src], mode="drop")
    return KVCache(data, scales)


def gather_blocks(kv_cache: KVCache, block_ids: jnp.ndarray) -> KVCache:
    """Pull blocks out for swap-out: payload [L, P, 2, KVH, BS, D]
    (+scales [L, P, 2, TPG, BS, SCALE_LANES])."""
    data, scales = kv_cache
    return KVCache(data[:, block_ids],
                   None if scales is None else scales[:, block_ids])


def scatter_blocks(
    kv_cache: KVCache,
    block_ids: jnp.ndarray,
    blocks: KVCache,
) -> KVCache:
    """Push swapped-in blocks back: blocks as from gather_blocks."""
    data, scales = kv_cache
    data = data.at[:, block_ids].set(blocks.data.astype(data.dtype),
                                     mode="drop")
    if scales is not None:
        scales = scales.at[:, block_ids].set(blocks.scales, mode="drop")
    return KVCache(data, scales)


def pack_scale_pages(per_head):
    """Lay [L, NB, 2, KVH, BS] per-head K/V scales out in the cache's
    scale-page layout (kv_scales_shape, tp=1) — the single place tests
    and tools encode the packed-vs-two-plane lane layout."""
    import numpy as np
    L, NB, _, KVH, BS = per_head.shape
    page = np.zeros(kv_scales_shape(L, KVH, NB, BS), per_head.dtype)
    rows = np.swapaxes(per_head, -1, -2)  # [L, NB, 2, BS, KVH]
    if page.shape[2] == 1:  # packed: K lanes [0:KVH], V at V_SCALE_LANE
        page[:, :, 0, 0, :, :KVH] = rows[:, :, 0]
        page[:, :, 0, 0, :, V_SCALE_LANE:V_SCALE_LANE + KVH] = rows[:, :, 1]
    else:
        page[..., 0, :, :KVH] = rows
    return page


def dequantize_pages(data: jnp.ndarray,
                     scales: Optional[jnp.ndarray]) -> jnp.ndarray:
    """[..., C, KVH, BS, D] pages (C=2 bf16/f32/int8, C=1 packed int4)
    + [..., SP, TPG, BS, LPG] scales (SP=2 separate K/V planes, SP=1
    K+V packed into one lane tile) -> f32 with C=2 (testing / XLA
    fallback path; the Pallas kernels fuse this into attention)."""
    if data.shape[-4] == 1:  # int4: unpack K/V nibbles back to 2 planes
        kc, vc = unpack_kv_int4(data[..., 0, :, :, :])
        data = jnp.stack([kc, vc], axis=-4)
    x = data.astype(jnp.float32)
    if scales is None:
        return x
    kvh = data.shape[-3]
    tpg = scales.shape[-3]
    kvh_g = kvh // tpg
    s = scales.astype(jnp.float32)
    if scales.shape[-4] == 1:  # packed: split the lane tile back out
        s = jnp.concatenate(
            [s[..., :kvh_g],
             s[..., V_SCALE_LANE:V_SCALE_LANE + kvh_g]], axis=-4)
    else:
        # [..., 2, TPG, BS, LPG] -> each group's first KVH/TPG lanes
        s = s[..., :kvh_g]
    # -> [..., 2, TPG, KVH/TPG, BS] -> [..., 2, KVH, BS]
    s = jnp.swapaxes(s, -1, -2)  # [..., 2, TPG, LPGslice, BS]
    s = s.reshape(s.shape[:-3] + (kvh, s.shape[-1]))
    return x * s[..., None]


def kv_cache_shape(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
    head_dim: int,
    kv_planes: int = 2,
) -> Tuple[int, int, int, int, int, int]:
    """kv_planes: 2 = separate K/V planes; 1 = nibble-packed int4."""
    return (num_layers, num_blocks, kv_planes, num_kv_heads, block_size,
            head_dim)


def kv_scales_shape(
    num_layers: int,
    num_kv_heads: int,
    num_blocks: int,
    block_size: int,
    tp: int = 1,
) -> Tuple[int, int, int, int, int, int]:
    """TPG axis OUTSIDE the trailing [block_size, SCALE_LANES] pair:
    TPG shards with the payload's head axis; each group's first
    KVH/TPG lanes are live.

    The K/V axis (position 2) is 1 when the shard's kv heads fit half
    a lane tile (kvh/tp <= V_SCALE_LANE): K and V scales then share a
    single [BS, SCALE_LANES] tile per page (K at lanes [0, kvh_g), V
    at [V_SCALE_LANE, V_SCALE_LANE + kvh_g)) — half the scale HBM and
    half the per-chunk scale DMA bytes. Larger head counts keep the
    two-plane layout.

    Every group is a FULL 128-lane tile even under tensor parallelism:
    Mosaic requires whole-page HBM DMAs to end on a 128-lane-aligned
    axis (measured: a 32-lane scale-page copy fails to compile —
    "Slice shape along dimension 5 must be aligned to tiling (128)"),
    and each shard's local scale view is its single [.., 1, BS, lanes]
    group. A packed [TPG, 128/TPG] layout (TP-invariant total HBM)
    would hand tp=8 shards 16-lane pages — exactly the un-compilable
    pattern. Cost: per-shard scale HBM under TP matches the single-chip
    layout instead of shrinking with 1/tp; single-chip (the
    capacity-bound case) is unchanged.

    TPG must not sit between block_size and the lanes: that makes it
    the tiled SUBLANE dim, and a size-1 sublane axis under bf16's
    (2, 128) tiling cannot be memref-sliced ("Slice shape along
    dimension 4 must be aligned to tiling (2)", measured on v5e —
    the tiling packs sublane PAIRS for 16-bit types). With TPG at
    axis 3 the tiled pair is always (block_size, 128): aligned for
    every dtype."""
    assert num_kv_heads // tp <= SCALE_LANES, (
        f"kv heads per shard ({num_kv_heads}/{tp}) exceed scale lanes "
        f"per group ({SCALE_LANES})")
    planes = 1 if num_kv_heads // tp <= V_SCALE_LANE else 2
    return (num_layers, num_blocks, planes, tp, block_size, SCALE_LANES)
