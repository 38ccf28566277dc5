"""Pallas TPU kernel: paged decode attention (+fused INT8 KV dequant).

Capability parity: /root/reference/csrc/attention/attention_kernels.cu
(single_query_cached_kv_attention) — one query token per sequence
attending over KV pages scattered in HBM through a block table, fp32
softmax/accumulation. The CUDA kernel maps (head, seq) to thread
blocks with shared-memory logits (attention_kernels.cu:66-91).

TPU design notes (what made this fast):
- Cache layout [L, NB, 2, KVH, BS, D]: a page is contiguous across K,
  V, and ALL kv heads, so ONE DMA per page (plus one for its scales)
  fetches everything, and heads-outside-tokens makes the chunk
  assembly [KVH, CHUNK, D] a FREE shape cast — a token-major page
  needed a real transpose per chunk that was >half the kernel time
  (see ops/cache.py for the full layout rationale).
- Pages stream HBM->VMEM in chunks through a double-buffered pipeline
  that prefetches ACROSS grid steps: while sequence b's last chunk
  computes, sequence b+1's first chunk is already in flight (buffer
  parity and a first-touch flag live in SMEM, the jax
  paged_attention_kernel pattern) — no pipeline drain at sequence
  boundaries.
- Scores run on the MXU as one kv-head-batched dot per chunk
  ([KVH, G, D] x [KVH, CHUNK, D] -> [KVH, G, CHUNK]); an earlier
  VPU-broadcast formulation (elementwise q*k + lane reduction) was
  ~50 us per (sequence, layer) of pure vector work and capped decode
  at ~47 GB/s of KV bandwidth.
- INT8 KV: per-token-per-head dequant scales fold into the score
  matrix (q.k_int8 * k_scale) and the softmax weights (p * v_scale) —
  per-token scalar multiplies instead of rescaling payloads. int8
  values convert losslessly to bf16 for the MXU (8-bit mantissa).
- Block tables / context lengths ride in via scalar prefetch so DMA
  addresses are known ahead of compute.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.ops.cache import KVCache, V_SCALE_LANE

_NEG_INF = -1e30
_PAGES_PER_CHUNK = 16  # pages fetched + processed per pipeline stage
_PAGES_PER_CHUNK_INT4 = 8  # nibble-packed pages are half the bytes


def _pages_per_chunk(packed: bool = False) -> int:
    """Pipeline chunk size in pages, env-tunable for on-hardware
    sweeps (VLLM_TPU_PAGES_PER_CHUNK). The tradeoff is real on both
    sides: a sequence's final chunk fetches and masks ~chunk/2 wasted
    tokens on average (pure HBM-bandwidth loss at serving context
    lengths), while smaller chunks issue more DMAs per sequence and
    the kernel is issue-rate-sensitive. 16 pages (256 tokens at
    block_size 16) measured best in round 1 on int8 pages; int4
    halves the per-page bytes and the measured optimum moved to 8
    (b128 int4-KV bench: ppc8 2186 / ppc16 2076 / ppc32 1903 tok/s).

    Read at TRACE time: set the var before the engine builds — a
    mid-process change cannot affect already-compiled programs."""
    raw = os.environ.get("VLLM_TPU_PAGES_PER_CHUNK")
    if raw is None:
        return _PAGES_PER_CHUNK_INT4 if packed else _PAGES_PER_CHUNK
    try:
        pages = int(raw)
    except ValueError:
        raise ValueError(
            f"VLLM_TPU_PAGES_PER_CHUNK={raw!r} is not an integer") from None
    if pages < 1:
        raise ValueError(
            f"VLLM_TPU_PAGES_PER_CHUNK must be >= 1, got {pages}")
    return pages


def _interpret() -> bool:
    return bool(os.environ.get("VLLM_TPU_INTERPRET"))


def _decode_kernel(
    # scalar prefetch
    layer_ref,  # [1] i32 (SMEM) — traced so one program serves the
    #             lax.scan over layers (static layer unrolled 32
    #             programs and made tracing/lowering dominate startup)
    block_tables_ref,  # [B, MB] i32 (SMEM)
    context_lens_ref,  # [B] i32 (SMEM)
    buffer_index_ref,  # [1] i32 (SMEM, mutable pipeline state)
    init_flag_ref,  # [1] i32 (SMEM)
    # inputs
    q_ref,  # [1, KVH, G, D] VMEM block for this sequence
    kv_hbm,  # [L, NB, 2, KVH, BS, D] full cache in HBM/ANY
    *rest,  # (scales_hbm,) o_ref, kv_buf, sems (, s_buf, s_sems)
    scale: float,
    block_size: int,
    pages: int,
    quantized: bool,
    packed: bool,
):
    if quantized:
        (scales_hbm, o_ref, kv_buf, sems, s_buf, s_sems) = rest
    else:
        (o_ref, kv_buf, sems) = rest
        scales_hbm = s_buf = s_sems = None

    b = pl.program_id(0)
    B = pl.num_programs(0)
    layer = layer_ref[0]
    mb = block_tables_ref.shape[1]
    chunk_tokens = pages * block_size
    ctx = context_lens_ref[b]
    num_chunks = pl.cdiv(ctx, chunk_tokens)

    def chunks_of(bb):
        return pl.cdiv(context_lens_ref[bb], chunk_tokens)

    def copies(bb, i, slot):
        """Per-page async copies of chunk i of sequence bb (shared
        semaphore; tail pages clamp to a valid table entry and are
        masked in compute). One combined K+V payload copy per page,
        plus one scale copy when quantized."""
        out = []
        for j in range(pages):
            page = block_tables_ref[bb,
                                    jnp.minimum(i * pages + j, mb - 1)]
            out.append(
                pltpu.make_async_copy(kv_hbm.at[layer, page],
                                      kv_buf.at[slot, j], sems.at[slot]))
            if quantized:
                out.append(
                    pltpu.make_async_copy(scales_hbm.at[layer, page],
                                          s_buf.at[slot, j],
                                          s_sems.at[slot]))
        return out

    def start_chunk(bb, i, slot):
        for c in copies(bb, i, slot):
            c.start()

    def wait_chunk(bb, i, slot):
        for c in copies(bb, i, slot):
            c.wait()

    def next_index(i):
        """Index of the chunk after (b, i): (b, i+1), or the first
        chunk of the next sequence with work."""

        def advance_b():
            next_b = jax.lax.while_loop(
                lambda bb: jnp.logical_and(bb < B, chunks_of(
                    jax.lax.clamp(0, bb, B - 1)) == 0), lambda bb: bb + 1,
                b + 1)
            return next_b, jnp.int32(0)

        return jax.lax.cond(i + 1 < num_chunks, lambda: (b, i + 1),
                            advance_b)

    @pl.when(num_chunks > 0)
    def _run():
        @pl.when(init_flag_ref[0] == 1)
        def _first_touch():
            init_flag_ref[0] = 0
            start_chunk(b, 0, buffer_index_ref[0])

        kvh, g, d = q_ref.shape[1:]
        q = q_ref[0].astype(jnp.float32) * scale  # [KVH, G, D]
        # MXU inputs: bf16 on the serving path (q is bf16; int8 KV
        # converts to bf16 exactly — 8 mantissa bits); full f32 when
        # the caller computes in f32 (tests, f32 caches).
        mxu_dtype = (jnp.float32 if (q_ref.dtype == jnp.float32
                                     or kv_hbm.dtype == jnp.float32) else
                     jnp.bfloat16)
        qm = q.astype(mxu_dtype)
        if packed:
            # The biased K nibble (k+8, see ops/cache.py pack_kv_int4)
            # shifts every raw QK score by 8*sum_d(q); precompute the
            # correction once per sequence.
            qsum8 = 8.0 * jnp.sum(q, axis=-1)  # [KVH, G] f32

        def body(i, carry):
            m, l, acc = carry  # [KVH, G], [KVH, G], [KVH, G, D]
            slot = buffer_index_ref[0]
            nb, ni = next_index(i)

            @pl.when(nb < B)
            def _prefetch():
                start_chunk(nb, ni, 1 - slot)

            buffer_index_ref[0] = 1 - slot
            wait_chunk(b, i, slot)

            # Dequantize in the page buffer's own layout (the scale
            # page broadcasts straight along lanes). ``[...]`` forces a
            # full VALUE load — slicing a transformed ref with integer
            # indices falls into an unsupported gather path on Mosaic.
            kvb = kv_buf[slot][...]  # [P, C, KVH, BS, D]
            # lax.index_in_dim: jnp's mixed int/slice indexing lowers
            # through a gather Mosaic doesn't support.
            if packed:
                # INT4: one plane, byte = 16*v + (k+8). The biased-low
                # packing (ops/cache.py pack_kv_int4) means V NEVER
                # unpacks: the raw bytes feed the MXU directly and a
                # second dot against the low-nibble codes subtracts
                # their contribution. K needs ONE bitwise AND. The
                # previous sign-extending unpack (int32 widen + 3
                # shifts per byte) was VPU work of ~the same cost as
                # the halved page DMA it was supposed to save — int4
                # measured ~4% SLOWER than int8 at equal concurrency.
                praw = jax.lax.index_in_dim(kvb, 0, axis=1, keepdims=False)
                kb = jnp.bitwise_and(praw, 15)  # int8, = k + 8
                vb = praw
            else:
                kb = jax.lax.index_in_dim(kvb, 0, axis=1, keepdims=False)
                vb = jax.lax.index_in_dim(kvb, 1, axis=1, keepdims=False)
            if not quantized:
                kb = kb.astype(mxu_dtype)
                vb = vb.astype(mxu_dtype)
            # [P, KVH, BS, D] -> [KVH, CHUNK, D]: an outer-dims swap +
            # sublane-tile merge, i.e. a free shape cast (token-major
            # pages needed a real transpose here — >half the kernel
            # time). INT8 payloads go STRAIGHT into the MXU (conversion
            # fuses into the dot); their per-token scales fold into the
            # score matrix / softmax weights — payload-sized dequant
            # passes made the kernel VPU-bound.
            k = kb.swapaxes(0, 1).reshape(kvh, chunk_tokens, d)
            v = vb.swapaxes(0, 1).reshape(kvh, chunk_tokens, d)
            if quantized:
                sb = s_buf[slot][...]  # [P, SP, TPG(=1), BS, LPG]
                packed_scales = sb.shape[1] == 1

                def chunk_scales(which):
                    # Pick K or V — a plane for the 2-plane layout, a
                    # lane offset (0 / V_SCALE_LANE) for the packed
                    # tile — then THIS shard's (only) tp group:
                    # [P, SP, TPG, BS, LPG] -> [P, BS, LPG] -> flatten
                    # pages into tokens -> the kv heads' lanes ->
                    # [KVH, CHUNK] (small-array transposes; the
                    # payload stays put).
                    s = jax.lax.index_in_dim(
                        sb, 0 if packed_scales else which, axis=1,
                        keepdims=False)
                    s = jax.lax.index_in_dim(s, 0, axis=1, keepdims=False)
                    off = which * V_SCALE_LANE if packed_scales else 0
                    s = jax.lax.slice_in_dim(
                        s.reshape(chunk_tokens, sb.shape[-1]), off,
                        off + kvh, axis=1)
                    return s.swapaxes(0, 1).astype(jnp.float32)

                sck = chunk_scales(0)
                scv = chunk_scales(1)
                if packed:
                    # The V "codes" are raw bytes = 16*v + u; folding
                    # 1/16 into the V scales makes pw @ bytes - pw @ u
                    # come out in true dequantized units.
                    scv = scv * 0.0625
            s = jax.lax.dot_general(
                qm, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [KVH, G, CHUNK]
            if packed:
                s = s - qsum8[..., None]  # de-bias: q @ (k+8) -> q @ k
            if quantized:
                s = s * sck[:, None, :]
            pos = i * chunk_tokens + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 2)
            s = jnp.where(pos < ctx, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1))  # [KVH, G]
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1)
            if quantized:
                p = p * scv[:, None, :]
            pm = p.astype(mxu_dtype)
            pv = jax.lax.dot_general(
                pm, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # [KVH, G, D]
            if packed:
                # Subtract the low-nibble (biased K) contribution from
                # the raw-byte dot: pw @ (16*v + u) - pw @ u = 16*pw@v,
                # and scv carries the 1/16. One extra MXU dot in a
                # DMA-bound kernel beats a per-byte VPU unpack.
                pv = pv - jax.lax.dot_general(
                    pm, k, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            acc_new = acc * corr[..., None] + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((kvh, g), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((kvh, g), jnp.float32)
        acc0 = jnp.zeros((kvh, g, d), jnp.float32)
        _, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-9)[..., None]).astype(o_ref.dtype)

    # Pad rows (ctx == 0) never run; keep their output finite.
    @pl.when(num_chunks == 0)
    def _pad_row():
        o_ref[0] = jnp.zeros_like(o_ref[0])


@functools.partial(jax.jit, static_argnames=("scale",))
def pallas_paged_decode_attention(
    q: jnp.ndarray,  # [B, H, D]
    kv_cache: KVCache,  # payload [L, NB, 2, KVH, BS, D] (+scales)
    layer,  # i32 scalar (may be traced — scanned over layers)
    block_tables: jnp.ndarray,  # [B, MB] i32
    context_lens: jnp.ndarray,  # [B] i32
    scale: float,
) -> jnp.ndarray:
    B, H, D = q.shape
    data, scales = kv_cache
    _, NB, C, KVH, BS, _ = data.shape
    G = H // KVH
    quantized = scales is not None
    packed = C == 1  # int4: K/V nibble-packed into one plane

    q_grouped = q.reshape(B, KVH, G, D)
    pages = min(_pages_per_chunk(packed), block_tables.shape[1])

    in_specs = [
        pl.BlockSpec((1, KVH, G, D), lambda b, *_: (b, 0, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch_shapes = [
        pltpu.VMEM((2, pages) + data.shape[2:], data.dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    operands = [q_grouped, data]
    if quantized:
        # Scales are [L, NB, SP, TPG, BS, LPG] (SP = 1 packed K+V lane
        # tile or 2 separate planes); the kernel sees ONE tp
        # group of that layout (TPG axis local size 1): its local kv
        # heads in the first KVH lanes. Under tensor parallelism
        # shard_map hands each shard its own group (ops/attention.py);
        # a multi-group global array here means the caller forgot the
        # shard_map wrapper.
        assert scales.shape[-3] == 1, (
            f"decode kernel needs a single-tp-group scale view, got "
            f"{scales.shape} — wrap the call in shard_map for tp>1")
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch_shapes += [
            pltpu.VMEM((2, pages) + scales.shape[2:], scales.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        operands.append(scales)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, KVH, G, D), lambda b, *_: (b, 0, 0, 0)),
        scratch_shapes=scratch_shapes,
    )

    kernel = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale,
                          block_size=BS, pages=pages, quantized=quantized,
                          packed=packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, G, D), q.dtype),
        # The int4 path needs headroom for the low-nibble AND temp and
        # the extra dot operand; raise the scoped-VMEM ceiling so
        # Mosaic doesn't reject the kernel at larger chunk shapes.
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024) if packed else None),
        interpret=_interpret(),
    )

    out = kernel(jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
                 block_tables.astype(jnp.int32),
                 context_lens.astype(jnp.int32),
                 jnp.zeros((1,), jnp.int32),  # buffer_index
                 jnp.ones((1,), jnp.int32),  # init_flag
                 *operands)
    return out.reshape(B, H, D)
