"""Attention tests vs. naive per-sequence einsum references
(pattern: /root/reference/tests/kernels/test_attention.py:30-66),
for both the XLA fallback and the Pallas kernels (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_tpu.ops.attention import paged_decode_attention, prefill_attention
from vllm_tpu.ops.cache import KVCache

BS = 16
D = 128  # Pallas kernels assume lane-width head_dim


def naive_attention(q, k, v, scale):
    """q [H, D] or [Tq, H, D]; k/v [Tk, KVH, D]; causal if Tq given."""
    single = q.ndim == 2
    if single:
        q = q[None]
    Tq, H, _ = q.shape
    Tk, KVH, _ = k.shape
    G = H // KVH
    kr = np.repeat(k, G, axis=1)
    vr = np.repeat(v, G, axis=1)
    scores = np.einsum("qhd,khd->hqk", q, kr).astype(np.float64) * scale
    if not single:
        causal = np.tril(np.ones((Tq, Tk), bool), k=Tk - Tq)
        scores = np.where(causal[None], scores, -np.inf)
    scores -= scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("hqk,khd->qhd", p, vr)
    return out[0] if single else out


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("impl", ["xla", "pallas"])
# (96, 96): kv heads > V_SCALE_LANE engage the SP=2 two-plane scale
# layout in the decode kernel's chunk-scale handling — otherwise
# unexercised (every supported model family packs into SP=1).
@pytest.mark.parametrize("H,KVH", [(4, 4), (4, 2), (96, 96)])
def test_paged_decode_attention_vs_naive(H, KVH, impl, quantized):
    rng = np.random.default_rng(0)
    L, NB, MB = 2, 16, 4
    B = 4
    context_lens = np.array([1, 23, 64, 0], dtype=np.int32)  # incl. pad row
    block_tables = rng.permutation(NB)[:B * MB].reshape(B, MB).astype(
        np.int32)

    kv_data = rng.standard_normal((L, NB, 2, KVH, BS, D), dtype=np.float32)
    if quantized:
        from vllm_tpu.ops.cache import pack_scale_pages
        scales = np.abs(kv_data).max(-1) / 127.0 + 1e-10  # [L,NB,2,KVH,BS]
        kv_int = np.clip(np.round(kv_data / scales[..., None]), -127, 127)
        scales_page = pack_scale_pages(scales)
        kv_cache = KVCache(jnp.asarray(kv_int, jnp.int8),
                           jnp.asarray(scales_page))
        # The reference below must see exactly what the kernel sees.
        kv_data = kv_int * scales[..., None]
    else:
        kv_cache = KVCache(jnp.asarray(kv_data), None)
    q = rng.standard_normal((B, H, D), dtype=np.float32)
    scale = D**-0.5

    out = np.asarray(
        paged_decode_attention(jnp.asarray(q), kv_cache, 1,
                               jnp.asarray(block_tables),
                               jnp.asarray(context_lens), scale, impl=impl))

    for i in range(B):
        ctx = context_lens[i]
        if ctx == 0:
            assert np.isfinite(out[i]).all()
            continue
        # pages are [2, KVH, BS, D]: move tokens in front, concat
        ks = np.concatenate(
            [np.moveaxis(kv_data[1, b, 0], 1, 0) for b in block_tables[i]],
            axis=0)[:ctx]
        vs = np.concatenate(
            [np.moveaxis(kv_data[1, b, 1], 1, 0) for b in block_tables[i]],
            axis=0)[:ctx]
        ref = naive_attention(q[i], ks, vs, scale)
        np.testing.assert_allclose(out[i], ref, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("H,KVH", [(4, 4), (4, 2)])
def test_prefill_attention_packed_segments(H, KVH, impl):
    rng = np.random.default_rng(1)
    lens = [40, 1, 70]
    T_pad = 128
    seq_ids = np.full(T_pad, -1, dtype=np.int32)
    start = 0
    for sid, ln in enumerate(lens):
        seq_ids[start:start + ln] = sid
        start += ln

    q = rng.standard_normal((T_pad, H, D), dtype=np.float32)
    k = rng.standard_normal((T_pad, KVH, D), dtype=np.float32)
    v = rng.standard_normal((T_pad, KVH, D), dtype=np.float32)
    scale = D**-0.5

    out = np.asarray(
        prefill_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(seq_ids), scale, impl=impl))

    start = 0
    for ln in lens:
        sl = slice(start, start + ln)
        ref = naive_attention(q[sl], k[sl], v[sl], scale)
        np.testing.assert_allclose(out[sl], ref, atol=2e-3, rtol=2e-3)
        start += ln


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("H,KVH", [(4, 4), (4, 2), (96, 96)])
def test_paged_decode_attention_int4(H, KVH, impl):
    """INT4 nibble-packed cache (biased K low nibble, V high) vs a
    naive reference over the dequantized values."""
    rng = np.random.default_rng(2)
    L, NB, MB = 2, 16, 4
    B = 4
    context_lens = np.array([1, 23, 64, 0], dtype=np.int32)
    block_tables = rng.permutation(NB)[:B * MB].reshape(B, MB).astype(
        np.int32)

    from vllm_tpu.ops.cache import pack_scale_pages
    kv_data = rng.standard_normal((L, NB, 2, KVH, BS, D), dtype=np.float32)
    scales = np.abs(kv_data).max(-1) / 7.0 + 1e-10  # [L, NB, 2, KVH, BS]
    codes = np.clip(np.round(kv_data / scales[..., None]), -7,
                    7).astype(np.int8)
    # Biased-low packing (ops/cache.py pack_kv_int4): byte as signed
    # int8 == 16*v + (k+8).
    packed = (((codes[:, :, 0] + 8) & 0xF) |
              (codes[:, :, 1] << 4)).astype(np.int8)[:, :, None]
    scales_page = pack_scale_pages(scales)
    kv_cache = KVCache(jnp.asarray(packed), jnp.asarray(scales_page))
    # The reference must see exactly what the kernel dequantizes to.
    kv_data = codes * scales[..., None]

    q = rng.standard_normal((B, H, D), dtype=np.float32)
    scale = D**-0.5
    out = np.asarray(
        paged_decode_attention(jnp.asarray(q), kv_cache, 1,
                               jnp.asarray(block_tables),
                               jnp.asarray(context_lens), scale, impl=impl))

    for i in range(B):
        ctx = context_lens[i]
        if ctx == 0:
            assert np.isfinite(out[i]).all()
            continue
        ks = np.concatenate(
            [np.moveaxis(kv_data[1, b, 0], 1, 0) for b in block_tables[i]],
            axis=0)[:ctx]
        vs = np.concatenate(
            [np.moveaxis(kv_data[1, b, 1], 1, 0) for b in block_tables[i]],
            axis=0)[:ctx]
        ref = naive_attention(q[i], ks, vs, scale)
        np.testing.assert_allclose(out[i], ref, atol=2e-3, rtol=2e-3)
