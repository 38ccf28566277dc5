"""Attention tests vs. naive per-sequence einsum references
(pattern: /root/reference/tests/kernels/test_attention.py:30-66)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_tpu.ops.attention import paged_decode_attention, prefill_attention

BS = 4


def naive_attention(q, k, v, scale):
    """q [H, D] or [Tq, H, D]; k/v [Tk, KVH, D]; causal if Tq given."""
    single = q.ndim == 2
    if single:
        q = q[None]
    Tq, H, D = q.shape
    Tk, KVH, _ = k.shape
    G = H // KVH
    kr = np.repeat(k, G, axis=1)  # [Tk, H, D]
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


@pytest.mark.parametrize("H,KVH,D", [(4, 4, 16), (4, 2, 16)])
def test_paged_decode_attention_vs_naive(H, KVH, D):
    rng = np.random.default_rng(0)
    NB, MB = 16, 4
    B = 3
    context_lens = np.array([1, 7, 13], dtype=np.int32)
    # Distinct random block tables per sequence.
    block_tables = rng.permutation(NB)[:B * MB].reshape(B, MB).astype(np.int32)

    k_cache = rng.standard_normal((KVH, NB, BS, D), dtype=np.float32)
    v_cache = rng.standard_normal((KVH, NB, BS, D), dtype=np.float32)
    q = rng.standard_normal((B, H, D), dtype=np.float32)
    scale = D**-0.5

    out = np.asarray(
        paged_decode_attention(jnp.asarray(q), jnp.asarray(k_cache),
                               jnp.asarray(v_cache),
                               jnp.asarray(block_tables),
                               jnp.asarray(context_lens), scale, impl="xla"))

    for i in range(B):
        L = context_lens[i]
        # Walk the block table to rebuild this sequence's KV history.
        ks = np.concatenate(
            [k_cache[:, b].transpose(1, 0, 2) for b in block_tables[i]])[:L]
        vs = np.concatenate(
            [v_cache[:, b].transpose(1, 0, 2) for b in block_tables[i]])[:L]
        ref = naive_attention(q[i], ks, vs, scale)
        np.testing.assert_allclose(out[i], ref, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("H,KVH,D", [(4, 4, 16), (4, 2, 16)])
def test_prefill_attention_packed_segments(H, KVH, D):
    rng = np.random.default_rng(1)
    lens = [5, 1, 8]
    T_pad = 16  # includes 2 padding tokens
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
                          jnp.asarray(seq_ids), scale, impl="xla"))

    start = 0
    for ln in lens:
        sl = slice(start, start + ln)
        ref = naive_attention(q[sl], k[sl], v[sl], scale)
        np.testing.assert_allclose(out[sl], ref, atol=2e-3, rtol=2e-3)
        start += ln
