"""Model-zoo correctness: load a randomly initialized HF torch model's
state_dict into our functional-JAX model and compare logits — for the
packed prefill path AND token-by-token paged decode. This exceeds the
reference's test suite (it has kernel tests only, SURVEY.md §4) by
validating end-to-end parity per model family.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vllm_tpu.models.common import DecodeBatch, PrefillBatch
from vllm_tpu.ops.cache import PAD_SLOT, kv_cache_shape

BLOCK_SIZE = 4
NUM_BLOCKS = 16


def tiny_config(family):
    import transformers as tf
    if family == "llama":
        cfg = tf.LlamaConfig(vocab_size=128, hidden_size=32,
                             intermediate_size=64, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=4,
                             max_position_embeddings=64)
        return cfg, tf.LlamaForCausalLM
    if family == "gpt2":
        cfg = tf.GPT2Config(vocab_size=128, n_embd=32, n_layer=2, n_head=4,
                            n_positions=64)
        return cfg, tf.GPT2LMHeadModel
    if family == "gpt_neox":
        cfg = tf.GPTNeoXConfig(vocab_size=128, hidden_size=32,
                               intermediate_size=64, num_hidden_layers=2,
                               num_attention_heads=4, rotary_pct=0.5,
                               max_position_embeddings=64,
                               use_parallel_residual=True)
        return cfg, tf.GPTNeoXForCausalLM
    if family == "gpt_neox_seq":
        cfg = tf.GPTNeoXConfig(vocab_size=128, hidden_size=32,
                               intermediate_size=64, num_hidden_layers=2,
                               num_attention_heads=4, rotary_pct=1.0,
                               max_position_embeddings=64,
                               use_parallel_residual=False)
        return cfg, tf.GPTNeoXForCausalLM
    if family == "opt":
        cfg = tf.OPTConfig(vocab_size=128, hidden_size=32, ffn_dim=64,
                           num_hidden_layers=2, num_attention_heads=4,
                           max_position_embeddings=64,
                           word_embed_proj_dim=32, do_layer_norm_before=True)
        return cfg, tf.OPTForCausalLM
    raise ValueError(family)


def build_ours(family, cfg):
    from vllm_tpu.models import MODEL_REGISTRY
    arch = {"llama": "LlamaForCausalLM", "gpt2": "GPT2LMHeadModel",
            "gpt_neox": "GPTNeoXForCausalLM",
            "gpt_neox_seq": "GPTNeoXForCausalLM",
            "opt": "OPTForCausalLM"}[family]
    return MODEL_REGISTRY[arch](cfg, dtype=jnp.float32)


def empty_cache(model):
    from vllm_tpu.ops.cache import KVCache
    return KVCache(
        jnp.zeros(
            kv_cache_shape(model.layers, model.kv_heads, NUM_BLOCKS,
                           BLOCK_SIZE, model.head_dim), jnp.float32), None)


FAMILIES = ["llama", "gpt2", "gpt_neox", "gpt_neox_seq", "opt"]


@pytest.fixture(scope="module")
def hf_pairs():
    """One (hf_model, our_model, params) triple per family."""
    out = {}
    for family in FAMILIES:
        cfg, hf_cls = tiny_config(family)
        torch.manual_seed(0)
        hf_model = hf_cls(cfg).eval()
        state = [(k, v.detach().numpy())
                 for k, v in hf_model.state_dict().items()]
        ours = build_ours(family, cfg)
        params = ours.load_weights(iter(state))
        out[family] = (hf_model, ours, params)
    return out


@pytest.mark.parametrize("family", FAMILIES)
def test_prefill_logits_match_hf(family, hf_pairs):
    hf_model, ours, params = hf_pairs[family]
    prompt = [3, 17, 9, 101, 55, 2, 88]
    T = len(prompt)
    T_pad = 12

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([prompt])).logits[0].numpy()

    batch = PrefillBatch(
        token_ids=jnp.asarray(prompt + [0] * (T_pad - T), jnp.int32),
        positions=jnp.asarray(list(range(T)) + [0] * (T_pad - T), jnp.int32),
        seq_ids=jnp.asarray([0] * T + [-1] * (T_pad - T), jnp.int32),
        slot_mapping=jnp.asarray(
            list(range(T)) + [int(PAD_SLOT)] * (T_pad - T), jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32),
    )
    hidden, _ = ours.forward(params, batch, empty_cache(ours))
    logits = np.asarray(ours.compute_logits(params, hidden))[:T]
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("family", FAMILIES)
def test_paged_decode_matches_hf(family, hf_pairs):
    """Prefill a prompt, then decode 5 tokens one at a time through the
    paged KV cache; logits at every step must match HF's full forward."""
    hf_model, ours, params = hf_pairs[family]
    prompt = [3, 17, 9, 101]
    n_decode = 5

    # HF greedy continuation (full-context forward each step).
    ids = list(prompt)
    hf_steps = []
    with torch.no_grad():
        for _ in range(n_decode):
            logits = hf_model(torch.tensor([ids])).logits[0, -1].numpy()
            hf_steps.append(logits)
            ids.append(int(np.argmax(logits)))

    # Ours: prefill then paged decode. Non-contiguous block table to
    # exercise real paging.
    block_table = [7, 2, 11]  # covers 12 slots > 4 + 5 tokens
    kv = empty_cache(ours)
    T = len(prompt)
    T_pad = 8

    def slot(pos):
        return block_table[pos // BLOCK_SIZE] * BLOCK_SIZE + pos % BLOCK_SIZE

    batch = PrefillBatch(
        token_ids=jnp.asarray(prompt + [0] * (T_pad - T), jnp.int32),
        positions=jnp.asarray(list(range(T)) + [0] * (T_pad - T), jnp.int32),
        seq_ids=jnp.asarray([0] * T + [-1] * (T_pad - T), jnp.int32),
        slot_mapping=jnp.asarray(
            [slot(p) for p in range(T)] + [int(PAD_SLOT)] * (T_pad - T),
            jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32),
    )
    hidden, kv = ours.forward(params, batch, kv)
    logits = np.asarray(
        ours.compute_logits(params, hidden[batch.logits_indices]))[0]
    np.testing.assert_allclose(logits, hf_steps[0], atol=2e-3, rtol=2e-3)

    ids = list(prompt) + [int(np.argmax(hf_steps[0]))]
    for step in range(1, n_decode):
        pos = len(ids) - 1
        dbatch = DecodeBatch(
            token_ids=jnp.asarray([ids[-1], 0], jnp.int32),  # + pad row
            positions=jnp.asarray([pos, 0], jnp.int32),
            slot_mapping=jnp.asarray([slot(pos), int(PAD_SLOT)], jnp.int32),
            block_tables=jnp.asarray([block_table, [0] * len(block_table)],
                                     jnp.int32),
            context_lens=jnp.asarray([pos + 1, 0], jnp.int32),
        )
        hidden, kv = ours.forward(params, dbatch, kv)
        logits = np.asarray(ours.compute_logits(params, hidden))[0]
        np.testing.assert_allclose(logits, hf_steps[step], atol=2e-3,
                                   rtol=2e-3)
        ids.append(int(np.argmax(hf_steps[step])))


@pytest.mark.parametrize("family", FAMILIES)
def test_int8_weight_only_matches_dequantized(family, hf_pairs):
    """Weight-only INT8: the quantized forward must equal a float
    forward over the explicitly dequantized weights (y = (x@Wq)*s is
    algebraically x@(Wq*s) for per-column scales)."""
    from vllm_tpu.ops.quant import QuantizedLinear, dequantize_linear
    _, ours, params = hf_pairs[family]
    cfg = ours.cfg
    quant_model = build_ours(family, cfg)
    quant_model.quantization = "int8"

    # Re-quantize from the float tree (deep copy so the fixture's
    # params stay float).
    import copy
    qparams = copy.deepcopy(params)
    from vllm_tpu.models.common import maybe_quantize
    qparams = maybe_quantize(quant_model, qparams)

    def dequant_tree(p):
        if isinstance(p, QuantizedLinear):
            return dequantize_linear(p, jnp.float32)
        if isinstance(p, tuple):
            return tuple(dequant_tree(x) for x in p)
        if isinstance(p, dict):
            return {k: dequant_tree(v) for k, v in p.items()}
        if isinstance(p, list):
            return [dequant_tree(x) for x in p]
        return p

    fparams = dequant_tree(qparams)

    prompt = [5, 9, 77, 30, 2]
    T = len(prompt)
    T_pad = 8
    batch = PrefillBatch(
        token_ids=jnp.asarray(prompt + [0] * (T_pad - T), jnp.int32),
        positions=jnp.asarray(list(range(T)) + [0] * (T_pad - T), jnp.int32),
        seq_ids=jnp.asarray([0] * T + [-1] * (T_pad - T), jnp.int32),
        slot_mapping=jnp.asarray(
            list(range(T)) + [int(PAD_SLOT)] * (T_pad - T), jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32),
    )
    qh, _ = quant_model.forward(qparams, batch, empty_cache(ours))
    fh, _ = ours.forward(fparams, batch, empty_cache(ours))
    ql = np.asarray(quant_model.compute_logits(qparams, qh))[:T]
    fl = np.asarray(ours.compute_logits(fparams, fh))[:T]
    np.testing.assert_allclose(ql, fl, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("family", FAMILIES)
def test_int4_group_quant_matches_dequantized(family, hf_pairs):
    """INT4 (w4a8): the quantized forward must track a float forward
    over the explicitly dequantized int4 weights — the residual is the
    per-token int8 activation quantization only (~0.5%/layer), since
    the weights are bit-identical after dequant."""
    import copy

    from vllm_tpu.models.common import maybe_quantize
    from vllm_tpu.ops.quant import (Int4Linear, QuantizedLinear,
                                    dequantize_linear,
                                    dequantize_linear_int4)
    _, ours, params = hf_pairs[family]
    cfg = ours.cfg
    quant_model = build_ours(family, cfg)
    quant_model.quantization = "int4"

    qparams = maybe_quantize(quant_model, copy.deepcopy(params))

    def dequant_tree(p):
        if isinstance(p, Int4Linear):
            return dequantize_linear_int4(p, jnp.float32)
        if isinstance(p, QuantizedLinear):
            return dequantize_linear(p, jnp.float32)
        if isinstance(p, tuple):
            return tuple(dequant_tree(x) for x in p)
        if isinstance(p, dict):
            return {k: dequant_tree(v) for k, v in p.items()}
        if isinstance(p, list):
            return [dequant_tree(x) for x in p]
        return p

    fparams = dequant_tree(qparams)

    # The layer stack must actually be int4 (lm_head stays int8).
    def is_int4(leaf):
        if isinstance(leaf, Int4Linear):
            return True
        if isinstance(leaf, tuple):  # (weight, bias) pair
            return isinstance(leaf[0], Int4Linear)
        return False

    assert all(is_int4(qparams["layers"][k])
               for k in quant_model.QUANT_LAYER_KEYS)

    prompt = [5, 9, 77, 30, 2]
    T = len(prompt)
    T_pad = 8
    batch = PrefillBatch(
        token_ids=jnp.asarray(prompt + [0] * (T_pad - T), jnp.int32),
        positions=jnp.asarray(list(range(T)) + [0] * (T_pad - T), jnp.int32),
        seq_ids=jnp.asarray([0] * T + [-1] * (T_pad - T), jnp.int32),
        slot_mapping=jnp.asarray(
            list(range(T)) + [int(PAD_SLOT)] * (T_pad - T), jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32),
    )
    qh, _ = quant_model.forward(qparams, batch, empty_cache(ours))
    fh, _ = ours.forward(fparams, batch, empty_cache(ours))
    ql = np.asarray(quant_model.compute_logits(qparams, qh))[:T]
    fl = np.asarray(ours.compute_logits(fparams, fh))[:T]
    scale = np.abs(fl).max() + 1e-9
    assert np.abs(ql - fl).max() / scale < 0.05, (
        np.abs(ql - fl).max() / scale)
