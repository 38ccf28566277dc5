"""Tensor-parallel correctness on a virtual 8-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8).

The reference validated multi-GPU only manually (SURVEY.md §4); here
tp=8 must reproduce tp=1 greedy outputs exactly — the same check the
driver's dryrun_multichip compiles, but asserting numerics.
"""

import jax
import numpy as np
import pytest
import torch

from vllm_tpu import LLM, SamplingParams

from .utils import MockTokenizer

VOCAB = 128
MAX_LEN = 48


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    import transformers as tf
    # 8 heads so kv-heads shard 1-per-device at tp=8.
    cfg = tf.LlamaConfig(vocab_size=VOCAB, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=8, num_key_value_heads=8,
                         max_position_embeddings=MAX_LEN)
    torch.manual_seed(3)
    hf_model = tf.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("llama-tiny-tp")
    hf_model.save_pretrained(path, safe_serialization=True)
    return str(path)


def make_llm(checkpoint, tp, **kwargs):
    defaults = dict(
        tokenizer=MockTokenizer(VOCAB),
        dtype="float32",
        block_size=4,
        num_device_blocks_override=64,
        swap_space=0.001,
        max_model_len=MAX_LEN,
        max_num_batched_tokens=32,
        max_num_seqs=8,
        max_prefill_seqs=4,
        tensor_parallel_size=tp,
    )
    defaults.update(kwargs)
    return LLM(model=checkpoint, **defaults)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp8_matches_tp1_greedy(checkpoint):
    prompts = ["parallel", "mesh check xyz"]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ref = [o.outputs[0].token_ids
           for o in make_llm(checkpoint, 1).generate(prompts, params,
                                                     use_tqdm=False)]
    tp8 = [o.outputs[0].token_ids
           for o in make_llm(checkpoint, 8).generate(prompts, params,
                                                     use_tqdm=False)]
    assert tp8 == ref


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp8_int8_weights_runs(checkpoint):
    llm = make_llm(checkpoint, 8, quantization="int8")
    params = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    [out] = llm.generate("quant tp", params, use_tqdm=False)
    assert len(out.outputs[0].token_ids) == 4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp8_int8_kv_matches_tp1(checkpoint):
    """INT8 KV under TP: payload shards on kv heads, scales on their
    tp-group axis (VERDICT r1: previously untested)."""
    prompts = ["quantized kv", "shard the scales"]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ref = [o.outputs[0].token_ids
           for o in make_llm(checkpoint, 1, kv_cache_dtype="int8").generate(
               prompts, params, use_tqdm=False)]
    tp8 = [o.outputs[0].token_ids
           for o in make_llm(checkpoint, 8, kv_cache_dtype="int8").generate(
               prompts, params, use_tqdm=False)]
    assert tp8 == ref


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp8_int4_kv_matches_tp1(checkpoint):
    """INT4 nibble-packed KV under TP: the packed payload shards on kv
    heads exactly like int8 (the plane axis is 1), scales on their
    tp-group axis."""
    prompts = ["packed kv", "four bit pages"]
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    ref = [o.outputs[0].token_ids
           for o in make_llm(checkpoint, 1, kv_cache_dtype="int4").generate(
               prompts, params, use_tqdm=False)]
    tp8 = [o.outputs[0].token_ids
           for o in make_llm(checkpoint, 8, kv_cache_dtype="int4").generate(
               prompts, params, use_tqdm=False)]
    assert tp8 == ref


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("kv_dtype", ["bfloat16", "int8", "int4"])
def test_tp8_pallas_shard_map_matches_xla(checkpoint, kv_dtype,
                                          monkeypatch):
    """The Pallas kernels must run PER-SHARD under tp (shard_map over
    the model axis), not through GSPMD replication. Interpret mode on
    the CPU mesh executes the real kernel bodies + shard_map wrappers
    end-to-end and must reproduce the XLA fallback path's outputs.
    (bf16 KV compares in float32 weights/activations: dtype identical
    across paths, so results must match exactly.)"""
    monkeypatch.setenv("VLLM_TPU_INTERPRET", "1")
    monkeypatch.setenv("VLLM_TPU_FORCE_PALLAS_OPS", "1")
    prompts = ["pallas on a mesh", "sharded kernels"]
    # float32 cache keeps the Pallas path's MXU dtype at f32 in
    # interpret mode -> exact match vs the XLA path.
    kv = "float32" if kv_dtype == "bfloat16" else kv_dtype
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    pallas_out = [
        o.outputs[0].token_ids
        for o in make_llm(checkpoint, 8, kv_cache_dtype=kv).generate(
            prompts, params, use_tqdm=False)
    ]
    monkeypatch.delenv("VLLM_TPU_FORCE_PALLAS_OPS")
    monkeypatch.setenv("VLLM_TPU_FORCE_XLA_OPS", "1")
    xla_out = [
        o.outputs[0].token_ids
        for o in make_llm(checkpoint, 8, kv_cache_dtype=kv).generate(
            prompts, params, use_tqdm=False)
    ]
    assert pallas_out == xla_out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp8_gpt_neox_int8_weights_matches_tp1(tmp_path_factory):
    """The GPT-NeoX family (driver config: NeoX-20B TP4 + INT8 weights)
    under tensor parallelism: tp8 greedy == tp1 with int8 linears."""
    import transformers as tf
    cfg = tf.GPTNeoXConfig(vocab_size=VOCAB, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=8, rotary_pct=0.25,
                           use_parallel_residual=True,
                           max_position_embeddings=MAX_LEN)
    torch.manual_seed(5)
    path = str(tmp_path_factory.mktemp("neox-tiny-tp"))
    tf.GPTNeoXForCausalLM(cfg).eval().save_pretrained(
        path, safe_serialization=True)
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = {}
    for tp in (1, 8):
        llm = make_llm(path, tp, quantization="int8")
        outs[tp] = [o.outputs[0].token_ids
                    for o in llm.generate(["neox parallel", "rotary kv"],
                                          params, use_tqdm=False)]
    assert outs[8] == outs[1]
