"""AOT program cache (warm restart): a second engine built with the
same config + source digest must LOAD its precompiled step executables
from disk (no re-trace/lower/compile) and produce identical outputs.

CPU note: AOT executables on the CPU backend embed host machine
features, so the cache is off by default on CPU — these tests opt in
with an explicit tmp dir (same machine, same process family)."""

import os

import pytest
import torch

from vllm_tpu import LLM, SamplingParams

from .utils import MockTokenizer

VOCAB = 128
MAX_LEN = 48


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    import transformers as tf
    cfg = tf.OPTConfig(vocab_size=VOCAB, hidden_size=32, ffn_dim=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=MAX_LEN,
                       word_embed_proj_dim=32, do_layer_norm_before=True)
    torch.manual_seed(11)
    hf_model = tf.OPTForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("opt-tiny-aot")
    hf_model.save_pretrained(path, safe_serialization=True)
    return str(path)


def make_llm(checkpoint):
    return LLM(model=checkpoint, tokenizer=MockTokenizer(VOCAB),
               dtype="float32", block_size=4,
               num_device_blocks_override=64, swap_space=0.001,
               max_model_len=MAX_LEN, max_num_batched_tokens=32,
               max_num_seqs=8, max_prefill_seqs=4, precompile=True)


def run(llm):
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(["warm restart", "via aot"], params, use_tqdm=False)
    return [o.outputs[0].token_ids for o in outs]


def test_warm_restart_loads_executables(checkpoint, tmp_path, monkeypatch):
    monkeypatch.setenv("VLLM_TPU_AOT_CACHE", str(tmp_path / "aot"))

    cold = make_llm(checkpoint)
    aot = cold.llm_engine.worker._aot
    assert aot is not None
    assert aot.hits == 0 and aot.misses > 0 and not aot.disabled
    n_programs = aot.misses
    assert len(os.listdir(tmp_path / "aot")) == n_programs
    cold_out = run(cold)

    warm = make_llm(checkpoint)
    aot2 = warm.llm_engine.worker._aot
    # Every precompiled program came off disk; nothing recompiled.
    assert aot2.hits == n_programs and aot2.misses == 0, (
        aot2.hits, aot2.misses)
    assert run(warm) == cold_out


def test_source_or_config_change_invalidates(checkpoint, tmp_path,
                                             monkeypatch):
    monkeypatch.setenv("VLLM_TPU_AOT_CACHE", str(tmp_path / "aot2"))
    llm = make_llm(checkpoint)
    worker = llm.llm_engine.worker
    prefix = worker._aot.prefix
    # The digest must move with the KV geometry (block count is part of
    # the donated cache aval) — a stale hit would load a wrong-shaped
    # executable.
    worker.cache_config.num_device_blocks = 32
    from vllm_tpu.worker.aot_cache import AOTProgramCache
    changed = AOTProgramCache(str(tmp_path / "aot2"),
                              worker._aot_key_material())
    assert changed.prefix != prefix
