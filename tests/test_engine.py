"""End-to-end engine tests on a tiny OPT checkpoint written to disk
(exercises config+weight loading, bucketed prefill/decode programs,
on-device sampling, continuous batching, preemption, beam search)."""

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
    cfg = tf.OPTConfig(vocab_size=VOCAB, hidden_size=32, ffn_dim=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=MAX_LEN,
                       word_embed_proj_dim=32, do_layer_norm_before=True)
    torch.manual_seed(7)
    hf_model = tf.OPTForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("opt-tiny")
    hf_model.save_pretrained(path, safe_serialization=True)
    return str(path), hf_model


def make_llm(checkpoint, **kwargs):
    path, _ = checkpoint
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
    )
    defaults.update(kwargs)
    return LLM(model=path, **defaults)


def hf_greedy(hf_model, prompt_ids, n_tokens):
    out = hf_model.generate(torch.tensor([prompt_ids]),
                            max_new_tokens=n_tokens, do_sample=False,
                            eos_token_id=None, pad_token_id=0)
    return out[0].tolist()[len(prompt_ids):]


@pytest.fixture(scope="module")
def llm(checkpoint):
    return make_llm(checkpoint)


def test_greedy_matches_hf(checkpoint, llm):
    _, hf_model = checkpoint
    prompt = "hello tpu"
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    [out] = llm.generate(prompt, params, use_tqdm=False)
    prompt_ids = MockTokenizer(VOCAB).encode(prompt)
    expected = hf_greedy(hf_model, prompt_ids, 8)
    assert out.outputs[0].token_ids == expected
    assert out.finished
    assert out.outputs[0].finish_reason == "length"
    assert out.outputs[0].text == "".join(chr(t) for t in expected)


def test_continuous_batch_greedy_matches_hf(checkpoint, llm):
    _, hf_model = checkpoint
    prompts = ["a", "bc bc", "hello world", "xyz q", "m"]
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(prompts, params, use_tqdm=False)
    assert len(outs) == len(prompts)
    tok = MockTokenizer(VOCAB)
    for prompt, out in zip(prompts, outs):
        expected = hf_greedy(hf_model, tok.encode(prompt), 6)
        assert out.outputs[0].token_ids == expected, prompt


def test_parallel_sampling(llm):
    params = SamplingParams(n=4, temperature=0.9, top_p=0.9, max_tokens=5,
                            ignore_eos=True)
    [out] = llm.generate("sample me", params, use_tqdm=False)
    assert len(out.outputs) == 4
    for c in out.outputs:
        assert len(c.token_ids) == 5
    assert {c.index for c in out.outputs} == {0, 1, 2, 3}


def test_top_k_sampling(llm):
    params = SamplingParams(temperature=1.2, top_k=2, max_tokens=6,
                            ignore_eos=True)
    [out] = llm.generate("k test", params, use_tqdm=False)
    assert len(out.outputs[0].token_ids) == 6


def test_beam_search(checkpoint, llm):
    _, hf_model = checkpoint
    params = SamplingParams(use_beam_search=True, best_of=4, n=2,
                            temperature=0.0, max_tokens=6, ignore_eos=True)
    [out] = llm.generate("beam beam", params, use_tqdm=False)
    assert len(out.outputs) == 2
    # Outputs come back best-first by cumulative logprob.
    assert (out.outputs[0].cumulative_logprob
            >= out.outputs[1].cumulative_logprob)
    # Beam-0 must dominate the greedy path's cumulative logprob: greedy
    # is one of the candidates beam search explores.
    tok = MockTokenizer(VOCAB)
    greedy = hf_greedy(hf_model, tok.encode("beam beam"), 6)
    with torch.no_grad():
        ids = tok.encode("beam beam") + greedy
        logits = hf_model(torch.tensor([ids])).logits[0].float()
        logprobs = torch.log_softmax(logits, -1)
        greedy_lp = sum(
            float(logprobs[len(tok.encode('beam beam')) + i - 1, t])
            for i, t in enumerate(greedy))
    assert out.outputs[0].cumulative_logprob >= greedy_lp - 1e-3


def test_logprobs_returned(llm):
    params = SamplingParams(temperature=0.0, max_tokens=4, logprobs=3,
                            ignore_eos=True)
    [out] = llm.generate("lp", params, use_tqdm=False)
    lps = out.outputs[0].logprobs
    assert lps is not None and len(lps) == 4
    for step_lps, token in zip(lps, out.outputs[0].token_ids):
        assert token in step_lps
        assert len(step_lps) >= 3


def test_prompt_logprobs_match_hf(checkpoint, llm):
    _, hf_model = checkpoint
    prompt = "check prompt lp"
    params = SamplingParams(temperature=0.0, max_tokens=2,
                            prompt_logprobs=2, ignore_eos=True)
    [out] = llm.generate(prompt, params, use_tqdm=False)
    ids = MockTokenizer(VOCAB).encode(prompt)
    assert out.prompt_logprobs is not None
    assert len(out.prompt_logprobs) == len(ids)
    assert out.prompt_logprobs[0] is None
    with torch.no_grad():
        logits = hf_model(torch.tensor([ids])).logits[0].float()
        ref = torch.log_softmax(logits, -1)
    for p in range(1, len(ids)):
        d = out.prompt_logprobs[p]
        # Realized token present and numerically right (position p's
        # token scored from position p-1's logits).
        assert ids[p] in d
        assert abs(d[ids[p]] - float(ref[p - 1, ids[p]])) < 2e-3
        # Plus the top-2 alternatives.
        assert len(d) >= 2
        top2 = torch.topk(ref[p - 1], 2)
        for t, lp in zip(top2.indices.tolist(), top2.values.tolist()):
            assert t in d and abs(d[t] - lp) < 2e-3


def test_prompt_logprobs_disabled_rejected(checkpoint):
    llm = make_llm(checkpoint, enable_prompt_logprobs=False)
    with pytest.raises(ValueError, match="prompt_logprobs"):
        llm.generate("x", SamplingParams(prompt_logprobs=0), use_tqdm=False)


def test_stop_string(checkpoint, llm):
    _, hf_model = checkpoint
    prompt = "stop here"
    expected = hf_greedy(hf_model, MockTokenizer(VOCAB).encode(prompt), 8)
    stop_char = chr(expected[3])
    params = SamplingParams(temperature=0.0, max_tokens=8, stop=[stop_char],
                            ignore_eos=True)
    [out] = llm.generate(prompt, params, use_tqdm=False)
    assert out.outputs[0].finish_reason == "stop"
    assert not out.outputs[0].text.endswith(stop_char)
    assert len(out.outputs[0].token_ids) <= 4


def test_eos_stops_generation(checkpoint):
    path, hf_model = checkpoint
    # Find the first greedy token and make it the EOS.
    first = hf_greedy(hf_model, MockTokenizer(VOCAB).encode("eos"), 1)[0]
    llm = make_llm(checkpoint, tokenizer=MockTokenizer(VOCAB,
                                                       eos_token_id=first))
    params = SamplingParams(temperature=0.0, max_tokens=8)
    [out] = llm.generate("eos", params, use_tqdm=False)
    assert out.outputs[0].finish_reason == "stop"
    assert len(out.outputs[0].token_ids) == 1


def test_preemption_recompute_preserves_output(checkpoint):
    """A block pool too small for both requests forces preemption by
    recompute; final outputs must still match HF greedy."""
    _, hf_model = checkpoint
    llm = make_llm(checkpoint, num_device_blocks_override=14)
    prompts = ["aaaa bbbb cccc", "dddd eeee ffff"]
    params = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate(prompts, params, use_tqdm=False)
    tok = MockTokenizer(VOCAB)
    for prompt, out in zip(prompts, outs):
        expected = hf_greedy(hf_model, tok.encode(prompt), 10)
        assert out.outputs[0].token_ids == expected, prompt


def test_abort_request(checkpoint):
    llm = make_llm(checkpoint)
    engine = llm.llm_engine
    engine.add_request("keep", "hello", SamplingParams(temperature=0.0,
                                                       max_tokens=4,
                                                       ignore_eos=True))
    engine.add_request("kill", "world", SamplingParams(temperature=0.0,
                                                       max_tokens=4,
                                                       ignore_eos=True))
    engine.step()
    engine.abort_request("kill")
    finished = []
    while engine.has_unfinished_requests():
        finished.extend(o.request_id for o in engine.step() if o.finished)
    assert finished == ["keep"]


def test_int8_kv_cache_end_to_end(checkpoint):
    """INT8 KV quantization: the first sampled token is exact (prefill
    attends over unquantized fresh K/V), decode runs through the
    quantized cache end-to-end."""
    _, hf_model = checkpoint
    llm = make_llm(checkpoint, kv_cache_dtype="int8")
    prompt = "quantize me"
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    [out] = llm.generate(prompt, params, use_tqdm=False)
    assert len(out.outputs[0].token_ids) == 8
    expected = hf_greedy(hf_model, MockTokenizer(VOCAB).encode(prompt), 8)
    assert out.outputs[0].token_ids[0] == expected[0]
    # Tiny random models have near-flat logits; still, int8 per-vector
    # scales should track the fp32 greedy path closely.
    matches = sum(a == b for a, b in zip(out.outputs[0].token_ids, expected))
    assert matches >= 4, (out.outputs[0].token_ids, expected)


def test_ignored_overlong_prompt_reported(checkpoint):
    llm = make_llm(checkpoint)
    engine = llm.llm_engine
    engine.add_request("big", "x" * (MAX_LEN + 10),
                       SamplingParams(temperature=0.0, max_tokens=4))
    outs = engine.step()
    assert len(outs) == 1 and outs[0].finished
    assert outs[0].outputs[0].finish_reason == "length"
    assert not engine.has_unfinished_requests()


def test_multi_step_decode_matches_hf(checkpoint):
    """num_decode_steps > 1 fuses decode steps on device (tokens feed
    back in-scan); greedy output must be identical to single-step."""
    _, hf_model = checkpoint
    llm = make_llm(checkpoint, num_decode_steps=4)
    prompts = ["multi step", "x", "fused decode chain"]
    params = SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True)
    outs = llm.generate(prompts, params, use_tqdm=False)
    tok = MockTokenizer(VOCAB)
    for prompt, out in zip(prompts, outs):
        expected = hf_greedy(hf_model, tok.encode(prompt), 9)
        assert out.outputs[0].token_ids == expected, prompt


def test_multi_step_stop_string_mid_chunk(checkpoint):
    """A stop hit inside a fused chunk must discard the chunk's
    remaining speculative tokens."""
    _, hf_model = checkpoint
    prompt = "stop mid chunk"
    expected = hf_greedy(hf_model, MockTokenizer(VOCAB).encode(prompt), 8)
    stop_char = chr(expected[2])
    llm = make_llm(checkpoint, num_decode_steps=4)
    params = SamplingParams(temperature=0.0, max_tokens=8, stop=[stop_char],
                            ignore_eos=True)
    [out] = llm.generate(prompt, params, use_tqdm=False)
    assert out.outputs[0].finish_reason == "stop"
    assert len(out.outputs[0].token_ids) <= 3
    assert not out.outputs[0].text.endswith(stop_char)


def test_multi_step_beam_falls_back_single_step(checkpoint):
    """Beam groups force single-step chunks; results must stay valid."""
    llm = make_llm(checkpoint, num_decode_steps=4)
    params = SamplingParams(use_beam_search=True, best_of=4, n=2,
                            temperature=0.0, max_tokens=5, ignore_eos=True)
    [out] = llm.generate("beam fused", params, use_tqdm=False)
    assert len(out.outputs) == 2
    assert all(len(c.token_ids) == 5 for c in out.outputs)


def test_multi_step_preemption(checkpoint):
    """Multi-step chunks + tiny block pool: preemption still produces
    exact greedy outputs."""
    _, hf_model = checkpoint
    llm = make_llm(checkpoint, num_device_blocks_override=14,
                   num_decode_steps=4)
    prompts = ["aaaa bbbb cccc", "dddd eeee ffff"]
    params = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    outs = llm.generate(prompts, params, use_tqdm=False)
    tok = MockTokenizer(VOCAB)
    for prompt, out in zip(prompts, outs):
        expected = hf_greedy(hf_model, tok.encode(prompt), 10)
        assert out.outputs[0].token_ids == expected, prompt


def test_mixed_beam_and_greedy_chunked(checkpoint):
    """A beam group in the serving mix must NOT collapse greedy rows'
    multi-step chunks (beam runs its own single-step program beside the
    chunk): greedy output stays exact while beam output stays valid."""
    _, hf_model = checkpoint
    llm = make_llm(checkpoint, num_decode_steps=4)
    greedy = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    beam = SamplingParams(use_beam_search=True, best_of=2, n=1,
                          temperature=0.0, max_tokens=8, ignore_eos=True)
    tok = MockTokenizer(VOCAB)
    llm.llm_engine.add_request("g", None, greedy,
                               prompt_token_ids=tok.encode("hello tpu"))
    llm.llm_engine.add_request("b", None, beam,
                               prompt_token_ids=tok.encode("beam beam"))
    outs = {}
    saw_multi_step = False
    while llm.llm_engine.has_unfinished_requests():
        for out in llm.llm_engine.step():
            if out.finished:
                outs[out.request_id] = out
        # Beam emits 1 token/iteration, greedy up to 4: lengths diverge.
        groups = (llm.llm_engine.scheduler.running)
        lens = {g.request_id: g.get_seqs()[0].get_output_len()
                for g in groups}
        if lens.get("g", 0) > lens.get("b", 0):
            saw_multi_step = True
    assert saw_multi_step, "greedy rows did not out-pace the beam group"
    expected = hf_greedy(hf_model, tok.encode("hello tpu"), 8)
    assert outs["g"].outputs[0].token_ids == expected
    assert len(outs["b"].outputs[0].token_ids) == 8


def test_penalties_chunked_matches_single_step(checkpoint):
    """Presence/frequency penalties ride the on-device count state, so
    chunked decode must produce exactly the single-step results."""
    params = SamplingParams(temperature=0.0, max_tokens=10,
                            presence_penalty=1.5, frequency_penalty=0.7,
                            ignore_eos=True)
    outs = {}
    for steps in (1, 4):
        llm = make_llm(checkpoint, num_decode_steps=steps)
        [out] = llm.generate("pen pen pen", params, use_tqdm=False)
        outs[steps] = out.outputs[0].token_ids
    assert outs[1] == outs[4]
    # And the penalty must actually bite: an unpenalized run differs.
    llm = make_llm(checkpoint, num_decode_steps=4)
    [plain] = llm.generate(
        "pen pen pen",
        SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True),
        use_tqdm=False)
    assert plain.outputs[0].token_ids != outs[4]


def test_async_scheduling_matches_sync(checkpoint):
    """One-step-lagged dispatch must not change any sampled token:
    greedy + parallel sampling + preemption-tight blocks, async vs
    sync."""
    prompts = ["hello tpu", "a b c d", "zz"]
    params = SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True)
    results = {}
    for mode in (False, True):
        llm = make_llm(checkpoint, num_decode_steps=2,
                       num_device_blocks_override=20,
                       async_scheduling=mode)
        outs = llm.generate(prompts, params, use_tqdm=False)
        results[mode] = [o.outputs[0].token_ids for o in outs]
    assert results[True] == results[False]


def test_async_parallel_sampling_seeded_rows(checkpoint):
    """Async token feed must route sample j to sequence j (parallel
    sampling rows feed from samples[j], not the argmax row)."""
    params = SamplingParams(n=3, temperature=0.8, top_p=0.95, max_tokens=6,
                            ignore_eos=True)
    llm = make_llm(checkpoint, async_scheduling=True)
    [out] = llm.generate("sample feed", params, use_tqdm=False)
    assert len(out.outputs) == 3
    assert all(len(c.token_ids) == 6 for c in out.outputs)


def test_beam_swap_roundtrip_single_host(checkpoint):
    """Engine-level preempt-by-SWAP: a beam group under a tight block
    pool gets swapped to the host pool (asynchronously drained) and
    later swapped back in, finishing with valid output."""
    llm = make_llm(checkpoint, num_device_blocks_override=10,
                   swap_space=0.001)
    engine = llm.llm_engine
    greedy = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    beam = SamplingParams(use_beam_search=True, best_of=2, n=1,
                          temperature=0.0, max_tokens=8, ignore_eos=True)
    tok = MockTokenizer(VOCAB)
    engine.add_request("g0", None, greedy,
                       prompt_token_ids=tok.encode("hello mesh"))
    engine.add_request("g1", None, greedy, prompt_token_ids=tok.encode("tp"))
    engine.add_request("b", None, beam,
                       prompt_token_ids=tok.encode("beam beam!"))
    results = {}
    saw_swap = False
    for _ in range(200):
        if not engine.has_unfinished_requests():
            break
        for out in engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids
        saw_swap = saw_swap or bool(engine.scheduler.swapped)
    assert saw_swap, "beam group was never preempted by swap"
    assert set(results) == {"g0", "g1", "b"}
    assert len(results["b"]) == 8

    # The swap round-trip must not perturb outputs: same requests with
    # ample blocks produce identical tokens.
    llm2 = make_llm(checkpoint, num_device_blocks_override=64)
    engine2 = llm2.llm_engine
    engine2.add_request("g0", None, greedy,
                        prompt_token_ids=tok.encode("hello mesh"))
    engine2.add_request("g1", None, greedy,
                        prompt_token_ids=tok.encode("tp"))
    engine2.add_request("b", None, beam,
                        prompt_token_ids=tok.encode("beam beam!"))
    ref = {}
    while engine2.has_unfinished_requests():
        for out in engine2.step():
            if out.finished:
                ref[out.request_id] = out.outputs[0].token_ids
    assert results == ref


def test_int4_quantized_engine_end_to_end(checkpoint):
    """INT4 weights (w4a8, group scales) through the full engine:
    deterministic greedy decode, correct lengths, and the engine's
    first sampled token agrees with a torch forward over the
    explicitly int4-dequantized weights (the prefill path is exact up
    to the int8 activation quantization)."""
    path, hf_model = checkpoint
    llm = make_llm(checkpoint, quantization="int4")
    params = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    [out1] = llm.generate("int4 run", params, use_tqdm=False)
    [out2] = llm.generate("int4 run", params, use_tqdm=False)
    assert out1.outputs[0].token_ids == out2.outputs[0].token_ids
    assert len(out1.outputs[0].token_ids) == 6

    # First token vs torch-on-dequantized-weights.
    import jax
    import jax.numpy as jnp

    from vllm_tpu.ops.quant import (Int4Linear, QuantizedLinear,
                                    dequantize_linear,
                                    dequantize_linear_int4)
    worker = llm.llm_engine.worker
    ids = MockTokenizer(VOCAB).encode("int4 run")

    def dq(leaf):
        if isinstance(leaf, Int4Linear):
            return dequantize_linear_int4(leaf, jnp.float32)
        if isinstance(leaf, QuantizedLinear):
            return dequantize_linear(leaf, jnp.float32)
        return leaf

    fparams = jax.tree.map(
        dq, worker.params,
        is_leaf=lambda x: isinstance(x, (Int4Linear, QuantizedLinear)))
    # Rebuilding a torch state dict from the dequantized tree is
    # overkill — instead run OUR model float forward on the dequantized
    # params and compare argmax.
    from vllm_tpu.models.common import PrefillBatch, gather_last_hidden
    from vllm_tpu.ops.cache import PAD_SLOT, KVCache, kv_cache_shape
    T = len(ids)
    T_pad = 16
    batch = PrefillBatch(
        token_ids=jnp.asarray(ids + [0] * (T_pad - T), jnp.int32),
        positions=jnp.asarray(list(range(T)) + [0] * (T_pad - T),
                              jnp.int32),
        seq_ids=jnp.asarray([0] * T + [-1] * (T_pad - T), jnp.int32),
        slot_mapping=jnp.asarray(
            list(range(T)) + [int(PAD_SLOT)] * (T_pad - T), jnp.int32),
        logits_indices=jnp.asarray([T - 1], jnp.int32),
    )
    model = worker.model

    def forward_logits(p):
        cache = KVCache(
            jnp.zeros(kv_cache_shape(model.layers, 4, 16, 4,
                                     worker.head_dim_padded), jnp.float32),
            None)
        h, _ = model.forward(p, batch, cache)
        sel = gather_last_hidden(h, batch)  # [1, H]: last prompt row
        return np.asarray(model.compute_logits(p, sel)[0])

    # The engine's first sampled token is the argmax of the quantized
    # forward (same w4a8 math), and the quantized logits track the
    # float forward over the dequantized weights within the int8
    # activation-quant budget (the weights cancel exactly).
    qlogits = forward_logits(worker.params)
    flogits = forward_logits(fparams)
    assert int(np.argmax(qlogits)) == out1.outputs[0].token_ids[0]
    scale = np.abs(flogits).max() + 1e-9
    assert np.abs(qlogits - flogits).max() / scale < 0.05


def test_int4_kv_cache_end_to_end(checkpoint):
    """INT4 KV (nibble-packed pages): first sampled token exact
    (prefill attends over fresh unquantized K/V), decode through the
    packed cache, and the packed layout survives swap-capable
    engine paths (same assertions as the int8-KV test, coarser
    tolerance — int4 codes carry 4x the step size)."""
    _, hf_model = checkpoint
    import jax.numpy as jnp
    llm = make_llm(checkpoint, kv_cache_dtype="int4")
    worker = llm.llm_engine.worker
    assert worker.kv_cache.data.shape[2] == 1  # packed plane
    assert worker.kv_cache.data.dtype == jnp.int8
    prompt = "quantize me harder"
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    [out] = llm.generate(prompt, params, use_tqdm=False)
    assert len(out.outputs[0].token_ids) == 8
    expected = hf_greedy(hf_model, MockTokenizer(VOCAB).encode(prompt), 8)
    assert out.outputs[0].token_ids[0] == expected[0]
    # Determinism across runs.
    [out2] = llm.generate(prompt, params, use_tqdm=False)
    assert out.outputs[0].token_ids == out2.outputs[0].token_ids
