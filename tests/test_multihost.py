"""Multi-process runtime integration: a 2-process CPU 'cluster'
(jax.distributed over localhost, 1 device per process) must reproduce
the single-process tp=1 greedy outputs exactly. Exercises the
plan-broadcast channel, follower replay loop, replicated sampler
outputs, and shutdown. The reference never had an automated
multi-worker test (SURVEY.md §4)."""

import json
import os
import socket
import subprocess
import sys

import pytest
import torch

from vllm_tpu import LLM, SamplingParams

from .utils import MockTokenizer

VOCAB = 128


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    import transformers as tf
    cfg = tf.LlamaConfig(vocab_size=VOCAB, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=8, num_key_value_heads=8,
                         max_position_embeddings=48)
    path = tmp_path_factory.mktemp("llama-mh")
    torch.manual_seed(3)
    tf.LlamaForCausalLM(cfg).eval().save_pretrained(
        str(path), safe_serialization=True)
    return str(path)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_engine_matches_single(checkpoint, tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children pin 1 CPU device themselves
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(port), str(rank), checkpoint],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo", text=True) for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    result_line = [l for l in outs[0].splitlines()
                   if l.startswith("RESULT ")]
    assert result_line, outs[0][-3000:]
    dist_results = json.loads(result_line[0][len("RESULT "):])

    # The beam group must actually have been preempted by SWAP in the
    # 2-process run (10-block pool): broadcast swap plans + per-process
    # host pools did real work.
    assert dist_results["swapped"] is True
    # OpenAI SSE streaming served FROM the cluster's driver process
    # (driver eval config 5 shape) produced a 4-token completion.
    assert len(dist_results["openai_stream"]) >= 4
    # Plan-channel overhead on the driver: one KV-store message per
    # step. The bound is loose (CI boxes stutter) — the measured
    # localhost cost is ~1 ms/step at these plan sizes, vs the 144 ms
    # device time of a 7B decode chunk (README "Multi-host scaling").
    chan = dist_results["channel"]
    assert chan["sends"] > 20, chan
    assert chan["send_ms_avg"] < 20.0, chan

    # Single-process tp=1 reference in THIS process (ample blocks — a
    # preempt/swap round-trip must not change any output).
    llm = LLM(model=checkpoint, tokenizer=MockTokenizer(VOCAB),
              dtype="float32", block_size=4, num_device_blocks_override=64,
              swap_space=0.001, max_model_len=48, max_num_batched_tokens=32,
              max_num_seqs=8, max_prefill_seqs=4)
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    beam = SamplingParams(use_beam_search=True, best_of=2, n=1,
                          temperature=0.0, max_tokens=8, ignore_eos=True)
    engine = llm.llm_engine
    engine.add_request("0", "hello mesh", params)
    engine.add_request("1", "tp", params)
    engine.add_request("2", "beam beam!", beam)
    ref = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                ref[out.request_id] = out.outputs[0].token_ids
    # Same phase-2 workload (async pipelining active: no beam).
    for i, prompt in enumerate(("pipelined", "across", "two hosts!")):
        engine.add_request(f"a{i}", prompt, params)
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                ref[out.request_id] = out.outputs[0].token_ids
    for rid in ("0", "1", "2", "a0", "a1", "a2"):
        assert dist_results[rid] == ref[rid], rid

    # The second engine built in the same cluster session (fresh plan
    # epoch) must generate correctly too.
    engine2 = LLM(model=checkpoint, tokenizer=MockTokenizer(VOCAB),
                  dtype="float32", block_size=4,
                  num_device_blocks_override=64, swap_space=0.001,
                  max_model_len=48, max_num_batched_tokens=32,
                  max_num_seqs=8, max_prefill_seqs=4).llm_engine
    engine2.add_request("e2", "second engine", params)
    ref2 = {}
    while engine2.has_unfinished_requests():
        for out in engine2.step():
            if out.finished:
                ref2[out.request_id] = out.outputs[0].token_ids
    assert dist_results["e2"] == ref2["e2"]
