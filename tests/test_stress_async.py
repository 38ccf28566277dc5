"""Adversarial async-scheduling stress: randomized workloads mixing
beam search, penalties, stop strings, staggered arrivals, mid-run
aborts, and a swap-forcing tiny block budget must produce IDENTICAL
outputs in async (one-step-lagged) and sync modes.

The async bookkeeping under test: pending_tokens accounting, the
device token feed (patch indices + record selectors), chunk drops on
preemption, the beam/penalty pipeline-blocker fallback, and abort
staging. Targeted tests cover each alone; this interleaves them over
20 seeds (engines are reused across seeds — the randomized part is the
workload, not the config)."""

import random

import pytest
import torch

from vllm_tpu import LLM, SamplingParams

from .utils import MockTokenizer

VOCAB = 128
MAX_LEN = 48
SEEDS = 20


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    import transformers as tf
    cfg = tf.OPTConfig(vocab_size=VOCAB, hidden_size=32, ffn_dim=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       max_position_embeddings=MAX_LEN,
                       word_embed_proj_dim=32, do_layer_norm_before=True)
    torch.manual_seed(3)
    hf_model = tf.OPTForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("opt-tiny-stress")
    hf_model.save_pretrained(path, safe_serialization=True)
    return str(path)


def make_engine(checkpoint, async_mode, **overrides):
    llm = LLM(model=checkpoint, tokenizer=MockTokenizer(VOCAB),
              dtype="float32", block_size=4,
              # Tight: forces preempt (RECOMPUTE for greedy groups,
              # SWAP for beam) under concurrent load.
              num_device_blocks_override=16, swap_space=0.001,
              max_model_len=MAX_LEN, max_num_batched_tokens=32,
              max_num_seqs=8, max_prefill_seqs=4, num_decode_steps=2,
              async_scheduling=async_mode, **overrides)
    return llm.llm_engine


def random_request(rng, i):
    """A (request_id, prompt, params) triple; all comparisons are
    deterministic (temperature 0) so async/sync must match exactly."""
    rid = f"r{i}"
    words = ["tpu", "mesh", "page", "beam", "swap", "chunk", "feed"]
    prompt = " ".join(rng.sample(words, rng.randint(1, 3)))
    kind = rng.randrange(4)
    if kind == 0:  # plain greedy
        params = SamplingParams(temperature=0.0,
                                max_tokens=rng.randint(4, 12),
                                ignore_eos=True)
    elif kind == 1:  # greedy + penalties (a pipeline blocker)
        params = SamplingParams(temperature=0.0,
                                presence_penalty=rng.choice([0.4, 1.1]),
                                frequency_penalty=rng.choice([0.0, 0.6]),
                                max_tokens=rng.randint(4, 10),
                                ignore_eos=True)
    elif kind == 2:  # beam search (blocker + swap preemption target)
        params = SamplingParams(use_beam_search=True, best_of=2, n=1,
                                temperature=0.0,
                                max_tokens=rng.randint(4, 8),
                                ignore_eos=True)
    else:  # greedy + stop strings (tests in-flight token drops)
        stop = [chr(rng.randrange(32, 127)) for _ in range(2)]
        params = SamplingParams(temperature=0.0, stop=stop,
                                max_tokens=rng.randint(6, 12),
                                ignore_eos=True)
    return rid, prompt, params


def run_workload(engine, seed):
    rng = random.Random(seed)
    n = rng.randint(4, 7)
    requests = [random_request(rng, i) for i in range(n)]
    # Staggered arrivals / mid-flight aborts, keyed on the engine-step
    # index — identical in both modes by construction.
    arrive_at = {i: rng.randrange(4) for i in range(n)}
    aborted = {f"r{i}" for i in range(n) if rng.random() < 0.2}
    abort_at = {f"r{i}": rng.randint(2, 8) for i in range(n)}

    results = {}
    step_idx = 0
    pending = dict(arrive_at)
    for _ in range(400):
        for i, at in list(pending.items()):
            if step_idx >= at:
                rid, prompt, params = requests[i]
                engine.add_request(rid, prompt, params)
                del pending[i]
        for rid in list(aborted):
            if step_idx >= abort_at[rid]:
                engine.abort_request(rid)
        if not pending and not engine.has_unfinished_requests():
            break
        for out in engine.step():
            if out.finished:
                results[out.request_id] = [
                    (c.token_ids, c.text, c.finish_reason)
                    for c in out.outputs
                ]
        step_idx += 1
    assert not engine.has_unfinished_requests(), "workload did not drain"
    # Aborted requests stress the abort/drain machinery but are NOT
    # compared: the async mode observes completions one step later, so
    # a step-indexed abort can legitimately race a natural completion
    # differently per mode. Every non-aborted request must match
    # exactly.
    return {rid: r for rid, r in results.items() if rid not in aborted}


def test_async_matches_sync_randomized(checkpoint):
    sync_engine = make_engine(checkpoint, async_mode=False)
    async_engine = make_engine(checkpoint, async_mode=True)
    assert async_engine.async_scheduling
    for seed in range(SEEDS):
        expected = run_workload(sync_engine, seed)
        got = run_workload(async_engine, seed)
        assert got == expected, f"seed {seed} diverged"


def test_async_matches_sync_int4_everything(checkpoint):
    """The same adversarial workload with BOTH int4 modes on (nibble-
    packed KV + w4a8 weights): preemption, swap, COW and the async
    feed all run against the packed page layout. Fewer seeds — the
    point is soak coverage of the int4 bookkeeping, not re-proving the
    scheduler."""
    kwargs = dict(kv_cache_dtype="int4", quantization="int4")
    sync_engine = make_engine(checkpoint, async_mode=False, **kwargs)
    async_engine = make_engine(checkpoint, async_mode=True, **kwargs)
    for seed in range(5):
        expected = run_workload(sync_engine, seed)
        got = run_workload(async_engine, seed)
        assert got == expected, f"seed {seed} diverged"
