"""Child process for tests/test_multihost.py: a 2-process CPU
'cluster' — process 0 drives the engine, process 1 replays broadcast
plans. Prints the driver's generated token ids as JSON on stdout."""

import json
import os
import sys

os.environ.setdefault("VLLM_TPU_INTERPRET", "1")
os.environ["VLLM_TPU_FORCE_XLA_OPS"] = "1"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)


class CharTokenizer:
    vocab_size = 128
    eos_token_id = None

    def encode(self, text):
        return [ord(c) % 128 for c in text]

    def convert_ids_to_tokens(self, ids, skip_special_tokens=False):
        return chr(ids) if isinstance(ids, int) else [chr(i) for i in ids]

    def convert_tokens_to_string(self, tokens):
        return "".join(tokens)

    def get_added_vocab(self):
        return {}


def main():
    port, process_id, model_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from vllm_tpu.parallel.distributed import (follower_loop,
                                               init_distributed, is_driver)
    init_distributed(f"localhost:{port}", 2, process_id)
    assert jax.device_count() == 2

    from vllm_tpu.engine.arg_utils import EngineArgs
    # 10 device blocks: tight enough that the beam group (lowest
    # priority, latest arrival) gets preempted by SWAP mid-run and
    # later swapped back in — exercising the broadcast swap plans and
    # the per-process host pools.
    args = EngineArgs(model=model_path, dtype="float32", block_size=4,
                      tensor_parallel_size=2, num_device_blocks_override=10,
                      swap_space=0.001, max_model_len=48,
                      max_num_batched_tokens=32, max_num_seqs=8,
                      max_prefill_seqs=4, disable_log_stats=True)
    tok = CharTokenizer()

    if not is_driver():
        follower_loop(args, tokenizer=tok)
        # Second engine in the SAME cluster session (regression: the
        # plan channel's coordination-service keys are write-once, so
        # engine 2 must publish under a fresh epoch prefix).
        follower_loop(args, tokenizer=tok)
        return

    from vllm_tpu import SamplingParams
    from vllm_tpu.engine.llm_engine import LLMEngine
    engine = LLMEngine.from_engine_args(args, tokenizer=tok)
    params = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    beam = SamplingParams(use_beam_search=True, best_of=2, n=1,
                          temperature=0.0, max_tokens=8, ignore_eos=True)
    engine.add_request("0", "hello mesh", params)
    engine.add_request("1", "tp", params)
    engine.add_request("2", "beam beam!", beam)
    results = {}
    saw_swap = False
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids
        saw_swap = saw_swap or bool(engine.scheduler.swapped)
    results["swapped"] = saw_swap

    # Phase 2 — async (one-step-lagged) scheduling across the cluster:
    # no beam/penalty requests, so the engine pipelines and decode rows
    # run with pending (in-flight) tokens, exercising the plan-shipped
    # feed-patch indices and every-process feed recording.
    assert engine.async_scheduling
    for i, prompt in enumerate(("pipelined", "across", "two hosts!")):
        engine.add_request(f"a{i}", prompt, params)
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids
    # The device-side token feed must have actually been recorded.
    assert engine.worker._feed_tokens is not None

    # Driver eval config 5 shape: the OpenAI server running ON the
    # driver process of a multi-process cluster, streaming a completion
    # (followers keep replaying broadcast plans underneath aiohttp).
    results["openai_stream"] = _serve_openai_once(engine, tok)
    # Per-step plan-channel overhead on the driver's critical path
    # (scaling-efficiency evidence; asserted in the parent test).
    results["channel"] = engine.worker._plan_channel.stats()
    engine.shutdown()

    # Phase 3 — a SECOND engine in the same cluster session: its plan
    # channel must start at a fresh key epoch (coordination-service
    # keys are write-once; engine 1's keys are still live).
    engine2 = LLMEngine.from_engine_args(args, tokenizer=tok)
    engine2.add_request("e2", "second engine", params)
    while engine2.has_unfinished_requests():
        for out in engine2.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids
    engine2.shutdown()
    print("RESULT " + json.dumps(results))


def _serve_openai_once(sync_engine, tok) -> str:
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_tpu.entrypoints.openai.api_server import build_app

    async def run():
        app = build_app(AsyncLLMEngine(sync_engine, log_requests=False),
                        "mh-model")
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/v1/completions", json={
                "model": "mh-model", "prompt": "stream on a cluster",
                "max_tokens": 4, "temperature": 0.0, "ignore_eos": True,
                "stream": True,
            })
            assert r.status == 200, r.status
            raw = (await r.read()).decode()
            assert raw.rstrip().endswith("data: [DONE]")
            chunks = [json.loads(line[len("data: "):])
                      for line in raw.splitlines()
                      if line.startswith("data: ") and "[DONE]" not in line]
            return "".join(c["choices"][0]["text"] for c in chunks)

    return asyncio.run(run())


if __name__ == "__main__":
    main()
