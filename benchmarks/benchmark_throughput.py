"""Offline throughput benchmark.

Capability parity: /root/reference/benchmarks/benchmark_throughput.py —
requests/s and tokens/s over N requests sampled from a ShareGPT JSON
dump (prompt<=1024, prompt+output<=2048 filters), or a seeded synthetic
workload with the same length envelope when no dataset file is given
(TPU hosts are often egress-less).
"""

import argparse
import json
import random
import time
from typing import List, Tuple

import numpy as np

from vllm_tpu import LLM, SamplingParams


def sample_requests_sharegpt(
    dataset_path: str,
    num_requests: int,
    tokenizer,
) -> List[Tuple[List[int], int]]:
    """(prompt_token_ids, output_len) per request. Filters match
    benchmark_throughput.py:58-67."""
    with open(dataset_path) as f:
        dataset = json.load(f)
    dataset = [d for d in dataset if len(d["conversations"]) >= 2]
    dataset = [(d["conversations"][0]["value"],
                d["conversations"][1]["value"]) for d in dataset]

    tokenized = []
    for prompt, completion in dataset:
        prompt_ids = tokenizer.encode(prompt)
        output_len = len(tokenizer.encode(completion))
        if len(prompt_ids) < 4 or output_len < 4:
            continue
        if len(prompt_ids) > 1024 or len(prompt_ids) + output_len > 2048:
            continue
        tokenized.append((prompt_ids, output_len))
    return random.sample(tokenized, num_requests)


def sample_requests_synthetic(num_requests: int, vocab: int,
                              seed: int) -> List[Tuple[List[int], int]]:
    rng = np.random.RandomState(seed)
    reqs = []
    for _ in range(num_requests):
        prompt_len = int(rng.randint(16, 1024))
        output_len = int(rng.randint(16, min(256, 2048 - prompt_len)))
        reqs.append((rng.randint(0, vocab, (prompt_len,)).tolist(),
                     output_len))
    return reqs


def main(args: argparse.Namespace):
    print(args)
    random.seed(args.seed)

    tokenizer = None
    if args.dummy:
        # Hermetic run: tiny on-disk checkpoint, no network egress.
        from vllm_tpu.entrypoints.dummy import (CharTokenizer,
                                                make_dummy_checkpoint)
        args.model = make_dummy_checkpoint()
        tokenizer = CharTokenizer()
        args.max_num_batched_tokens = min(args.max_num_batched_tokens, 64)
        args.max_num_seqs = min(args.max_num_seqs, 8)
    dummy_kwargs = (dict(block_size=4, num_device_blocks_override=128,
                         max_model_len=64, swap_space=0.01)
                    if args.dummy else {})
    llm = LLM(
        model=args.model,
        tokenizer=tokenizer,
        tensor_parallel_size=args.tensor_parallel_size,
        kv_cache_dtype=args.kv_cache_dtype,
        seed=args.seed,
        use_dummy_weights=args.use_dummy_weights,
        max_num_seqs=args.max_num_seqs,
        max_num_batched_tokens=args.max_num_batched_tokens,
        **dummy_kwargs,
    )
    vocab = llm.llm_engine.model_config.get_vocab_size()

    if args.dataset:
        requests = sample_requests_sharegpt(args.dataset, args.num_prompts,
                                            llm.get_tokenizer())
    elif args.dummy:
        rng = np.random.RandomState(args.seed)
        requests = [(rng.randint(0, vocab, (16,)).tolist(), 8)
                    for _ in range(args.num_prompts)]
    else:
        requests = sample_requests_synthetic(args.num_prompts, vocab,
                                             args.seed)

    for i, (prompt_token_ids, output_len) in enumerate(requests):
        sampling_params = SamplingParams(
            n=args.n,
            temperature=0.0 if args.use_beam_search else 1.0,
            top_p=1.0,
            use_beam_search=args.use_beam_search,
            ignore_eos=True,
            max_tokens=output_len,
        )
        llm.llm_engine.add_request(str(i), None, sampling_params,
                                   prompt_token_ids=prompt_token_ids)

    start = time.perf_counter()
    while llm.llm_engine.has_unfinished_requests():
        llm.llm_engine.step()
    elapsed = time.perf_counter() - start

    total_tokens = sum(len(ids) + olen * args.n for ids, olen in requests)
    print(f"Throughput: {len(requests) / elapsed:.2f} requests/s, "
          f"{total_tokens / elapsed:.2f} tokens/s")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark offline serving throughput.")
    parser.add_argument("--dataset", type=str, default=None,
                        help="ShareGPT JSON; synthetic workload if omitted")
    parser.add_argument("--model", type=str, default="facebook/opt-125m")
    parser.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--use-beam-search", action="store_true")
    parser.add_argument("--num-prompts", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dummy", action="store_true",
                        help="tiny random model, zero network I/O")
    parser.add_argument("--use-dummy-weights", action="store_true")
    parser.add_argument("--max-num-seqs", type=int, default=256)
    parser.add_argument("--max-num-batched-tokens", type=int, default=2560)
    args = parser.parse_args()
    main(args)
