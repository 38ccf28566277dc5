"""Online serving benchmark (client side).

Capability parity: /root/reference/benchmarks/benchmark_serving.py —
Poisson arrivals at --request-rate against a running api_server,
measuring request latency, per-token latency, and per-output-token
latency. Beyond the reference (BASELINE.md row 4): requests stream, so
time-to-first-token is measured per request and reported as
p50/p90/p99 alongside latency percentiles. Start the server first:
    python -m vllm_tpu.entrypoints.api_server --model <model> ...
"""

import argparse
import asyncio
import json
import random
import time
from typing import AsyncGenerator, List, Tuple

import aiohttp
import numpy as np

# (prompt_len, output_len, ttft_seconds, total_latency_seconds)
REQUEST_LATENCY: List[Tuple[int, int, float, float]] = []


def sample_requests(args, tokenizer=None) -> List[Tuple[str, int, int]]:
    """(prompt, prompt_len, output_len) tuples."""
    if args.dataset:
        with open(args.dataset) as f:
            dataset = json.load(f)
        dataset = [d for d in dataset if len(d["conversations"]) >= 2]
        pairs = [(d["conversations"][0]["value"],
                  d["conversations"][1]["value"]) for d in dataset]
        out = []
        for prompt, completion in pairs:
            plen = len(prompt.split())  # cheap proxy client-side
            olen = len(completion.split())
            if plen < 4 or olen < 4 or plen > 1024 or plen + olen > 2048:
                continue
            out.append((prompt, plen, olen))
        return random.sample(out, args.num_prompts)
    rng = np.random.RandomState(args.seed)
    words = ["the", "of", "to", "and", "in", "that", "it", "is", "was", "I"]
    out = []
    for _ in range(args.num_prompts):
        plen = int(rng.randint(16, 512))
        olen = int(rng.randint(16, 256))
        prompt = " ".join(rng.choice(words) for _ in range(plen))
        out.append((prompt, plen, olen))
    return out


async def get_request(
    input_requests: List[Tuple[str, int, int]],
    request_rate: float,
) -> AsyncGenerator[Tuple[str, int, int], None]:
    for request in input_requests:
        yield request
        if request_rate == float("inf"):
            continue
        await asyncio.sleep(np.random.exponential(1.0 / request_rate))


async def send_request(api_url: str, prompt: str, prompt_len: int,
                       output_len: int, best_of: int,
                       use_beam_search: bool) -> None:
    request_start_time = time.perf_counter()
    pload = {
        "prompt": prompt,
        "n": 1,
        "best_of": best_of,
        "use_beam_search": use_beam_search,
        "temperature": 0.0 if use_beam_search else 1.0,
        "top_p": 1.0,
        "max_tokens": output_len,
        "ignore_eos": True,
        # Stream so the first NUL-delimited chunk timestamps TTFT.
        "stream": True,
    }
    timeout = aiohttp.ClientTimeout(total=3 * 3600)
    ttft = None
    async with aiohttp.ClientSession(timeout=timeout) as session:
        while True:
            ok = True
            async with session.post(api_url, json=pload) as response:
                async for chunk, _ in response.content.iter_chunks():
                    if ttft is None:
                        ttft = time.perf_counter() - request_start_time
                    if b'"error"' in chunk:
                        ok = False
            if ok:
                break
            ttft = None
    request_latency = time.perf_counter() - request_start_time
    REQUEST_LATENCY.append((prompt_len, output_len, ttft, request_latency))


async def benchmark(api_url: str, input_requests, best_of: int,
                    use_beam_search: bool, request_rate: float) -> None:
    tasks: List[asyncio.Task] = []
    async for request in get_request(input_requests, request_rate):
        prompt, prompt_len, output_len = request
        tasks.append(
            asyncio.create_task(
                send_request(api_url, prompt, prompt_len, output_len,
                             best_of, use_beam_search)))
    await asyncio.gather(*tasks)


def main(args: argparse.Namespace):
    print(args)
    random.seed(args.seed)
    np.random.seed(args.seed)

    api_url = f"http://{args.host}:{args.port}/generate"
    input_requests = sample_requests(args)

    benchmark_start_time = time.perf_counter()
    asyncio.run(
        benchmark(api_url, input_requests, args.best_of,
                  args.use_beam_search, args.request_rate))
    benchmark_time = time.perf_counter() - benchmark_start_time
    print(f"Total time: {benchmark_time:.2f} s")
    print(f"Throughput: {args.num_prompts / benchmark_time:.2f} requests/s")

    lats = np.array([lat for _, _, _, lat in REQUEST_LATENCY])
    ttfts = np.array([t for _, _, t, _ in REQUEST_LATENCY])
    print(f"Average latency: {lats.mean():.2f} s")
    print(f"Latency p50/p90/p99: {np.percentile(lats, 50):.2f} / "
          f"{np.percentile(lats, 90):.2f} / "
          f"{np.percentile(lats, 99):.2f} s")
    print(f"TTFT p50/p90/p99: {np.percentile(ttfts, 50):.3f} / "
          f"{np.percentile(ttfts, 90):.3f} / "
          f"{np.percentile(ttfts, 99):.3f} s")
    avg_per_token_latency = np.mean([
        lat / (plen + olen) for plen, olen, _, lat in REQUEST_LATENCY
    ])
    print(f"Average latency per token: {avg_per_token_latency:.2f} s")
    avg_per_output_token_latency = np.mean(
        [lat / olen for _, olen, _, lat in REQUEST_LATENCY])
    print("Average latency per output token: "
          f"{avg_per_output_token_latency:.2f} s")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark online serving throughput.")
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--dataset", type=str, default=None,
                        help="ShareGPT JSON; synthetic workload if omitted")
    parser.add_argument("--best-of", type=int, default=1)
    parser.add_argument("--use-beam-search", action="store_true")
    parser.add_argument("--num-prompts", type=int, default=100)
    parser.add_argument("--request-rate", type=float, default=float("inf"),
                        help="requests/s Poisson rate; inf = all at once")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    main(args)
