"""Batch decode latency benchmark.

Capability parity: /root/reference/benchmarks/benchmark_latency.py —
mean end-to-end latency of a fixed (batch_size × input_len →
output_len) decode, N iters after warmup. The reference brackets runs
with cudaProfilerStart/Stop for nsys; the TPU analog is
jax.profiler.trace (enable with --profile), viewable in TensorBoard.
"""

import argparse
import time

import numpy as np
from tqdm import tqdm

from vllm_tpu import LLM, SamplingParams


def main(args: argparse.Namespace):
    print(args)

    if args.dummy:
        from vllm_tpu.entrypoints.dummy import (CharTokenizer,
                                                make_dummy_checkpoint)
        args.model = make_dummy_checkpoint()
        args.batch_size = min(args.batch_size, 8)
        args.input_len = min(args.input_len, 16)
        args.output_len = min(args.output_len, 16)
    dummy_kwargs = (dict(block_size=4, num_device_blocks_override=128,
                         max_model_len=64, swap_space=0.01)
                    if args.dummy else {})
    llm_kwargs = dict(
        model=args.model,
        tokenizer=(CharTokenizer() if args.dummy else None),
        tensor_parallel_size=args.tensor_parallel_size,
        max_num_seqs=args.batch_size,
        max_num_batched_tokens=max(args.batch_size * args.input_len, 2560),
        **dummy_kwargs,
    )
    if args.use_dummy_weights:
        llm_kwargs["use_dummy_weights"] = True
    llm = LLM(**llm_kwargs)

    sampling_params = SamplingParams(
        n=args.n,
        temperature=0.0 if args.use_beam_search else 1.0,
        top_p=1.0,
        use_beam_search=args.use_beam_search,
        ignore_eos=True,
        max_tokens=args.output_len,
    )
    print(sampling_params)
    vocab = llm.llm_engine.model_config.get_vocab_size()
    rng = np.random.RandomState(0)
    dummy_prompt_token_ids = rng.randint(
        0, vocab, (args.batch_size, args.input_len)).tolist()

    def run_to_completion(profile: bool = False):
        if profile:
            import jax
            jax.profiler.start_trace(args.profile_dir)
        start_time = time.perf_counter()
        llm.generate(prompt_token_ids=dummy_prompt_token_ids,
                     sampling_params=sampling_params,
                     use_tqdm=False)
        end_time = time.perf_counter()
        if profile:
            import jax
            jax.profiler.stop_trace()
        return end_time - start_time

    print("Warming up...")
    run_to_completion(profile=False)

    latencies = []
    for _ in tqdm(range(args.num_iters), desc="Profiling iterations"):
        latencies.append(run_to_completion(profile=args.profile))
    print(f"Avg latency: {np.mean(latencies)} seconds")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark the latency of a single batch.")
    parser.add_argument("--model", type=str, default="facebook/opt-125m")
    parser.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--n", type=int, default=1,
                        help="output sequences per prompt")
    parser.add_argument("--use-beam-search", action="store_true")
    parser.add_argument("--num-iters", type=int, default=3)
    parser.add_argument("--use-dummy-weights", action="store_true")
    parser.add_argument("--dummy", action="store_true",
                        help="tiny random model, zero network I/O")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace per iter")
    parser.add_argument("--profile-dir", type=str, default="/tmp/jax-trace")
    args = parser.parse_args()
    main(args)
