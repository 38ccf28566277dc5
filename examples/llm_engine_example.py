"""Direct engine stepping example.

Capability parity: /root/reference/examples/llm_engine_example.py —
drive LLMEngine manually: add requests with distinct sampling params,
call step() in a loop, print finished outputs.
"""

import argparse

from vllm_tpu import EngineArgs, LLMEngine, SamplingParams


def main(args: argparse.Namespace):
    tokenizer = None
    if args.dummy:
        # Tiny random model, zero network I/O.
        from vllm_tpu.entrypoints.dummy import apply_dummy_args
        tokenizer = apply_dummy_args(args)
    engine_args = EngineArgs.from_cli_args(args)
    engine = LLMEngine.from_engine_args(engine_args, tokenizer=tokenizer)

    # One request per sampling mode the engine distinguishes: greedy,
    # temperature sampling with penalties, parallel sampling with a
    # sample pool, and beam search.
    test_prompts = [
        ("The TPU's systolic array multiplies matrices by",
         SamplingParams(temperature=0.0)),
        ("Paged attention splits the KV cache into",
         SamplingParams(temperature=0.8, top_k=5, presence_penalty=0.2)),
        ("Continuous batching improves throughput because",
         SamplingParams(n=2, best_of=5, temperature=0.8, top_p=0.95,
                        frequency_penalty=0.1)),
        ("The scheduler preempts a sequence group when",
         SamplingParams(n=3, best_of=3, use_beam_search=True,
                        temperature=0.0)),
    ]

    request_id = 0
    while test_prompts or engine.has_unfinished_requests():
        if test_prompts:
            prompt, sampling_params = test_prompts.pop(0)
            engine.add_request(str(request_id), prompt, sampling_params)
            request_id += 1

        request_outputs = engine.step()
        for request_output in request_outputs:
            if request_output.finished:
                print(request_output)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Demo of stepping the LLMEngine directly")
    parser.add_argument("--dummy", action="store_true",
                        help="tiny random model, zero network I/O")
    parser = EngineArgs.add_cli_args(parser)
    args = parser.parse_args()
    main(args)
