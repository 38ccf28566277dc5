"""Headline benchmark: offline continuous-batching throughput on
LLaMA-7B, one chip.

Mirrors the reference's benchmark_throughput.py (ShareGPT-style mixed
prompt/output lengths, engine defaults) with a seeded synthetic
workload so it runs hermetically (no hub/network I/O; dummy weights —
throughput is weight-value independent).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the ratio to vLLM v0.1.0 on one A100-40G serving
LLaMA-7B on the ShareGPT workload (~1700 output tok/s, estimated from
the reference's published figures, /root/reference/README.md:65-91 —
no absolute number is recorded in-tree).
"""

import argparse
import json
import os
import time

import numpy as np

BASELINE_OUTPUT_TOKS_PER_S = 1700.0


def enable_persistent_compile_cache():
    """XLA compiles each bucketed program once EVER, not once per
    process — bench restarts then start in seconds."""
    import jax
    cache_dir = os.environ.get("VLLM_TPU_XLA_CACHE_DIR",
                               "/tmp/vllm_tpu_xla_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Warm restarts load serialized step EXECUTABLES (no re-trace /
    # lower / compile at all — the XLA cache above only skips the
    # backend-compile stage and still pays ~2 min of tracing/lowering
    # for the 7B step programs). A stable path keeps bench restarts at
    # the same commit deterministic, not axon-load dependent.
    os.environ.setdefault("VLLM_TPU_AOT_CACHE", "/tmp/vllm_tpu_aot_cache")


class _NullTokenizer:
    vocab_size = 32000
    eos_token_id = None

    def encode(self, text):
        raise NotImplementedError("bench feeds token ids directly")

    def convert_ids_to_tokens(self, ids, skip_special_tokens=False):
        if isinstance(ids, int):
            return f"t{ids}"
        return [f"t{i}" for i in ids]

    def convert_tokens_to_string(self, tokens):
        return " ".join(tokens)

    def decode(self, ids, **kwargs):
        return " ".join(f"t{i}" for i in ids)

    def get_added_vocab(self):
        return {}


def llama_7b_config():
    from transformers import LlamaConfig
    return LlamaConfig(vocab_size=32000, hidden_size=4096,
                       intermediate_size=11008, num_hidden_layers=32,
                       num_attention_heads=32, num_key_value_heads=32,
                       max_position_embeddings=2048)


def build_llm(kv_cache_dtype: str, max_num_seqs: int,
              max_num_batched_tokens: int, quantization=None,
              num_decode_steps: int = 8, block_size: int = 16):
    from vllm_tpu import LLM
    return LLM(
        model="llama-7b-bench",
        hf_config=llama_7b_config(),
        tokenizer=_NullTokenizer(),
        use_dummy_weights=True,
        dtype="bfloat16",
        kv_cache_dtype=kv_cache_dtype,
        quantization=quantization,
        num_decode_steps=num_decode_steps,
        max_num_seqs=max_num_seqs,
        max_num_batched_tokens=max_num_batched_tokens,
        block_size=block_size,
        # One program per step kind: compiles (and axon executable
        # loads) run tens of seconds each, so the bench pins single
        # buckets instead of the serving ladders.
        prefill_token_buckets=[max_num_batched_tokens],
        decode_batch_buckets=[max_num_seqs],
        disable_log_stats=True,
        precompile=True,
    )


def synth_requests(n, vocab, seed=1234, max_prompt=512, max_output=256):
    """ShareGPT-shaped lengths (reference filters: prompt<=1024,
    prompt+output<=2048; medians are a few hundred tokens)."""
    rng = np.random.RandomState(seed)
    reqs = []
    for _ in range(n):
        plen = int(rng.randint(16, max_prompt))
        olen = int(rng.randint(32, max_output))
        reqs.append((rng.randint(0, vocab, (plen,)).tolist(), olen))
    return reqs


def run(llm, reqs):
    from vllm_tpu import SamplingParams
    for i, (prompt_ids, olen) in enumerate(reqs):
        llm.llm_engine.add_request(
            str(i), None,
            SamplingParams(temperature=0.0, max_tokens=olen,
                           ignore_eos=True), prompt_token_ids=prompt_ids)
    out_tokens = 0
    prompt_tokens = 0
    t0 = time.perf_counter()
    while llm.llm_engine.has_unfinished_requests():
        for out in llm.llm_engine.step():
            if out.finished:
                out_tokens += sum(len(c.token_ids) for c in out.outputs)
                prompt_tokens += len(out.prompt_token_ids)
    elapsed = time.perf_counter() - t0
    return elapsed, prompt_tokens, out_tokens


def _backend_watchdog(deadline_s: int = 900) -> None:
    """Fail loudly if backend init hangs (observed: the axon tunnel's
    device enumeration can stall indefinitely when the TPU service is
    degraded). jax.devices() runs in a thread; the C-level hang can't
    be interrupted, so on deadline we report and hard-exit nonzero —
    no JSON result line is printed, which keeps a dead backend from
    being recorded as a (zero) benchmark number."""
    import os
    import sys
    import threading
    done = threading.Event()

    def check():
        import jax
        jax.devices()
        done.set()

    threading.Thread(target=check, daemon=True).start()
    if not done.wait(deadline_s):
        print(f"bench: backend init did not complete within {deadline_s}s "
              f"(TPU service unreachable?) — aborting without a result.",
              file=sys.stderr, flush=True)
        os._exit(3)


def main():
    parser = argparse.ArgumentParser()
    # 1000 requests = the reference benchmark_throughput.py default
    # (benchmark_throughput.py:198). Round 1's ad-hoc 128 under-measured
    # the steady state: with a fixed finite workload the final
    # ramp-down (the fleet draining 64 -> 0 with ever-smaller batches)
    # is amortized over the run, and at 128 requests it cost ~11% of
    # the measured rate (128 -> 1653, 256 -> 1753, 512 -> 1830,
    # 1000 -> 1863 tok/s; same engine, same seed family).
    parser.add_argument("--num-requests", type=int, default=1000)
    # 128 concurrent sequences + INT4 KV: the round-4 measured knee.
    # INT4 KV doubles blocks-per-chip (1795 -> 3600+); at 128 seqs the
    # ShareGPT envelope just fits (3378 blocks needed ~3300), and
    # throughput peaked there (b64 1832 / b96 1996 / b128 2076 / b160
    # 1751 tok/s — 160 exceeds capacity and thrashes preemption).
    parser.add_argument("--max-num-seqs", type=int, default=128)
    parser.add_argument("--max-num-batched-tokens", type=int, default=1024)
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    # int8-w8a8: weight-only INT8 everywhere + per-token activation
    # quant on prefill-sized matmuls (int8 MXU = 2x bf16 rate; measured
    # quality delta -0.01% ppl, see README quality gate).
    parser.add_argument("--quantization", type=str, default="int8-w8a8")
    parser.add_argument("--num-decode-steps", type=int, default=8)
    # 0 = auto: 32 for int4 KV, 16 otherwise. The paged-decode kernel
    # issues 2 DMAs per fetched page from its scalar core (payload +
    # scales); at block_size 16 the int4 config is DMA-ISSUE-bound
    # (~0.11 us/issue, measured: int4 and int8 both 14.5 ms/step at
    # identical page counts despite int4 moving half the bytes —
    # tools/attn_microbench.py). 32-token pages halve the issue count
    # and let int4's halved bytes actually bind on bandwidth.
    parser.add_argument("--block-size", type=int, default=0)
    parser.add_argument("--quick", action="store_true",
                        help="small sanity run (8 requests)")
    parser.add_argument("--verbose", action="store_true",
                        help="print a per-step-kind timing breakdown "
                        "to stderr")
    args = parser.parse_args()
    if args.quick:
        args.num_requests = min(args.num_requests, 8)
        args.max_num_seqs = min(args.max_num_seqs, 8)
    enable_persistent_compile_cache()
    _backend_watchdog()

    from vllm_tpu.worker.worker import SUPPORTED_KV_DTYPES
    kv_dtype = args.kv_cache_dtype
    if kv_dtype == "auto":
        # INT4 KV is the measured throughput winner (capacity: decode
        # admission rises from ~57 to ~102 concurrent rows); int8 is
        # the fallback ladder for builds without nibble-packed caches.
        for cand in ("int4", "int8"):
            if cand in SUPPORTED_KV_DTYPES:
                kv_dtype = cand
                break
        else:
            kv_dtype = "bfloat16"
    quant = None if args.quantization in ("none", "") else args.quantization
    block_size = args.block_size or (32 if kv_dtype == "int4" else 16)
    t_start = time.perf_counter()
    llm = build_llm(kv_dtype, args.max_num_seqs,
                    args.max_num_batched_tokens, quant,
                    args.num_decode_steps, block_size)
    import sys
    print(f"[startup] engine ready in "
          f"{time.perf_counter() - t_start:.1f} s (weights + precompile)",
          file=sys.stderr)

    vocab = 32000
    # Warmup: trigger prefill/decode bucket compilation off the clock.
    run(llm, synth_requests(4, vocab, seed=7))

    # Reset perf counters after warmup so the breakdown covers the
    # timed run only.
    for v in llm.llm_engine.perf.values():
        for key in v:
            v[key] = 0 if isinstance(v[key], int) else 0.0
    reqs = synth_requests(args.num_requests, vocab)
    elapsed, prompt_tokens, out_tokens = run(llm, reqs)

    if args.verbose:
        import sys
        total = 0.0
        for kind, p in llm.llm_engine.perf.items():
            if not p["steps"]:
                continue
            total += p["sched_s"] + p["exec_s"] + p["host_s"]
            print(
                f"[perf] {kind}: {p['steps']} steps, "
                f"sched {p['sched_s']:.2f}s exec {p['exec_s']:.2f}s "
                f"host {p['host_s']:.2f}s, "
                f"prompt_toks {p['prompt_tokens']} "
                f"decode_toks {p['decode_tokens']}", file=sys.stderr)
        print(f"[perf] accounted {total:.2f}s of {elapsed:.2f}s wall",
              file=sys.stderr)

    value = out_tokens / elapsed
    w = {"int8": "int8w", "int8-w8a8": "int8w8a8",
         "int4": "int4w"}.get(quant, "bf16w")
    print(json.dumps({
        "metric": f"llama7b_output_tokens_per_s_1chip_{w}_kv_{kv_dtype}",
        "value": round(value, 2),
        "unit": "tokens/s",
        "vs_baseline": round(value / BASELINE_OUTPUT_TOKS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
