"""Synthetic-weights quantization quality smoke (no-egress stand-in
for a WikiText-2 perplexity gate — see README "Quality gate").

Writes a small random-weight LLaMA checkpoint + a synthetic text
corpus, then runs evals/perplexity.py's harness over the quantization
configs through the REAL serving path (prefill-written quantized KV
re-read by paged decode). Random weights produce near-uniform logits,
so ppl deltas here measure pure quantization numerics, not language
quality — a real-checkpoint run is mandatory before shipping any new
quantization mode if weights are ever available locally.

Usage: python evals/synthetic_gate.py [--cpu] [--layers 4]
       [--tokens 1800] [--configs fp:bfloat16 int4w:int8+w4 ...]
"""

import argparse
import math
import os
import random
import tempfile


def make_checkpoint(layers: int, seed: int = 5) -> str:
    import torch
    import transformers as tf
    cfg = tf.LlamaConfig(vocab_size=2048, hidden_size=256,
                         intermediate_size=512, num_hidden_layers=layers,
                         num_attention_heads=8, num_key_value_heads=8,
                         max_position_embeddings=2048)
    torch.manual_seed(seed)
    model = tf.LlamaForCausalLM(cfg).eval()
    path = tempfile.mkdtemp(prefix="synthetic-gate-")
    model.save_pretrained(path, safe_serialization=True)
    # A matching tokenizer-free corpus: perplexity.py tokenizes with
    # AutoTokenizer, which this random checkpoint lacks — so we bypass
    # its main() and drive run_config directly (see below).
    return path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--layers", type=int, default=4)
    parser.add_argument("--tokens", type=int, default=1800)
    parser.add_argument("--seq-len", type=int, default=512)
    parser.add_argument(
        "--configs", nargs="+",
        default=["fp:bfloat16", "int8kv:int8", "int8w:int8+w",
                 "w8a8:int8+w8a8", "int4w:int8+w4", "int4kv:int4+w4",
                 # The shipped bench headline combination (bench.py
                 # defaults): int8-w8a8 linears + INT4 KV.
                 "int4kv8w:int4+w8a8"])
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend + interpreted "
                        "Pallas (the container pins JAX_PLATFORMS "
                        "before main() runs, so an env var alone "
                        "cannot)")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("VLLM_TPU_INTERPRET", "1")
    # Initialize the backend BEFORE make_checkpoint imports torch:
    # loading torch's shared libraries first breaks the axon TPU
    # plugin's registration ("Backend 'axon' is not in the list of
    # known backends", observed 2026-08-19) — torch-after-jax is fine.
    jax.devices()

    # Repo root on sys.path at RUNTIME, not via PYTHONPATH: an env
    # PYTHONPATH=. also breaks the axon plugin discovery (same
    # unknown-backend failure, reproduced with a bare `import jax`).
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from evals.perplexity import run_config
    path = make_checkpoint(args.layers)
    rng = random.Random(17)
    ids = [rng.randrange(2, 2048) for _ in range(args.tokens)]

    class _IdTokenizer:  # random checkpoints ship no tokenizer files
        vocab_size = 2048
        eos_token_id = None

        def encode(self, text):
            return [ord(c) % 2048 for c in text]

        def convert_ids_to_tokens(self, ids, skip_special_tokens=False):
            return [chr(i % 128) for i in ids]

        def convert_tokens_to_string(self, toks):
            return "".join(toks)

    tokenizer = _IdTokenizer()

    results = {}
    suffixes = {"w": "int8", "w4": "int4", "w8a8": "int8-w8a8", "": None}
    for spec in args.configs:
        name, cfg = spec.split(":")
        kv, _, wq = cfg.partition("+")
        if wq not in suffixes:
            raise SystemExit(
                f"unknown weight-quant suffix '+{wq}' in --configs "
                f"'{spec}' (valid: +w, +w4, +w8a8, or none)")
        quant = suffixes[wq]
        # Cap the KV pool: the analytic memory sizing assumes a real
        # accelerator's HBM and would hand this toy model a multi-GiB
        # cache (one window of max_model_len is all the scorer needs).
        blocks = 2 * ((args.seq_len + 8) // 16 + 2)
        ppl = run_config(path, ids, args.seq_len, args.seq_len, kv, quant,
                         tokenizer=tokenizer,
                         num_device_blocks_override=blocks)
        results[name] = ppl
        print(f"{name}: kv={kv} quant={quant} ppl={ppl:.4f}", flush=True)
    if "fp" in results:
        for name, ppl in results.items():
            if name != "fp":
                rel = (ppl - results["fp"]) / results["fp"]
                print(f"Δppl {name} vs fp: {ppl - results['fp']:+.4f} "
                      f"({rel:+.3%})")
    assert all(math.isfinite(p) for p in results.values())


if __name__ == "__main__":
    main()
