"""WikiText-2 perplexity harness — the INT8 quality gate.

BASELINE.md: "WikiText-2 perplexity Δ at INT8 KV within stated Δ of
the FP16 reference". Runs the same model under different
kv-cache-dtype / weight-quantization settings and reports ppl deltas.

Token-by-token decode through the engine's paged cache measures
exactly what serving produces (prefill computes each position's logits
over the *unquantized* fresh K/V, so a prefill-only ppl would hide KV
quantization error).

Needs local assets (TPU hosts are egress-less):
  --model <dir with config.json + weights>   (HF layout)
  --dataset <wikitext-2 raw test split, plain text file>

Usage:
  python evals/perplexity.py --model /data/llama-7b \
      --dataset /data/wikitext-2/wiki.test.raw \
      --configs fp:bfloat16 int8kv:int8 int8w:int8+w
"""

import argparse
import math

import numpy as np


_DECODE_ROWS = 256  # teacher-forcing rows per jitted decode program


def batched_nll(llm, token_ids, seq_len, stride):
    """Sum NLL of each token given its seq_len-window prefix, decoding
    through the paged cache (teacher forcing via logprobs of the
    realized token).

    Positions don't depend on each other (the whole window's KV is in
    the cache after prefill), so they score in _DECODE_ROWS-row
    DecodeBatches sharing one block table — row for position ``pos``
    feeds token ids[pos-1] with context_lens=pos, reading keys
    0..pos-1 through the same paged-attention path serving uses.
    """
    import jax
    import jax.numpy as jnp

    from vllm_tpu.models.common import DecodeBatch, PrefillBatch
    from vllm_tpu.ops.cache import PAD_SLOT

    worker = llm.llm_engine.worker
    model, params = worker.model, worker.params
    block_size = worker.block_size

    @jax.jit
    def prefill(kv, batch):
        _, kv = model.forward(params, batch, kv)
        return kv

    @jax.jit
    def decode_nll(kv, batch, targets):
        hidden, _ = model.forward(params, batch, kv)
        logits = model.compute_logits(params, hidden).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]

    total_nll, total_tokens = 0.0, 0
    windows = range(0, max(len(token_ids) - seq_len, 1), stride)
    for start in windows:
        ids = token_ids[start:start + seq_len]
        T = len(ids)
        n_blocks = -(-T // block_size)
        table = list(range(n_blocks))  # private cache region per window

        # Page-granularity write plan (the engine's fast path): the
        # window fills blocks contiguously from position 0, so page i
        # copies tokens [i*BS : (i+1)*BS] into block table[i]. The
        # token-granularity slot_mapping path would race on TPU (16
        # tokens share each page's read-modify-write) — see
        # ops/cache.write_kv's distinct-blocks requirement.
        batch = PrefillBatch(
            token_ids=jnp.asarray(ids, jnp.int32),
            positions=jnp.asarray(np.arange(T), jnp.int32),
            seq_ids=jnp.zeros((T,), jnp.int32),
            slot_mapping=jnp.full((T,), int(PAD_SLOT), jnp.int32),
            logits_indices=jnp.asarray([T - 1], jnp.int32),
            page_src=jnp.asarray(
                [p * block_size for p in range(n_blocks)], jnp.int32),
            page_dst=jnp.asarray(table, jnp.int32),
        )
        worker.kv_cache = prefill(worker.kv_cache, batch)

        # Teacher-forced NLL of tokens 1..T-1 (prefill wrote quantized
        # KV; these decode rows re-read it like serving would).
        R = _DECODE_ROWS
        positions = list(range(1, T))
        for chunk_start in range(0, len(positions), R):
            chunk = positions[chunk_start:chunk_start + R]
            n = len(chunk)
            pad = R - n
            dbatch = DecodeBatch(
                token_ids=jnp.asarray(
                    [ids[p - 1] for p in chunk] + [0] * pad, jnp.int32),
                positions=jnp.asarray(
                    [p - 1 for p in chunk] + [0] * pad, jnp.int32),
                slot_mapping=jnp.full((R,), int(PAD_SLOT), jnp.int32),
                block_tables=jnp.asarray([table] * R, jnp.int32),
                context_lens=jnp.asarray(
                    [p for p in chunk] + [0] * pad, jnp.int32),
            )
            targets = jnp.asarray([ids[p] for p in chunk] + [0] * pad,
                                  jnp.int32)
            row_logp = np.asarray(decode_nll(worker.kv_cache, dbatch,
                                             targets))
            total_nll -= float(row_logp[:n].sum())
            total_tokens += n
    return total_nll, total_tokens


def run_config(model_dir, dataset_ids, seq_len, stride, kv_dtype, quant,
               tokenizer=None, **engine_kwargs):
    from vllm_tpu import LLM
    llm = LLM(model=model_dir, kv_cache_dtype=kv_dtype, quantization=quant,
              max_model_len=seq_len + 8, max_num_seqs=1,
              disable_log_stats=True, tokenizer=tokenizer, **engine_kwargs)
    nll, n = batched_nll(llm, dataset_ids, seq_len, stride)
    return math.exp(nll / n)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--seq-len", type=int, default=1024)
    parser.add_argument("--stride", type=int, default=1024)
    parser.add_argument("--max-tokens", type=int, default=8192,
                        help="cap on evaluated dataset tokens")
    parser.add_argument(
        "--configs", nargs="+",
        default=["fp:bfloat16", "int8kv:int8", "int8w:int8+w"],
        help="name:kv_dtype[+w|+w4|+w8a8] — +w adds weight-only int8, "
        "+w4 group-scaled int4 weights, +w8a8 int8 weights+activations")
    args = parser.parse_args()

    from transformers import AutoTokenizer
    tokenizer = AutoTokenizer.from_pretrained(args.model)
    with open(args.dataset) as f:
        text = f.read()
    ids = tokenizer.encode(text)[:args.max_tokens]
    print(f"dataset: {len(ids)} tokens, window {args.seq_len}")

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
        ppl = run_config(args.model, ids, args.seq_len, args.stride, kv,
                         quant)
        results[name] = ppl
        print(f"{name}: kv={kv} quant={quant} ppl={ppl:.4f}")
    if "fp" in results:
        for name, ppl in results.items():
            if name != "fp":
                print(f"Δppl {name} vs fp: {ppl - results['fp']:+.4f}")


if __name__ == "__main__":
    main()
