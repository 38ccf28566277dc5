#!/bin/bash
# Round-3 TPU validation: run serially on the real chip (single host
# core — parallel runs contend and corrupt timings). Each stage logs to
# $LOGDIR and the script prints a one-line summary per stage at the end.
#
# Stages:
#   0. chip sanity + standalone int4 Pallas kernel probe (fails fast on
#      a Mosaic lowering regression: ~1 min vs discovering it inside a
#      10-minute bench compile)
#   1. synthetic quality gate through the real kernels (incl. int4)
#   2. control bench: int8-w8a8 (round-2 headline config)
#   3. warm-restart timing: identical re-run must load AOT executables
#   4. int4-weights bench (same concurrency)
#   5. int4 weights + int4 nibble-packed KV bench
#   6. the int4+int4 config at max_num_seqs 96 (freed KV blocks may
#      move the optimum)
# After a winner is chosen and bench.py defaults updated, re-run the
# final configuration ONCE at the final commit so the driver's bench
# starts with warm XLA+AOT caches (cache keys shift with any source
# edit).
set -u
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r3logs}
mkdir -p "$LOGDIR"

stage() {  # stage <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s)"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc wall=$((SECONDS-t0))s" | tee -a "$LOGDIR/summary.txt"
  tail -2 "$LOGDIR/$name.log" | tee -a "$LOGDIR/summary.txt"
}

: > "$LOGDIR/summary.txt"

stage sanity 300 python -c "import jax; print(jax.devices())"
grep -q "Tpu\|axon" "$LOGDIR/sanity.log" || { echo "NO TPU"; exit 1; }

stage int4probe 600 python -c "
from vllm_tpu.ops.pallas.int4_matmul import probe_int4_kernel
assert probe_int4_kernel(), 'int4 kernel failed on hardware'
print('int4 Pallas kernel OK on', __import__('jax').default_backend())
"

stage int4kvprobe 600 python -c "
from vllm_tpu.ops.cache import probe_int4_kv_kernels
assert probe_int4_kv_kernels(), 'int4-KV kernels failed on hardware'
print('int4-KV Pallas kernels OK on', __import__('jax').default_backend())
"

stage ppl_gate 3600 env PYTHONPATH=. python -u evals/synthetic_gate.py

stage bench_int8 5400 python bench.py
stage bench_warm 3600 python bench.py --quick
grep -E "Precompiled|AOT|Weights ready|engine ready" \
  "$LOGDIR/bench_warm.log" | tail -4 | tee -a "$LOGDIR/summary.txt"

stage bench_int4 5400 python bench.py --quantization int4
stage bench_int4kv 5400 python bench.py --quantization int4 \
  --kv-cache-dtype int4
stage bench_int4kv_b96 5400 python bench.py --quantization int4 \
  --kv-cache-dtype int4 --max-num-seqs 96

echo; echo "==== SUMMARY ===="; cat "$LOGDIR/summary.txt"
