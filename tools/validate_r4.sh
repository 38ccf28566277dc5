#!/bin/bash
# Round-4 TPU validation: run serially on the real chip (single host
# core — parallel runs contend and corrupt timings). Each stage logs to
# $LOGDIR and the script prints a one-line summary per stage at the end.
#
# Usage:
#   tools/validate_r4.sh quick   # HEAD-health gate (~10 min): full CPU
#                                # test suite + TPU smoke bench. Run
#                                # before leaving ANY kernel/layout
#                                # refactor as HEAD (round 3 ended with
#                                # a half-landed migration at HEAD and
#                                # no gate to catch it).
#   tools/validate_r4.sh         # full perf matrix (hours)
#
# Full stages:
#   0. chip sanity + standalone int4 weight/KV kernel probes (fails
#      fast on a Mosaic lowering regression)
#   1. synthetic quality gate through the real kernels (incl. int4)
#   2. control bench: int8-w8a8 + int8 KV (round-2/3 headline config)
#   3. warm-restart timing: identical re-run must load AOT executables
#   4. int4-weights bench (same concurrency)
#   5. int4 weights + int4 nibble-packed KV bench
#   6. the int4+int4 config at max_num_seqs 96 and 128 (freed KV
#      blocks move the concurrency knee)
#   7. pages-per-chunk sweep on the int4-KV config (halved page bytes
#      may move the DMA-issue/waste tradeoff)
# After a winner is chosen and bench.py defaults updated, re-run the
# final configuration ONCE at the final commit so the driver's bench
# starts with warm XLA+AOT caches (cache keys shift with any source
# edit).
set -u
cd "$(dirname "$0")/.."
LOGDIR=${LOGDIR:-/tmp/r4logs}
mkdir -p "$LOGDIR"

stage() {  # stage <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* (timeout ${tmo}s)"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc wall=$((SECONDS-t0))s" | tee -a "$LOGDIR/summary.txt"
  tail -2 "$LOGDIR/$name.log" | tee -a "$LOGDIR/summary.txt"
  return $rc
}

: > "$LOGDIR/summary.txt"

if [ "${1:-}" = "quick" ]; then
  # HEAD-health gate: the CPU suite (interpret-mode kernels + sharding
  # tests on the virtual mesh) plus one tiny TPU bench that compiles
  # the quantized write path end-to-end. Both must pass before a
  # refactor commit is left as HEAD.
  stage pytest 1500 python -m pytest tests/ -q || exit 1
  stage bench_smoke 3600 python bench.py --quick || exit 1
  grep -q '"metric"' "$LOGDIR/bench_smoke.log" || { echo "NO JSON"; exit 1; }
  echo "quick gate OK"
  exit 0
fi

stage sanity 300 python -c "import jax; print(jax.devices())"
grep -q "Tpu\|TPU\|axon" "$LOGDIR/sanity.log" || { echo "NO TPU"; exit 1; }

# Mosaic compile of the int4 kernels is SLOW through the axon tunnel
# (measured 2026-08-19: 245 s for the tiny-probe int4 matmul vs 12 s
# for the same op via XLA) — give the probes compile headroom, and
# seed the persistent caches so engine-startup probes hit them.
stage int4probe 2400 python -c "
from bench import enable_persistent_compile_cache
enable_persistent_compile_cache()
from vllm_tpu.ops.pallas.int4_matmul import probe_int4_kernel
assert probe_int4_kernel(), 'int4 kernel failed on hardware'
print('int4 Pallas kernel OK on', __import__('jax').default_backend())
"

stage int4kvprobe 2400 python -c "
from bench import enable_persistent_compile_cache
enable_persistent_compile_cache()
from vllm_tpu.ops.cache import probe_int4_kv_kernels
assert probe_int4_kv_kernels(), 'int4-KV kernels failed on hardware'
print('int4-KV Pallas kernels OK on', __import__('jax').default_backend())
"

# No PYTHONPATH here: PYTHONPATH=. breaks the axon TPU plugin's
# registration (unknown-backend failure); the gate self-paths instead.
stage ppl_gate 3600 env USE_TF=0 python -u evals/synthetic_gate.py

stage bench_int8 5400 python bench.py
stage bench_warm 3600 python bench.py --quick
grep -E "Precompiled|AOT|Weights ready|engine ready" \
  "$LOGDIR/bench_warm.log" | tail -4 | tee -a "$LOGDIR/summary.txt"

stage bench_int4 5400 python bench.py --quantization int4
stage bench_int4kv 5400 python bench.py --quantization int4 \
  --kv-cache-dtype int4
stage bench_int4kv_b96 5400 python bench.py --quantization int4 \
  --kv-cache-dtype int4 --max-num-seqs 96
stage bench_int4kv_b128 5400 python bench.py --quantization int4 \
  --kv-cache-dtype int4 --max-num-seqs 128

for ppc in 8 32; do
  stage "bench_int4kv_ppc$ppc" 5400 env VLLM_TPU_PAGES_PER_CHUNK=$ppc \
    python bench.py --quantization int4 --kv-cache-dtype int4
done

echo; echo "==== SUMMARY ===="; cat "$LOGDIR/summary.txt"
