"""TPU executor: owns device state and runs scheduler-planned steps.

Capability parity: /root/reference/vllm/worker/worker.py (input
preparation worker.py:128-237, execute_model worker.py:239-283, memory
profiling worker.py:59-118) + /root/reference/vllm/worker/cache_engine.py
(KV allocation, swap/copy) + the device half of
/root/reference/vllm/model_executor/layers/sampler.py.

TPU re-design:
- One process drives the whole mesh; tensor parallelism is GSPMD
  shardings on params/KV, not per-GPU worker processes + NCCL.
- Step programs are jitted per static bucket (token count / batch size
  / block-table width / sample & topk counts) instead of the
  reference's pad-to-8 dynamic shapes; the KV cache is a single
  donated array so every step updates it in place.
- Memory profiling reads XLA's compiled memory analysis instead of
  sampling torch allocator peaks — static allocation makes the block
  count exact rather than empirical.
- Sampling runs on device for ALL rows at once; the host only
  assembles SequenceOutputs and does beam bookkeeping from returned
  top-k logprobs.
"""

import functools
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from vllm_tpu.config import (CacheConfig, ModelConfig, ParallelConfig,
                             SchedulerConfig)
from vllm_tpu.core.scheduler import SchedulerOutputs, StepKind
from vllm_tpu.logger import init_logger
from vllm_tpu.models.common import (DecodeBatch, MixedBatch, PrefillBatch,
                                    gather_last_hidden)
from vllm_tpu.models.model_loader import get_model
from vllm_tpu.ops.cache import (PAD_SLOT, SCALE_DTYPE, KVCache, copy_blocks,
                                gather_blocks, kv_cache_shape,
                                kv_scales_shape, scatter_blocks)
from vllm_tpu.ops.sampling import (PAD_TOKEN, SamplingTensors, append_counts,
                                   counts_from_history, sample)
from vllm_tpu.parallel.mesh import (KV_CACHE_SPEC, KV_SCALES_SPEC,
                                    active_mesh, build_mesh, shard_params)
from vllm_tpu.sampling_params import SamplingParams
from vllm_tpu.sequence import SequenceGroupMetadata, SequenceOutputs
from vllm_tpu.utils import cdiv, make_buckets, pick_bucket

logger = init_logger(__name__)

try:  # native host-side batch packer (csrc/host/plan_packer.cpp)
    from vllm_tpu import _plan_packer
except ImportError:  # pure-Python fallback below
    _plan_packer = None

# KV dtypes the executor supports; int8/int4 quantize on write with
# per-token-per-head scales and dequantize inside the attention
# kernels (north star beyond the reference). int4 nibble-packs K and V
# into one int8 plane (ops/cache.py KVCache) — half the KV HBM and
# half the decode attention's page bandwidth vs int8.
SUPPORTED_KV_DTYPES = ("bfloat16", "float32", "int8", "int4")

# Plan-header feed modes: whether (and how) a step records the async
# token feed from its own outputs. Carried in the plan so followers
# replay the recording identically (multi-host async scheduling).
FEED_NONE = 0
FEED_FLAT = 1     # out leaves are single-step (mixed program)
FEED_STEPPED = 2  # out leaves carry a leading fused-step axis

SAMPLE_BUCKETS = [1, 2, 4, 8, 16, 32]
TOPK_BUCKETS = [1, 2, 4, 8, 16, 32, 64, 128]
PAIR_BUCKETS = [8, 16, 32, 64, 128, 256]
# Per-row logit_bias entries pad to one of these (1 = the no-bias
# common case: a [B, 1] PAD column the static use_bias flag ignores).
BIAS_BUCKETS = [1, 8, 32, 128]

_DEFAULT_HBM_BYTES = 16 * (1 << 30)  # v5e/v5p-lite chip


def _aval_sig(args) -> Tuple:
    """Hashable (treedef, leaf shape/dtype) signature of a step call's
    arguments — the dispatch key for AOT-cached executables. Matches
    jit's notion of "same program" for our call sites: no static or
    weak-typed arguments reach the step programs (every leaf is an
    ndarray; plan arrays are canonical numpy i32/f32)."""
    leaves, treedef = jax.tree.flatten(args)
    # treedef/np.dtype hash in C — this runs on the serving host path
    # every step, so no string building here (entry_name reprs the sig
    # once per program for the cache filename).
    return (treedef, tuple((l.shape, l.dtype) for l in leaves))


class _StepProgram:
    """A step-program handle: dispatches to an AOT-cached compiled
    executable when one is registered for the argument signature, else
    to the plain jit function.

    Executables are only loaded/compiled+saved during precompile() (the
    only phase that runs cold shapes on purpose); mid-serving lazy
    variants (penalties / bias / prompt-logprobs) take the jit path
    exactly as before.
    """

    __slots__ = ("jit_fn", "key_sig", "worker", "compiled")

    def __init__(self, jit_fn, key_sig, worker) -> None:
        self.jit_fn = jit_fn
        self.key_sig = key_sig
        self.worker = worker
        self.compiled: Dict[Tuple, Any] = {}

    def lower(self, *args):  # memory-analysis path delegates
        return self.jit_fn.lower(*args)

    def __call__(self, *args):
        w = self.worker
        if not self.compiled and not (w._precompiling and w._aot):
            return self.jit_fn(*args)
        sig = _aval_sig(args)
        prog = self.compiled.get(sig)
        if (prog is None and w._precompiling and w._aot is not None
                and not w._aot.disabled):
            name = w._aot.entry_name(self.key_sig, sig)
            prog = w._aot.load(name)
            if prog is None:
                prog = self.jit_fn.lower(*args).compile()
                w._aot.save(name, prog)
                if w._aot.disabled:
                    # Backend can't serialize: don't register the
                    # explicitly-compiled program — fall through to the
                    # jit path so later buckets regain the persistent
                    # XLA cache (an AOT-style lower+compile bypasses
                    # it on this backend).
                    return self.jit_fn(*args)
            self.compiled[sig] = prog
        if prog is not None:
            return prog(*args)
        return self.jit_fn(*args)


class TPUWorker:
    """Single-controller executor over a (possibly multi-chip) mesh."""

    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
    ) -> None:
        self.model_config = model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config

        t0 = time.perf_counter()
        self.mesh = build_mesh(parallel_config.tensor_parallel_size)
        # int8-w8a8 activation quantization must never trigger on a
        # decode-sized batch (its numerics are documented as identical
        # to weight-only INT8): the threshold sits strictly above the
        # largest decode batch bucket, so only prefill/mixed row counts
        # cross it.
        self.model, params = get_model(
            model_config,
            w8a8_min_rows=max(scheduler_config.decode_batch_buckets) + 1)
        t1 = time.perf_counter()
        self.params = shard_params(params, self.model.param_shardings(),
                                   self.mesh)
        jax.block_until_ready(self.params)
        self.weights_bytes = sum(
            leaf.nbytes for leaf in jax.tree.leaves(self.params))
        logger.info("Weights ready: %.2f GiB in %.1f s (load %.1f s, "
                    "shard %.1f s).", self.weights_bytes / 2**30,
                    time.perf_counter() - t0, t1 - t0,
                    time.perf_counter() - t1)

        hf = model_config.hf_config
        self.num_layers = hf.num_hidden_layers
        self.num_kv_heads = getattr(hf, "num_key_value_heads",
                                    hf.num_attention_heads)
        self.head_dim = model_config.get_head_size()
        # The cache stores head_dim padded to 128 lanes (Mosaic HBM-DMA
        # alignment; zero lanes are exact) — head_dim 64/96 models
        # (OPT, GPT-2, GPT-NeoX) failed to compile the page DMAs
        # otherwise. Sizing/accounting uses the padded value.
        from vllm_tpu.ops.cache import padded_head_dim
        self.head_dim_padded = padded_head_dim(self.head_dim)
        self.block_size = cache_config.block_size
        if cache_config.kv_cache_dtype not in SUPPORTED_KV_DTYPES:
            raise NotImplementedError(
                f"kv_cache_dtype={cache_config.kv_cache_dtype} is not "
                f"supported yet (have: {SUPPORTED_KV_DTYPES}).")
        self.kv_quantized = cache_config.kv_cache_dtype in ("int8", "int4")
        # int4 stores nibble-packed bytes: the array dtype is int8 with
        # the K/V plane axis collapsed to 1 (kv_planes).
        self.kv_planes = 1 if cache_config.kv_cache_dtype == "int4" else 2
        self.kv_dtype = jnp.dtype("int8" if self.kv_quantized else
                                  cache_config.kv_cache_dtype)

        self.kv_cache: Optional[KVCache] = None
        self.host_pool: Optional[np.ndarray] = None
        self.host_scales: Optional[np.ndarray] = None
        data_sharding = NamedSharding(self.mesh, KV_CACHE_SPEC)
        self._kv_sharding = KVCache(
            data_sharding,
            NamedSharding(self.mesh, KV_SCALES_SPEC)
            if self.kv_quantized else None)
        self._rep = NamedSharding(self.mesh, P())

        # Multi-host: process 0 drives (scheduler + plan broadcast);
        # followers replay broadcast plans (parallel/distributed.py).
        self._num_processes = jax.process_count()
        self._is_driver = jax.process_index() == 0
        self._plan_channel = None
        if self._num_processes > 1:
            from vllm_tpu.parallel.distributed import PlanChannel
            self._plan_channel = PlanChannel()

        self._base_key = jax.random.PRNGKey(model_config.seed)
        self._step_counter = 0
        # Async-scheduling token feed: next input token per sequence
        # from the most recently dispatched step. The device array
        # lives on EVERY process (each records it from its own
        # replicated step outputs); the seq_id -> slot map is
        # driver-only host bookkeeping (it shapes the idx arrays the
        # plans carry).
        self._feed_tokens: Optional[Any] = None
        self._feed_map: Optional[Dict[int, int]] = None
        self._block_buckets = scheduler_config.block_table_buckets(
            self.block_size)
        self._hist_buckets = make_buckets(
            16, max(16, scheduler_config.max_model_len))
        self._fn_cache: Dict[Any, Any] = {}
        # AOT program cache (warm restart): created in precompile()
        # once the config is complete (needs the KV block count).
        self._aot = None
        self._precompiling = False

    # ------------------------------------------------------------------
    # memory sizing (parity: worker.py:59-118, re-done statically)
    # ------------------------------------------------------------------

    @property
    def swap_enabled(self) -> bool:
        """Whether preempt-by-SWAP (and so beam/best_of>1) is usable."""
        return (self.cache_config.num_cpu_blocks or 0) > 0

    def block_bytes(self) -> int:
        """Global bytes of one KV block across all layers (parity:
        cache_engine.py:132-146), including dequant scales if
        quantized. kv_planes folds the int4 packing in (1 plane of
        int8 bytes holds both K and V)."""
        payload = (self.num_layers * self.kv_planes * self.num_kv_heads *
                   self.block_size * self.head_dim_padded *
                   self.kv_dtype.itemsize)
        if self.kv_quantized:
            payload += (int(np.prod(self._scales_shape(1))) *
                        jnp.dtype(SCALE_DTYPE).itemsize)
        return payload

    def profile_num_available_blocks(self) -> Tuple[int, int]:
        # Swap pools are per-process (each host keeps its own KV
        # shard), so the count is world-size independent — parity:
        # cache_engine.py:120-130.
        num_cpu = self.cache_config.swap_space_bytes // self.block_bytes()
        if self.cache_config.num_device_blocks_override is not None:
            return self.cache_config.num_device_blocks_override, num_cpu

        tp = self.parallel_config.tensor_parallel_size
        total_hbm = int(
            os.environ.get("VLLM_TPU_HBM_BYTES", _DEFAULT_HBM_BYTES))
        temp_bytes = self._estimate_step_temp_bytes()
        weights_per_dev = self.weights_bytes // tp
        block_dev_bytes = max(1, self.block_bytes() // tp)
        budget = int(total_hbm * self.cache_config.gpu_memory_utilization)
        avail = budget - weights_per_dev - temp_bytes
        num_device = max(avail // block_dev_bytes, 0)
        # The block count is part of the KV cache shape, so run-to-run
        # jitter in the temp estimate would change every compiled
        # program and defeat the persistent compilation cache. The
        # analytic estimate is deterministic; only the compile-measured
        # path needs rounding to a stable granule.
        if os.environ.get("VLLM_TPU_EXACT_MEM_PROFILE") and num_device > 256:
            num_device -= num_device % 256
        if num_device <= 0:
            raise RuntimeError(
                f"No HBM left for KV cache: budget={budget}, "
                f"weights={weights_per_dev}, activations={temp_bytes}.")
        logger.info(
            "Memory profile: weights %.2f GiB/dev, step temp %.2f GiB, "
            "KV blocks: %d device (%.2f GiB/dev), %d host swap.",
            weights_per_dev / 2**30, temp_bytes / 2**30, num_device,
            num_device * block_dev_bytes / 2**30, num_cpu)
        return int(num_device), int(num_cpu)

    def _estimate_step_temp_bytes(self) -> int:
        """Transient HBM a step program needs beyond weights + KV.

        Default: a closed-form bound over the largest bucketed shapes.
        Step temps are tiny next to the KV budget (~0.1 GiB measured vs
        ~8 GiB free on a 7B/v5e config), so a conservative formula
        costs a couple of blocks — while the compile-based exact
        answer cost ~21 minutes of cold startup (two full 7B step
        compiles whose programs are then thrown away; the placeholder
        block count keeps them from ever matching the serving
        programs in the persistent XLA cache). Set
        VLLM_TPU_EXACT_MEM_PROFILE=1 to compile-and-measure instead
        (result disk-cached per config under ~/.cache/vllm_tpu).
        """
        if not os.environ.get("VLLM_TPU_EXACT_MEM_PROFILE"):
            return self._analytic_step_temp_bytes()
        cache_path = self._mem_profile_cache_path()
        if cache_path is not None and os.path.exists(cache_path):
            try:
                with open(cache_path) as f:
                    cached = int(f.read().strip())
                logger.info("Memory profile loaded from %s.", cache_path)
                return cached
            except (OSError, ValueError):
                pass
        temp = self._compiled_step_temp_bytes()
        if cache_path is not None:
            try:
                os.makedirs(os.path.dirname(cache_path), exist_ok=True)
                with open(cache_path, "w") as f:
                    f.write(str(temp))
            except OSError:
                pass
        return temp

    def _analytic_step_temp_bytes(self) -> int:
        """Closed-form bound on step-program temps.

        Accounts the few payload-sized live tensors a step creates:
        MLP activations (gate/up), q/k/v + residuals, the f32 KV
        quantize staging, f32 logits + the sampler's full-vocab sort
        buffers, plus fixed slack for fusion temps. Everything scales
        with the LARGEST prefill token bucket / decode batch bucket.
        """
        cfg = self.scheduler_config
        hf = self.model_config.hf_config
        T = cfg.prefill_token_buckets[-1] + cfg.decode_batch_buckets[-1]
        B = max(cfg.decode_batch_buckets[-1] + cfg.max_prefill_seqs,
                SAMPLE_BUCKETS[-1])
        V = self.model_config.get_vocab_size()
        H = hf.hidden_size
        inter = getattr(hf, "intermediate_size", None) or 4 * H
        act = 2  # bf16
        # Peak-liveness terms only (XLA fuses the elementwise chains;
        # the scanned layer body reuses one layer's activations). XLA's
        # own memory_analysis measured 0.10 GiB on the 7B bench config
        # against 0.15 estimated here — every 100 MB over-estimate
        # costs ~23 KV blocks.
        temp = (
            2 * T * inter * act        # gate/up MLP activations
            + 3 * T * H * act          # residual + attn in/out
            + T * 2 * self.num_kv_heads * self.head_dim * 4  # KV quant f32
            + 3 * B * V * 4            # f32 logits + top-k/sort temps
        )
        if cfg.enable_prompt_logprobs:
            # The echo+logprobs prefill variant holds [T_pre, V] f32
            # logits + log-softmax + the top_k sort temps for every
            # prompt position (same 3x convention as the sampler's
            # [B, V] charge above). This variant compiles lazily on the
            # first echo request — AFTER the startup cross-check ran —
            # so under-charging it here would OOM mid-serving.
            temp += 3 * cfg.prefill_token_buckets[-1] * V * 4
        tp = self.parallel_config.tensor_parallel_size
        return int(temp // tp + (48 << 20))  # +48 MiB slack

    def _mem_profile_cache_path(self) -> Optional[str]:
        import hashlib
        hf = self.model_config.hf_config
        cfg = self.scheduler_config
        key = repr((hf.to_diff_dict() if hasattr(hf, "to_diff_dict") else
                    str(hf), self.cache_config.kv_cache_dtype,
                    self.model_config.quantization, self.block_size,
                    cfg.prefill_token_buckets, cfg.decode_batch_buckets,
                    cfg.max_prefill_seqs, self._block_buckets,
                    self.parallel_config.tensor_parallel_size,
                    jax.__version__))
        digest = hashlib.sha256(key.encode()).hexdigest()[:16]
        base = os.environ.get(
            "VLLM_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "vllm_tpu"))
        return os.path.join(base, f"memprofile-{digest}.txt")

    def _compiled_step_temp_bytes(self) -> int:
        """Lower+compile the largest step programs abstractly and read
        XLA's static temp allocation."""
        try:
            T = self.scheduler_config.prefill_token_buckets[-1]
            S = self.scheduler_config.max_prefill_seqs
            B = self.scheduler_config.decode_batch_buckets[-1]
            MB = self._block_buckets[-1]
            placeholder_blocks = 64
            kv = self._kv_abstract(placeholder_blocks)
            i32 = jnp.int32

            def abstract(shape, dtype=i32):
                return jax.ShapeDtypeStruct(shape, dtype)

            NP = T // self.block_size + S
            pre_batch = PrefillBatch(abstract((T,)), abstract((T,)),
                                     abstract((T,)), abstract((T,)),
                                     abstract((S,)), abstract((NP,)),
                                     abstract((NP,)))
            dec_batch = DecodeBatch(abstract((B,)), abstract((B,)),
                                    abstract((B,)), abstract((B, MB)),
                                    abstract((B,)))

            def tensors(n):
                f32 = jnp.float32
                return SamplingTensors(abstract((n,), f32),
                                       abstract((n,), f32), abstract((n,)),
                                       abstract((n,), f32),
                                       abstract((n,), f32), abstract((n, 16)),
                                       abstract((n, BIAS_BUCKETS[0])),
                                       abstract((n, BIAS_BUCKETS[0]), f32))

            key = jax.ShapeDtypeStruct((2,), jnp.uint32)
            params_abs = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.
                                               sharding), self.params)
            temps = []
            for fn, args in (
                (self._make_step_fn("mixed", 1, 8, 16),
                 (params_abs, kv, MixedBatch(pre_batch, dec_batch),
                  tensors(S + B), key)),
                (self._make_step_fn("decode", 1, 8, 16,
                                    self.scheduler_config.num_decode_steps),
                 (params_abs, kv, dec_batch, tensors(B), key)),
            ):
                mem = fn.lower(*args).compile().memory_analysis()
                temps.append(
                    getattr(mem, "temp_size_in_bytes", 0) or 0)
            temp = max(temps)
            if temp > 0:
                return int(temp * 1.05)  # small safety margin
        except Exception as e:  # pragma: no cover - backend specific
            logger.warning("Static memory analysis unavailable (%s).", e)
        total_hbm = int(
            os.environ.get("VLLM_TPU_HBM_BYTES", _DEFAULT_HBM_BYTES))
        return int(0.08 * total_hbm)

    def _kv_shape(self, num_blocks):
        return kv_cache_shape(self.num_layers, self.num_kv_heads, num_blocks,
                              self.block_size, self.head_dim_padded,
                              kv_planes=self.kv_planes)

    def _scales_shape(self, num_blocks):
        return kv_scales_shape(self.num_layers, self.num_kv_heads,
                               num_blocks, self.block_size,
                               self.parallel_config.tensor_parallel_size)

    def _kv_abstract(self, num_blocks) -> KVCache:
        data = jax.ShapeDtypeStruct(self._kv_shape(num_blocks),
                                    self.kv_dtype)
        scales = (jax.ShapeDtypeStruct(self._scales_shape(num_blocks),
                                       SCALE_DTYPE)
                  if self.kv_quantized else None)
        return KVCache(data, scales)

    def init_cache(self) -> None:
        cfg = self.cache_config
        assert cfg.num_device_blocks is not None
        nb = cfg.num_device_blocks
        if self.kv_planes == 1:
            # Standalone tiny compile of the nibble-packed kernel
            # variants: a Mosaic regression becomes a logged XLA
            # fallback instead of a failed step-program compile.
            from vllm_tpu.ops.cache import probe_int4_kv_kernels
            probe_int4_kv_kernels()
        zeros = KVCache(
            jnp.zeros(self._kv_shape(nb), self.kv_dtype),
            jnp.zeros(self._scales_shape(nb), SCALE_DTYPE)
            if self.kv_quantized else None)
        self.kv_cache = jax.device_put(zeros, self._kv_sharding)
        # Host swap pools hold THIS PROCESS's shard (its kv heads /
        # scale groups): swap never moves KV across hosts (parity:
        # cache_engine.py:120-130 swaps each GPU's own cache slice).
        self._kv_slices = self._process_slices(self.kv_cache.data)
        self._scale_slices = (self._process_slices(self.kv_cache.scales)
                              if self.kv_quantized else None)
        ncpu = max(cfg.num_cpu_blocks, 1)
        shape = self._local_shape(self._kv_slices)
        self.host_pool = np.zeros((ncpu,) + shape[:1] + shape[2:],
                                  dtype=np.dtype(self.kv_dtype))
        if self.kv_quantized:
            # Host mirror of the padded scales page layout.
            scales_shape = self._local_shape(self._scale_slices)
            self.host_scales = np.zeros(
                (ncpu,) + scales_shape[:1] + scales_shape[2:],
                np.dtype(SCALE_DTYPE))
        self._pending_swap_outs: List[Tuple[KVCache, List[int], int]] = []

    # -- per-process shard geometry (multi-host swap) -------------------

    @staticmethod
    def _process_slices(arr) -> Tuple[List[int], List[int]]:
        """Per-axis [lo, hi) bounds of this process's union of
        addressable shards. The union must be contiguous (true for our
        1-axis shardings with standard device order) — a gap would
        silently corrupt the swap pools, so verify coverage."""
        lo = list(arr.shape)
        hi = [0] * arr.ndim
        covered = 0
        seen = set()
        for s in arr.addressable_shards:
            for ax, sl in enumerate(s.index):
                start = sl.start or 0
                stop = sl.stop if sl.stop is not None else arr.shape[ax]
                lo[ax] = min(lo[ax], start)
                hi[ax] = max(hi[ax], stop)
            key = tuple((sl.start or 0,
                         sl.stop if sl.stop is not None else arr.shape[ax])
                        for ax, sl in enumerate(s.index))
            if key not in seen:  # replicas repeat the same index
                seen.add(key)
                covered += int(np.prod([b - a for a, b in key]))
        box = int(np.prod([h - l for h, l in zip(hi, lo)]))
        assert covered == box, (
            f"process shards are non-contiguous (cover {covered} of "
            f"bounding box {box}); per-process swap pools require a "
            "contiguous shard range per host")
        return lo, hi

    @staticmethod
    def _local_shape(slices) -> Tuple[int, ...]:
        lo, hi = slices
        return tuple(h - l for h, l in zip(hi, lo))

    # ------------------------------------------------------------------
    # jitted step programs
    # ------------------------------------------------------------------

    def _make_step_fn(self, kind: str, num_samples: int,
                      num_topk: int, hist_len: int, num_steps: int = 1,
                      greedy_only: bool = False,
                      with_penalties: bool = False,
                      with_bias: bool = False,
                      prompt_lp_topk: int = 0):
        """kind: "mixed" (prefill part + single-step decode part fused
        into one program) or "decode" (decode-only, optionally a
        multi-step scan). ``with_penalties`` (static) enables the
        presence/frequency count machinery; multi-step chunks carry the
        [B, V] count state on device, appending each sampled token, so
        penalty requests chunk like everything else. ``with_bias``
        (static) enables per-row logit_bias. ``prompt_lp_topk`` > 0
        (mixed only) additionally emits per-PROMPT-position logprobs
        of each realized token plus its top-k alternatives (the
        echo+logprobs / perplexity path; costs a [T, V] logits pass,
        so it is a separate program variant)."""
        key_sig = ("step", kind, num_samples, num_topk, num_steps,
                   greedy_only, with_penalties, with_bias, prompt_lp_topk)
        if key_sig in self._fn_cache:
            return self._fn_cache[key_sig]
        model = self.model
        block_size = self.block_size
        max_model_len = self.scheduler_config.max_model_len
        vocab = self.model_config.get_vocab_size()

        if kind == "mixed" or num_steps == 1:

            def step(params, kv_cache, batch, tensors, key):
                hidden, kv_cache = model.forward(params, batch, kv_cache)
                sel = gather_last_hidden(hidden, batch)
                logits = model.compute_logits(params, sel)
                out = sample(logits, tensors, key, num_samples, num_topk,
                             greedy_only, use_penalties=with_penalties,
                             use_bias=with_bias)
                if kind == "decode":
                    out = jax.tree.map(lambda x: x[None], out)  # [1, ...]
                if prompt_lp_topk:
                    T = batch.num_prefill_tokens
                    tok = batch.prefill.token_ids
                    seq = batch.prefill.seq_ids
                    # Position i's token is predicted from position
                    # i-1's logits WITHIN the same sequence; each
                    # sequence's first token has no logprob (masked to
                    # 0 here, None at the API).
                    logp = jax.nn.log_softmax(
                        model.compute_logits(params, hidden[:T - 1]),
                        axis=-1)  # [T-1, V]
                    realized = jnp.take_along_axis(
                        logp, tok[1:][:, None], axis=-1)[:, 0]
                    same = (seq[1:] == seq[:-1]) & (seq[1:] >= 0)
                    plp_lps, plp_ids = jax.lax.top_k(logp, prompt_lp_topk)
                    plp = (jnp.where(same, realized, 0.0), plp_ids,
                           plp_lps)
                    return kv_cache, (out, plp)
                return kv_cache, out
        else:
            # Multi-step decode: sampled tokens feed back on device, so
            # one dispatch + one host fetch covers ``num_steps`` tokens
            # per sequence (host/dispatch overhead dominates small
            # decode steps on a tunneled runtime). Slot/position/context
            # advance deterministically; the host applies tokens and
            # stop checks per chunk.
            def step(params, kv_cache, batch, tensors, key):
                pad = batch.context_lens == 0
                counts0 = (counts_from_history(tensors.output_tokens, vocab)
                           if with_penalties else jnp.zeros((), jnp.float32))

                def body(carry, j):
                    kv, tok, pos, counts = carry
                    block = jnp.take_along_axis(
                        batch.block_tables,
                        jnp.minimum(pos // block_size,
                                    batch.block_tables.shape[1] -
                                    1)[:, None], axis=1)[:, 0]
                    # Chunk tail positions past max_model_len (a
                    # sequence finished mid-chunk) must not write —
                    # their table rows don't cover them.
                    drop = pad | (pos >= max_model_len)
                    slot = jnp.where(drop, PAD_SLOT,
                                     block * block_size + pos % block_size)
                    b = DecodeBatch(
                        token_ids=tok,
                        positions=pos,
                        slot_mapping=slot,
                        block_tables=batch.block_tables,
                        context_lens=jnp.where(pad, 0, pos + 1),
                    )
                    hidden, kv = model.forward(params, b, kv)
                    logits = model.compute_logits(params, hidden)
                    out = sample(logits, tensors,
                                 jax.random.fold_in(key, j), num_samples,
                                 num_topk, greedy_only,
                                 use_penalties=with_penalties,
                                 use_bias=with_bias,
                                 counts=counts if with_penalties else None)
                    newtok = out.samples[0]
                    if with_penalties:
                        counts = append_counts(counts, newtok)
                    return (kv, newtok, pos + 1, counts), out

                (kv_cache, _, _, _), outs = jax.lax.scan(
                    body,
                    (kv_cache, batch.token_ids, batch.positions, counts0),
                    jnp.arange(num_steps))
                return kv_cache, outs  # leaves stacked on a leading S dim

        # Trace under the active mesh so the attention/cache ops wrap
        # their Pallas kernels in shard_map when tp > 1.
        mesh = self.mesh
        inner_step = step

        def step_in_mesh(params, kv_cache, batch, tensors, key):
            with active_mesh(mesh):
                return inner_step(params, kv_cache, batch, tensors, key)

        # Sampler outputs replicate across the mesh so the driver
        # process can fetch them locally under multi-host.
        fn = jax.jit(step_in_mesh, donate_argnums=(1,),
                     out_shardings=(self._kv_sharding, self._rep))
        prog = _StepProgram(fn, key_sig, self)
        self._fn_cache[key_sig] = prog
        return prog

    @functools.cached_property
    def _copy_fn(self):
        return jax.jit(copy_blocks, donate_argnums=(0,))

    @functools.cached_property
    def _gather_fn(self):
        return jax.jit(gather_blocks)

    @functools.cached_property
    def _scatter_fn(self):
        return jax.jit(scatter_blocks, donate_argnums=(0,))

    def _next_key(self):
        self._step_counter += 1
        return jax.random.fold_in(self._base_key, self._step_counter)

    # ------------------------------------------------------------------
    # precompilation (no reference analog; XLA's static-shape answer to
    # CUDA-graph capture, parallel_state.py:506-556)
    # ------------------------------------------------------------------

    def precompile(self) -> None:
        """Compile the common-case (greedy/sample, no penalties) step
        program for every bucket up front, so no compile lands mid-serving.
        Runs each program once with all-padding inputs: PAD_SLOT drops
        every KV write and context_len 0 masks attention, so the live
        cache passes through unchanged."""
        assert self.kv_cache is not None, "init_cache() first"
        cfg = self.scheduler_config
        t0 = time.perf_counter()
        hist0 = self._hist_buckets[0]
        from vllm_tpu.worker.aot_cache import (AOTProgramCache,
                                               resolve_cache_dir)
        aot_dir = resolve_cache_dir()
        if aot_dir is not None:
            self._aot = AOTProgramCache(
                aot_dir, self._aot_key_material(),
                execution_devices=self.mesh.devices.flat)
        self._precompiling = True

        # Build all-padding PLANS and run them through the exact
        # serving exec path (_exec_mixed / _exec_decode): a retrace of
        # a 7B step program costs ~56 s of pure Python tracing, and
        # hand-crafted device arrays here repeatedly proved subtly
        # different from the serving plans' arrays (provenance/
        # commitment), silently re-tracing+compiling mid-serving
        # despite "precompilation". Same code path => identical avals
        # by construction.
        def sampling_arrays(n):
            return [
                np.zeros((n,), np.float32),  # temperature (0 = greedy)
                np.ones((n,), np.float32),  # top_p
                np.ones((n,), np.int32),  # top_k
                np.zeros((n,), np.float32),  # presence
                np.zeros((n,), np.float32),  # frequency
                np.full((n, hist0), int(PAD_TOKEN), np.int32),  # history
                np.full((n, BIAS_BUCKETS[0]), int(PAD_TOKEN),
                        np.int32),  # bias ids
                np.zeros((n, BIAS_BUCKETS[0]), np.float32),  # bias vals
            ]

        S = cfg.max_prefill_seqs
        MB = self._block_buckets[-1]
        Btop = cfg.decode_batch_buckets[-1]

        def decode_arrays(B):
            # Raw host tokens + an all-(-1) feed-idx array: _exec_*
            # applies the same _patch_tokens the serving path does, so
            # the step programs' token-input avals match exactly.
            return [
                np.zeros((B,), np.int32),  # token_ids
                np.zeros((B,), np.int32),  # positions
                np.full((B,), int(PAD_SLOT), np.int32),  # slot_mapping
                np.zeros((B, MB), np.int32),  # block_tables
                np.zeros((B,), np.int32),  # context_lens
            ]

        def feed_idx(B):
            return [np.full((B,), -1, np.int32)]

        # Both the greedy-only and the sampled (full-vocab sort)
        # program variants: serving traffic is usually temperature > 0,
        # and its first request otherwise paid a multi-minute
        # mid-serving compile (measured as 20 s p50 TTFT on the first
        # serving-bench run vs 0.23 s warm).
        for greedy in (1, 0):
            for T in cfg.prefill_token_buckets:
                NP = T // self.block_size + S
                plan = ([np.array([0, 1, 1, greedy, 0, 0, 0, FEED_NONE],
                                  np.int32)] + [
                    np.zeros((T,), np.int32),  # token_ids
                    np.zeros((T,), np.int32),  # positions
                    np.full((T,), -1, np.int32),  # seq_ids
                    np.full((T,), int(PAD_SLOT), np.int32),  # slot_mapping
                    np.zeros((S,), np.int32),  # logits_indices
                    np.zeros((NP,), np.int32),  # page_src
                    np.full((NP,), -1, np.int32),  # page_dst
                ] + decode_arrays(Btop) + feed_idx(Btop) +
                    sampling_arrays(S + Btop))
                self._exec_mixed(plan)
            for B in cfg.decode_batch_buckets:
                plan = ([
                    np.array([1, cfg.num_decode_steps, 1, greedy, 0, 0, 0,
                              FEED_NONE], np.int32)
                ] + decode_arrays(B) + feed_idx(B) + sampling_arrays(B))
                self._exec_decode(plan)
        jax.block_until_ready(self.kv_cache.data)
        self._precompiling = False
        logger.info(
            "Precompiled %d mixed + %d decode programs in %.1f s%s.",
            2 * len(cfg.prefill_token_buckets),
            2 * len(cfg.decode_batch_buckets),
            time.perf_counter() - t0,
            f" (AOT: {self._aot.stats()})" if self._aot else "")
        self._check_temp_estimate()

    def _check_temp_estimate(self) -> None:
        """Cross-check the analytic temp formula against XLA's measured
        temp allocation of the ACTUAL serving programs (free when the
        AOT path holds their Compiled handles). The formula sized the
        KV block count; if the real temps exceed the remaining HBM
        headroom, fail HERE — an analytic misestimate must not OOM
        mid-serving on a model shape outside the formula's assumptions.
        """
        if self._aot is None or self.cache_config.num_device_blocks is None:
            return
        worst = 0
        try:
            for wrapper in self._fn_cache.values():
                for prog in wrapper.compiled.values():
                    mem = prog.memory_analysis()
                    worst = max(worst,
                                getattr(mem, "temp_size_in_bytes", 0) or 0)
        except Exception as e:  # backend without memory stats
            logger.debug("Temp-estimate cross-check unavailable (%s).", e)
            return
        if worst == 0:
            return
        est = self._estimate_step_temp_bytes()
        tp = self.parallel_config.tensor_parallel_size
        total_hbm = int(
            os.environ.get("VLLM_TPU_HBM_BYTES", _DEFAULT_HBM_BYTES))
        used = (self.weights_bytes // tp +
                self.cache_config.num_device_blocks *
                (self.block_bytes() // tp) + worst)
        if used > total_hbm:
            raise RuntimeError(
                f"Step programs need {worst / 2**30:.2f} GiB of temp HBM "
                f"but the analytic estimate assumed "
                f"{est / 2**30:.2f} GiB and sized the KV cache into that "
                f"margin (total demand {used / 2**30:.2f} GiB > "
                f"{total_hbm / 2**30:.2f} GiB). Set "
                "VLLM_TPU_EXACT_MEM_PROFILE=1 (compile-measured sizing) "
                "or lower --gpu-memory-utilization.")
        if worst > est:
            logger.warning(
                "Measured step temps (%.2f GiB) exceed the analytic "
                "estimate (%.2f GiB); serving still fits in HBM "
                "(%.2f of %.2f GiB) but the KV cache is sized into the "
                "utilization slack. Consider VLLM_TPU_EXACT_MEM_PROFILE=1.",
                worst / 2**30, est / 2**30, used / 2**30,
                total_hbm / 2**30)

    def _aot_key_material(self) -> str:
        """Everything that must match for a cached executable to be
        valid: the full package source (any edit invalidates), the
        shape-determining configs (including the KV block count — it is
        part of the donated cache aval), and the runtime (jax version,
        backend, device kind, mesh, process)."""
        import glob
        import hashlib

        import vllm_tpu
        root = os.path.dirname(os.path.abspath(vllm_tpu.__file__))
        src = hashlib.sha256()
        for path in sorted(
                glob.glob(os.path.join(root, "**", "*.py"),
                          recursive=True)):
            src.update(path.encode())
            with open(path, "rb") as f:
                src.update(f.read())
        dev = jax.devices()[0]
        hf = self.model_config.hf_config
        bits = {
            "src": src.hexdigest(),
            "jax": jax.__version__,
            "platform": dev.platform,
            "device_kind": dev.device_kind,
            "n_devices": jax.device_count(),
            "process": (jax.process_index(), jax.process_count()),
            "mesh": repr(self.mesh.shape),
            "hf": hf.to_json_string(),
            "model": (self.model_config.dtype, self.model_config.seed,
                      self.model_config.quantization),
            "cache": (self.block_size, self.cache_config.kv_cache_dtype,
                      self.cache_config.num_device_blocks),
            "sched": repr(vars(self.scheduler_config)),
            "buckets": (self._block_buckets, self._hist_buckets,
                        BIAS_BUCKETS, SAMPLE_BUCKETS, TOPK_BUCKETS),
            # Anything else that changes the traced step programs
            # without changing source or configs: kernel-tuning env
            # knobs and the startup probes' Pallas-vs-XLA dispatch
            # outcomes (a libtpu change can flip a probe between runs
            # of the same build).
            "env": {
                k: os.environ.get(k, "")
                for k in ("VLLM_TPU_PAGES_PER_CHUNK",
                          "VLLM_TPU_FORCE_XLA_OPS",
                          "VLLM_TPU_FORCE_PALLAS_OPS",
                          "VLLM_TPU_INTERPRET")
            },
            "probes": self._kernel_probe_state(),
        }
        return repr(sorted(bits.items()))

    @staticmethod
    def _kernel_probe_state() -> Tuple[bool, bool]:
        """Dispatch outcomes of the startup kernel probes (part of the
        AOT cache key — they select which implementation the step
        programs trace). Call AFTER the probes ran (weight load probes
        int4 matmul; init_cache probes int4-KV), which precompile()'s
        ordering guarantees."""
        from vllm_tpu.ops.cache import int4_kv_pallas_ok
        from vllm_tpu.ops.pallas.int4_matmul import _KERNEL_BROKEN
        return (bool(_KERNEL_BROKEN[0]), not int4_kv_pallas_ok())

    # ------------------------------------------------------------------
    # step execution
    # ------------------------------------------------------------------

    def execute_step(
        self,
        metadata_list: List[SequenceGroupMetadata],
        sched: SchedulerOutputs,
    ) -> List[Dict[int, SequenceOutputs]]:
        """Synchronous dispatch+fetch (evals and external callers; the
        engine drives dispatch_step/fetch_step separately for async
        scheduling)."""
        return self.fetch_step(self.dispatch_step(metadata_list, sched))

    def dispatch_step(
        self,
        metadata_list: List[SequenceGroupMetadata],
        sched: SchedulerOutputs,
    ):
        """Enqueue this step's device work and return a handle for
        fetch_step — nothing here blocks on device results, so the
        engine can overlap the host side of the PREVIOUS step (apply,
        detokenize, stop checks, next schedule) with this step's
        device execution (async scheduling; hides the ~30 ms tunnel
        poll floor plus all host bookkeeping per iteration)."""
        # Order matters: swap-out must read blocks before this step's
        # KV writes / COW copies can reuse them (the reference orders
        # this with per-layer CUDA events, attention.py:124-126; here
        # jax data dependencies on the donated cache array serialize
        # it for free).
        if len(self._pending_swap_outs) >= 2:
            # Bound the device staging memory swap-outs hold while
            # their host copies land lazily.
            self._drain_swap_outs()
        if sched.blocks_to_swap_out:
            self._swap_out(sched.blocks_to_swap_out)
        if sched.blocks_to_copy:
            self._copy(sched.blocks_to_copy)
        if sched.blocks_to_swap_in:
            self._swap_in(sched.blocks_to_swap_in)
        if not metadata_list:
            return None
        if sched.kind == StepKind.MIXED:
            return self._dispatch_mixed(metadata_list)
        return self._dispatch_decode(metadata_list, sched.num_decode_steps)

    def fetch_step(self, handle) -> List[Dict[int, SequenceOutputs]]:
        """Block on a dispatched step's results and assemble
        SequenceOutputs (one dict per fused decode step)."""
        if handle is None:
            return []
        if handle[0] == "mixed":
            return self._fetch_mixed(handle)
        return self._fetch_decode(handle)

    # -- block ops ----------------------------------------------------

    def _pad_ids(self, ids: List[int], bucket: int) -> np.ndarray:
        arr = np.full((bucket,), int(PAD_SLOT), np.int32)
        arr[:len(ids)] = ids
        return arr

    def _swap_out(self, mapping: Dict[int, int]) -> None:
        dev_ids = np.asarray(list(mapping.keys()), np.int32)
        cpu_ids = np.asarray([mapping[int(d)] for d in dev_ids], np.int32)
        plan = [np.array([4], np.int32), dev_ids, cpu_ids]
        self._broadcast_plan(plan)
        self._exec_swap_out(plan)

    def _exec_swap_out(self, plan: List[np.ndarray]) -> None:
        """Dispatch the device-side gather and queue the host copy:
        the step program behind it starts immediately (jax async
        dispatch) while the staged blocks trickle to the host; the
        host copy lands lazily in _drain_swap_outs (a synchronous
        np.asarray here stalled the whole step — and on a not-ready
        buffer costs the ~30 ms tunnel poll floor per array)."""
        dev_ids = plan[1]
        bucket = pick_bucket(PAIR_BUCKETS, len(dev_ids))
        padded = np.full((bucket,), 0, np.int32)
        padded[:len(dev_ids)] = dev_ids
        staged = self._gather_fn(self.kv_cache, jnp.asarray(padded))
        self._pending_swap_outs.append(
            (staged, [int(c) for c in plan[2]], len(dev_ids)))

    def _drain_swap_outs(self) -> None:
        """Land queued swap-outs in the host pool (this process's
        shard only — no cross-host traffic)."""
        for staged, cpu_ids, n in self._pending_swap_outs:
            # staged.data: [L, P, 2, KVH, BS, D]; host pools block-major.
            data = self._local_np(staged.data, self._kv_slices)
            self.host_pool[cpu_ids] = np.moveaxis(data[:, :n], 1, 0)
            if self.kv_quantized:
                scales = self._local_np(staged.scales, self._scale_slices)
                self.host_scales[cpu_ids] = np.moveaxis(
                    scales[:, :n], 1, 0)
        self._pending_swap_outs.clear()

    def _local_np(self, arr, slices) -> np.ndarray:
        """This process's contiguous slice of a sharded array as numpy
        (assembled from addressable shards; never fetches remote
        shards)."""
        if self._num_processes == 1:
            return np.asarray(arr)
        lo, _ = slices
        shape = list(self._local_shape(slices))
        shape[1] = arr.shape[1]  # block axis: staged buckets vary
        out = np.empty(tuple(shape), arr.dtype)
        for shard in arr.addressable_shards:
            dest = tuple(
                slice((sl.start or 0) - (lo[ax] if ax != 1 else 0),
                      (sl.stop if sl.stop is not None else arr.shape[ax]) -
                      (lo[ax] if ax != 1 else 0))
                for ax, sl in enumerate(shard.index))
            out[dest] = np.asarray(shard.data)
        return out

    def _swap_in(self, mapping: Dict[int, int]) -> None:
        cpu_ids = np.asarray(list(mapping.keys()), np.int32)
        dev_ids = np.asarray([mapping[int(c)] for c in cpu_ids], np.int32)
        plan = [np.array([5], np.int32), cpu_ids, dev_ids]
        self._broadcast_plan(plan)
        self._exec_swap_in(plan)

    def _exec_swap_in(self, plan: List[np.ndarray]) -> None:
        self._drain_swap_outs()  # pool must be current before reading
        cpu_ids = [int(c) for c in plan[1]]
        dev_ids = [int(d) for d in plan[2]]
        n = len(cpu_ids)
        bucket = pick_bucket(PAIR_BUCKETS, n)
        staged = KVCache(
            self._make_staged(self.host_pool, self._kv_shape(bucket),
                              n, cpu_ids, KV_CACHE_SPEC),
            self._make_staged(self.host_scales, self._scales_shape(bucket),
                              n, cpu_ids, KV_SCALES_SPEC)
            if self.kv_quantized else None)
        if self._num_processes == 1:
            staged = jax.device_put(staged, self._kv_sharding)
        self.kv_cache = self._scatter_fn(
            self.kv_cache, jnp.asarray(self._pad_ids(dev_ids, bucket)),
            staged)

    def _make_staged(self, pool, global_shape, n, cpu_ids, spec):
        """Assemble the staged swap-in blocks from this process's pool:
        multi-host builds a global sharded array via
        make_array_from_process_local_data; single-host returns a plain
        array the caller device_puts."""
        blocks = np.zeros((pool.shape[1], global_shape[1]) + pool.shape[2:],
                          pool.dtype)
        blocks[:, :n] = np.moveaxis(pool[cpu_ids], 0, 1)
        if self._num_processes == 1:
            return jnp.asarray(blocks)
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, spec), blocks, global_shape)

    def _copy(self, mapping: Dict[int, List[int]]) -> None:
        pairs = [(s, d) for s, dsts in mapping.items() for d in dsts]
        bucket = pick_bucket(PAIR_BUCKETS, len(pairs))
        plan = [
            np.array([2], np.int32),
            self._pad_ids([p[0] for p in pairs], bucket),
            self._pad_ids([p[1] for p in pairs], bucket),
        ]
        self._broadcast_plan(plan)
        self._exec_copy(plan)

    def _exec_copy(self, plan: List[np.ndarray]) -> None:
        self.kv_cache = self._copy_fn(self.kv_cache, jnp.asarray(plan[1]),
                                      jnp.asarray(plan[2]))

    # -- multi-host plan replay (parallel/distributed.py) ----------------

    def _broadcast_plan(self, plan: List[np.ndarray]) -> None:
        if self._plan_channel is not None and self._is_driver:
            from vllm_tpu.parallel.distributed import STEP_EXECUTE
            self._plan_channel.send(STEP_EXECUTE, plan)

    def execute_broadcast_plan(self, plan: List[np.ndarray]) -> None:
        """Follower side: replay one broadcast step. Outputs are
        replicated; only the driver reads them."""
        kind = int(plan[0][0])
        if len(self._pending_swap_outs) >= 2 and kind != 5:
            self._drain_swap_outs()  # kind 5 drains itself
        if kind == 0:
            self._exec_mixed(plan)
        elif kind == 1:
            self._exec_decode(plan)
        elif kind == 2:
            self._exec_copy(plan)
        elif kind == 4:
            self._exec_swap_out(plan)
        elif kind == 5:
            self._exec_swap_in(plan)
        else:
            raise ValueError(f"unknown plan kind {kind}")

    def shutdown_followers(self) -> None:
        if self._plan_channel is not None and self._is_driver:
            from vllm_tpu.parallel.distributed import STEP_SHUTDOWN
            self._plan_channel.send(STEP_SHUTDOWN, [])

    # -- sampling-parameter rows ---------------------------------------

    def _sampling_arrays(
        self,
        rows: List[Tuple[SamplingParams, List[int]]],
        n: int,
        vocab: int,
    ) -> List[np.ndarray]:
        """Per-row sampling parameters as 8 numpy arrays (the
        SamplingTensors field order)."""
        temp = np.zeros((n,), np.float32)
        top_p = np.ones((n,), np.float32)
        top_k = np.full((n,), vocab, np.int32)
        pres = np.zeros((n,), np.float32)
        freq = np.zeros((n,), np.float32)
        need_hist = any(p.presence_penalty != 0 or p.frequency_penalty != 0
                        for p, _ in rows)
        hist_len = (pick_bucket(self._hist_buckets,
                                max(1, max(len(t) for _, t in rows)))
                    if need_hist else self._hist_buckets[0])
        hist = np.full((n, hist_len), int(PAD_TOKEN), np.int32)
        bias_k = pick_bucket(
            BIAS_BUCKETS,
            max([len(p.logit_bias) if p.logit_bias else 0
                 for p, _ in rows] + [1]))
        bias_ids = np.full((n, bias_k), int(PAD_TOKEN), np.int32)
        bias_vals = np.zeros((n, bias_k), np.float32)
        for i, (p, tokens) in enumerate(rows):
            temp[i] = p.temperature
            top_p[i] = p.top_p
            top_k[i] = p.top_k if p.top_k > 0 else vocab
            pres[i] = p.presence_penalty
            freq[i] = p.frequency_penalty
            if need_hist and tokens:
                tail = tokens[-hist_len:]
                hist[i, :len(tail)] = tail
            if p.logit_bias:
                for j, (t, b) in enumerate(p.logit_bias.items()):
                    bias_ids[i, j] = t
                    bias_vals[i, j] = b
        return [temp, top_p, top_k, pres, freq, hist, bias_ids, bias_vals]

    @staticmethod
    def _row_topk_need(p: SamplingParams, is_prompt: bool) -> int:
        need = 1
        if p.use_beam_search:
            need = max(need, p.best_of if is_prompt else 2 * p.best_of)
        if p.logprobs:
            need = max(need, p.logprobs)
        return need

    def _logprobs_dict(self, out, row: int, token: int, token_lp: float,
                       num_requested) -> Dict[int, float]:
        d = {token: float(token_lp)}
        if num_requested:
            ids = np.asarray(out.topk_ids[row, :num_requested])
            lps = np.asarray(out.topk_logprobs[row, :num_requested])
            for t, lp in zip(ids.tolist(), lps.tolist()):
                d.setdefault(int(t), float(lp))
        return d

    # -- mixed (prefill part + single decode step, one program) ---------

    def _build_prefill_arrays(
        self, metadata_list: List[SequenceGroupMetadata]
    ) -> List[np.ndarray]:
        """Pack prompt groups into the prefill part's 7 plan arrays.

        Full token sequences, not just prompts: a sequence preempted
        by RECOMPUTE re-prefills its generated tokens too (parity:
        scheduler.py:369-380 requeues the group; the worker
        re-processes everything).
        """
        cfg = self.scheduler_config
        S = cfg.max_prefill_seqs
        pack_seqs: List[Tuple[List[int], List[int]]] = []
        total = 0
        for md in metadata_list:
            first_seq_id = next(iter(md.seq_data))
            data = md.seq_data[first_seq_id]
            pack_seqs.append(
                (data.get_token_ids(), md.block_tables[first_seq_id]))
            total += data.get_len()

        T = pick_bucket(cfg.prefill_token_buckets, total)
        tokens = np.zeros((T,), np.int32)
        positions = np.zeros((T,), np.int32)
        seq_ids_flat = np.full((T,), -1, np.int32)
        slots = np.full((T,), int(PAD_SLOT), np.int32)
        logits_idx = np.zeros((S,), np.int32)
        if _plan_packer is not None:
            _plan_packer.fill_prefill(pack_seqs, tokens, positions,
                                      seq_ids_flat, slots, logits_idx,
                                      self.block_size, int(PAD_SLOT))
        else:
            cursor = 0
            for i, (ids, table) in enumerate(pack_seqs):
                for pos, token in enumerate(ids):
                    tokens[cursor] = token
                    positions[cursor] = pos
                    seq_ids_flat[cursor] = i
                    slots[cursor] = (
                        table[pos // self.block_size] * self.block_size +
                        pos % self.block_size)
                    cursor += 1
                logits_idx[i] = cursor - 1

        # Page-granularity KV-write plan: each sequence fills its
        # blocks contiguously from its batch start (one
        # dynamic-update-slice per page instead of per-token scatters).
        NP = T // self.block_size + S
        page_src = np.zeros((NP,), np.int32)
        page_dst = np.full((NP,), -1, np.int32)
        pi = 0
        start = 0
        for ids, table in pack_seqs:
            for p in range(cdiv(len(ids), self.block_size)):
                page_src[pi] = start + p * self.block_size
                page_dst[pi] = table[p]
                pi += 1
            start += len(ids)
        return [tokens, positions, seq_ids_flat, slots, logits_idx,
                page_src, page_dst]

    def _build_decode_arrays(
        self, metadata_list: List[SequenceGroupMetadata], B: int
    ) -> Tuple[List[np.ndarray], List[Tuple[SequenceGroupMetadata, int]]]:
        """Pack decode rows into the 5 decode plan arrays; returns
        (arrays, row -> (group metadata, seq_id)). Rows whose sequence
        has in-flight (async-dispatched) tokens position past them and
        get a placeholder token id — _patch_tokens (inside _exec_*)
        patches the real value in from the previous step's on-device
        outputs, on every process."""
        row_seq: List[Tuple[SequenceGroupMetadata, int]] = []
        pack_rows: List[Tuple[int, int, List[int]]] = []
        for md in metadata_list:
            for sid, data in md.seq_data.items():
                row_seq.append((md, sid))
                pending = data.pending_tokens
                token = 0 if pending else data.get_last_token_id()
                pack_rows.append((token, data.get_len() + pending,
                                  md.block_tables[sid]))

        # Block tables always pad to the max width: the Pallas kernel
        # only walks ctx pages, so wide tables cost nothing, and the
        # decode program count collapses from |B|x|MB| to |B| (each
        # compile is tens of seconds on a 32-layer model).
        MB = self._block_buckets[-1]
        tokens = np.zeros((B,), np.int32)
        positions = np.zeros((B,), np.int32)
        slots = np.full((B,), int(PAD_SLOT), np.int32)
        table_arr = np.zeros((B, MB), np.int32)
        ctx = np.zeros((B,), np.int32)
        if _plan_packer is not None and pack_rows:
            _plan_packer.fill_decode(pack_rows, tokens, positions, slots,
                                     table_arr, ctx, self.block_size,
                                     int(PAD_SLOT))
        else:
            for i, (token, L, table) in enumerate(pack_rows):
                pos = L - 1
                tokens[i] = token
                positions[i] = pos
                slots[i] = (table[pos // self.block_size] * self.block_size +
                            pos % self.block_size)
                table_arr[i, :len(table)] = table
                ctx[i] = L
        return [tokens, positions, slots, table_arr, ctx], row_seq

    # -- async token feed ----------------------------------------------

    # The feed fns pin their output sharding: the step programs' outputs
    # carry the mesh ({Auto: ('data','model')} avals), and letting that
    # propagate through the feed into the next step's token input gave
    # it a DIFFERENT type than precompile's mesh-less padding array —
    # one full re-trace + lower of a 7B program (~60 s) on the first
    # async step, despite identical shapes/dtypes. Jitted rather than
    # eager because per-step eager ops dispatch op-by-op through the
    # tunneled runtime (orders of magnitude slower).

    @functools.cached_property
    def _feed_patch_fn(self):
        def patch(tokens, idx, feed):
            return jnp.where(idx < 0, tokens, feed[jnp.clip(idx, 0, None)])

        return jax.jit(patch, out_shardings=self._rep)

    @functools.cached_property
    def _feed_select_fn(self):
        def select(samples, topk, rows, js, greedy):
            return jnp.where(greedy, topk[rows, 0], samples[js, rows])

        return jax.jit(select, out_shardings=self._rep)

    @functools.cached_property
    def _feed_select_stepped_fn(self):
        def select(samples, topk, rows, js, greedy):
            return jnp.where(greedy, topk[-1][rows, 0],
                             samples[-1][js, rows])

        return jax.jit(select, out_shardings=self._rep)

    def _feed_idx(self, n: int, row_seq) -> np.ndarray:
        """Driver side: per-row index into the live feed-token device
        array (-1 = use the plan's host-provided token). The index
        array travels IN the plan, so followers patch their own
        (replicated, identically computed) feed arrays the same way —
        this is what lets async scheduling run multi-host with zero
        extra traffic."""
        idx = np.full((n,), -1, np.int32)
        for i, (md, sid) in enumerate(row_seq):
            if md.seq_data[sid].pending_tokens > 0:
                idx[i] = self._feed_map[sid]
        return idx

    def _patch_tokens(self, tokens: np.ndarray, idx: np.ndarray) -> Any:
        """Exec side (driver AND followers): patch rows whose sequences
        have in-flight tokens with the previous step's on-device
        next-token values (one jitted gather — no host sync).

        ALWAYS applied, even with nothing to patch: the step programs
        must see one consistent token-array provenance — a numpy input
        on some steps and a committed device array on others silently
        compiled a SECOND variant of each 7B program mid-serving
        (~50 s stall despite precompile)."""
        feed = (self._feed_tokens if self._feed_tokens is not None
                else self._placeholder_feed)
        return self._feed_patch_fn(tokens, idx, feed)

    @functools.cached_property
    def _placeholder_feed(self):
        return jnp.zeros((self.scheduler_config.max_num_seqs,), jnp.int32)

    def _feed_entries(self, entries) -> Tuple[List[np.ndarray], int]:
        """Driver side: pack this step's feed-record rows as plan
        arrays and remap seq_id -> feed slot. entries: (seq_id, row,
        sample_j) with sample_j < 0 meaning greedy (argmax row). Entry
        arrays pad to max_num_seqs so the jitted select compiles once
        per output-bucket shape. Returns ([rows, js, greedy], n) with
        n == 0 meaning nothing to record (feed untouched; every row a
        later step could patch is re-recorded by whichever step last
        ran it, so a skipped record never leaves a stale slot live)."""
        if not entries:
            return [], 0
        pad = max(self.scheduler_config.max_num_seqs, len(entries))
        rows = np.zeros((pad,), np.int32)
        js = np.zeros((pad,), np.int32)
        greedy = np.ones((pad,), bool)
        for i, (_, r, j) in enumerate(entries):
            rows[i] = r
            js[i] = max(j, 0)
            greedy[i] = j < 0
        self._feed_map = {sid: i for i, (sid, _, _) in enumerate(entries)}
        return [rows, js, greedy], len(entries)

    def _record_feed(self, out, plan: List[np.ndarray], at: int,
                     stepped: bool) -> None:
        """Exec side (driver AND followers): record the next input
        token per sequence from this step's device outputs, using the
        plan-shipped row/sample selectors."""
        rows, js, greedy = plan[at], plan[at + 1], plan[at + 2]
        fn = (self._feed_select_stepped_fn
              if stepped else self._feed_select_fn)
        self._feed_tokens = fn(out.samples, out.topk_ids, rows, js, greedy)

    def _dispatch_mixed(self, metadata_list: List[SequenceGroupMetadata]):
        cfg = self.scheduler_config
        S = cfg.max_prefill_seqs
        vocab = self.model_config.get_vocab_size()
        prompt_mds = [md for md in metadata_list if md.is_prompt]
        decode_mds = [md for md in metadata_list if not md.is_prompt]

        prefill_arrays = self._build_prefill_arrays(prompt_mds)
        # The decode part always pads to the TOP batch bucket: one
        # mixed program per prefill token bucket (pad rows are
        # near-free in the decode kernel — ctx==0 rows zero-fill and
        # skip), where bucketing by live rows would compile |T|x|B|
        # programs.
        B = cfg.decode_batch_buckets[-1]
        decode_arrays, row_seq = self._build_decode_arrays(decode_mds, B)
        feed_idx = self._feed_idx(B, row_seq)

        # Sampling rows: [S prompt rows | B decode rows].
        rows: List[Tuple[SamplingParams, List[int]]] = []
        for md in prompt_mds:
            data = md.seq_data[next(iter(md.seq_data))]
            rows.append((md.sampling_params, data.output_token_ids))
        rows += [(SamplingParams(temperature=0.0), [])] * (S - len(rows))
        for md, sid in row_seq:
            rows.append((md.sampling_params,
                         md.seq_data[sid].output_token_ids))

        num_samples = pick_bucket(
            SAMPLE_BUCKETS,
            max((md.sampling_params.best_of for md in prompt_mds
                 if not md.sampling_params.use_beam_search), default=1))
        num_topk = pick_bucket(
            TOPK_BUCKETS,
            max([self._row_topk_need(md.sampling_params, True)
                 for md in prompt_mds] +
                [self._row_topk_need(md.sampling_params, False)
                 for md, _ in row_seq]))
        greedy_only = all(md.sampling_params.is_greedy
                          or md.sampling_params.use_beam_search
                          for md in metadata_list)
        with_pen = any(p.presence_penalty != 0 or p.frequency_penalty != 0
                       for p, _ in rows)
        with_bias = any(p.logit_bias for p, _ in rows)
        # Prompt logprobs (echo+logprobs): the variant program also
        # emits per-prompt-position realized + top-k logprobs.
        plp_topk = 0
        if any(md.sampling_params.prompt_logprobs is not None
               for md in prompt_mds):
            plp_topk = pick_bucket(
                TOPK_BUCKETS,
                max(max(md.sampling_params.prompt_logprobs or 0
                        for md in prompt_mds), 1))
        # Next-input-token feed for async scheduling (recorded
        # on-device inside _exec_mixed, on every process): prompt seqs
        # take their first sampled token, decode rows their new token.
        entries = []
        for i, md in enumerate(prompt_mds):
            p = md.sampling_params
            if p.use_beam_search:
                continue  # beam never pipelines (host fork selection)
            for j, sid in enumerate(md.seq_data):
                entries.append((sid, i, -1 if p.is_greedy else j))
        for r, (md, sid) in enumerate(row_seq):
            p = md.sampling_params
            if p.use_beam_search:
                continue
            entries.append((sid, S + r, -1 if p.is_greedy else 0))
        feed_arrays, n_feed = self._feed_entries(entries)

        plan = ([
            np.array([0, num_samples, num_topk, int(greedy_only),
                      int(with_pen), int(with_bias), plp_topk,
                      FEED_FLAT if n_feed else FEED_NONE], np.int32)
        ] + prefill_arrays + decode_arrays + [feed_idx] +
            self._sampling_arrays(rows, S + B, vocab) + feed_arrays)
        self._broadcast_plan(plan)
        out = self._exec_mixed(plan)
        plp = None
        if plp_topk:
            out, plp = out
        # Packed lengths at dispatch time (RECOMPUTE re-prefills carry
        # output tokens too, and fetch may run an iteration later).
        pack_lens = [md.seq_data[next(iter(md.seq_data))].get_len()
                     for md in prompt_mds]
        return ("mixed", out, prompt_mds, decode_mds, row_seq, S, B, plp,
                pack_lens)

    def _fetch_mixed(self, handle) -> List[Dict[int, SequenceOutputs]]:
        (_, out, prompt_mds, decode_mds, row_seq, S, B, plp,
         pack_lens) = handle
        out, plp = jax.device_get((out, plp))
        if plp is not None:
            self._attach_prompt_logprobs(prompt_mds, pack_lens, plp)
        results = self._collect_prompt_outputs(
            prompt_mds, self._slice_rows(out, 0, S))
        results.update(
            self._collect_decode_outputs(
                decode_mds, row_seq, self._slice_rows(out, S, S + B)))
        return [results]

    def _attach_prompt_logprobs(self, prompt_mds, pack_lens, plp) -> None:
        """Slice the packed per-position logprob arrays back to their
        sequences and attach them to the groups' SequenceData (the
        scheduler passes live references). Entry p of a sequence's
        list is the logprob data of ITS token p (p=0 -> None: no
        preceding context). plp arrays are [T-1, ...]: position i of
        the packed batch predicts packed token i+1."""
        realized, top_ids, top_lps = plp
        start = 0
        for md, length in zip(prompt_mds, pack_lens):
            k = md.sampling_params.prompt_logprobs
            if k is None:
                start += length
                continue
            lps: List[Optional[Dict[int, float]]] = [None]
            data = md.seq_data[next(iter(md.seq_data))]
            tokens = data.get_token_ids()
            for p in range(1, length):
                i = start + p - 1  # packed row predicting token p
                d = {int(tokens[p]): float(realized[i])}
                for t, lp in zip(top_ids[i, :k].tolist(),
                                 top_lps[i, :k].tolist()):
                    d.setdefault(int(t), float(lp))
                lps.append(d)
            for seq_data in md.seq_data.values():
                seq_data.prompt_logprobs = lps
            start += length

    @staticmethod
    def _slice_rows(out, lo: int, hi: int):
        """View of sampler output rows [lo:hi] (row axis is axis 0 of
        topk leaves, axis 1 of sample leaves)."""
        return type(out)(samples=out.samples[..., lo:hi],
                         sample_logprobs=out.sample_logprobs[..., lo:hi],
                         topk_ids=out.topk_ids[lo:hi],
                         topk_logprobs=out.topk_logprobs[lo:hi])

    def _exec_mixed(self, plan: List[np.ndarray]):
        (_, num_samples, num_topk, greedy_only, with_pen, with_bias,
         plp_topk, feed_mode) = (int(x) for x in plan[0])
        decode_tokens = self._patch_tokens(plan[8], plan[13])
        batch = MixedBatch(
            PrefillBatch(*(jnp.asarray(a) for a in plan[1:8])),
            DecodeBatch(decode_tokens,
                        *(jnp.asarray(a) for a in plan[9:13])))
        tensors = SamplingTensors(*(jnp.asarray(a) for a in plan[14:22]))
        hist_len = tensors.output_tokens.shape[1]
        fn = self._make_step_fn("mixed", num_samples, num_topk, hist_len,
                                greedy_only=bool(greedy_only),
                                with_penalties=bool(with_pen),
                                with_bias=bool(with_bias),
                                prompt_lp_topk=plp_topk)
        self.kv_cache, out = fn(self.params, self.kv_cache, batch, tensors,
                                self._next_key())
        if feed_mode != FEED_NONE:
            self._record_feed(out[0] if plp_topk else out, plan, 22,
                              stepped=False)
        return out

    def _collect_prompt_outputs(self, metadata_list, out):
        # ``out`` is already on host (one batched device->host transfer
        # upstream; separate np.asarray round-trips cost ~10s of ms
        # through a tunneled runtime).
        samples = out.samples
        sample_lps = out.sample_logprobs
        topk_ids = out.topk_ids
        topk_lps = out.topk_logprobs

        results: Dict[int, SequenceOutputs] = {}
        for i, md in enumerate(metadata_list):
            p = md.sampling_params
            seq_ids = list(md.seq_data)
            if p.use_beam_search:
                # All beams share the prompt: seed them with the top
                # best_of distinct tokens.
                for j, sid in enumerate(seq_ids):
                    token = int(topk_ids[i, j])
                    lp = float(topk_lps[i, j])
                    results[sid] = SequenceOutputs(
                        sid, sid, token,
                        self._logprobs_dict(out, i, token, lp, p.logprobs))
            elif p.is_greedy:
                sid = seq_ids[0]
                token = int(topk_ids[i, 0])
                lp = float(topk_lps[i, 0])
                results[sid] = SequenceOutputs(
                    sid, sid, token,
                    self._logprobs_dict(out, i, token, lp, p.logprobs))
            else:
                # Parallel sampling: sample j seeds sequence j.
                for j, sid in enumerate(seq_ids):
                    token = int(samples[j, i])
                    lp = float(sample_lps[j, i])
                    results[sid] = SequenceOutputs(
                        sid, sid, token,
                        self._logprobs_dict(out, i, token, lp, p.logprobs))
        return results

    # -- decode --------------------------------------------------------

    def _decode_plan(
        self, metadata_list: List[SequenceGroupMetadata], num_steps: int,
        record_feed: bool = True,
    ) -> Tuple[List[np.ndarray], List[Tuple[SequenceGroupMetadata, int]]]:
        cfg = self.scheduler_config
        vocab = self.model_config.get_vocab_size()
        n = sum(len(md.seq_data) for md in metadata_list)
        B = pick_bucket(cfg.decode_batch_buckets, n)
        decode_arrays, row_seq = self._build_decode_arrays(metadata_list, B)
        feed_idx = self._feed_idx(B, row_seq)
        rows = [(md.sampling_params, md.seq_data[sid].output_token_ids)
                for md, sid in row_seq]

        num_topk = pick_bucket(
            TOPK_BUCKETS,
            max(self._row_topk_need(md.sampling_params, False)
                for md, _ in row_seq))
        greedy_only = all(md.sampling_params.is_greedy
                          or md.sampling_params.use_beam_search
                          for md, _ in row_seq)
        with_pen = any(p.presence_penalty != 0 or p.frequency_penalty != 0
                       for p, _ in rows)
        with_bias = any(p.logit_bias for p, _ in rows)
        entries = ([(sid, r, -1 if md.sampling_params.is_greedy else 0)
                    for r, (md, sid) in enumerate(row_seq)
                    if not md.sampling_params.use_beam_search]
                   if record_feed else [])
        feed_arrays, n_feed = self._feed_entries(entries)
        plan = ([
            np.array([1, num_steps, num_topk, int(greedy_only),
                      int(with_pen), int(with_bias), 0,
                      FEED_STEPPED if n_feed else FEED_NONE], np.int32)
        ] + decode_arrays + [feed_idx] +
            self._sampling_arrays(rows, B, vocab) + feed_arrays)
        return plan, row_seq

    def _dispatch_decode(self, metadata_list: List[SequenceGroupMetadata],
                         num_steps: int = 1):
        # Beam groups need host bookkeeping (fork selection) every
        # token, so they can't join a multi-step chunk — but they must
        # not collapse everyone else's chunk either (VERDICT r1 #4).
        # They run as their own single-step program dispatched alongside
        # the chunked program; one combined fetch covers both.
        if num_steps > 1:
            chunk_mds = [md for md in metadata_list
                         if not md.sampling_params.use_beam_search]
            beam_mds = [md for md in metadata_list
                        if md.sampling_params.use_beam_search]
        else:
            chunk_mds, beam_mds = metadata_list, []

        if not chunk_mds:
            chunk_mds, beam_mds, num_steps = beam_mds, [], 1

        plan_c, rows_c = self._decode_plan(chunk_mds, num_steps)
        self._broadcast_plan(plan_c)
        outs_c = self._exec_decode(plan_c)
        outs_b = rows_b = None
        if beam_mds:
            # Beam rows never pipeline (host fork selection), so the
            # beam side-plan must not clobber the chunk's feed record.
            plan_b, rows_b = self._decode_plan(beam_mds, 1,
                                               record_feed=False)
            self._broadcast_plan(plan_b)
            outs_b = self._exec_decode(plan_b)
        return ("decode", outs_c, chunk_mds, rows_c, outs_b, beam_mds,
                rows_b, num_steps)

    def _fetch_decode(self, handle) -> List[Dict[int, SequenceOutputs]]:
        (_, outs_c, chunk_mds, rows_c, outs_b, beam_mds, rows_b,
         num_steps) = handle
        # One batched device->host transfer for everything.
        outs_c, outs_b = jax.device_get((outs_c, outs_b))
        results = [
            self._collect_decode_outputs(
                chunk_mds, rows_c,
                jax.tree.map(lambda x: x[j], outs_c))  # noqa: B023
            for j in range(num_steps)
        ]
        if beam_mds:
            results[0].update(
                self._collect_decode_outputs(
                    beam_mds, rows_b,
                    jax.tree.map(lambda x: x[0], outs_b)))
        return results

    def _exec_decode(self, plan: List[np.ndarray]):
        (_, num_steps, num_topk, greedy_only, with_pen, with_bias, _,
         feed_mode) = (int(x) for x in plan[0])
        tokens = self._patch_tokens(plan[1], plan[6])
        batch = DecodeBatch(tokens, *(jnp.asarray(a) for a in plan[2:6]))
        tensors = SamplingTensors(*(jnp.asarray(a) for a in plan[7:15]))
        hist_len = tensors.output_tokens.shape[1]
        fn = self._make_step_fn("decode", 1, num_topk, hist_len, num_steps,
                                greedy_only=bool(greedy_only),
                                with_penalties=bool(with_pen),
                                with_bias=bool(with_bias))
        self.kv_cache, outs = fn(self.params, self.kv_cache, batch, tensors,
                                 self._next_key())
        if feed_mode != FEED_NONE:
            self._record_feed(outs, plan, 15, stepped=True)
        return outs

    def _collect_decode_outputs(self, metadata_list, row_seq, out):
        samples = out.samples
        sample_lps = out.sample_logprobs
        topk_ids = out.topk_ids
        topk_lps = out.topk_logprobs

        # Row index per (group, seq).
        row_of: Dict[int, int] = {
            sid: i for i, (_, sid) in enumerate(row_seq)
        }
        results: Dict[int, SequenceOutputs] = {}
        for md in metadata_list:
            p = md.sampling_params
            seq_ids = list(md.seq_data)
            if p.use_beam_search:
                # Parity: sampler.py:303-358 — expand each live beam by
                # 2*width candidates, keep the global top width by
                # cumulative logprob, rebind slots to winning parents.
                width = p.best_of
                candidates = []
                for sid in seq_ids:
                    r = row_of[sid]
                    base = md.seq_data[sid].cumulative_logprob
                    for j in range(2 * width):
                        candidates.append(
                            (base + float(topk_lps[r, j]), sid,
                             int(topk_ids[r, j]), float(topk_lps[r, j])))
                candidates.sort(key=lambda c: c[0], reverse=True)
                winners = candidates[:len(seq_ids)]
                for slot_sid, (_, parent_sid, token, lp) in zip(
                        seq_ids, winners):
                    r = row_of[parent_sid]
                    results[slot_sid] = SequenceOutputs(
                        slot_sid, parent_sid, token,
                        self._logprobs_dict(out, r, token, lp, p.logprobs))
            else:
                for sid in seq_ids:
                    r = row_of[sid]
                    if p.is_greedy:
                        token = int(topk_ids[r, 0])
                        lp = float(topk_lps[r, 0])
                    else:
                        token = int(samples[0, r])
                        lp = float(sample_lps[0, r])
                    results[sid] = SequenceOutputs(
                        sid, sid, token,
                        self._logprobs_dict(out, r, token, lp, p.logprobs))
        return results
