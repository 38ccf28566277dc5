"""Engine configuration objects.

Capability parity: /root/reference/vllm/config.py (ModelConfig wrapping
the HF AutoConfig with per-rank head/layer derivation, CacheConfig with
block size + memory-utilization + swap space, ParallelConfig with
tp*pp=world_size and pp>1 rejected, SchedulerConfig with
max_num_batched_tokens / max_num_seqs, and dtype resolution).

TPU re-design notes:
- dtype "auto" resolves to bfloat16 (the MXU-native type); float16 is
  coerced to bfloat16 (reference instead requires SM80 for bf16,
  config.py:225-232 — the constraint inverts on TPU).
- CacheConfig carries the KV-cache dtype (bfloat16 or int8) because KV
  quantization is a first-class feature here.
- SchedulerConfig additionally owns the static-shape bucket ladders
  (XLA compiles one program per shape; the scheduler packs work into
  these buckets instead of the reference's pad-to-8, worker.py:209-217).
"""

import os
from typing import List, Optional

import jax.numpy as jnp

from vllm_tpu.logger import init_logger
from vllm_tpu.utils import cdiv, make_buckets

logger = init_logger(__name__)

_GiB = 1 << 30

_STR_TO_DTYPE = {
    "float32": jnp.float32,
    "float": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.bfloat16,  # coerced: TPU has no fp16 compute path
    "half": jnp.bfloat16,
}


def _get_and_verify_dtype(hf_config, dtype: str):
    if dtype != "auto":
        key = dtype.lower()
        if key not in _STR_TO_DTYPE:
            raise ValueError(f"Unknown dtype: {dtype}")
        if key in ("float16", "half"):
            logger.warning("float16 is not supported on TPU; using bfloat16.")
        return _STR_TO_DTYPE[key]
    # "auto": run in bfloat16 regardless of the checkpoint dtype. All
    # supported checkpoints (fp32/fp16/bf16) convert losslessly enough
    # for inference, and bf16 feeds the MXU at full rate.
    config_dtype = str(getattr(hf_config, "torch_dtype", None) or "float32")
    if "float32" in config_dtype:
        logger.info("Casting %s checkpoint to bfloat16 for TPU.", config_dtype)
    return jnp.bfloat16


class ModelConfig:
    """The model to serve: architecture, dtype, context length.

    ``model`` is an HF hub id or a local directory containing
    ``config.json`` (+ weights). For offline/unit-test use, pass an
    instantiated ``transformers.PretrainedConfig`` via ``hf_config`` to
    skip all hub I/O.
    """

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        dtype: str = "auto",
        seed: int = 0,
        use_dummy_weights: bool = False,
        download_dir: Optional[str] = None,
        use_np_cache: bool = False,
        max_model_len: Optional[int] = None,
        hf_config=None,
        quantization: Optional[str] = None,
    ) -> None:
        self.model = model
        self.tokenizer = tokenizer if tokenizer is not None else model
        self.tokenizer_mode = tokenizer_mode
        self.seed = seed
        self.use_dummy_weights = use_dummy_weights
        self.download_dir = download_dir
        self.use_np_cache = use_np_cache
        if quantization in ("none",):
            quantization = None
        if quantization not in (None, "int8", "int8-w8a8", "int4"):
            raise ValueError(f"Unsupported quantization: {quantization} "
                             "(have: int8, int8-w8a8, int4)")
        self.quantization = quantization

        if hf_config is None:
            from transformers import AutoConfig
            hf_config = AutoConfig.from_pretrained(model)
        self.hf_config = hf_config
        self.dtype = _get_and_verify_dtype(hf_config, dtype)

        derived_max_len = getattr(hf_config, "max_position_embeddings", None)
        if derived_max_len is None:
            derived_max_len = 2048
        self.max_model_len = (max_model_len
                              if max_model_len is not None else derived_max_len)
        if tokenizer_mode not in ("auto", "slow"):
            raise ValueError(
                f"tokenizer_mode must be 'auto' or 'slow', got {tokenizer_mode}")

    # -- per-rank shape derivation (reference config.py:73-83) ------------

    def get_hidden_size(self) -> int:
        return self.hf_config.hidden_size

    def get_head_size(self) -> int:
        return self.hf_config.hidden_size // self.hf_config.num_attention_heads

    def get_num_heads(self, parallel_config: "ParallelConfig") -> int:
        total = self.hf_config.num_attention_heads
        tp = parallel_config.tensor_parallel_size
        if total % tp != 0:
            raise ValueError(
                f"num_attention_heads ({total}) must be divisible by "
                f"tensor_parallel_size ({tp}).")
        return total // tp

    def get_num_kv_heads(self, parallel_config: "ParallelConfig") -> int:
        # v0.1.0-era models are all MHA (kv heads == q heads); GQA models
        # set num_key_value_heads in their HF config.
        total = getattr(self.hf_config, "num_key_value_heads",
                        self.hf_config.num_attention_heads)
        tp = parallel_config.tensor_parallel_size
        return max(1, total // tp)

    def get_num_layers(self, parallel_config: "ParallelConfig") -> int:
        total = self.hf_config.num_hidden_layers
        pp = parallel_config.pipeline_parallel_size
        return total // pp

    def get_vocab_size(self) -> int:
        return self.hf_config.vocab_size

    def verify_with_parallel_config(
            self, parallel_config: "ParallelConfig") -> None:
        self.get_num_heads(parallel_config)  # raises on indivisibility
        layers = self.hf_config.num_hidden_layers
        pp = parallel_config.pipeline_parallel_size
        if layers % pp != 0:
            raise ValueError(
                f"num_hidden_layers ({layers}) must be divisible by "
                f"pipeline_parallel_size ({pp}).")
        if (self.quantization == "int4"
                and parallel_config.tensor_parallel_size > 1):
            # The int4 matmul is a Pallas kernel whose group-scale
            # layout isn't shard_map-wrapped yet; int8/int8-w8a8 cover
            # multi-chip (where per-chip weight bytes already shrink
            # by tp).
            raise NotImplementedError(
                "quantization='int4' currently requires "
                "tensor_parallel_size == 1; use 'int8'/'int8-w8a8' "
                "for multi-chip serving.")


class CacheConfig:
    """Paged KV cache configuration.

    ``num_device_blocks`` / ``num_cpu_blocks`` are filled in after the
    executor profiles compiled-program HBM usage (reference analog:
    profile_num_available_blocks, worker.py:59-118).
    """

    def __init__(
        self,
        block_size: int = 16,
        gpu_memory_utilization: float = 0.90,
        swap_space: float = 4.0,  # GiB of host swap for preempted beams
        kv_cache_dtype: str = "auto",
        num_device_blocks_override: Optional[int] = None,
    ) -> None:
        self.block_size = block_size
        self.gpu_memory_utilization = gpu_memory_utilization
        self.swap_space_bytes = int(swap_space * _GiB)
        if kv_cache_dtype == "auto":
            kv_cache_dtype = "bfloat16"
        if kv_cache_dtype not in ("bfloat16", "float32", "int8", "int4"):
            raise ValueError(f"Unsupported kv_cache_dtype: {kv_cache_dtype}")
        self.kv_cache_dtype = kv_cache_dtype
        self.num_device_blocks_override = num_device_blocks_override
        self._verify_args()

        # Populated by the executor's memory profile.
        self.num_device_blocks: Optional[int] = None
        self.num_cpu_blocks: Optional[int] = None

    def _verify_args(self) -> None:
        if self.block_size not in (4, 8, 16, 32, 64):
            raise ValueError(
                f"block_size must be one of 4/8/16/32/64, got {self.block_size}.")
        if not 0 < self.gpu_memory_utilization <= 1:
            raise ValueError(
                "gpu_memory_utilization must be in (0, 1], got "
                f"{self.gpu_memory_utilization}.")


class ParallelConfig:
    """Device-mesh layout.

    TP shards attention heads + MLP over the ``model`` mesh axis (ICI);
    PP > 1 is rejected, matching the reference
    (config.py:160-162 NotImplementedError).
    """

    def __init__(
        self,
        pipeline_parallel_size: int = 1,
        tensor_parallel_size: int = 1,
    ) -> None:
        self.pipeline_parallel_size = pipeline_parallel_size
        self.tensor_parallel_size = tensor_parallel_size
        self.world_size = pipeline_parallel_size * tensor_parallel_size
        self._verify_args()

    def _verify_args(self) -> None:
        if self.pipeline_parallel_size > 1:
            raise NotImplementedError(
                "Pipeline parallelism is not supported yet.")
        if self.tensor_parallel_size < 1:
            raise ValueError("tensor_parallel_size must be >= 1.")


class SchedulerConfig:
    """Continuous-batching limits + static-shape bucket ladders.

    The bucket ladders are the TPU translation of the reference's
    dynamic batch shapes: prefill programs are compiled per
    (token-bucket), decode programs per (batch-bucket, block-bucket).
    """

    def __init__(
        self,
        max_num_batched_tokens: int = 2560,
        max_num_seqs: int = 256,
        max_model_len: int = 2048,
        prefill_token_buckets: Optional[List[int]] = None,
        decode_batch_buckets: Optional[List[int]] = None,
        max_prefill_seqs: int = 16,
        num_decode_steps: int = 1,
        admit_min_free_slots: Optional[int] = None,
        admit_fill_frac: float = 0.85,
        max_admit_delay_s: float = 0.3,
        enable_prompt_logprobs: bool = True,
    ) -> None:
        self.max_num_batched_tokens = max_num_batched_tokens
        self.max_num_seqs = max_num_seqs
        self.max_model_len = max_model_len
        if num_decode_steps < 1:
            raise ValueError(
                f"num_decode_steps must be >= 1, got {num_decode_steps}")
        # Decode steps fused into one device program: sampled tokens
        # feed back on device, the host applies them (and checks stops)
        # per chunk. Trades up to num_decode_steps-1 wasted tokens on a
        # stop for a num_decode_steps-fold cut in host/dispatch
        # overhead per token.
        self.num_decode_steps = num_decode_steps
        if prefill_token_buckets is None:
            prefill_token_buckets = make_buckets(
                min(64, max_num_batched_tokens), max_num_batched_tokens)
        self.prefill_token_buckets = sorted(prefill_token_buckets)
        if decode_batch_buckets is None:
            decode_batch_buckets = make_buckets(min(8, max_num_seqs),
                                                max_num_seqs)
        self.decode_batch_buckets = sorted(decode_batch_buckets)
        # Max prompts packed into one prefill program (sizes the
        # per-sequence metadata arrays of the prefill batch).
        self.max_prefill_seqs = max_prefill_seqs
        # Admission hysteresis: a prefill program costs the same
        # whether it packs 1 prompt or a full bucket, so admitting on
        # every freed sequence slot runs mostly-padded prefills AND
        # robs the decode fleet of its multi-step chunks. Defer
        # admission until the admissible prompts can fill
        # ``admit_fill_frac`` of the largest token bucket, OR at least
        # ``admit_min_free_slots`` sequence slots are free, OR the
        # head prompt has waited ``max_admit_delay_s`` (TTFT guard) —
        # an empty fleet always admits immediately.
        if admit_min_free_slots is None:
            admit_min_free_slots = max(1, max_num_seqs // 8)
        self.admit_min_free_slots = admit_min_free_slots
        self.admit_fill_frac = admit_fill_frac
        self.max_admit_delay_s = max_admit_delay_s
        # Prompt logprobs (echo+logprobs / perplexity) need a [T, V]
        # logits pass in a prefill-program variant; enabling reserves
        # the extra step-temp HBM for it (a few dozen KV blocks).
        # Disable to reclaim them when serving never echoes.
        self.enable_prompt_logprobs = enable_prompt_logprobs

    def block_table_buckets(self, block_size: int) -> List[int]:
        """Bucket ladder for blocks-per-sequence in decode block tables."""
        max_blocks = cdiv(self.max_model_len, block_size)
        return make_buckets(min(8, max_blocks), max_blocks)
