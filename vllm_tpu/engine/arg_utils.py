"""Engine CLI arguments.

Capability parity: /root/reference/vllm/engine/arg_utils.py — one
dataclass of every flag shared by the LLM constructor and both API
servers, argparse integration, create_engine_configs() producing the
four typed config objects; AsyncEngineArgs adds serving-only flags.
Reference defaults preserved: block_size 16, gpu_memory_utilization
0.90, swap_space 4 GiB, max_num_batched_tokens 2560, max_num_seqs 256.
"""

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

from vllm_tpu.config import (CacheConfig, ModelConfig, ParallelConfig,
                             SchedulerConfig)


@dataclass
class EngineArgs:
    model: str
    tokenizer: Optional[str] = None
    tokenizer_mode: str = "auto"
    download_dir: Optional[str] = None
    use_np_cache: bool = False
    use_dummy_weights: bool = False
    dtype: str = "auto"
    kv_cache_dtype: str = "auto"
    quantization: Optional[str] = None  # weight-only: None | "int8"
    seed: int = 0
    max_model_len: Optional[int] = None
    worker_use_ray: bool = False  # accepted for CLI parity; ignored
    pipeline_parallel_size: int = 1
    tensor_parallel_size: int = 1
    block_size: int = 16
    swap_space: float = 4.0  # GiB
    gpu_memory_utilization: float = 0.90
    max_num_batched_tokens: int = 2560
    max_num_seqs: int = 256
    max_prefill_seqs: int = 16
    num_decode_steps: int = 1
    admit_min_free_slots: Optional[int] = None
    max_admit_delay_s: float = 0.3
    # One-step-lagged dispatch: overlap host work + result polling with
    # device execution (single-process; auto-falls-back around
    # beam/penalty requests). Outputs lag one iteration.
    async_scheduling: bool = True
    # Prompt logprobs (echo+logprobs) reserve [T, V]-sized step-temp
    # HBM for the prefill-variant program; disabling reclaims it as KV
    # blocks and rejects such requests.
    enable_prompt_logprobs: bool = True
    num_device_blocks_override: Optional[int] = None
    disable_log_stats: bool = False
    # Compile every bucketed step program at startup instead of on
    # first use (pairs well with JAX's persistent compilation cache).
    precompile: bool = False
    # Directory for jax.profiler traces; enables
    # engine.start_profile()/stop_profile() (view with TensorBoard).
    profile_dir: Optional[str] = None
    # Programmatic only (no CLI flag): a pre-built transformers
    # PretrainedConfig, skipping all hub/disk I/O (tests, dryruns).
    hf_config: Optional[Any] = None
    # Programmatic only: explicit bucket ladders (fewer buckets =
    # fewer compiled programs; benchmarks pin one bucket per kind).
    prefill_token_buckets: Optional[List[int]] = None
    decode_batch_buckets: Optional[List[int]] = None

    def __post_init__(self):
        if self.tokenizer is None:
            self.tokenizer = self.model

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser.add_argument("--model", type=str, default="facebook/opt-125m",
                            help="model name or local checkpoint directory")
        parser.add_argument("--tokenizer", type=str, default=None)
        parser.add_argument("--tokenizer-mode", type=str, default="auto",
                            choices=["auto", "slow"])
        parser.add_argument("--download-dir", type=str, default=None)
        parser.add_argument("--use-np-cache", action="store_true")
        parser.add_argument("--use-dummy-weights", action="store_true")
        parser.add_argument("--dtype", type=str, default="auto",
                            choices=["auto", "bfloat16", "float16",
                                     "float32"])
        parser.add_argument("--kv-cache-dtype", type=str, default="auto",
                            choices=["auto", "bfloat16", "float32", "int8",
                                     "int4"])
        parser.add_argument("--quantization", "-q", type=str, default=None,
                            choices=["none", "int8", "int8-w8a8", "int4"],
                            help="INT8 linears: weight-only, or +per-token "
                            "activation quant for prefill-sized matmuls")
        parser.add_argument("--seed", type=int, default=0)
        parser.add_argument("--max-model-len", type=int, default=None)
        parser.add_argument("--worker-use-ray", action="store_true",
                            help="accepted for vLLM CLI parity; the TPU "
                            "engine is single-controller")
        parser.add_argument("--pipeline-parallel-size", "-pp", type=int,
                            default=1)
        parser.add_argument("--tensor-parallel-size", "-tp", type=int,
                            default=1)
        parser.add_argument("--block-size", type=int, default=16,
                            choices=[4, 8, 16, 32, 64])
        parser.add_argument("--swap-space", type=float, default=4.0,
                            help="CPU swap space per engine, GiB")
        parser.add_argument("--gpu-memory-utilization", type=float,
                            default=0.90)
        parser.add_argument("--max-num-batched-tokens", type=int,
                            default=2560)
        parser.add_argument("--max-num-seqs", type=int, default=256)
        parser.add_argument("--max-prefill-seqs", type=int, default=16)
        parser.add_argument("--num-decode-steps", type=int, default=1,
                            help="decode steps fused per device program "
                            "(tokens feed back on device)")
        parser.add_argument("--admit-min-free-slots", type=int, default=None,
                            help="admission hysteresis: defer prompt "
                            "admission until this many sequence slots are "
                            "free (default max_num_seqs/8)")
        parser.add_argument("--max-admit-delay-s", type=float, default=0.3,
                            help="TTFT guard: max seconds a head-of-queue "
                            "prompt waits past the previous admission")
        parser.add_argument("--disable-async-scheduling",
                            dest="async_scheduling", action="store_false",
                            help="fetch each step's results before "
                            "scheduling the next (easier to debug; slower)")
        parser.add_argument("--disable-prompt-logprobs",
                            dest="enable_prompt_logprobs",
                            action="store_false",
                            help="reject prompt-logprob (echo+logprobs) "
                            "requests and reclaim their reserved step-temp "
                            "HBM as KV blocks")
        parser.add_argument("--num-device-blocks-override", type=int,
                            default=None)
        parser.add_argument("--disable-log-stats", action="store_true")
        parser.add_argument("--precompile", action="store_true",
                            help="compile all bucketed step programs at "
                            "startup instead of on first use")
        parser.add_argument("--profile-dir", type=str, default=None,
                            help="write jax.profiler traces here; "
                            "start/stop via engine.start_profile()")
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        attrs = [f.name for f in dataclasses.fields(cls)]
        # Programmatic-only fields (hf_config) have no CLI flag.
        return cls(**{a: getattr(args, a) for a in attrs if hasattr(args, a)})

    def create_engine_configs(
        self
    ) -> Tuple[ModelConfig, CacheConfig, ParallelConfig, SchedulerConfig]:
        model_config = ModelConfig(
            model=self.model,
            tokenizer=self.tokenizer,
            tokenizer_mode=self.tokenizer_mode,
            dtype=self.dtype,
            seed=self.seed,
            use_dummy_weights=self.use_dummy_weights,
            download_dir=self.download_dir,
            use_np_cache=self.use_np_cache,
            max_model_len=self.max_model_len,
            hf_config=self.hf_config,
            quantization=self.quantization,
        )
        cache_config = CacheConfig(
            block_size=self.block_size,
            gpu_memory_utilization=self.gpu_memory_utilization,
            swap_space=self.swap_space,
            kv_cache_dtype=self.kv_cache_dtype,
            num_device_blocks_override=self.num_device_blocks_override,
        )
        parallel_config = ParallelConfig(
            pipeline_parallel_size=self.pipeline_parallel_size,
            tensor_parallel_size=self.tensor_parallel_size,
        )
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=model_config.max_model_len,
            max_prefill_seqs=self.max_prefill_seqs,
            num_decode_steps=self.num_decode_steps,
            admit_min_free_slots=self.admit_min_free_slots,
            max_admit_delay_s=self.max_admit_delay_s,
            prefill_token_buckets=self.prefill_token_buckets,
            decode_batch_buckets=self.decode_batch_buckets,
            enable_prompt_logprobs=self.enable_prompt_logprobs,
        )
        model_config.verify_with_parallel_config(parallel_config)
        return model_config, cache_config, parallel_config, scheduler_config


@dataclass
class AsyncEngineArgs(EngineArgs):
    """Serving additions (parity: arg_utils.py:112-127)."""
    disable_log_requests: bool = False
    max_log_len: Optional[int] = None

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser = EngineArgs.add_cli_args(parser)
        parser.add_argument("--disable-log-requests", action="store_true")
        parser.add_argument("--max-log-len", type=int, default=None)
        return parser
