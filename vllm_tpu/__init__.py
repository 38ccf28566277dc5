"""vllm_tpu: a TPU-native LLM serving engine.

Capability parity with vLLM v0.1.0's public API
(/root/reference/vllm/__init__.py), re-designed for JAX/XLA/Pallas on
TPU pod slices. See SURVEY.md for the architecture map.
"""

from vllm_tpu.engine.arg_utils import AsyncEngineArgs, EngineArgs
from vllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_tpu.engine.llm_engine import LLMEngine
from vllm_tpu.entrypoints.llm import LLM
from vllm_tpu.outputs import CompletionOutput, RequestOutput
from vllm_tpu.parallel.distributed import init_distributed
from vllm_tpu.sampling_params import SamplingParams

# API parity with vLLM's `initialize_cluster`
# (/root/reference/vllm/__init__.py) — here it brings up the
# multi-process JAX runtime instead of Ray.
initialize_cluster = init_distributed

__version__ = "0.1.0"

__all__ = [
    "LLM",
    "SamplingParams",
    "RequestOutput",
    "CompletionOutput",
    "LLMEngine",
    "AsyncLLMEngine",
    "EngineArgs",
    "AsyncEngineArgs",
    "initialize_cluster",
    "init_distributed",
    "__version__",
]
