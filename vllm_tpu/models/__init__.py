"""Model zoo: HF-architecture-string registry.

Capability parity: /root/reference/vllm/model_executor/model_loader.py:14-19
(GPT2LMHeadModel, GPTNeoXForCausalLM, LlamaForCausalLM, OPTForCausalLM).
"""

from vllm_tpu.models.gpt2 import GPT2Model
from vllm_tpu.models.gpt_neox import GPTNeoXModel
from vllm_tpu.models.llama import LlamaModel
from vllm_tpu.models.opt import OPTModel

MODEL_REGISTRY = {
    "LlamaForCausalLM": LlamaModel,
    "GPT2LMHeadModel": GPT2Model,
    "GPTNeoXForCausalLM": GPTNeoXModel,
    "OPTForCausalLM": OPTModel,
}

__all__ = ["MODEL_REGISTRY", "GPT2Model", "GPTNeoXModel", "LlamaModel",
           "OPTModel"]
