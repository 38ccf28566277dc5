"""Model construction from config.

Capability parity: /root/reference/vllm/model_executor/model_loader.py
— architecture-string registry dispatch, then real or dummy weights.
Returns (model, params): models are stateless here, parameters live in
a separate pytree the executor shards and feeds to jitted steps.
"""

from typing import Any, Dict, Tuple

from vllm_tpu.config import ModelConfig
from vllm_tpu.logger import init_logger
from vllm_tpu.models import MODEL_REGISTRY
from vllm_tpu.models.weight_utils import hf_weights_iterator

logger = init_logger(__name__)


def _get_architecture(hf_config) -> str:
    architectures = getattr(hf_config, "architectures", None) or []
    for arch in architectures:
        if arch in MODEL_REGISTRY:
            return arch
    # Fall back on model_type for configs without the field.
    by_type = {
        "llama": "LlamaForCausalLM",
        "gpt2": "GPT2LMHeadModel",
        "gpt_neox": "GPTNeoXForCausalLM",
        "opt": "OPTForCausalLM",
    }
    model_type = getattr(hf_config, "model_type", None)
    if model_type in by_type:
        return by_type[model_type]
    raise ValueError(
        f"Model architectures {architectures} (model_type={model_type}) are "
        f"not supported. Supported: {list(MODEL_REGISTRY)}")


def get_model(model_config: ModelConfig,
              w8a8_min_rows: int = None) -> Tuple[Any, Dict[str, Any]]:
    arch = _get_architecture(model_config.hf_config)
    model = MODEL_REGISTRY[arch](
        model_config.hf_config, dtype=model_config.dtype,
        quantization=getattr(model_config, "quantization", None))
    if model_config.use_dummy_weights:
        logger.info("Initializing %s with dummy weights.", arch)
        # One jitted program instead of ~200 eager random dispatches
        # (each eager op is a round trip on a tunneled runtime).
        import jax
        params = jax.jit(
            lambda: model.init_dummy_params(model_config.seed))()
    else:
        logger.info("Loading %s weights from %s.", arch, model_config.model)
        params = model.load_weights(
            hf_weights_iterator(model_config.model,
                                model_config.download_dir,
                                model_config.use_np_cache))
    # Weight-only quantization runs leaf-at-a-time after either load
    # path (peak memory: float tree + one int8 leaf).
    from vllm_tpu.models.common import maybe_quantize
    params = maybe_quantize(model, params, w8a8_min_rows=w8a8_min_rows)
    return model, params
