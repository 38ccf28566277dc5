"""LLaMA (and Vicuna) decoder.

Capability parity: /root/reference/vllm/model_executor/models/llama.py
— RMSNorm + SwiGLU + full-head RoPE, no biases, untied lm_head, HF
checkpoint loading. Re-designed functional-JAX: q/k/v and gate/up stay
separate parameters (the reference fuses them per TP rank,
llama.py:59-64,93-108; under GSPMD a fused concat axis would split
across devices at the wrong boundary, while separate matmuls shard
cleanly and XLA fuses them at compile time).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_tpu.models.common import (attend, dense,
                                    maybe_quantize_shardings, scan_layers,
                                    stack_layer_specs, stack_layers)
from vllm_tpu.ops import apply_rope, compute_rope_cache, rms_norm


class LlamaModel:

    QUANT_LAYER_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                        "up_proj", "down_proj")
    QUANT_TOP_KEYS = ("lm_head",)

    def __init__(self, hf_config, dtype=jnp.bfloat16,
                 quantization=None) -> None:
        self.cfg = hf_config
        self.dtype = dtype
        self.quantization = quantization
        self.hidden = hf_config.hidden_size
        self.heads = hf_config.num_attention_heads
        self.kv_heads = getattr(hf_config, "num_key_value_heads", self.heads)
        self.head_dim = self.hidden // self.heads
        self.inter = hf_config.intermediate_size
        self.layers = hf_config.num_hidden_layers
        self.vocab = hf_config.vocab_size
        self.eps = getattr(hf_config, "rms_norm_eps", 1e-6)
        self.scale = self.head_dim**-0.5
        max_pos = getattr(hf_config, "max_position_embeddings", 4096)
        rope_base = getattr(hf_config, "rope_theta", 10000.0)
        self.cos, self.sin = compute_rope_cache(self.head_dim, max_pos,
                                                rope_base)

    # -- forward ---------------------------------------------------------

    def forward(self, params, batch, kv_cache):
        h = params["embed_tokens"][batch.token_ids].astype(self.dtype)
        h, kv_cache = scan_layers(self._layer, self.layers,
                                  params["layers"], h, batch, kv_cache)
        h = rms_norm(h, params["norm"], self.eps)
        return h, kv_cache

    def _layer(self, lp, idx, h, batch, kv_cache):
        T = h.shape[0]
        residual = h
        x = rms_norm(h, lp["input_layernorm"], self.eps)
        q = dense(x, lp["q_proj"]).reshape(T, self.heads, self.head_dim)
        k = dense(x, lp["k_proj"]).reshape(T, self.kv_heads, self.head_dim)
        v = dense(x, lp["v_proj"]).reshape(T, self.kv_heads, self.head_dim)
        q = apply_rope(q, batch.positions, self.cos, self.sin, self.head_dim)
        k = apply_rope(k, batch.positions, self.cos, self.sin, self.head_dim)
        attn, kv_cache = attend(q, k, v, kv_cache, idx, batch, self.scale)
        h = residual + dense(attn.reshape(T, -1), lp["o_proj"])

        residual = h
        x = rms_norm(h, lp["post_attention_layernorm"], self.eps)
        x = jax.nn.silu(dense(x, lp["gate_proj"])) * dense(x, lp["up_proj"])
        h = residual + dense(x, lp["down_proj"])
        return h, kv_cache

    def compute_logits(self, params, hidden):
        return dense(hidden, params["lm_head"]).astype(jnp.float32)

    # -- parameters --------------------------------------------------------

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random small weights (parity:
        /root/reference/vllm/model_executor/weight_utils.py:105-119)."""
        key = jax.random.PRNGKey(seed)
        idx = [0]

        def u(*shape, dtype=None):
            idx[0] += 1
            return jax.random.uniform(jax.random.fold_in(key, idx[0]), shape,
                                      dtype or self.dtype, -1e-1, 1e-1)

        H, D, KV, I = self.hidden, self.head_dim, self.kv_heads, self.inter
        layers = []
        for _ in range(self.layers):
            layers.append({
                "input_layernorm": jnp.ones((H,), jnp.float32),
                "q_proj": u(H, self.heads * D),
                "k_proj": u(H, KV * D),
                "v_proj": u(H, KV * D),
                "o_proj": u(self.heads * D, H),
                "post_attention_layernorm": jnp.ones((H,), jnp.float32),
                "gate_proj": u(H, I),
                "up_proj": u(H, I),
                "down_proj": u(I, H),
            })
        return {
            "embed_tokens": u(self.vocab, H),
            "layers": stack_layers(layers),
            "norm": jnp.ones((H,), jnp.float32),
            "lm_head": u(H, self.vocab),
        }

    def load_weights(self, weights_iter) -> Dict[str, Any]:
        """Map HF LLaMA checkpoint names into the param tree."""
        params: Dict[str, Any] = {
            "layers": [{} for _ in range(self.layers)]
        }

        def linear(w):  # torch [out, in] -> ours [in, out]
            return jnp.asarray(w).T.astype(self.dtype)

        for name, w in weights_iter:
            if "rotary_emb.inv_freq" in name:
                continue
            if name == "model.embed_tokens.weight":
                params["embed_tokens"] = jnp.asarray(w).astype(self.dtype)
            elif name == "model.norm.weight":
                params["norm"] = jnp.asarray(w).astype(jnp.float32)
            elif name == "lm_head.weight":
                params["lm_head"] = linear(w)
            elif name.startswith("model.layers."):
                parts = name.split(".")
                i = int(parts[2])
                lp = params["layers"][i]
                rest = ".".join(parts[3:])
                if rest in ("input_layernorm.weight",
                            "post_attention_layernorm.weight"):
                    lp[rest[:-len(".weight")]] = jnp.asarray(w).astype(
                        jnp.float32)
                elif rest.startswith("self_attn."):
                    lp[parts[4]] = linear(w)  # q/k/v/o_proj
                elif rest.startswith("mlp."):
                    lp[parts[4]] = linear(w)  # gate/up/down_proj
                else:
                    raise ValueError(f"unexpected weight {name}")
            else:
                raise ValueError(f"unexpected weight {name}")
        params["layers"] = stack_layers(params["layers"])
        return params

    def param_shardings(self) -> Dict[str, Any]:
        """TP PartitionSpecs: heads/intermediate shard over 'model'."""
        col = P(None, "model")  # output-dim sharded
        row = P("model", None)  # input-dim sharded
        rep = P(None)
        layer = {
            "input_layernorm": rep,
            "q_proj": col,
            "k_proj": col,
            "v_proj": col,
            "o_proj": row,
            "post_attention_layernorm": rep,
            "gate_proj": col,
            "up_proj": col,
            "down_proj": row,
        }
        return maybe_quantize_shardings(
            self, {
                "embed_tokens": P("model", None),
                "layers": stack_layer_specs(layer),
                "norm": rep,
                "lm_head": col,
            })
