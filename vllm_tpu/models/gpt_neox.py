"""GPT-NeoX (Pythia) decoder.

Capability parity: /root/reference/vllm/model_executor/models/gpt_neox.py
— partial rotary embeddings (rotary_pct, gpt_neox.py:64-67), optional
parallel residual (gpt_neox.py:111,134), untied embed_out. The HF
checkpoint stores query_key_value head-interleaved
([heads, 3, head_dim] on the output axis); load de-interleaves into
separate q/k/v.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_tpu.models.common import (attend, dense,
                                    maybe_quantize_shardings,
                                    scan_layers, stack_layer_specs,
                                    stack_layers)
from vllm_tpu.ops import apply_rope, compute_rope_cache, get_act_fn, layer_norm


class GPTNeoXModel:

    QUANT_LAYER_KEYS = ("q_proj", "k_proj", "v_proj", "dense",
                        "dense_h_to_4h", "dense_4h_to_h")
    QUANT_TOP_KEYS = ("embed_out",)

    def __init__(self, hf_config, dtype=jnp.bfloat16,
                 quantization=None) -> None:
        self.cfg = hf_config
        self.dtype = dtype
        self.quantization = quantization
        self.hidden = hf_config.hidden_size
        self.heads = hf_config.num_attention_heads
        self.kv_heads = self.heads
        self.head_dim = self.hidden // self.heads
        self.inter = hf_config.intermediate_size
        self.layers = hf_config.num_hidden_layers
        self.vocab = hf_config.vocab_size
        self.eps = getattr(hf_config, "layer_norm_eps", 1e-5)
        self.parallel_residual = getattr(hf_config, "use_parallel_residual",
                                         True)
        self.act = get_act_fn(getattr(hf_config, "hidden_act", "gelu"))
        self.scale = self.head_dim**-0.5
        self.rotary_dim = int(self.head_dim *
                              getattr(hf_config, "rotary_pct", 1.0))
        max_pos = hf_config.max_position_embeddings
        base = getattr(hf_config, "rotary_emb_base", 10000.0)
        self.cos, self.sin = compute_rope_cache(self.rotary_dim, max_pos,
                                                base)

    # -- forward -----------------------------------------------------------

    def forward(self, params, batch, kv_cache):
        h = params["embed_in"][batch.token_ids].astype(self.dtype)
        h, kv_cache = scan_layers(self._layer, self.layers,
                                  params["layers"], h, batch, kv_cache)
        h = layer_norm(h, *params["final_layer_norm"], eps=self.eps)
        return h, kv_cache

    def _layer(self, lp, idx, h, batch, kv_cache):
        T = h.shape[0]
        x = layer_norm(h, *lp["input_layernorm"], eps=self.eps)
        q = dense(x, *lp["q_proj"]).reshape(T, self.heads, self.head_dim)
        k = dense(x, *lp["k_proj"]).reshape(T, self.heads, self.head_dim)
        v = dense(x, *lp["v_proj"]).reshape(T, self.heads, self.head_dim)
        q = apply_rope(q, batch.positions, self.cos, self.sin,
                       self.rotary_dim)
        k = apply_rope(k, batch.positions, self.cos, self.sin,
                       self.rotary_dim)
        attn, kv_cache = attend(q, k, v, kv_cache, idx, batch, self.scale)
        attn = dense(attn.reshape(T, -1), *lp["dense"])

        def mlp(y):
            y = self.act(dense(y, *lp["dense_h_to_4h"]))
            return dense(y, *lp["dense_4h_to_h"])

        if self.parallel_residual:
            # x = input + attn(ln1(input)) + mlp(ln2(input))
            m = mlp(layer_norm(h, *lp["post_attention_layernorm"],
                               eps=self.eps))
            h = h + attn + m
        else:
            h = h + attn
            m = mlp(layer_norm(h, *lp["post_attention_layernorm"],
                               eps=self.eps))
            h = h + m
        return h, kv_cache

    def compute_logits(self, params, hidden):
        return dense(hidden, params["embed_out"]).astype(jnp.float32)

    # -- parameters --------------------------------------------------------

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        key = jax.random.PRNGKey(seed)
        idx = [0]

        def u(*shape, dtype=None):
            idx[0] += 1
            return jax.random.uniform(jax.random.fold_in(key, idx[0]), shape,
                                      dtype or self.dtype, -1e-1, 1e-1)

        H, I = self.hidden, self.inter

        def ln():
            return (jnp.ones((H,), jnp.float32), jnp.zeros((H,), jnp.float32))

        def lin(i, o):
            return (u(i, o), jnp.zeros((o,), self.dtype))

        layers = []
        for _ in range(self.layers):
            layers.append({
                "input_layernorm": ln(),
                "post_attention_layernorm": ln(),
                "q_proj": lin(H, H),
                "k_proj": lin(H, H),
                "v_proj": lin(H, H),
                "dense": lin(H, H),
                "dense_h_to_4h": lin(H, I),
                "dense_4h_to_h": lin(I, H),
            })
        return {
            "embed_in": u(self.vocab, H),
            "layers": stack_layers(layers),
            "final_layer_norm": ln(),
            "embed_out": u(H, self.vocab),
        }

    def load_weights(self, weights_iter) -> Dict[str, Any]:
        params: Dict[str, Any] = {"layers": [{} for _ in range(self.layers)]}
        pending: Dict[str, Dict[str, Any]] = {}
        H, D, N = self.hidden, self.head_dim, self.heads

        def finish(lp, leaf, entry):
            if "weight" in entry and "bias" in entry:
                lp[leaf] = (entry["weight"], entry["bias"])

        for name, w in weights_iter:
            if name.startswith("gpt_neox."):
                name = name[len("gpt_neox."):]
            if (".attention.bias" in name or ".attention.masked_bias" in name
                    or "rotary_emb.inv_freq" in name):
                continue
            w = jnp.asarray(w)
            if name == "embed_in.weight":
                params["embed_in"] = w.astype(self.dtype)
            elif name == "embed_out.weight":
                params["embed_out"] = w.T.astype(self.dtype)
            elif name.startswith("final_layer_norm."):
                entry = pending.setdefault("final_ln", {})
                entry[name.split(".")[-1]] = w.astype(jnp.float32)
                if len(entry) == 2:
                    params["final_layer_norm"] = (entry["weight"],
                                                  entry["bias"])
            elif name.startswith("layers."):
                parts = name.split(".")
                i = int(parts[1])
                lp = params["layers"][i]
                sub = ".".join(parts[2:-1])
                kind = parts[-1]
                if sub in ("input_layernorm", "post_attention_layernorm"):
                    entry = pending.setdefault(f"{i}.{sub}", {})
                    entry[kind] = w.astype(jnp.float32)
                    finish(lp, sub, entry)
                elif sub == "attention.query_key_value":
                    # Output axis is [heads, 3(q|k|v), head_dim]:
                    # de-interleave into separate projections.
                    w = w.astype(self.dtype)
                    if kind == "weight":  # torch [3H, H]
                        w = w.reshape(N, 3, D, H)
                        splits = [
                            w[:, j].reshape(N * D, H).T for j in range(3)
                        ]
                    else:  # [3H]
                        w = w.reshape(N, 3, D)
                        splits = [w[:, j].reshape(N * D) for j in range(3)]
                    for j, leaf in enumerate(("q_proj", "k_proj", "v_proj")):
                        entry = pending.setdefault(f"{i}.{leaf}", {})
                        entry[kind] = splits[j]
                        finish(lp, leaf, entry)
                elif sub in ("attention.dense", "mlp.dense_h_to_4h",
                             "mlp.dense_4h_to_h"):
                    leaf = sub.split(".")[-1]
                    entry = pending.setdefault(f"{i}.{leaf}", {})
                    entry[kind] = (w.T if kind == "weight" else w).astype(
                        self.dtype)
                    finish(lp, leaf, entry)
                else:
                    raise ValueError(f"unexpected weight {name}")
            else:
                raise ValueError(f"unexpected weight {name}")
        params["layers"] = stack_layers(params["layers"])
        return params

    def param_shardings(self) -> Dict[str, Any]:
        col = (P(None, "model"), P("model"))
        row = (P("model", None), P(None))
        ln = (P(None), P(None))
        layer = {
            "input_layernorm": ln,
            "post_attention_layernorm": ln,
            "q_proj": col,
            "k_proj": col,
            "v_proj": col,
            "dense": row,
            "dense_h_to_4h": col,
            "dense_4h_to_h": row,
        }
        return maybe_quantize_shardings(
            self, {
                "embed_in": P("model", None),
                "layers": stack_layer_specs(layer),
                "final_layer_norm": ln,
                "embed_out": (P(None, "model")),
            })
