"""GPT-2 decoder.

Capability parity: /root/reference/vllm/model_executor/models/gpt2.py —
learned position table wpe, fused c_attn (HF Conv1D stores [in, out],
so no transpose on load, gpt2.py:232-270), gelu_new MLP, lm_head tied
to wte. The fused c_attn is split into q/k/v at load time (see
llama.py for why fused projections don't shard under GSPMD).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_tpu.models.common import (attend, dense,
                                    maybe_quantize_shardings,
                                    scan_layers, stack_layer_specs,
                                    stack_layers)
from vllm_tpu.ops import get_act_fn, layer_norm


class GPT2Model:

    QUANT_LAYER_KEYS = ("q_proj", "k_proj", "v_proj", "c_proj", "c_fc",
                        "mlp_c_proj")
    QUANT_TOP_KEYS = ()  # lm_head is tied to wte (an embedding gather)

    def __init__(self, hf_config, dtype=jnp.bfloat16,
                 quantization=None) -> None:
        self.cfg = hf_config
        self.dtype = dtype
        self.quantization = quantization
        self.hidden = hf_config.hidden_size
        self.heads = hf_config.num_attention_heads
        self.kv_heads = self.heads
        self.head_dim = self.hidden // self.heads
        self.inter = (hf_config.n_inner if getattr(hf_config, "n_inner", None)
                      else 4 * self.hidden)
        self.layers = hf_config.num_hidden_layers
        self.vocab = hf_config.vocab_size
        self.max_pos = hf_config.max_position_embeddings
        self.eps = getattr(hf_config, "layer_norm_epsilon", 1e-5)
        self.act = get_act_fn(
            getattr(hf_config, "activation_function", "gelu_new"))
        self.scale = self.head_dim**-0.5

    # -- forward -----------------------------------------------------------

    def forward(self, params, batch, kv_cache):
        h = params["wte"][batch.token_ids].astype(self.dtype)
        h = h + params["wpe"][batch.positions].astype(self.dtype)
        h, kv_cache = scan_layers(self._layer, self.layers,
                                  params["layers"], h, batch, kv_cache)
        h = layer_norm(h, *params["ln_f"], eps=self.eps)
        return h, kv_cache

    def _layer(self, lp, idx, h, batch, kv_cache):
        T = h.shape[0]
        residual = h
        x = layer_norm(h, *lp["ln_1"], eps=self.eps)
        q = dense(x, *lp["q_proj"]).reshape(T, self.heads, self.head_dim)
        k = dense(x, *lp["k_proj"]).reshape(T, self.heads, self.head_dim)
        v = dense(x, *lp["v_proj"]).reshape(T, self.heads, self.head_dim)
        attn, kv_cache = attend(q, k, v, kv_cache, idx, batch, self.scale)
        h = residual + dense(attn.reshape(T, -1), *lp["c_proj"])

        residual = h
        x = layer_norm(h, *lp["ln_2"], eps=self.eps)
        x = self.act(dense(x, *lp["c_fc"]))
        h = residual + dense(x, *lp["mlp_c_proj"])
        return h, kv_cache

    def compute_logits(self, params, hidden):
        return (hidden @ params["wte"].T).astype(jnp.float32)  # tied head

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
                "ln_1": ln(),
                "q_proj": lin(H, H),
                "k_proj": lin(H, H),
                "v_proj": lin(H, H),
                "c_proj": lin(H, H),
                "ln_2": ln(),
                "c_fc": lin(H, I),
                "mlp_c_proj": lin(I, H),
            })
        return {
            "wte": u(self.vocab, H),
            "wpe": u(self.max_pos, H),
            "layers": stack_layers(layers),
            "ln_f": ln(),
        }

    def load_weights(self, weights_iter) -> Dict[str, Any]:
        params: Dict[str, Any] = {"layers": [{} for _ in range(self.layers)]}
        pending: Dict[str, Dict[str, Any]] = {}
        H = self.hidden

        def finish(lp, leaf, entry):
            if "weight" in entry and "bias" in entry:
                lp[leaf] = (entry["weight"], entry["bias"])

        for name, w in weights_iter:
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if name.endswith(".attn.bias") or name.endswith(
                    ".attn.masked_bias"):
                continue  # causal-mask buffers
            if name == "lm_head.weight":
                continue  # tied to wte
            w = jnp.asarray(w)
            if name == "wte.weight":
                params["wte"] = w.astype(self.dtype)
            elif name == "wpe.weight":
                params["wpe"] = w.astype(self.dtype)
            elif name.startswith("ln_f."):
                entry = pending.setdefault("ln_f", {})
                entry[name.split(".")[-1]] = w.astype(jnp.float32)
                if len(entry) == 2:
                    params["ln_f"] = (entry["weight"], entry["bias"])
            elif name.startswith("h."):
                parts = name.split(".")
                i = int(parts[1])
                lp = params["layers"][i]
                sub = ".".join(parts[2:-1])
                kind = parts[-1]
                if sub in ("ln_1", "ln_2"):
                    entry = pending.setdefault(f"{i}.{sub}", {})
                    entry[kind] = w.astype(jnp.float32)
                    finish(lp, sub, entry)
                elif sub == "attn.c_attn":
                    # HF Conv1D: [in, 3H] weight / [3H] bias. Split into
                    # q/k/v along the output axis.
                    w = w.astype(self.dtype)
                    for j, leaf in enumerate(("q_proj", "k_proj", "v_proj")):
                        entry = pending.setdefault(f"{i}.{leaf}", {})
                        if kind == "weight":
                            entry["weight"] = w[:, j * H:(j + 1) * H]
                        else:
                            entry["bias"] = w[j * H:(j + 1) * H]
                        finish(lp, leaf, entry)
                elif sub in ("attn.c_proj", "mlp.c_fc", "mlp.c_proj"):
                    leaf = {"attn.c_proj": "c_proj", "mlp.c_fc": "c_fc",
                            "mlp.c_proj": "mlp_c_proj"}[sub]
                    entry = pending.setdefault(f"{i}.{leaf}", {})
                    entry[kind] = w.astype(self.dtype)  # Conv1D: no transpose
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
            "ln_1": ln,
            "q_proj": col,
            "k_proj": col,
            "v_proj": col,
            "c_proj": row,
            "ln_2": ln,
            "c_fc": col,
            "mlp_c_proj": row,
        }
        return maybe_quantize_shardings(
            self, {
                "wte": P("model", None),
                "wpe": P(None, None),
                "layers": stack_layer_specs(layer),
                "ln_f": ln,
            })
