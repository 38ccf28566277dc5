"""OPT decoder.

Capability parity: /root/reference/vllm/model_executor/models/opt.py —
learned positional embeddings with the +2 offset (opt.py:43), optional
project_in/project_out (opt.py:179-186), pre/post-layernorm variants
via do_layer_norm_before (opt.py:121,150-157,188-195), ReLU MLP,
lm_head tied to embed_tokens.
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

# Parity: OPT checkpoints index position embeddings from 2
# (/root/reference/vllm/model_executor/models/opt.py:43).
POS_OFFSET = 2


class OPTModel:

    QUANT_LAYER_KEYS = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1",
                        "fc2")
    QUANT_TOP_KEYS = ()  # lm_head tied; project_in/out are small

    def __init__(self, hf_config, dtype=jnp.bfloat16,
                 quantization=None) -> None:
        self.cfg = hf_config
        self.dtype = dtype
        self.quantization = quantization
        self.hidden = hf_config.hidden_size
        self.heads = hf_config.num_attention_heads
        self.kv_heads = self.heads
        self.head_dim = self.hidden // self.heads
        self.ffn = hf_config.ffn_dim
        self.layers = hf_config.num_hidden_layers
        self.vocab = hf_config.vocab_size
        self.embed_dim = getattr(hf_config, "word_embed_proj_dim",
                                 self.hidden)
        self.pre_ln = getattr(hf_config, "do_layer_norm_before", True)
        self.act = get_act_fn(
            getattr(hf_config, "activation_function", "relu"))
        self.scale = self.head_dim**-0.5
        self.max_pos = hf_config.max_position_embeddings

    # -- forward -----------------------------------------------------------

    def forward(self, params, batch, kv_cache):
        h = params["embed_tokens"][batch.token_ids].astype(self.dtype)
        if "project_in" in params:
            h = dense(h, params["project_in"])
        pos = params["embed_positions"][batch.positions + POS_OFFSET]
        h = h + pos.astype(self.dtype)
        h, kv_cache = scan_layers(self._layer, self.layers,
                                  params["layers"], h, batch, kv_cache)
        if "final_layer_norm" in params:
            h = layer_norm(h, *params["final_layer_norm"])
        if "project_out" in params:
            h = dense(h, params["project_out"])
        return h, kv_cache

    def _layer(self, lp, idx, h, batch, kv_cache):
        T = h.shape[0]
        residual = h
        x = layer_norm(h, *lp["self_attn_layer_norm"]) if self.pre_ln else h
        q = dense(x, *lp["q_proj"]).reshape(T, self.heads, self.head_dim)
        k = dense(x, *lp["k_proj"]).reshape(T, self.heads, self.head_dim)
        v = dense(x, *lp["v_proj"]).reshape(T, self.heads, self.head_dim)
        attn, kv_cache = attend(q, k, v, kv_cache, idx, batch, self.scale)
        h = residual + dense(attn.reshape(T, -1), *lp["out_proj"])
        if not self.pre_ln:
            h = layer_norm(h, *lp["self_attn_layer_norm"])

        residual = h
        x = layer_norm(h, *lp["final_layer_norm"]) if self.pre_ln else h
        x = self.act(dense(x, *lp["fc1"]))
        x = dense(x, *lp["fc2"])
        h = residual + x
        if not self.pre_ln:
            h = layer_norm(h, *lp["final_layer_norm"])
        return h, kv_cache

    def compute_logits(self, params, hidden):
        # lm_head tied to embed_tokens [V, E].
        return (hidden @ params["embed_tokens"].T).astype(jnp.float32)

    # -- parameters --------------------------------------------------------

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        key = jax.random.PRNGKey(seed)
        idx = [0]

        def u(*shape, dtype=None):
            idx[0] += 1
            return jax.random.uniform(jax.random.fold_in(key, idx[0]), shape,
                                      dtype or self.dtype, -1e-1, 1e-1)

        H, F = self.hidden, self.ffn

        def ln():
            return (jnp.ones((H,), jnp.float32), jnp.zeros((H,), jnp.float32))

        def lin(i, o):
            return (u(i, o), jnp.zeros((o,), self.dtype))

        layers = []
        for _ in range(self.layers):
            layers.append({
                "self_attn_layer_norm": ln(),
                "q_proj": lin(H, H),
                "k_proj": lin(H, H),
                "v_proj": lin(H, H),
                "out_proj": lin(H, H),
                "final_layer_norm": ln(),
                "fc1": lin(H, F),
                "fc2": lin(F, H),
            })
        params = {
            "embed_tokens": u(self.vocab, self.embed_dim),
            "embed_positions": u(self.max_pos + POS_OFFSET, H),
            "layers": stack_layers(layers),
        }
        if self.pre_ln:
            params["final_layer_norm"] = ln()
        if self.embed_dim != H:
            params["project_in"] = u(self.embed_dim, H)
            params["project_out"] = u(H, self.embed_dim)
        return params

    def load_weights(self, weights_iter) -> Dict[str, Any]:
        params: Dict[str, Any] = {"layers": [{} for _ in range(self.layers)]}
        pending: Dict[str, Dict[str, jnp.ndarray]] = {}

        def stash(store, key, kind, w):
            entry = pending.setdefault(key, {})
            entry[kind] = w
            if "weight" in entry and "bias" in entry:
                store[key.split("/")[-1]] = (entry["weight"], entry["bias"])

        for name, w in weights_iter:
            if name.startswith("decoder."):  # some checkpoints drop "model."
                name = "model." + name
            if name == "lm_head.weight":
                continue  # tied to embed_tokens
            if not name.startswith("model.decoder."):
                raise ValueError(f"unexpected weight {name}")
            rest = name[len("model.decoder."):]
            if rest == "embed_tokens.weight":
                params["embed_tokens"] = jnp.asarray(w).astype(self.dtype)
            elif rest == "embed_positions.weight":
                params["embed_positions"] = jnp.asarray(w).astype(self.dtype)
            elif rest.startswith("final_layer_norm."):
                entry = pending.setdefault("final_ln", {})
                entry[rest.split(".")[-1]] = jnp.asarray(w).astype(
                    jnp.float32)
                if len(entry) == 2:
                    params["final_layer_norm"] = (entry["weight"],
                                                  entry["bias"])
            elif rest == "project_in.weight":
                params["project_in"] = jnp.asarray(w).T.astype(self.dtype)
            elif rest == "project_out.weight":
                params["project_out"] = jnp.asarray(w).T.astype(self.dtype)
            elif rest.startswith("layers."):
                parts = rest.split(".")
                i = int(parts[1])
                lp = params["layers"][i]
                sub = ".".join(parts[2:-1])  # e.g. self_attn.q_proj
                kind = parts[-1]  # weight | bias
                leaf = sub.split(".")[-1]
                if sub in ("self_attn_layer_norm", "final_layer_norm"):
                    wj = jnp.asarray(w).astype(jnp.float32)
                    stash(lp, f"{i}/{leaf}", kind, wj)
                else:
                    wj = jnp.asarray(w).astype(self.dtype)
                    if kind == "weight":
                        wj = wj.T
                    stash(lp, f"{i}/{leaf}", kind, wj)
            else:
                raise ValueError(f"unexpected weight {name}")
        params["layers"] = stack_layers(params["layers"])
        return params

    def param_shardings(self) -> Dict[str, Any]:
        col = (P(None, "model"), P("model"))
        row = (P("model", None), P(None))
        ln = (P(None), P(None))
        layer = {
            "self_attn_layer_norm": ln,
            "q_proj": col,
            "k_proj": col,
            "v_proj": col,
            "out_proj": row,
            "final_layer_norm": ln,
            "fc1": col,
            "fc2": row,
        }
        shardings = {
            "embed_tokens": P("model", None),
            "embed_positions": P(None, None),
            "layers": stack_layer_specs(layer),
        }
        if self.pre_ln:
            shardings["final_layer_norm"] = ln
        if self.embed_dim != self.hidden:
            shardings["project_in"] = P(None, None)
            shardings["project_out"] = P(None, None)
        return maybe_quantize_shardings(self, shardings)
