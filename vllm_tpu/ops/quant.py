"""Weight-only INT8 quantization for linear layers.

North star beyond the reference (BASELINE.md: "weight-only INT8
linears"): decode on TPU is weight-bandwidth-bound, so halving the
bytes per weight read roughly doubles decode throughput and frees HBM
for KV blocks.

Scheme: symmetric per-output-channel scales. ``y = (x @ W_q) * s`` is
exactly ``x @ (W_q * s)`` when ``s`` is per-column, so dequantization
collapses to one cheap [T, out] multiply on the matmul result — the
int8->bf16 convert of the weight tile fuses into the dot's operand
load under XLA (the "fused dequant matmul" the reference implements
by hand in CUDA for its KV path).
"""

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_INT8_MAX = 127.0


class QuantizedLinear(NamedTuple):
    """An [in, out] linear weight, int8 payload + per-column scales."""
    w: jnp.ndarray  # [in, out] int8
    scale: jnp.ndarray  # [out] f32


# Jitted (cached per weight shape): quantizing a 7B model is ~200
# leaves, and eager per-op dispatch through a tunneled runtime costs
# seconds per leaf. Leaf-at-a-time keeps peak memory at
# float-tree + one int8 leaf (a whole-tree jit could hold both trees).
@jax.jit
def quantize_linear_weight(w: jnp.ndarray) -> QuantizedLinear:
    """Symmetric per-output-channel int8 quantization of [in, out]
    (or layer-stacked [L, in, out] -> per-layer [L, out] scales)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2)
    scale = jnp.maximum(amax / _INT8_MAX, 1e-10)
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale[..., None, :]),
        -_INT8_MAX, _INT8_MAX).astype(jnp.int8)
    return QuantizedLinear(q, scale.astype(jnp.float32))


def dequantize_linear(ql: QuantizedLinear,
                      dtype=jnp.float32) -> jnp.ndarray:
    return (ql.w.astype(jnp.float32) *
            ql.scale[..., None, :]).astype(dtype)


# When set (the "int8-w8a8" quantization mode), linears whose row count
# is >= this threshold ALSO quantize activations per-token and run the
# matmul as int8 x int8 -> int32 — the MXU's int8 rate is 2x bf16, and
# prefill-sized matmuls are compute-bound (~85% of a mixed step's
# device time at T=1088 on 7B). Decode-sized matmuls (few rows) are
# weight-BANDWIDTH-bound, where activation quant buys nothing — the
# static row-count check routes them to the bf16 path, so decode
# numerics are identical to weight-only INT8. Trace-time static.
# The threshold is derived from the engine's bucket ladder (strictly
# above the largest decode batch bucket — see TPUWorker.__init__), NOT
# hard-coded, so growing max_num_seqs can never silently flip decode
# steps onto the activation-quant path.
_W8A8_MIN_ROWS = [None]


def set_w8a8_min_rows(rows) -> None:
    _W8A8_MIN_ROWS[0] = rows


def quantized_matmul(x: jnp.ndarray, ql: QuantizedLinear) -> jnp.ndarray:
    """x [T, in] @ quantized weight -> [T, out] in x.dtype."""
    rows = _W8A8_MIN_ROWS[0]
    if rows is not None and x.shape[0] >= rows:
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        xs = jnp.maximum(amax / _INT8_MAX, 1e-8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -_INT8_MAX,
                      _INT8_MAX).astype(jnp.int8)
        y = jax.lax.dot_general(xq, ql.w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * xs * ql.scale).astype(x.dtype)
    y = jnp.matmul(x, ql.w.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y * ql.scale).astype(x.dtype)


def _quant_leaf(leaf):
    """Quantize a linear param leaf: bare [in, out] array, or a
    (weight, bias) tuple (bias stays as is)."""
    if isinstance(leaf, tuple):
        w, b = leaf
        return (quantize_linear_weight(w), b)
    return quantize_linear_weight(leaf)


def _quant_leaf_sharding(spec):
    """Mirror _quant_leaf on a PartitionSpec leaf: the int8 payload
    keeps the weight's spec; per-column scales shard like the output
    dim (column-parallel -> sharded scales, row-parallel -> replicated).
    Layer-stacked specs ([None, in, out]) keep the leading layer axis
    on the scales too."""
    def one(w_spec):
        lead = tuple(w_spec)[:-2]  # () or (None,) for stacked layers
        return QuantizedLinear(w_spec, P(*(lead + (w_spec[-1],))))

    if isinstance(spec, tuple) and not isinstance(spec, P):
        w_spec, b_spec = spec
        return (one(w_spec), b_spec)
    return one(spec)


def quantize_model_params(params: dict, layer_keys: Tuple[str, ...],
                          top_keys: Tuple[str, ...]) -> dict:
    """Quantize the named linear leaves of a model param tree in place
    (``layers`` is a layer-stacked dict; each leaf quantizes with
    per-layer scales)."""
    for key in layer_keys:
        params["layers"][key] = _quant_leaf(params["layers"][key])
    for key in top_keys:
        if key in params:
            params[key] = _quant_leaf(params[key])
    return params


def quantize_model_shardings(shardings: dict, layer_keys: Tuple[str, ...],
                             top_keys: Tuple[str, ...]) -> dict:
    for key in layer_keys:
        shardings["layers"][key] = _quant_leaf_sharding(
            shardings["layers"][key])
    for key in top_keys:
        if key in shardings:
            shardings[key] = _quant_leaf_sharding(shardings[key])
    return shardings
