"""Weight-only INT8 / INT4 quantization for linear layers.

North star beyond the reference (BASELINE.md: "weight-only INT8
linears"): decode on TPU is weight-bandwidth-bound, so halving the
bytes per weight read roughly doubles decode throughput and frees HBM
for KV blocks.

INT8 scheme: symmetric per-output-channel scales. ``y = (x @ W_q) * s``
is exactly ``x @ (W_q * s)`` when ``s`` is per-column, so
dequantization collapses to one cheap [T, out] multiply on the matmul
result — the int8->bf16 convert of the weight tile fuses into the
dot's operand load under XLA (the "fused dequant matmul" the reference
implements by hand in CUDA for its KV path).

INT4 scheme ("int4" mode, w4a8): two 4-bit codes nibble-packed per
int8 byte (byte r holds input-rows r [low] and r+in/2 [high] — the
split-half pairing keeps each half a contiguous slab so the matmul
kernel's per-group slices stay plain lane/sublane windows), with
GROUP-WISE scales (128 input rows per group) because per-column int4
is too coarse for real checkpoints. Group scales don't fold into a
single dot the way per-column ones do, so the matmul runs as a Pallas
kernel: activations quantize per-token to int8, each group's nibbles
feed the MXU as int8, and the [group, out] scales fold into the f32
accumulator between group dots (ops/pallas/int4_matmul.py). Top-level
leaves (lm_head) stay INT8 — their quality sensitivity is high and
their bytes are noise next to the layer stack.
"""

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_INT8_MAX = 127.0
# Symmetric int4 uses [-7, 7]: keeping the code range symmetric costs
# one of 16 levels and spares the +/- asymmetry bookkeeping.
_INT4_MAX = 7.0
# Input rows per int4 scale group. 128 matches the MXU contraction
# tile, so the kernel's per-group dot is exactly one K-pass and the
# scale fold costs one vector multiply-add per group.
INT4_GROUP = 128


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


class Int4Linear(NamedTuple):
    """An [in, out] linear weight as nibble-packed int4 + group scales.

    w_packed: [in//2, out] int8 (or layer-stacked [L, in//2, out]) —
        byte r holds code for input-row r in its LOW nibble and
        input-row r + in//2 in its HIGH nibble.
    scale: [NG, 2, out] f32 ([L, NG, 2, out] stacked) — entry [g, 0]
        scales input rows [g*G, (g+1)*G) (the low half), [g, 1] rows
        [in//2 + g*G, ...) (the high half); G = min(INT4_GROUP, in//2).
        The group axis leads so the matmul kernel's traced group index
        lands on the leading (untiled) axis of the scale block WITHOUT
        a per-call transpose (a [NG, 2, out] transpose inside the step
        program would materialize MBs of HBM traffic per layer per
        step).
    """
    w_packed: jnp.ndarray
    scale: jnp.ndarray


def int4_group(in_dim: int) -> int:
    g = min(int(INT4_GROUP), in_dim // 2)
    assert (in_dim // 2) % g == 0, (
        f"int4 needs in_dim/2 ({in_dim // 2}) divisible by the scale "
        f"group ({g})")
    return g


def _quantize_one_int4(w: jnp.ndarray) -> Int4Linear:
    """Group-wise int4 quantization of a single [in, out] weight."""
    in_dim = w.shape[-2]
    g = int4_group(in_dim)
    ng = (in_dim // 2) // g
    # [2, NG, G, out]: halves x groups x rows-in-group.
    wf = w.astype(jnp.float32).reshape(2, ng, g, w.shape[-1])
    amax = jnp.max(jnp.abs(wf), axis=-2)
    scale = jnp.maximum(amax / _INT4_MAX, 1e-10)
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -_INT4_MAX,
                 _INT4_MAX).astype(jnp.int8)
    lo = q[0].reshape(in_dim // 2, w.shape[-1])
    hi = q[1].reshape(in_dim // 2, w.shape[-1])
    # Biased-low packing: the LOW nibble stores lo+8 (unsigned, [1, 15])
    # so the byte read as signed int8 is exactly 16*hi + (lo+8). The
    # matmul kernel exploits that identity to skip nibble sign-extension
    # entirely: x_hi @ byte = 16*(x_hi @ hi) + x_hi @ ulo, and
    # x_lo @ ulo = x_lo @ lo + 8*rowsum(x_lo) — one bitwise AND per
    # byte (ulo) replaces the widen+3-shift unpack that made the kernel
    # VPU-bound (see ops/pallas/int4_matmul.py).
    packed = jnp.bitwise_or(jnp.bitwise_and(lo + 8, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    # Store group-axis-leading ([NG, 2, out]) — one transpose here
    # instead of one per matmul call in the step program.
    return Int4Linear(packed,
                      jnp.swapaxes(scale.astype(jnp.float32), 0, 1))


_quantize_one_int4_jit = jax.jit(_quantize_one_int4)


def quantize_linear_int4(w: jnp.ndarray) -> Int4Linear:
    """Symmetric group-wise int4 quantization of [in, out] (or
    layer-stacked [L, in, out]).

    Layer-stacked leaves quantize layer-at-a-time: the int4 pipeline's
    reshapes and nibble-packing defeat XLA's elementwise fusion, so a
    whole-leaf formulation materialized f32 + int8-code temps of the
    full [L, in, out] stack (~8 GiB on 7B's MLP leaf) on top of the
    still-resident bf16 tree — RESOURCE_EXHAUSTED on a 16 GiB v5e at
    engine build. Per-layer temps are ~1/L of that and bound the peak
    at bf16-tree + this leaf's outputs. The loop is an EAGER python
    loop over per-layer jitted calls, not lax.map: the scan
    formulation re-gathers the input stack and update-slices the
    output stack every iteration, measured 124 s for ONE 7B MLP leaf
    on a v5e (~22 min of engine build across leaves) vs 1.2 s for 32
    eager per-layer dispatches of the identical body."""
    assert w.shape[-2] % 2 == 0, (
        f"int4 needs an even in_dim, got {w.shape[-2]}")
    if w.ndim == 3:
        parts = [_quantize_one_int4_jit(w[i]) for i in range(w.shape[0])]
        return Int4Linear(jnp.stack([p.w_packed for p in parts]),
                          jnp.stack([p.scale for p in parts]))
    return _quantize_one_int4_jit(w)


def unpack_int4(packed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[.., in/2, out] packed bytes -> (low, high) int8 nibble planes.

    byte = 16*hi + (lo+8) (see _quantize_one_int4): the arithmetic
    right shift floors 16*hi + [1,15] back to hi for any sign, and the
    low nibble de-biases with one subtract."""
    p = packed.astype(jnp.int32)
    hi = jnp.right_shift(p, 4).astype(jnp.int8)  # arithmetic: sign-extends
    lo = (jnp.bitwise_and(p, 0xF) - 8).astype(jnp.int8)
    return lo, hi


def dequantize_linear_int4(ql: Int4Linear,
                           dtype=jnp.float32) -> jnp.ndarray:
    lo, hi = unpack_int4(ql.w_packed)
    half = jnp.stack([lo, hi], axis=-3)  # [.., 2, in/2, out]
    lead = half.shape[:-3]
    ng = ql.scale.shape[-3]
    out = half.shape[-1]
    grouped = half.reshape(lead + (2, ng, half.shape[-2] // ng, out))
    s = jnp.swapaxes(ql.scale, -3, -2)  # [.., 2, NG, out]
    w = grouped.astype(jnp.float32) * s[..., None, :]
    return w.reshape(lead + (half.shape[-2] * 2, out)).astype(dtype)


def quantize_activations_int8(
        x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token symmetric int8: [T, in] -> ([T, in] int8, [T, 1] f32)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / _INT8_MAX, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs), -_INT8_MAX,
                  _INT8_MAX).astype(jnp.int8)
    return xq, xs


def int4_matmul_xla(x: jnp.ndarray, ql: Int4Linear) -> jnp.ndarray:
    """Reference/fallback int4 matmul (w4a8, numerically identical to
    the Pallas kernel): per-token int8 activations, per-group int8
    dots accumulated in f32 against the group scales."""
    xq, xs = quantize_activations_int8(x)
    lo, hi = unpack_int4(ql.w_packed)  # [in/2, out] each
    in2, out = lo.shape[-2:]
    ng = ql.scale.shape[-3]
    g = in2 // ng
    T = xq.shape[0]
    # [T, 2, NG, G]: halves x groups of the input axis.
    xg = xq.reshape(T, 2, ng, g)
    acc = jnp.zeros((T, out), jnp.float32)
    for h, plane in enumerate((lo, hi)):
        pg = plane.reshape(ng, g, out)
        z = jax.lax.dot_general(
            xg[:, h].transpose(1, 0, 2), pg,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)  # [NG, T, out]
        acc = acc + jnp.einsum("nto,no->to", z.astype(jnp.float32),
                               ql.scale[:, h].astype(jnp.float32))
    return (acc * xs).astype(x.dtype)


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


def _quant_leaf(leaf, int4: bool = False):
    """Quantize a linear param leaf: bare [in, out] array, or a
    (weight, bias) tuple (bias stays as is)."""
    quantize = quantize_linear_int4 if int4 else quantize_linear_weight
    if isinstance(leaf, tuple):
        w, b = leaf
        return (quantize(w), b)
    return quantize(leaf)


def _quant_leaf_sharding(spec, int4: bool = False):
    """Mirror _quant_leaf on a PartitionSpec leaf: the quantized
    payload keeps the weight's spec; int8 per-column scales shard like
    the output dim (column-parallel -> sharded scales, row-parallel ->
    replicated); int4 [NG, 2, out] group scales (group axis leading —
    see Int4Linear) likewise shard only on their output axis. Layer-stacked specs ([None, in, out]) keep the
    leading layer axis on the scales too."""
    def one(w_spec):
        lead = tuple(w_spec)[:-2]  # () or (None,) for stacked layers
        if int4:
            return Int4Linear(w_spec,
                              P(*(lead + (None, None, w_spec[-1]))))
        return QuantizedLinear(w_spec, P(*(lead + (w_spec[-1],))))

    if isinstance(spec, tuple) and not isinstance(spec, P):
        w_spec, b_spec = spec
        return (one(w_spec), b_spec)
    return one(spec)


def quantize_model_params(params: dict, layer_keys: Tuple[str, ...],
                          top_keys: Tuple[str, ...],
                          int4: bool = False) -> dict:
    """Quantize the named linear leaves of a model param tree in place
    (``layers`` is a layer-stacked dict; each leaf quantizes with
    per-layer scales). ``int4`` applies to the LAYER leaves only — the
    top-level lm_head stays int8 (quality-sensitive, and its bytes are
    noise next to the layer stack)."""
    for key in layer_keys:
        params["layers"][key] = _quant_leaf(params["layers"][key],
                                            int4=int4)
    for key in top_keys:
        if key in params:
            params[key] = _quant_leaf(params[key])
    return params


def quantize_model_shardings(shardings: dict, layer_keys: Tuple[str, ...],
                             top_keys: Tuple[str, ...],
                             int4: bool = False) -> dict:
    for key in layer_keys:
        shardings["layers"][key] = _quant_leaf_sharding(
            shardings["layers"][key], int4=int4)
    for key in top_keys:
        if key in shardings:
            shardings[key] = _quant_leaf_sharding(shardings[key])
    return shardings
