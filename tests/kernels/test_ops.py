"""Elementwise-op tests against hand-rolled numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_tpu.ops import (apply_rope, compute_rope_cache, get_act_fn,
                          layer_norm, rms_norm, silu_and_mul)


def test_rms_norm_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 64), dtype=np.float32)
    w = rng.standard_normal(64, dtype=np.float32)
    ref = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-6) * w
    out = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_layer_norm_matches_reference():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, 32), dtype=np.float32)
    w = rng.standard_normal(32, dtype=np.float32)
    b = rng.standard_normal(32, dtype=np.float32)
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-5) * w + b
    out = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_silu_and_mul():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 16), dtype=np.float32)
    gate, up = x[:, :8], x[:, 8:]
    ref = gate / (1 + np.exp(-gate)) * up
    out = silu_and_mul(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_act_registry():
    x = jnp.linspace(-2, 2, 8)
    for name in ("gelu", "gelu_new", "gelu_fast", "relu"):
        y = get_act_fn(name)(x)
        assert y.shape == x.shape
    with pytest.raises(ValueError):
        get_act_fn("nope")


@pytest.mark.parametrize("rotary_dim,head_dim", [(16, 16), (8, 16)])
def test_rope_matches_rotate_half_reference(rotary_dim, head_dim):
    """HF-style rotate_half reference (the reference's own test style,
    /root/reference/tests/kernels/test_pos_encoding.py:29-60)."""
    rng = np.random.default_rng(3)
    T, H = 5, 3
    x = rng.standard_normal((T, H, head_dim), dtype=np.float32)
    positions = np.array([0, 3, 1, 7, 2], dtype=np.int32)
    base = 10000.0

    cos_c, sin_c = compute_rope_cache(rotary_dim, 16, base)
    out = apply_rope(jnp.asarray(x), jnp.asarray(positions), cos_c, sin_c,
                     rotary_dim)

    # Reference: rotate_half on the rotary prefix.
    inv_freq = 1.0 / (base**(np.arange(0, rotary_dim, 2) / rotary_dim))
    t = positions[:, None] * inv_freq[None, :]  # [T, rot/2]
    cos = np.cos(t)[:, None, :]
    sin = np.sin(t)[:, None, :]
    x_rot, x_pass = x[..., :rotary_dim], x[..., rotary_dim:]
    x1, x2 = x_rot[..., :rotary_dim // 2], x_rot[..., rotary_dim // 2:]
    ref_rot = np.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    ref = np.concatenate([ref_rot, x_pass], axis=-1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_quantized_matmul_w8a8_close():
    """int8 activations (prefill path of "int8-w8a8") stay within ~1%
    of the weight-only result; short (decode-sized) inputs bypass it
    and remain exact."""
    import numpy as np
    from vllm_tpu.ops.quant import (dequantize_linear, quantize_linear_weight,
                                    quantized_matmul, set_w8a8_min_rows)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    ql = quantize_linear_weight(w)
    x = jnp.asarray(rng.standard_normal((64, 256)), jnp.float32)
    ref = x @ dequantize_linear(ql)
    try:
        set_w8a8_min_rows(32)
        got = quantized_matmul(x, ql)
        err = float(jnp.max(jnp.abs(got - ref)) /
                    (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < 0.01, err
        set_w8a8_min_rows(128)  # above the row count -> exact path
        exact = quantized_matmul(x, ql)
        np.testing.assert_allclose(np.asarray(exact), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
    finally:
        set_w8a8_min_rows(None)


def test_int4_pack_roundtrip_exact():
    """Nibble pack -> unpack recovers the int4 codes exactly, and the
    split-half layout maps row r / r + in/2 to low / high nibbles."""
    import numpy as np
    from vllm_tpu.ops.quant import quantize_linear_int4, unpack_int4
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    ql = quantize_linear_int4(w)
    assert ql.w_packed.shape == (128, 64)
    lo, hi = unpack_int4(ql.w_packed)
    assert int(jnp.min(lo)) >= -7 and int(jnp.max(lo)) <= 7
    assert int(jnp.min(hi)) >= -7 and int(jnp.max(hi)) <= 7
    # Repack matches the stored bytes (biased-low layout: the byte as
    # signed int8 is 16*hi + (lo+8); see quant.py _quantize_one_int4).
    repacked = jnp.bitwise_or(
        jnp.bitwise_and(lo.astype(jnp.int32) + 8, 0xF),
        jnp.left_shift(hi.astype(jnp.int32), 4)).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(repacked),
                                  np.asarray(ql.w_packed))
    # The identity the Pallas kernel relies on: raw byte == 16*hi+lo+8.
    np.testing.assert_array_equal(
        np.asarray(ql.w_packed, np.int32),
        16 * np.asarray(hi, np.int32) + np.asarray(lo, np.int32) + 8)


def test_int4_dequant_error_bound():
    """Group-wise symmetric int4: |W - deq(W)| <= group_amax / 14 + eps
    per element (half a quantization step of the group's scale)."""
    import numpy as np
    from vllm_tpu.ops.quant import (dequantize_linear_int4, int4_group,
                                    quantize_linear_int4)
    rng = np.random.default_rng(2)
    in_dim, out = 512, 96
    w = rng.standard_normal((in_dim, out)).astype(np.float32)
    # Give groups very different magnitudes: group scales must adapt.
    w[:128] *= 20.0
    ql = quantize_linear_int4(jnp.asarray(w))
    deq = np.asarray(dequantize_linear_int4(ql))
    g = int4_group(in_dim)
    half = in_dim // 2
    for h in range(2):
        for gi in range((in_dim // 2) // g):
            rows = slice(h * half + gi * g, h * half + (gi + 1) * g)
            amax = np.abs(w[rows]).max(axis=0)  # per column
            bound = amax / 14 + 1e-6
            assert (np.abs(w[rows] - deq[rows]) <= bound[None, :]).all()


def test_int4_matmul_xla_matches_dequant():
    """The w4a8 fallback matmul tracks x @ deq(W) within the combined
    int4-weight + int8-activation error budget."""
    import numpy as np
    from vllm_tpu.ops.quant import (dequantize_linear_int4, int4_matmul_xla,
                                    quantize_linear_int4)
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((512, 128)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((16, 512)), jnp.float32)
    ql = quantize_linear_int4(w)
    ref = x @ dequantize_linear_int4(ql)
    got = int4_matmul_xla(x, ql)
    err = float(jnp.max(jnp.abs(got - ref)) /
                (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 0.01, err


@pytest.mark.parametrize("T", [8, 256])
def test_int4_pallas_kernel_matches_xla(T):
    """The Pallas fused-dequant kernel (interpret mode) reproduces the
    XLA w4a8 formulation on MXU-sized shapes — both static variants:
    T=8 (narrow rows, three-dot biased-byte) and T=256 (wide rows,
    hi-nibble unpack; _WIDE_ROWS_MIN)."""
    import os
    import numpy as np
    from vllm_tpu.ops.pallas.int4_matmul import pallas_int4_matmul
    from vllm_tpu.ops.quant import int4_matmul_xla, quantize_linear_int4
    rng = np.random.default_rng(4)
    in_dim, out = 512, 256
    w = jnp.asarray(rng.standard_normal((in_dim, out)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((T, in_dim)), jnp.float32)
    ql = quantize_linear_int4(w)
    ref = int4_matmul_xla(x, ql)
    os.environ["VLLM_TPU_FORCE_PALLAS_OPS"] = "1"
    try:
        got = pallas_int4_matmul(x, ql)
    finally:
        os.environ.pop("VLLM_TPU_FORCE_PALLAS_OPS", None)
    # Both paths compute the same exact integer dots; they differ only
    # in f32 association (the kernel folds the +8-bias correction as a
    # separate rowsums @ s_lo term, the XLA path scales (x @ lo)
    # directly), so agreement is to f32 rounding, not bit-exact.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
