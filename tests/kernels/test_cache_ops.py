"""KV-cache op tests: replay every mapping in numpy and compare
(the reference's own pattern, /root/reference/tests/kernels/test_cache.py),
plus INT8 quantized-cache coverage (no reference counterpart)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_tpu.ops.cache import (PAD_SLOT, KVCache, copy_blocks,
                                dequantize_pages, gather_blocks,
                                kv_cache_shape, kv_scales_shape,
                                pack_scale_pages, scatter_blocks,
                                write_kv)

L, KVH, NB, BS, D = 2, 3, 8, 4, 16


def make_cache(seed=0, quantized=False, scale_dtype=np.float32) -> KVCache:
    rng = np.random.default_rng(seed)
    data = rng.standard_normal(kv_cache_shape(L, KVH, NB, BS, D),
                               dtype=np.float32)
    if not quantized:
        return KVCache(jnp.asarray(data), None)
    scales = np.abs(data).max(-1) / 127.0 + 1e-10  # [L, NB, 2, KVH, BS]
    q = np.clip(np.round(data / scales[..., None]), -127, 127)
    return KVCache(jnp.asarray(q, jnp.int8),
                   jnp.asarray(pack_scale_pages(scales)).astype(scale_dtype))


def test_write_kv_scatters_and_drops_padding():
    cache = make_cache()
    rng = np.random.default_rng(1)
    T = 5
    k = rng.standard_normal((T, KVH, D), dtype=np.float32)
    v = rng.standard_normal((T, KVH, D), dtype=np.float32)
    slots = np.array([0, 5, 17, 30, int(PAD_SLOT)], dtype=np.int32)

    out = write_kv(cache, 1, jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots))
    out_data = np.asarray(out.data)

    ref = np.asarray(cache.data).copy()
    for t, slot in enumerate(slots):
        if slot == int(PAD_SLOT):
            continue
        b, off = slot // BS, slot % BS
        ref[1, b, 0, :, off] = k[t]
        ref[1, b, 1, :, off] = v[t]
    np.testing.assert_array_equal(out_data, ref)
    # Layer 0 untouched.
    np.testing.assert_array_equal(out_data[0], np.asarray(cache.data)[0])


def test_write_kv_int8_quantizes_on_write():
    cache = make_cache(quantized=True)
    rng = np.random.default_rng(4)
    T = 4
    k = rng.standard_normal((T, KVH, D), dtype=np.float32) * 3.0
    v = rng.standard_normal((T, KVH, D), dtype=np.float32) * 0.1
    slots = np.array([0, 5, 17, int(PAD_SLOT)], dtype=np.int32)

    out = write_kv(cache, 0, jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots))
    deq = np.asarray(dequantize_pages(out.data, out.scales))

    for t, slot in enumerate(slots):
        if slot == int(PAD_SLOT):
            continue
        b, off = slot // BS, slot % BS
        # Per-vector symmetric int8: relative error <= 1/127 of amax.
        np.testing.assert_allclose(deq[0, b, 0, :, off], k[t],
                                   atol=np.abs(k[t]).max() / 127 + 1e-6)
        np.testing.assert_allclose(deq[0, b, 1, :, off], v[t],
                                   atol=np.abs(v[t]).max() / 127 + 1e-6)


def test_write_kv_bf16_scales_roundtrip():
    """The serving engine stores scales as bf16 (SCALE_DTYPE): the
    scale is rounded to bf16 BEFORE quantization, so the write->dequant
    round trip error stays within one int8 step of the stored scale
    plus bf16 rounding (~0.4%) of the value."""
    cache = make_cache(quantized=True, scale_dtype=jnp.bfloat16)
    assert cache.scales.dtype == jnp.bfloat16
    rng = np.random.default_rng(11)
    T = 4
    k = rng.standard_normal((T, KVH, D), dtype=np.float32) * 2.0
    v = rng.standard_normal((T, KVH, D), dtype=np.float32) * 0.05
    slots = np.array([2, 9, 21, 30], dtype=np.int32)

    out = write_kv(cache, 1, jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots))
    assert out.scales.dtype == jnp.bfloat16
    deq = np.asarray(dequantize_pages(out.data, out.scales))
    for t, slot in enumerate(slots):
        b, off = slot // BS, slot % BS
        for which, ref in ((0, k), (1, v)):
            a = np.abs(ref[t]).max()
            np.testing.assert_allclose(
                deq[1, b, which, :, off], ref[t],
                atol=a / 127 + a / 256 + 1e-6)


@pytest.mark.parametrize("quantized", [False, True])
def test_copy_blocks_all_layers(quantized):
    cache = make_cache(2, quantized)
    src = np.array([1, 3, int(PAD_SLOT)], dtype=np.int32)
    dst = np.array([6, 7, int(PAD_SLOT)], dtype=np.int32)
    out = copy_blocks(cache, jnp.asarray(src), jnp.asarray(dst))
    for got, orig in ((out.data, cache.data), (out.scales, cache.scales)):
        if got is None:
            continue
        got, orig = np.asarray(got), np.asarray(orig)
        ref = orig.copy()
        ref[:, 6] = orig[:, 1]
        ref[:, 7] = orig[:, 3]
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("quantized", [False, True])
def test_swap_roundtrip(quantized):
    cache = make_cache(3, quantized)
    ids = np.array([2, 5], dtype=np.int32)
    staged = gather_blocks(cache, jnp.asarray(ids))
    assert staged.data.shape == (L, 2, 2, KVH, BS, D)
    if quantized:
        assert staged.scales.shape == kv_scales_shape(L, KVH, 2, BS)
    wiped_data = np.asarray(cache.data).copy()
    wiped_data[:, ids] = 0
    wiped_scales = None
    if quantized:
        wiped_scales = np.asarray(cache.scales).copy()
        wiped_scales[:, ids] = 0
        wiped_scales = jnp.asarray(wiped_scales)
    restored = scatter_blocks(KVCache(jnp.asarray(wiped_data), wiped_scales),
                              jnp.asarray(ids), staged)
    np.testing.assert_array_equal(np.asarray(restored.data),
                                  np.asarray(cache.data))
    if quantized:
        np.testing.assert_array_equal(np.asarray(restored.scales),
                                      np.asarray(cache.scales))


@pytest.mark.parametrize("quantized", [False, True])
def test_pallas_write_kv_tokens_matches_xla(quantized):
    """The Pallas reshape_and_cache kernel (interpret mode) must match
    the XLA dynamic-update-slice path exactly."""
    from vllm_tpu.ops.pallas.kv_write import pallas_write_kv_tokens
    cache = make_cache(7, quantized)
    rng = np.random.default_rng(9)
    T = 6
    k = rng.standard_normal((T, KVH, D), dtype=np.float32)
    v = rng.standard_normal((T, KVH, D), dtype=np.float32)
    slots = np.array([0, 5, 17, 30, int(PAD_SLOT), 9], dtype=np.int32)

    ref = write_kv(cache, 1, jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots))
    got = pallas_write_kv_tokens(cache, 1, jnp.asarray(k), jnp.asarray(v),
                                 jnp.asarray(slots))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
    if quantized:
        # Scales may differ in the last ULP (different fusion contexts
        # around quantize_kv).
        np.testing.assert_allclose(np.asarray(got.scales),
                                   np.asarray(ref.scales), rtol=1e-6)


# ---------------------------------------------------------------------
# INT4 nibble-packed cache (K low nibble, V high — ops/cache.py KVCache)
# ---------------------------------------------------------------------

def make_cache_int4(seed=0) -> KVCache:
    """Random int4 cache built directly in numpy (codes in [-7, 7])."""
    from vllm_tpu.ops.cache import SCALE_DTYPE
    rng = np.random.default_rng(seed)
    codes = rng.integers(-7, 8, kv_cache_shape(L, KVH, NB, BS, D),
                         dtype=np.int8)  # [L, NB, 2, KVH, BS, D]
    packed = ((codes[:, :, 0] & 0xF) |
              (codes[:, :, 1] << 4)).astype(np.int8)[:, :, None]
    scales_page = pack_scale_pages(
        rng.uniform(0.05, 0.5, (L, NB, 2, KVH, BS)).astype(np.float32))
    return KVCache(jnp.asarray(packed),
                   jnp.asarray(scales_page).astype(SCALE_DTYPE))


def test_pack_unpack_int4_roundtrip():
    from vllm_tpu.ops.cache import pack_kv_int4, unpack_kv_int4
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.integers(-7, 8, (5, KVH, D), dtype=np.int8))
    v = jnp.asarray(rng.integers(-7, 8, (5, KVH, D), dtype=np.int8))
    packed = pack_kv_int4(k, v)
    ku, vu = unpack_kv_int4(packed)
    np.testing.assert_array_equal(np.asarray(ku), np.asarray(k))
    np.testing.assert_array_equal(np.asarray(vu), np.asarray(v))
    # The identity the decode kernel relies on (biased-low packing):
    # the raw byte read as signed int8 is exactly 16*v + (k+8).
    np.testing.assert_array_equal(
        np.asarray(packed, np.int32),
        16 * np.asarray(v, np.int32) + np.asarray(k, np.int32) + 8)


def test_write_kv_int4_quantizes_on_write():
    from vllm_tpu.ops.cache import SCALE_DTYPE
    cache = KVCache(
        jnp.zeros(kv_cache_shape(L, KVH, NB, BS, D, kv_planes=1),
                  jnp.int8),
        jnp.zeros(kv_scales_shape(L, KVH, NB, BS), SCALE_DTYPE))
    rng = np.random.default_rng(4)
    T = 4
    k = rng.standard_normal((T, KVH, D), dtype=np.float32) * 3.0
    v = rng.standard_normal((T, KVH, D), dtype=np.float32) * 0.1
    slots = np.array([0, 5, 17, int(PAD_SLOT)], dtype=np.int32)

    out = write_kv(cache, 0, jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots))
    assert out.data.shape[2] == 1  # packed plane preserved
    deq = np.asarray(dequantize_pages(out.data, out.scales))

    for t, slot in enumerate(slots):
        if slot == int(PAD_SLOT):
            continue
        b, off = slot // BS, slot % BS
        # Per-vector symmetric int4 + bf16 scale: |err| <= amax/7
        # (code step) + amax/7/256 (scale rounding).
        for which, ref in ((0, k[t]), (1, v[t])):
            a = np.abs(ref).max()
            np.testing.assert_allclose(deq[0, b, which, :, off], ref,
                                       atol=a / 7 * 1.01 + a / 256 + 1e-6)


def test_pallas_write_kv_tokens_matches_xla_int4():
    from vllm_tpu.ops.pallas.kv_write import pallas_write_kv_tokens
    cache = make_cache_int4(7)
    rng = np.random.default_rng(9)
    T = 6
    k = rng.standard_normal((T, KVH, D), dtype=np.float32)
    v = rng.standard_normal((T, KVH, D), dtype=np.float32)
    slots = np.array([0, 5, 17, 30, int(PAD_SLOT), 9], dtype=np.int32)

    ref = write_kv(cache, 1, jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots))
    got = pallas_write_kv_tokens(cache, 1, jnp.asarray(k), jnp.asarray(v),
                                 jnp.asarray(slots))
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(ref.data))
    np.testing.assert_allclose(np.asarray(got.scales),
                               np.asarray(ref.scales), rtol=1e-6)


def test_int4_probe_passes_in_interpret_mode(monkeypatch):
    """The startup probe must PASS on the interpret-mode kernels: a
    stale-layout regression in the int4 kv-write/decode kernels then
    fails CI here instead of silently downgrading int4-KV to the XLA
    path on device (which is how round 3's broken migration hid)."""
    from vllm_tpu.ops import cache as cache_mod
    monkeypatch.setenv("VLLM_TPU_FORCE_PALLAS_OPS", "1")
    monkeypatch.setattr(cache_mod, "_INT4_KV_BROKEN", [False])
    assert cache_mod.probe_int4_kv_kernels() is True
    assert cache_mod.int4_kv_pallas_ok()


def test_int4_probe_reraises_python_bugs(monkeypatch):
    """Python-side exceptions (stale asserts, wrapper shape bugs) must
    propagate out of the probe — only Mosaic/XLA backend failures may
    downgrade int4-KV to the XLA fallback."""
    from vllm_tpu.ops import cache as cache_mod
    monkeypatch.setenv("VLLM_TPU_FORCE_PALLAS_OPS", "1")
    monkeypatch.setattr(cache_mod, "_INT4_KV_BROKEN", [False])

    def stale_assert(*args, **kwargs):
        raise AssertionError("stale layout assert")

    monkeypatch.setattr(
        "vllm_tpu.ops.pallas.kv_write.pallas_write_kv_tokens", stale_assert)
    with pytest.raises(AssertionError, match="stale layout"):
        cache_mod.probe_int4_kv_kernels()
    # A genuine backend lowering error still downgrades gracefully.
    import jax

    def mosaic_fail(*args, **kwargs):
        raise jax.errors.JaxRuntimeError("mosaic lowering failed")

    monkeypatch.setattr(
        "vllm_tpu.ops.pallas.kv_write.pallas_write_kv_tokens", mosaic_fail)
    assert cache_mod.probe_int4_kv_kernels() is False
    assert not cache_mod.int4_kv_pallas_ok()


@pytest.mark.parametrize("int4", [False, True])
def test_write_kv_two_plane_scales_kvh_gt_64(int4):
    """kv heads per shard > V_SCALE_LANE keep the SP=2 two-plane scale
    layout. Every supported 7B-65B family fits the packed SP=1 tile,
    so nothing else exercises the SP=2 branches of _combine_quantize /
    dequantize_pages / the write kernel (round-4 advisor): this
    round-trips write (XLA + Pallas-interpret) -> dequantize at
    KVH=96."""
    from vllm_tpu.ops.cache import SCALE_DTYPE, V_SCALE_LANE
    from vllm_tpu.ops.pallas.kv_write import pallas_write_kv_tokens
    KVH2 = 96
    assert KVH2 > V_SCALE_LANE
    shape = kv_cache_shape(L, KVH2, NB, BS, D, kv_planes=1 if int4 else 2)
    sshape = kv_scales_shape(L, KVH2, NB, BS)
    assert sshape[2] == 2  # two-plane layout engaged
    cache = KVCache(jnp.zeros(shape, jnp.int8),
                    jnp.zeros(sshape, SCALE_DTYPE))
    rng = np.random.default_rng(21)
    T = 4
    k = rng.standard_normal((T, KVH2, D), dtype=np.float32) * 2.0
    v = rng.standard_normal((T, KVH2, D), dtype=np.float32) * 0.1
    slots = np.array([0, 5, 17, int(PAD_SLOT)], dtype=np.int32)

    ref = write_kv(cache, 1, jnp.asarray(k), jnp.asarray(v),
                   jnp.asarray(slots))
    got = pallas_write_kv_tokens(cache, 1, jnp.asarray(k), jnp.asarray(v),
                                 jnp.asarray(slots))
    np.testing.assert_array_equal(np.asarray(got.data),
                                  np.asarray(ref.data))
    np.testing.assert_allclose(np.asarray(got.scales),
                               np.asarray(ref.scales), rtol=1e-6)

    deq = np.asarray(dequantize_pages(ref.data, ref.scales))
    qstep = 7 if int4 else 127
    for t, slot in enumerate(slots):
        if slot == int(PAD_SLOT):
            continue
        b, off = slot // BS, slot % BS
        for which, x in ((0, k[t]), (1, v[t])):
            a = np.abs(x).max()
            np.testing.assert_allclose(
                deq[1, b, which, :, off], x,
                atol=a / qstep * 1.01 + a / 256 + 1e-6)


def test_copy_and_swap_int4():
    cache = make_cache_int4(3)
    src = np.array([1, 3], dtype=np.int32)
    dst = np.array([6, 7], dtype=np.int32)
    out = copy_blocks(cache, jnp.asarray(src), jnp.asarray(dst))
    ref = np.asarray(cache.data).copy()
    ref[:, 6] = ref[:, 1]
    ref[:, 7] = ref[:, 3]
    np.testing.assert_array_equal(np.asarray(out.data), ref)

    ids = np.array([2, 5], dtype=np.int32)
    staged = gather_blocks(cache, jnp.asarray(ids))
    assert staged.data.shape == (L, 2, 1, KVH, BS, D)
    wiped = np.asarray(cache.data).copy()
    wiped[:, ids] = 0
    wiped_scales = np.asarray(cache.scales).copy()
    wiped_scales[:, ids] = 0
    restored = scatter_blocks(
        KVCache(jnp.asarray(wiped), jnp.asarray(wiped_scales)),
        jnp.asarray(ids), staged)
    np.testing.assert_array_equal(np.asarray(restored.data),
                                  np.asarray(cache.data))
    np.testing.assert_array_equal(np.asarray(restored.scales),
                                  np.asarray(cache.scales))
