"""KV-cache op tests: replay every mapping in numpy and compare
(the reference's own pattern, /root/reference/tests/kernels/test_cache.py)."""

import jax.numpy as jnp
import numpy as np

from vllm_tpu.ops.cache import (PAD_SLOT, copy_blocks, gather_blocks,
                                kv_cache_shape, scatter_blocks, write_kv)

L, KVH, NB, BS, D = 2, 3, 8, 4, 16


def make_cache(seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(kv_cache_shape(L, KVH, NB, BS, D),
                               dtype=np.float32)


def test_write_kv_scatters_and_drops_padding():
    cache = make_cache()
    rng = np.random.default_rng(1)
    T = 5
    k = rng.standard_normal((T, KVH, D), dtype=np.float32)
    v = rng.standard_normal((T, KVH, D), dtype=np.float32)
    slots = np.array([0, 5, 17, 30, int(PAD_SLOT)], dtype=np.int32)

    out = np.asarray(write_kv(jnp.asarray(cache), 1, jnp.asarray(k),
                              jnp.asarray(v), jnp.asarray(slots)))

    ref = cache.copy()
    for t, slot in enumerate(slots):
        if slot == int(PAD_SLOT):
            continue
        b, off = slot // BS, slot % BS
        ref[1, 0, b, :, off, :] = k[t]
        ref[1, 1, b, :, off, :] = v[t]
    np.testing.assert_array_equal(out, ref)
    # Layer 0 untouched.
    np.testing.assert_array_equal(out[0], cache[0])


def test_copy_blocks_all_layers():
    cache = make_cache(2)
    src = np.array([1, 3, int(PAD_SLOT)], dtype=np.int32)
    dst = np.array([6, 7, int(PAD_SLOT)], dtype=np.int32)
    out = np.asarray(
        copy_blocks(jnp.asarray(cache), jnp.asarray(src), jnp.asarray(dst)))
    ref = cache.copy()
    ref[:, :, 6] = cache[:, :, 1]
    ref[:, :, 7] = cache[:, :, 3]
    np.testing.assert_array_equal(out, ref)


def test_swap_roundtrip():
    cache = make_cache(3)
    ids = np.array([2, 5], dtype=np.int32)
    staged = gather_blocks(jnp.asarray(cache), jnp.asarray(ids))
    assert staged.shape == (L, 2, 2, KVH, BS, D)
    wiped = cache.copy()
    wiped[:, :, ids] = 0.0
    restored = np.asarray(
        scatter_blocks(jnp.asarray(wiped), jnp.asarray(ids), staged))
    np.testing.assert_array_equal(restored, cache)
