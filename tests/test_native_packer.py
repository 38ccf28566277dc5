"""Native plan packer (csrc/host/plan_packer.cpp) vs the Python
fallback — the kernel-vs-reference pattern applied to the host side."""

import numpy as np
import pytest

plan_packer = pytest.importorskip("vllm_tpu._plan_packer")

PAD_SLOT = np.iinfo(np.int32).max
BS = 4


def test_fill_decode_matches_python():
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(5):
        L = int(rng.integers(1, 30))
        nt = -(-L // BS) + int(rng.integers(0, 3))
        table = rng.integers(0, 64, (nt,)).tolist()
        rows.append((int(rng.integers(0, 1000)), L, table))

    B, MB = 8, 12
    got = [np.zeros((B,), np.int32), np.zeros((B,), np.int32),
           np.full((B,), PAD_SLOT, np.int32), np.zeros((B, MB), np.int32),
           np.zeros((B,), np.int32)]
    plan_packer.fill_decode(rows, *got, BS, int(PAD_SLOT))

    ref = [np.zeros((B,), np.int32), np.zeros((B,), np.int32),
           np.full((B,), PAD_SLOT, np.int32), np.zeros((B, MB), np.int32),
           np.zeros((B,), np.int32)]
    for i, (token, L, table) in enumerate(rows):
        pos = L - 1
        ref[0][i] = token
        ref[1][i] = pos
        ref[2][i] = table[pos // BS] * BS + pos % BS
        ref[3][i, :len(table)] = table
        ref[4][i] = L
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)


def test_fill_prefill_matches_python():
    rng = np.random.default_rng(1)
    seqs = []
    for _ in range(3):
        L = int(rng.integers(1, 20))
        table = rng.integers(0, 64, (-(-L // BS),)).tolist()
        seqs.append((rng.integers(0, 999, (L,)).tolist(), table))

    T, S = 64, 4
    got = [np.zeros((T,), np.int32), np.zeros((T,), np.int32),
           np.full((T,), -1, np.int32), np.full((T,), PAD_SLOT, np.int32),
           np.zeros((S,), np.int32)]
    count = plan_packer.fill_prefill(seqs, *got, BS, int(PAD_SLOT))
    assert count == sum(len(ids) for ids, _ in seqs)

    ref = [np.zeros((T,), np.int32), np.zeros((T,), np.int32),
           np.full((T,), -1, np.int32), np.full((T,), PAD_SLOT, np.int32),
           np.zeros((S,), np.int32)]
    cursor = 0
    for i, (ids, table) in enumerate(seqs):
        for pos, token in enumerate(ids):
            ref[0][cursor] = token
            ref[1][cursor] = pos
            ref[2][cursor] = i
            ref[3][cursor] = table[pos // BS] * BS + pos % BS
            cursor += 1
        ref[4][i] = cursor - 1
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(g, r)


def test_fill_decode_rejects_overflow():
    with pytest.raises(ValueError):
        plan_packer.fill_decode(
            [(1, 1, [0])] * 3, np.zeros((2,), np.int32),
            np.zeros((2,), np.int32), np.zeros((2,), np.int32),
            np.zeros((2, 4), np.int32), np.zeros((2,), np.int32), BS,
            int(PAD_SLOT))
