import jax
import jax.numpy as jnp
import numpy as np

from vllm_tpu.ops.sampling import (PAD_TOKEN, SamplerOutput, SamplingTensors,
                                   sample)

V = 32


def make_tensors(B, temperature=1.0, top_p=1.0, top_k=None, presence=0.0,
                 frequency=0.0, tokens=None):
    if tokens is None:
        tokens = np.full((B, 4), int(PAD_TOKEN), dtype=np.int32)
    return SamplingTensors(
        temperature=jnp.full((B,), temperature, jnp.float32),
        top_p=jnp.full((B,), top_p, jnp.float32),
        top_k=jnp.full((B,), V if top_k is None else top_k, jnp.int32),
        presence_penalty=jnp.full((B,), presence, jnp.float32),
        frequency_penalty=jnp.full((B,), frequency, jnp.float32),
        output_tokens=jnp.asarray(tokens),
    )


def rand_logits(B, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, V), dtype=np.float32) * 3)


def test_greedy_is_argmax():
    logits = rand_logits(4)
    out = sample(logits, make_tensors(4, temperature=0.0),
                 jax.random.PRNGKey(0), num_samples=1, num_topk=1)
    np.testing.assert_array_equal(np.asarray(out.samples[0]),
                                  np.argmax(np.asarray(logits), -1))
    # The greedy token is also the top-1.
    np.testing.assert_array_equal(np.asarray(out.topk_ids[:, 0]),
                                  np.asarray(out.samples[0]))


def test_top_k_one_equals_argmax():
    logits = rand_logits(4, seed=1)
    out = sample(logits, make_tensors(4, temperature=0.9, top_k=1),
                 jax.random.PRNGKey(1), num_samples=1, num_topk=1)
    np.testing.assert_array_equal(np.asarray(out.samples[0]),
                                  np.argmax(np.asarray(logits), -1))


def test_top_k_restricts_support():
    logits = rand_logits(2, seed=2)
    keys = [jax.random.PRNGKey(i) for i in range(20)]
    top4 = set()
    for row in np.asarray(logits):
        top4 |= set(np.argsort(row)[-4:].tolist())
    for key in keys:
        out = sample(logits, make_tensors(2, temperature=2.0, top_k=4), key,
                     num_samples=2, num_topk=1)
        for tok in np.asarray(out.samples).ravel():
            assert int(tok) in top4


def test_top_p_keeps_nucleus_only():
    # One dominant token (p > 0.9): top_p=0.5 must always pick it.
    logits = np.zeros((1, V), np.float32)
    logits[0, 7] = 10.0
    for i in range(10):
        out = sample(jnp.asarray(logits), make_tensors(1, top_p=0.5),
                     jax.random.PRNGKey(i), num_samples=1, num_topk=1)
        assert int(out.samples[0, 0]) == 7


def test_penalties_suppress_repeats():
    logits = np.zeros((1, V), np.float32)
    logits[0, 3] = 1.0  # would win greedily
    tokens = np.full((1, 4), int(PAD_TOKEN), np.int32)
    tokens[0, :3] = 3  # token 3 appeared 3 times
    out = sample(jnp.asarray(logits),
                 make_tensors(1, temperature=0.0, frequency=1.0,
                              presence=0.5, tokens=tokens),
                 jax.random.PRNGKey(0), num_samples=1, num_topk=1)
    # 1.0 - 3*1.0 - 0.5 < 0 -> some other (zero-logit) token wins.
    assert int(out.samples[0, 0]) != 3


def test_logprobs_consistent():
    logits = rand_logits(3, seed=3)
    out = sample(logits, make_tensors(3, temperature=0.0),
                 jax.random.PRNGKey(0), num_samples=1, num_topk=5)
    ref = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    # topk_logprobs match the full log-softmax at topk_ids.
    for b in range(3):
        for j in range(5):
            assert abs(ref[b, int(out.topk_ids[b, j])]
                       - float(out.topk_logprobs[b, j])) < 1e-5
    # sample_logprobs match too.
    for b in range(3):
        assert abs(ref[b, int(out.samples[0, b])]
                   - float(out.sample_logprobs[0, b])) < 1e-5
    # topk is sorted descending.
    tk = np.asarray(out.topk_logprobs)
    assert (np.diff(tk, axis=-1) <= 1e-6).all()


def test_logit_bias_shifts_argmax():
    logits = np.zeros((2, V), np.float32)
    logits[:, 3] = 5.0  # would win greedily
    t = make_tensors(2, temperature=0.0)
    # Row 0: +100 on token 11 overrides; row 1: no bias (PAD ids).
    bias_ids = np.full((2, 2), int(PAD_TOKEN), np.int32)
    bias_vals = np.zeros((2, 2), np.float32)
    bias_ids[0, 0] = 11
    bias_vals[0, 0] = 100.0
    t = t._replace(bias_ids=jnp.asarray(bias_ids),
                   bias_vals=jnp.asarray(bias_vals))
    out = sample(jnp.asarray(logits), t, jax.random.PRNGKey(0),
                 num_samples=1, num_topk=1, use_bias=True)
    assert int(out.samples[0, 0]) == 11
    assert int(out.samples[0, 1]) == 3
    # -100 bans a token (OpenAI semantics).
    bias_ids[0, 0] = 3
    bias_vals[0, 0] = -100.0
    t = t._replace(bias_ids=jnp.asarray(bias_ids),
                   bias_vals=jnp.asarray(bias_vals))
    out = sample(jnp.asarray(logits), t, jax.random.PRNGKey(0),
                 num_samples=1, num_topk=1, use_bias=True)
    assert int(out.samples[0, 0]) != 3


def test_multi_sample_shape_and_variance():
    logits = jnp.zeros((1, V), jnp.float32)  # uniform
    out = sample(logits, make_tensors(1, temperature=1.0),
                 jax.random.PRNGKey(42), num_samples=8, num_topk=1)
    assert out.samples.shape == (8, 1)
    assert len(set(np.asarray(out.samples).ravel().tolist())) > 1
