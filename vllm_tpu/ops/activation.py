"""Activation ops.

Capability parity: /root/reference/csrc/activation_kernels.cu:12-23
(fused silu_and_mul for SwiGLU) and
/root/reference/vllm/model_executor/layers/activation.py:7-12 (the
gelu/gelu_new/gelu_fast/relu registry). XLA fuses silu(a)*b into one
elementwise pass, so no custom kernel is needed.
"""

import jax
import jax.numpy as jnp


def silu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU gate: x = [..., 2F] (gate ++ up) -> silu(gate) * up."""
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * up


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def gelu_fast(x: jnp.ndarray) -> jnp.ndarray:
    # tanh-approximation variant used by some GPT-2 style checkpoints;
    # numerically equivalent to gelu_new at inference precision.
    return jax.nn.gelu(x, approximate=True)


_ACT_FNS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": gelu_new,
    "gelu_fast": gelu_fast,
    "gelu_pytorch_tanh": gelu_new,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def get_act_fn(name: str):
    if name not in _ACT_FNS:
        raise ValueError(f"Unsupported activation: {name!r}")
    return _ACT_FNS[name]
