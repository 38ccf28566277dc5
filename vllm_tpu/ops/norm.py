"""Normalization ops.

Capability parity: /root/reference/csrc/layernorm_kernels.cu:10-34
(rms_norm with fp32 variance accumulation). On TPU a hand-written
kernel buys nothing: XLA fuses the normalization into the adjacent
matmul's epilogue, so these are plain jnp with fp32 math.
"""

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray,
             eps: float = 1e-6) -> jnp.ndarray:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    variance = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(variance + eps)
    return (x32 * weight.astype(jnp.float32)).astype(orig_dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * (1.0 / jnp.sqrt(var + eps))
    out = out * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
