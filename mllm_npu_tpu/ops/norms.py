"""Normalization ops (functional).

RMSNorm matches Llama semantics: fp32 variance, cast back to input
dtype, weight applied after the cast (reference behavior:
mllm_npu/models/language_models/llama3.py:75-93 LlamaRMSNorm).
XLA fuses these elementwise chains into surrounding ops; a Pallas
version is only warranted when fused into attention/matmul epilogues.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight * xf.astype(dtype)).astype(dtype)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf.astype(dtype) * weight + bias).astype(dtype)
