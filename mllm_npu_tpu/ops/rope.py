"""Rotary position embeddings with linear / NTK-dynamic scaling.

Capability parity with the reference's three RoPE variants
(reference: mllm_npu/models/language_models/llama3.py:96-155 —
LlamaRotaryEmbedding, LinearScaling, DynamicNTKScaling), re-expressed
functionally: positions in, (cos, sin) out, applied with the
half-rotation convention. All trig in fp32 (bf16 RoPE loses precision
at long context).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float = 10000.0,
                  ntk_alpha: Optional[float] = None) -> jax.Array:
    if ntk_alpha is not None:
        # NTK-aware: stretch the base so high frequencies are preserved
        theta = theta * ntk_alpha ** (head_dim / max(head_dim - 2, 1))
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponent)


def rope_cos_sin(
    positions: jax.Array,
    head_dim: int,
    *,
    theta: float = 10000.0,
    scaling_type: Optional[str] = None,   # None | "linear" | "dynamic"
    scaling_factor: float = 1.0,
    max_position_embeddings: int = 4096,
) -> tuple[jax.Array, jax.Array]:
    """positions: int [..., S] -> cos/sin [..., S, head_dim]."""
    pos = positions.astype(jnp.float32)
    if scaling_type == "linear":
        pos = pos / scaling_factor
        inv_freq = rope_inv_freq(head_dim, theta)
    elif scaling_type == "dynamic":
        # NTK-dynamic: rescale theta once sequence exceeds the training
        # window. Under jit the sequence length is static, so the branch
        # resolves at trace time when positions has static shape.
        seq_len = positions.shape[-1]
        if seq_len > max_position_embeddings:
            alpha = (scaling_factor * seq_len / max_position_embeddings
                     - (scaling_factor - 1))
            theta = theta * alpha ** (head_dim / max(head_dim - 2, 1))
        inv_freq = rope_inv_freq(head_dim, theta)
    else:
        inv_freq = rope_inv_freq(head_dim, theta)

    freqs = pos[..., None] * inv_freq  # [..., S, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [..., S, D]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array,
               sin: jax.Array) -> tuple[jax.Array, jax.Array]:
    """q/k: [B, S, H, D]; cos/sin: [B, S, D] or [S, D]."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
