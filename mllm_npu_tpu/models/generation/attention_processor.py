"""IP-Adapter-style decoupled cross-attention (Flax).

Capability parity with the reference's vendored processors (reference
mllm_npu/models/generation/attention_processor.py — AttnProcessor:6,
IPAttnProcessor:75 and their SDPA 2_0 variants :173/:257): attention
over text tokens and image tokens runs as two cross-attentions sharing
the query, mixed with a scale:

    out = attn(q, text_kv) + scale * attn(q, image_kv)

In diffusers these are processor objects swapped into each attention
layer; functionally they ARE the attention module, so here the
decoupled variant is a module (:class:`IPCrossAttention`) that UNets
can use in place of plain CrossAttention, and a helper to split a
combined [text; image] context.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _attend(q, k, v, heads, dim_head):
    B, Lq = q.shape[:2]
    q = q.reshape(B, Lq, heads, dim_head)
    k = k.reshape(B, -1, heads, dim_head)
    v = v.reshape(B, -1, heads, dim_head)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dim_head ** -0.5)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(
        B, Lq, heads * dim_head)


class IPCrossAttention(nn.Module):
    """Decoupled text/image cross-attention with mixing scale."""
    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    ip_scale: float = 1.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, text_context, image_context=None):
        inner = self.heads * self.dim_head
        dense = lambda f, name, bias=False: nn.Dense(
            f, use_bias=bias, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        q = dense(inner, "to_q")(x)
        k = dense(inner, "to_k")(text_context)
        v = dense(inner, "to_v")(text_context)
        out = _attend(q, k, v, self.heads, self.dim_head)
        if image_context is not None:
            k_ip = dense(inner, "to_k_ip")(image_context)
            v_ip = dense(inner, "to_v_ip")(image_context)
            out = out + self.ip_scale * _attend(q, k_ip, v_ip, self.heads,
                                                self.dim_head)
        return dense(self.query_dim, "to_out", bias=True)(out)


def split_ip_context(context: jax.Array, num_image_tokens: int
                     ) -> tuple[jax.Array, jax.Array]:
    """Split a combined [text; image] context along the token axis
    (the reference processors receive them concatenated,
    attention_processor.py:102-110)."""
    text = context[:, :-num_image_tokens]
    image = context[:, -num_image_tokens:]
    return text, image
