"""Deep perceiver resamplers: LLM features → UNet conditioning (Flax).

Capability parity with the reference resamplers (reference
mllm_npu/models/generation/resampler.py): PerceiverAttention (:26 — kv
over concat(x, latents), double-sqrt scaling), FeedForward (:8), deep
Resampler (:114), SDXL variants emitting dual-width prompt embeds
(768+1280) plus an attention-pooled ``pooled_prompt_embeds``
(ResamplerXL :163, ResamplerXLV2 :219 w/ input L2-normalize,
ResamplerXLIdentity :280), AttentionPool2d (:73 — CLIP-style pool with
mean token prepended).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class PerceiverAttention(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        inner = self.dim_head * self.heads
        ln = lambda name: nn.LayerNorm(dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=name)
        dense = lambda f, name: nn.Dense(f, use_bias=False,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=name)
        x = ln("norm1")(x)
        latents = ln("norm2")(latents)
        B, L, _ = latents.shape

        q = dense(inner, "to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = dense(inner * 2, "to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            B, N, _ = t.shape
            return t.reshape(B, N, self.heads, self.dim_head
                             ).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        scale = self.dim_head ** -0.25   # reference double-sqrt scaling
        w = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, inner)
        return dense(self.dim, "to_out")(out)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm")(x)
        x = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class AttentionPool2d(nn.Module):
    seq_len: int
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_all_tokens: bool = False):
        E = self.embed_dim
        out_dim = self.output_dim or E
        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=E ** -0.5),
                         (self.seq_len + 1, E), self.param_dtype)
        B = x.shape[0]
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        x = x + pos[None].astype(x.dtype)

        dense = lambda f, name: nn.Dense(f, use_bias=True, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=name)
        H = self.num_heads
        D = E // H
        q = dense(E, "q_proj")(x).reshape(B, -1, H, D)
        k = dense(E, "k_proj")(x).reshape(B, -1, H, D)
        v = dense(E, "v_proj")(x).reshape(B, -1, H, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                           ).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, -1, E)
        out = dense(out_dim, "c_proj")(out)
        if return_all_tokens:
            return out
        return out[:, 0]


class _PerceiverCore(nn.Module):
    dim: int
    depth: int
    dim_head: int
    heads: int
    num_queries: int
    ff_mult: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        latents = self.param("latents",
                             nn.initializers.normal(stddev=self.dim ** -0.5),
                             (1, self.num_queries, self.dim),
                             self.param_dtype)
        latents = jnp.broadcast_to(latents.astype(x.dtype),
                                   (x.shape[0],) + latents.shape[1:])
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.dim, self.dim_head, self.heads, self.dtype,
                self.param_dtype, name=f"attn_{i}")(x, latents)
            latents = latents + FeedForward(
                self.dim, self.ff_mult, self.dtype, self.param_dtype,
                name=f"ff_{i}")(latents)
        return latents


class Resampler(nn.Module):
    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 8
    embedding_dim: int = 768
    output_dim: int = 1024
    ff_mult: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=name)
        x = dense(self.dim, "proj_in")(x)
        latents = _PerceiverCore(self.dim, self.depth, self.dim_head,
                                 self.heads, self.num_queries, self.ff_mult,
                                 self.dtype, self.param_dtype,
                                 name="core")(x)
        latents = dense(self.output_dim, "proj_out")(latents)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="norm_out")(latents)


class ResamplerXL(nn.Module):
    """→ (prompt_embeds [B, nq, out1+out2], pooled [B, out2])."""
    dim: int = 1024
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    num_queries: int = 8
    embedding_dim: int = 768
    output1_dim: int = 768
    output2_dim: int = 1280
    ff_mult: int = 4
    normalize: bool = False       # True = ResamplerXLV2 semantics
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pooled_text_embeds=None):
        if self.normalize:
            x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=name)
        x = dense(self.dim, "proj_in")(x)
        latents = _PerceiverCore(self.dim, self.depth, self.dim_head,
                                 self.heads, self.num_queries, self.ff_mult,
                                 self.dtype, self.param_dtype,
                                 name="core")(x)
        hidden = nn.LayerNorm(dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="norm_out")(latents)
        e1 = dense(self.output1_dim, "unet_proj_1")(hidden)
        e2 = dense(self.output2_dim, "unet_proj_2")(hidden)
        prompt_embeds = jnp.concatenate([e1, e2], axis=-1)
        pooled = AttentionPool2d(self.num_queries, self.dim, self.heads,
                                 self.output2_dim, self.dtype,
                                 self.param_dtype, name="unet_attnpool")(
                                     hidden)
        return prompt_embeds, pooled


def ResamplerXLV2(**kw):
    kw.setdefault("normalize", True)
    return ResamplerXL(**kw)


class ResamplerXLIdentity(nn.Module):
    @nn.compact
    def __call__(self, x, pooled_text_embeds=None):
        return x, pooled_text_embeds
