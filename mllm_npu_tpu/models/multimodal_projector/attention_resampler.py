"""Perceiver-style attention resampler projector (Flax).

Capability parity with the reference projector
(mllm_npu/models/multimodal_projector/attention_resampler.py:85-151):
grid² learnable queries, frozen 2D sin-cos position table (added to the
queries and — bicubic-resized — to the keys), optional kv input
projection, LN on q and kv, one torch-style multi-head cross-attention.
Maps encoder tokens [B, L, kv_dim] → [B, grid², embed_dim].
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mllm_npu_tpu.models.vit_common import (TorchMHA, get_2d_sincos_pos_embed,
                                            interpolate_abs_pos)


class AttentionResampler(nn.Module):
    grid_size: int
    embed_dim: int
    num_heads: int
    kv_dim: Optional[int] = None
    ln_eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def num_queries(self) -> int:
        return self.grid_size ** 2

    @nn.compact
    def __call__(self, x):
        E = self.embed_dim
        pos = jnp.asarray(get_2d_sincos_pos_embed(E, self.grid_size),
                          self.dtype)  # [nq, E] frozen

        query = self.param(
            "query", nn.initializers.truncated_normal(stddev=0.02),
            (self.num_queries, E), self.param_dtype)

        if self.kv_dim is not None and self.kv_dim != E:
            x = nn.Dense(E, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="kv_proj")(x)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ln_kv")(x)

        q = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ln_q")(
                             query.astype(self.dtype))

        B, L, _ = x.shape
        kv_pos = interpolate_abs_pos(pos, L)           # [L, E]
        qb = jnp.broadcast_to((q + pos)[None], (B, self.num_queries, E))
        out = TorchMHA(E, self.num_heads, self.dtype, self.param_dtype,
                       name="attn")(qb, x + kv_pos[None], x)
        return out
