"""LLaVA-style MLP projector over 4x-concatenated features (reference:
mllm_npu/models/multimodal_projector/multilayer_perceptron.py:5-21)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    image_embed_dim: int
    llm_embed_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def embed_dim(self) -> int:
        return self.llm_embed_dim

    @nn.compact
    def __call__(self, x):
        # x: [B, L, image_embed_dim * 4]
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                         name="ln")(x)
        x = nn.Dense(self.llm_embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.llm_embed_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(x)
        return x
