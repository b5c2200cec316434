"""Adaptive-pool + linear projector (reference:
mllm_npu/models/multimodal_projector/pooling_projection.py:5-22)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mllm_npu_tpu.models.vit_common import adaptive_avg_pool_tokens


class SimplePooling(nn.Module):
    grid_size: int
    input_dim: int
    output_dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def num_queries(self) -> int:
        return self.grid_size ** 2

    @property
    def embed_dim(self) -> int:
        return self.output_dim

    @nn.compact
    def __call__(self, x):
        x = adaptive_avg_pool_tokens(x, self.grid_size)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="projector")(x)
