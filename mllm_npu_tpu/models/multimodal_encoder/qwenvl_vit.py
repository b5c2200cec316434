"""Qwen-VL ViT (Flax, from scratch), with and without the attention-pool
resampler head.

Capability parity with the reference's vendored Qwen ViT
(mllm_npu/models/multimodal_encoder/qwenvl_vit.py): conv patchify
(no bias), bicubic-interpolated absolute position table (256-entry,
resized to the 32×32=1024-token grid, :286-288), pre-LN transformer
(eps 1e-6, erf-GELU), then for the AttnPool variant: 256-query attention
resampler (:258-265), optional 4-corner patch-position embedding
(:267-271, :297-305), ln_post and a square output projection (:273-275).
SEED-X uses width 1664 / 48 layers (ViT-G, configs/models/
seedx_llama2_13b_qwenvl_vitg.yaml).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from mllm_npu_tpu.models.multimodal_projector.attention_resampler import (
    AttentionResampler)
from mllm_npu_tpu.models.vit_common import ViTEncoder, interpolate_abs_pos


@dataclasses.dataclass(frozen=True)
class QwenViTConfig:
    image_size: int = 448
    patch_size: int = 14
    width: int = 1664
    layers: int = 48
    heads: int = 16
    mlp_ratio: float = 4.9231
    n_queries: int = 256
    output_dim: int = 4096
    patch_pos: bool = False
    ln_eps: float = 1e-6
    remat: bool = True
    # absolute position table entries (256 in the reference,
    # qwenvl_vit.py:238; bicubic-resized to the actual token grid)
    pos_embed_size: int = 256
    # int8/int4 weight-only storage for the encoder's Dense layers
    # (conv/LN/pos stay float). The 1.9B ViT-G tower must be quantized
    # for the SEED-X serving stack to fit one 16GB v5e next to the int4
    # 13B LLM and the bf16 SDXL UNet; encode is one compute-bound
    # forward per request, so the accuracy/speed cost is negligible.
    quantization: Optional[str] = None

    @property
    def mlp_width(self) -> int:
        return int(self.width * self.mlp_ratio)

    @classmethod
    def vit_g(cls, **kw) -> "QwenViTConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "QwenViTConfig":
        kw.setdefault("image_size", 56)
        kw.setdefault("width", 64)
        kw.setdefault("layers", 1)
        kw.setdefault("heads", 4)
        kw.setdefault("mlp_ratio", 1.0)
        kw.setdefault("n_queries", 16)
        kw.setdefault("output_dim", 128)
        kw.setdefault("remat", False)
        kw.setdefault("pos_embed_size", 16)
        return cls(**kw)


class VisionTransformer(nn.Module):
    """Tokens-only variant (no pooling head): [B,H,W,3] → [B, L, width]."""
    config: QwenViTConfig = QwenViTConfig()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        x = nn.Conv(cfg.width, kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(
                        images.astype(self.dtype))
        B, gh, gw, C = x.shape
        x = x.reshape(B, gh * gw, C)

        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=cfg.width ** -0.5),
                         (cfg.pos_embed_size, cfg.width),
                         self.param_dtype)
        x = x + interpolate_abs_pos(pos.astype(self.dtype), x.shape[1])[None]

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ln_pre")(x)
        x = ViTEncoder(width=cfg.width, layers=cfg.layers, heads=cfg.heads,
                       mlp_width=cfg.mlp_width, ln_eps=cfg.ln_eps,
                       gelu_approx=False, remat=cfg.remat,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       quantization=cfg.quantization,
                       name="transformer")(x)
        return x


class VisionTransformerWithAttnPool(nn.Module):
    """Full Qwen-VL encoder head: [B,H,W,3] → [B, n_queries, output_dim]."""
    config: QwenViTConfig = QwenViTConfig()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.config.output_dim

    @nn.compact
    def __call__(self, images, patch_positions: Optional[jnp.ndarray] = None):
        cfg = self.config
        x = VisionTransformer(cfg, self.dtype, self.param_dtype,
                              name="backbone")(images)
        grid = int(cfg.n_queries ** 0.5)
        x = AttentionResampler(
            grid_size=grid, embed_dim=cfg.output_dim,
            num_heads=max(cfg.output_dim // 128, 1), kv_dim=cfg.width,
            ln_eps=cfg.ln_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn_pool")(x)

        if cfg.patch_pos:
            ppe = self.param("patch_pos_embed",
                             nn.initializers.normal(
                                 stddev=cfg.output_dim ** -0.5),
                             (4, cfg.output_dim), self.param_dtype)
            if patch_positions is not None:
                rel = jnp.concatenate(
                    [patch_positions, 1 - patch_positions], axis=-1) / 2
                x = x + (rel.astype(self.dtype) @ ppe.astype(self.dtype))[:, None, :]

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="ln_post")(x)
        proj = self.param("proj",
                          nn.initializers.normal(stddev=cfg.output_dim ** -0.5),
                          (cfg.output_dim, cfg.output_dim), self.param_dtype)
        return x @ proj.astype(x.dtype)
