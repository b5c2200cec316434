"""SigLIP vision tower (Flax, from scratch).

Replaces the reference's thin wrapper over HF ``SiglipVisionModel``
(reference: mllm_npu/models/multimodal_encoder/siglip_vit.py:8-49).
so400m-patch14-384 geometry: 384px/patch14 → 27×27=729 tokens, width
1152, 27 layers, heads 16, MLP 4304, gelu-tanh, learned position
embeddings, final post-LN; the MLLM consumes ``last_hidden_state``
[B, 729, 1152].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from mllm_npu_tpu.models.vit_common import ViTEncoder, interpolate_abs_pos


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-6
    remat: bool = True
    # int8/int4 weight-only Dense storage (see QwenViTConfig.quantization)
    quantization: "str | None" = None

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def so400m_384(cls, **kw) -> "SigLIPConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "SigLIPConfig":
        kw.setdefault("image_size", 56)
        kw.setdefault("hidden_size", 64)
        kw.setdefault("intermediate_size", 128)
        kw.setdefault("num_hidden_layers", 2)
        kw.setdefault("num_attention_heads", 4)
        kw.setdefault("remat", False)
        return cls(**kw)


class SigLIPVisionEncoder(nn.Module):
    """Images [B, H, W, 3] (NHWC, normalized) → tokens [B, L, width]."""
    config: SigLIPConfig = SigLIPConfig()
    hidden_dim: int = 1152      # kept for config parity with the reference
    output_dim: int = 4096
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        cfg = self.config
        x = nn.Conv(cfg.hidden_size,
                    kernel_size=(cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    padding="VALID", use_bias=True, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="patch_embedding")(
                        images.astype(self.dtype))
        B, gh, gw, C = x.shape
        x = x.reshape(B, gh * gw, C)

        pos = self.param("position_embedding",
                         nn.initializers.normal(stddev=0.02),
                         (cfg.num_patches, cfg.hidden_size), self.param_dtype)
        x = x + interpolate_abs_pos(pos.astype(self.dtype), x.shape[1])[None]

        x = ViTEncoder(width=cfg.hidden_size,
                       layers=cfg.num_hidden_layers,
                       heads=cfg.num_attention_heads,
                       mlp_width=cfg.intermediate_size,
                       ln_eps=cfg.layer_norm_eps,
                       gelu_approx=True,
                       remat=cfg.remat,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       quantization=cfg.quantization,
                       name="encoder")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name="post_layernorm")(x)
        return x
