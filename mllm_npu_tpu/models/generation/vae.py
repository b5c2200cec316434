"""AutoencoderKL (Flax, from scratch) — the SD/SDXL latent VAE.

Capability replacement for diffusers' torch ``AutoencoderKL`` that the
reference loads for its pipelines (reference adapter_modules.py:323
init_pipe(vae=...), txt2img demo :57-61). Encoder is needed for the
image-editing path (image→latents, reference pipeline
prepare_image_latents, pipeline_stable_diffusion_xl_t2i_edit.py:474);
decoder for generation. NHWC layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.13025   # SDXL; SD2.1 uses 0.18215

    @property
    def spatial_scale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def sdxl(cls, **kw) -> "VAEConfig":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "VAEConfig":
        kw.setdefault("block_out_channels", (16, 32))
        kw.setdefault("layers_per_block", 1)
        kw.setdefault("norm_num_groups", 8)
        return cls(**kw)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gn = lambda name: nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=name)
        conv = lambda name: nn.Conv(self.out_channels, (3, 3),
                                    padding=((1, 1), (1, 1)),
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        h = conv("conv1")(nn.silu(gn("norm1")(x)))
        h = conv("conv2")(nn.silu(gn("norm2")(h)))
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        dense = lambda name: nn.Dense(C, dtype=self.dtype,
                                      param_dtype=self.param_dtype,
                                      name=name)
        q, k, v = dense("to_q")(h), dense("to_k")(h), dense("to_v")(h)
        w = jax.nn.softmax(
            (q @ k.transpose(0, 2, 1) * (C ** -0.5)).astype(jnp.float32),
            axis=-1).astype(q.dtype)
        h = (w @ v)
        h = dense("to_out")(h).reshape(B, H, W, C)
        return x + h


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(x)
        for bi, ch in enumerate(cfg.block_out_channels):
            for li in range(cfg.layers_per_block):
                h = VAEResnet(ch, g, self.dtype, self.param_dtype,
                              name=f"down_{bi}_res_{li}")(h)
            if bi < len(cfg.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"down_{bi}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnet(ch, g, self.dtype, self.param_dtype,
                      name="mid_res_0")(h)
        h = VAEAttention(ch, g, self.dtype, self.param_dtype,
                         name="mid_attn")(h)
        h = VAEResnet(ch, g, self.dtype, self.param_dtype,
                      name="mid_res_1")(h)
        h = nn.silu(nn.GroupNorm(num_groups=g, epsilon=1e-6,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="conv_norm_out")(h))
        return nn.Conv(2 * cfg.latent_channels, (3, 3),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(z)
        h = VAEResnet(ch, g, self.dtype, self.param_dtype,
                      name="mid_res_0")(h)
        h = VAEAttention(ch, g, self.dtype, self.param_dtype,
                         name="mid_attn")(h)
        h = VAEResnet(ch, g, self.dtype, self.param_dtype,
                      name="mid_res_1")(h)
        for bi, ch in enumerate(reversed(cfg.block_out_channels)):
            for li in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, g, self.dtype, self.param_dtype,
                              name=f"up_{bi}_res_{li}")(h)
            if bi < len(cfg.block_out_channels) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C),
                                     method="nearest")
                h = nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"up_{bi}_upsample")(h)
        h = nn.silu(nn.GroupNorm(num_groups=g, epsilon=1e-6,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="conv_norm_out")(h))
        return nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype, self.param_dtype)
        self.decoder = Decoder(self.config, self.dtype, self.param_dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))   # [B,h,w,2*latent]

    def encode(self, x, rng=None):
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z)
