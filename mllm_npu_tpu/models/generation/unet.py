"""SDXL-class conditional UNet (Flax, from scratch).

The de-tokenizer's denoiser: capability replacement for the torch
diffusers ``UNet2DConditionModel`` the reference drives through its
SDXL adapters/pipelines (reference mllm_npu/models/generation/
adapter_modules.py + pipeline_stable_diffusion_xl_t2i_edit.py). Key
SDXL-specific behaviors reproduced:

- added conditioning: pooled text embeds (1280) + 6 micro-conditioning
  time_ids, fourier-embedded and merged into the time embedding
  (the reference computes time_ids in compute_time_ids,
  adapter_modules.py:262)
- cross-attention over ``encoder_hidden_states`` of width 2048 — here
  the resampler's projected image tokens instead of text-encoder states
- 8-channel ``conv_in`` variant for InstructPix2Pix-style editing
  (reference SDXLAdapterWithLatentImage, adapter_modules.py:750)

Layout is NHWC (TPU conv native); weight conversion from diffusers
checkpoints transposes accordingly (utils/weights.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 128
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280)
    down_block_types: tuple = ("DownBlock2D", "CrossAttnDownBlock2D",
                               "CrossAttnDownBlock2D")
    layers_per_block: int = 2
    transformer_layers_per_block: tuple = (1, 2, 10)
    num_attention_heads: tuple = (5, 10, 20)
    cross_attention_dim: int = 2048
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    norm_num_groups: int = 32
    remat: bool = True
    # attention dispatch: "auto" routes the big self-attention levels
    # through the padded Pallas flash kernel on TPU (benchmarks/sdxl.py
    # measures the win); "eager" forces the jnp path (A/B baseline)
    attention_impl: str = "auto"
    # LoRA on cross-attention projections (reference
    # SDXLText2ImageAndEditAdapter puts rank-16 LoRA on to_q/to_out,
    # adapter_modules.py:427-470)
    lora_rank: int = 0
    lora_targets: tuple = ("to_q", "to_out")
    # IP-Adapter decoupled image cross-attention: when > 0, the last
    # `ip_num_image_tokens` tokens of encoder_hidden_states are image
    # tokens attended through separate to_k_ip/to_v_ip projections and
    # mixed with a runtime scale (reference IPAttnProcessor,
    # attention_processor.py:75-170, installed by IPAdapterSD.set_ip_adapter,
    # adapter_modules.py:37-62)
    ip_num_image_tokens: int = 0
    ip_scale: float = 1.0
    # int8 weight-only storage for the transformer-block projections
    # (attention qkv/out, GEGLU, proj_in/out) via ops.quant.QuantDense.
    # Measured on v5e (benchmarks/sdxl.py --quant int8): the CFG step
    # is COMPUTE-bound (~5% of step time is weight traffic), so this
    # trades quality for HBM residency, not speed — see BASELINE.md.
    quantization: Optional[str] = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @classmethod
    def sdxl_base(cls, in_channels: int = 4, **kw) -> "UNetConfig":
        return cls(in_channels=in_channels, **kw)

    @classmethod
    def sd21(cls, **kw) -> "UNetConfig":
        kw.setdefault("block_out_channels", (320, 640, 1280, 1280))
        kw.setdefault("down_block_types",
                      ("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                       "CrossAttnDownBlock2D", "DownBlock2D"))
        kw.setdefault("transformer_layers_per_block", (1, 1, 1, 1))
        kw.setdefault("num_attention_heads", (5, 10, 20, 20))
        kw.setdefault("cross_attention_dim", 1024)
        kw.setdefault("projection_class_embeddings_input_dim", 0)
        kw.setdefault("sample_size", 96)
        return cls(**kw)

    @classmethod
    def sd15(cls, **kw) -> "UNetConfig":
        """SD-1.5 shape (reference IPAdapterSD drives a diffusers SD1.5
        UNet, adapter_modules.py:29-137)."""
        kw.setdefault("block_out_channels", (320, 640, 1280, 1280))
        kw.setdefault("down_block_types",
                      ("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                       "CrossAttnDownBlock2D", "DownBlock2D"))
        kw.setdefault("transformer_layers_per_block", (1, 1, 1, 1))
        kw.setdefault("num_attention_heads", (8, 8, 8, 8))
        kw.setdefault("cross_attention_dim", 768)
        kw.setdefault("projection_class_embeddings_input_dim", 0)
        kw.setdefault("sample_size", 64)
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "UNetConfig":
        kw.setdefault("sample_size", 8)
        kw.setdefault("block_out_channels", (32, 64))
        kw.setdefault("down_block_types",
                      ("DownBlock2D", "CrossAttnDownBlock2D"))
        kw.setdefault("layers_per_block", 1)
        kw.setdefault("transformer_layers_per_block", (1, 1))
        kw.setdefault("num_attention_heads", (2, 4))
        kw.setdefault("cross_attention_dim", 64)
        kw.setdefault("addition_time_embed_dim", 8)
        kw.setdefault("projection_class_embeddings_input_dim", 8 * 6 + 32)
        kw.setdefault("norm_num_groups", 8)
        kw.setdefault("remat", False)
        return cls(**kw)


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jax.Array:
    """Sinusoidal embeddings (diffusers Timesteps semantics)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32)
                    / (half - downscale_freq_shift))
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    return emb


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="linear_2")(x)


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        gn = lambda name: nn.GroupNorm(num_groups=self.groups,
                                       epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=name)
        conv = lambda name: nn.Conv(self.out_channels, (3, 3),
                                    padding=((1, 1), (1, 1)),
                                    dtype=self.dtype,
                                    param_dtype=self.param_dtype, name=name)
        h = nn.silu(gn("norm1")(x))
        h = conv("conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.silu(gn("norm2")(h))
        h = conv("conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    lora_rank: int = 0
    lora_targets: tuple = ("to_q", "to_out")
    # IP-Adapter decoupled path: last ip_tokens of `context` are image
    # tokens, attended via to_k_ip/to_v_ip and added with `ip_scale`
    ip_tokens: int = 0
    attention_impl: str = "auto"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quantization: Optional[str] = None

    @nn.compact
    def __call__(self, x, context=None, ip_scale=None):
        is_self = context is None
        context = x if is_self else context
        inner = self.heads * self.dim_head

        def dense(f, name, bias=False):
            if self.lora_rank > 0 and name in self.lora_targets:
                from mllm_npu_tpu.models.language_models.llama import (
                    LoRADense)
                return LoRADense(f, self.lora_rank, float(self.lora_rank),
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype, name=name)
            from mllm_npu_tpu.ops.quant import QuantDense
            return QuantDense(f, quantization=self.quantization,
                              use_bias=bias, dtype=self.dtype,
                              param_dtype=self.param_dtype, name=name)

        def attend(q, k, v):
            # ops.multi_head_attention routes the big self-attention
            # levels (S=4096/1024 at 1024², head dim 64) through the
            # padded Pallas flash kernel on TPU — the same op-class swap
            # the reference performs on NPU (reference
            # mllm_npu/acceleration/npu.py:36-40); the tiny
            # cross-attention (Sk=64 image tokens) and CPU tests fall
            # back to the eager path via the auto heuristic
            from mllm_npu_tpu import ops
            return ops.multi_head_attention(
                q, k, v, scale=self.dim_head ** -0.5,
                impl=self.attention_impl)

        B, L, _ = x.shape
        use_ip = self.ip_tokens > 0 and not is_self
        text_ctx = context[:, :-self.ip_tokens] if use_ip else context
        q = dense(inner, "to_q")(x).reshape(B, L, self.heads, self.dim_head)
        k = dense(inner, "to_k")(text_ctx).reshape(
            B, -1, self.heads, self.dim_head)
        v = dense(inner, "to_v")(text_ctx).reshape(
            B, -1, self.heads, self.dim_head)
        out = attend(q, k, v)
        if use_ip:
            ip_ctx = context[:, -self.ip_tokens:]
            k_ip = dense(inner, "to_k_ip")(ip_ctx).reshape(
                B, -1, self.heads, self.dim_head)
            v_ip = dense(inner, "to_v_ip")(ip_ctx).reshape(
                B, -1, self.heads, self.dim_head)
            scale = jnp.asarray(1.0 if ip_scale is None else ip_scale,
                                out.dtype)
            out = out + scale * attend(q, k_ip, v_ip)
        out = out.reshape(B, L, inner)
        return dense(self.query_dim, "to_out", bias=True)(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quantization: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from mllm_npu_tpu.ops.quant import QuantDense
        inner = self.dim * self.mult
        proj = QuantDense(inner * 2, quantization=self.quantization,
                          dtype=self.dtype,
                          param_dtype=self.param_dtype, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return QuantDense(self.dim, quantization=self.quantization,
                          dtype=self.dtype,
                          param_dtype=self.param_dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    context_dim: int
    lora_rank: int = 0
    lora_targets: tuple = ("to_q", "to_out")
    ip_tokens: int = 0
    attention_impl: str = "auto"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quantization: Optional[str] = None

    @nn.compact
    def __call__(self, x, context, ip_scale=None):
        ln = lambda name: nn.LayerNorm(dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=name)
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               lora_rank=self.lora_rank,
                               lora_targets=self.lora_targets,
                               attention_impl=self.attention_impl,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               quantization=self.quantization,
                               name="attn1")(ln("norm1")(x))
        x = x + CrossAttention(self.dim, self.heads, self.dim_head,
                               self.context_dim,
                               lora_rank=self.lora_rank,
                               lora_targets=self.lora_targets,
                               ip_tokens=self.ip_tokens,
                               attention_impl=self.attention_impl,
                               dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               quantization=self.quantization,
                               name="attn2")(ln("norm2")(x), context,
                                             ip_scale)
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 quantization=self.quantization,
                                 name="ff")(ln("norm3")(x))
        return x


class Transformer2D(nn.Module):
    channels: int
    heads: int
    layers: int
    context_dim: int
    groups: int = 32
    lora_rank: int = 0
    lora_targets: tuple = ("to_q", "to_out")
    ip_tokens: int = 0
    attention_impl: str = "auto"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quantization: Optional[str] = None

    @nn.compact
    def __call__(self, x, context, ip_scale=None):
        from mllm_npu_tpu.ops.quant import QuantDense
        B, H, W, C = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="norm")(x)
        # SDXL: use_linear_projection=True
        x = x.reshape(B, H * W, C)
        x = QuantDense(C, quantization=self.quantization,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj_in")(x)
        dim_head = C // self.heads
        for i in range(self.layers):
            x = BasicTransformerBlock(C, self.heads, dim_head,
                                      self.context_dim,
                                      self.lora_rank, self.lora_targets,
                                      self.ip_tokens, self.attention_impl,
                                      self.dtype, self.param_dtype,
                                      quantization=self.quantization,
                                      name=f"blocks_{i}")(x, context,
                                                          ip_scale)
        x = QuantDense(C, quantization=self.quantization,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj_out")(x)
        return x.reshape(B, H, W, C) + residual


class Downsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class UNet2DConditionModel(nn.Module):
    config: UNetConfig = UNetConfig()
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 added_cond: Optional[dict] = None, ip_scale=None):
        """sample [B,H,W,Cin] NHWC; timesteps [B] or scalar;
        encoder_hidden_states [B, L, context_dim]; added_cond:
        {'text_embeds': [B, 1280], 'time_ids': [B, 6]} (SDXL);
        ip_scale: runtime IP-Adapter mixing scale (traced scalar) when
        config.ip_num_image_tokens > 0."""
        cfg = self.config
        if cfg.ip_num_image_tokens > 0 and ip_scale is None:
            ip_scale = jnp.float32(cfg.ip_scale)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # time embedding
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedding(cfg.time_embed_dim, self.dtype,
                                 self.param_dtype,
                                 name="time_embedding")(
                                     temb.astype(self.dtype))
        if added_cond is not None and \
                cfg.projection_class_embeddings_input_dim:
            time_ids = added_cond["time_ids"].reshape(-1)
            add_t = timestep_embedding(time_ids,
                                       cfg.addition_time_embed_dim)
            add_t = add_t.reshape(sample.shape[0], -1)
            add_emb = jnp.concatenate(
                [added_cond["text_embeds"], add_t.astype(self.dtype)],
                axis=-1)
            temb = temb + TimestepEmbedding(
                cfg.time_embed_dim, self.dtype, self.param_dtype,
                name="add_embedding")(add_emb.astype(self.dtype))

        context = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        conv = lambda f, name: nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)),
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=name)
        res_cls = ResnetBlock
        tr_cls = Transformer2D
        if cfg.remat:
            res_cls = nn.remat(ResnetBlock, prevent_cse=False)
            tr_cls = nn.remat(Transformer2D, prevent_cse=False)

        h = conv(cfg.block_out_channels[0], "conv_in")(sample)
        skips = [h]

        # down
        n_blocks = len(cfg.block_out_channels)
        for bi, (btype, ch) in enumerate(zip(cfg.down_block_types,
                                             cfg.block_out_channels)):
            for li in range(cfg.layers_per_block):
                h = res_cls(ch, cfg.norm_num_groups, self.dtype,
                            self.param_dtype,
                            name=f"down_{bi}_res_{li}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = tr_cls(ch, cfg.num_attention_heads[bi],
                               cfg.transformer_layers_per_block[bi],
                               cfg.cross_attention_dim,
                               cfg.norm_num_groups, cfg.lora_rank,
                               cfg.lora_targets, cfg.ip_num_image_tokens,
                               cfg.attention_impl,
                               self.dtype, self.param_dtype,
                               quantization=cfg.quantization,
                               name=f"down_{bi}_attn_{li}")(h, context,
                                                            ip_scale)
                skips.append(h)
            if bi < n_blocks - 1:
                h = Downsample(ch, self.dtype, self.param_dtype,
                               name=f"down_{bi}_downsample")(h)
                skips.append(h)

        # mid
        mid_ch = cfg.block_out_channels[-1]
        h = res_cls(mid_ch, cfg.norm_num_groups, self.dtype,
                    self.param_dtype, name="mid_res_0")(h, temb)
        h = tr_cls(mid_ch, cfg.num_attention_heads[-1],
                   cfg.transformer_layers_per_block[-1],
                   cfg.cross_attention_dim, cfg.norm_num_groups,
                   cfg.lora_rank, cfg.lora_targets,
                   cfg.ip_num_image_tokens, cfg.attention_impl,
                   self.dtype, self.param_dtype,
                   quantization=cfg.quantization,
                   name="mid_attn")(h, context, ip_scale)
        h = res_cls(mid_ch, cfg.norm_num_groups, self.dtype,
                    self.param_dtype, name="mid_res_1")(h, temb)

        # up (reversed channels; layers_per_block + 1 resnets per block)
        up_channels = tuple(reversed(cfg.block_out_channels))
        up_types = tuple(reversed(cfg.down_block_types))
        for bi, (btype, ch) in enumerate(zip(up_types, up_channels)):
            for li in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res_cls(ch, cfg.norm_num_groups, self.dtype,
                            self.param_dtype,
                            name=f"up_{bi}_res_{li}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = tr_cls(ch, cfg.num_attention_heads[
                        n_blocks - 1 - bi],
                        cfg.transformer_layers_per_block[n_blocks - 1 - bi],
                        cfg.cross_attention_dim, cfg.norm_num_groups,
                        cfg.lora_rank, cfg.lora_targets,
                        cfg.ip_num_image_tokens, cfg.attention_impl,
                        self.dtype, self.param_dtype,
                        quantization=cfg.quantization,
                        name=f"up_{bi}_attn_{li}")(h, context, ip_scale)
            if bi < n_blocks - 1:
                h = Upsample(ch, self.dtype, self.param_dtype,
                             name=f"up_{bi}_upsample")(h)

        h = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return conv(cfg.out_channels, "conv_out")(h)


# Dense layers OUTSIDE the transformer blocks stay float under
# ``UNetConfig.quantization``: the two timestep-MLP projections and the
# per-resnet time_emb_proj are tiny (B×dim activations, no L dimension)
# and quantizing them would complicate the converter for no HBM win.
UNET_QUANT_SKIP = ("time_embedding", "add_embedding", "time_emb_proj")


def quantize_unet_params(params, bits: int = 8, group_size: int = 256):
    """Float UNet param tree → the structure ``UNetConfig(quantization=
    'int8'|'int4')`` expects (transformer-block Dense kernels →
    kernel_q + scale; convs/norms/time MLPs untouched). Mirrors
    ``quantize_llama_params``/``QwenViTConfig.quantization`` for the
    de-tokenizer (VERDICT r4 #3 measured-substitution experiment)."""
    from mllm_npu_tpu.ops.quant import quantize_dense_params
    return quantize_dense_params(params, skip=UNET_QUANT_SKIP,
                                 bits=bits, group_size=group_size)
