"""UNet block numerics vs torch replicas of the diffusers math.

The image isn't shipped with diffusers, so weight-level validation of
the converters (utils/weights.py) uses hand-written torch modules that
replicate the diffusers block forward passes exactly (ResnetBlock2D,
BasicTransformerBlock / Transformer2DModel with use_linear_projection,
Downsample2D, Upsample2D, get_timestep_embedding). Random torch weights
run through the converter must then produce the same outputs from the
Flax blocks — this catches transpose, group-norm-eps, GEGLU-split-order
and head-reshape mistakes that the structural tests cannot.

(Reference drives real diffusers modules: mllm_npu/models/generation/
adapter_modules.py; these tests are the TPU build's analogue of its
cross-backend parity harness, acceleration/acceleration.md:35.)
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from mllm_npu_tpu.models.generation.unet import (
    BasicTransformerBlock, Downsample, ResnetBlock, Transformer2D,
    Upsample, timestep_embedding)
from mllm_npu_tpu.utils.weights import _conv, _resnet, _transformer2d

torch.manual_seed(0)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def _nhwc(x_nchw):
    return x_nchw.detach().permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------------------
# torch replicas of the diffusers blocks
# ---------------------------------------------------------------------------

class TorchResnetBlock2D(tnn.Module):
    """diffusers ResnetBlock2D (default config: silu, eps 1e-5,
    time_embedding_norm='default')."""

    def __init__(self, cin, cout, temb_dim, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (tnn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchAttention(tnn.Module):
    """diffusers Attention (no bias on qkv, bias on to_out.0)."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(dim, dim, bias=False)
        self.to_k = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_v = tnn.Linear(ctx_dim, dim, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        B, L, C = x.shape
        H = self.heads
        q = self.to_q(x).reshape(B, L, H, C // H).transpose(1, 2)
        k = self.to_k(ctx).reshape(B, -1, H, C // H).transpose(1, 2)
        v = self.to_v(ctx).reshape(B, -1, H, C // H).transpose(1, 2)
        w = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(C // H), -1)
        out = (w @ v).transpose(1, 2).reshape(B, L, C)
        return self.to_out[0](out)


class TorchGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class TorchBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TorchAttention(dim, dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TorchAttention(dim, ctx_dim, heads)
        self.norm3 = tnn.LayerNorm(dim)

        class FF(tnn.Module):
            def __init__(self):
                super().__init__()
                self.net = tnn.ModuleList([
                    TorchGEGLU(dim, dim * 4), tnn.Identity(),
                    tnn.Linear(dim * 4, dim)])

            def forward(self, x):
                for m in self.net:
                    x = m(x)
                return x

        self.ff = FF()

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class TorchTransformer2D(tnn.Module):
    """diffusers Transformer2DModel with use_linear_projection=True
    (the SDXL configuration)."""

    def __init__(self, ch, ctx_dim, heads, layers, groups):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = tnn.Linear(ch, ch)
        self.transformer_blocks = tnn.ModuleList([
            TorchBasicTransformerBlock(ch, ctx_dim, heads)
            for _ in range(layers)])
        self.proj_out = tnn.Linear(ch, ch)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x)
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = self.proj_out(h)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return h + res


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------

CH_IN, CH_OUT, GROUPS, TEMB = 16, 32, 8, 24


def test_resnet_block_parity():
    t = TorchResnetBlock2D(CH_IN, CH_OUT, TEMB, GROUPS).eval()
    sd = {f"r.{k}": v for k, v in t.state_dict().items()}
    params = _resnet(sd, "r")

    x = np.random.RandomState(0).randn(2, 6, 6, CH_IN).astype(np.float32)
    temb = np.random.RandomState(1).randn(2, TEMB).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t(_nchw(x), torch.from_numpy(temb)))
    got = ResnetBlock(CH_OUT, groups=GROUPS).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_transformer2d_parity():
    ch, ctx_dim, heads, layers = 32, 48, 4, 2
    t = TorchTransformer2D(ch, ctx_dim, heads, layers, GROUPS).eval()
    sd = {f"t.{k}": v for k, v in t.state_dict().items()}
    params = _transformer2d(sd, "t", layers)

    x = np.random.RandomState(0).randn(2, 4, 4, ch).astype(np.float32)
    ctx = np.random.RandomState(1).randn(2, 7, ctx_dim).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t(_nchw(x), torch.from_numpy(ctx)))
    got = Transformer2D(ch, heads, layers, ctx_dim, groups=GROUPS).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5)


def test_basic_transformer_block_parity():
    dim, ctx_dim, heads = 32, 48, 4
    t = TorchBasicTransformerBlock(dim, ctx_dim, heads).eval()
    sd = {f"t.transformer_blocks.0.{k}": v
          for k, v in t.state_dict().items()}
    params = _transformer2d(
        {**sd, "t.norm.weight": torch.ones(dim),
         "t.norm.bias": torch.zeros(dim),
         "t.proj_in.weight": torch.eye(dim),
         "t.proj_in.bias": torch.zeros(dim),
         "t.proj_out.weight": torch.eye(dim),
         "t.proj_out.bias": torch.zeros(dim)}, "t", 1)["blocks_0"]

    x = np.random.RandomState(0).randn(2, 5, dim).astype(np.float32)
    ctx = np.random.RandomState(1).randn(2, 7, ctx_dim).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x), torch.from_numpy(ctx)).numpy()
    got = BasicTransformerBlock(dim, heads, dim // heads, ctx_dim).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_down_up_sample_parity():
    ch = 16
    down_t = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)
    up_t = tnn.Conv2d(ch, ch, 3, padding=1)
    x = np.random.RandomState(0).randn(1, 8, 8, ch).astype(np.float32)
    with torch.no_grad():
        ref_d = _nhwc(down_t(_nchw(x)))
        up_in = F.interpolate(_nchw(x), scale_factor=2, mode="nearest")
        ref_u = _nhwc(up_t(up_in))

    got_d = Downsample(ch).apply(
        {"params": {"conv": _conv(
            {f"d.weight": down_t.weight, "d.bias": down_t.bias}, "d")}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_d), ref_d, atol=2e-5)

    got_u = Upsample(ch).apply(
        {"params": {"conv": _conv(
            {f"u.weight": up_t.weight, "u.bias": up_t.bias}, "u")}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_u), ref_u, atol=2e-5)


def test_timestep_embedding_matches_diffusers_formula():
    """get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0 (SDXL Timesteps config)."""
    dim = 32
    ts = torch.tensor([0, 1, 7, 999], dtype=torch.float32)
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / half            # downscale_freq_shift = 0
    emb = ts[:, None] * torch.exp(exponent)[None]
    ref = torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1).numpy()

    got = timestep_embedding(jnp.asarray([0, 1, 7, 999]), dim)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


class TorchVAEResnet(tnn.Module):
    """diffusers ResnetBlock2D as configured inside AutoencoderKL
    (temb_channels=None, eps=1e-6)."""

    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (tnn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchVAEAttention(tnn.Module):
    """diffusers Attention as configured for the VAE mid block
    (heads=1, dim_head=C, qkv bias, residual_connection=True)."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.ModuleList([tnn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x)
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        w = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(C), -1)
        h = self.to_out[0](w @ v)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return x + h


def test_vae_resnet_parity():
    from mllm_npu_tpu.models.generation.vae import VAEResnet

    t = TorchVAEResnet(CH_IN, CH_OUT, GROUPS).eval()
    sd = {f"r.{k}": v for k, v in t.state_dict().items()}
    params = _resnet(sd, "r")
    x = np.random.RandomState(0).randn(2, 6, 6, CH_IN).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t(_nchw(x)))
    got = VAEResnet(CH_OUT, groups=GROUPS).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_vae_attention_parity():
    from mllm_npu_tpu.models.generation.vae import VAEAttention
    from mllm_npu_tpu.utils.weights import _vae_attn

    ch = 32
    t = TorchVAEAttention(ch, GROUPS).eval()
    sd = {}
    for k, v in t.state_dict().items():
        sd["a." + k.replace("to_out.0", "to_out.0")] = v
    params = _vae_attn(sd, "a")
    x = np.random.RandomState(0).randn(2, 4, 4, ch).astype(np.float32)
    with torch.no_grad():
        ref = _nhwc(t(_nchw(x)))
    got = VAEAttention(ch, groups=GROUPS).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)
