"""Shared ViT building blocks (Flax).

Used by the SigLIP tower, the Qwen-VL ViT, and the attention-resampler
projector. Attention parameter naming follows torch ``nn.MultiheadAttention``
split into q/k/v/out so reference checkpoints convert 1:1 (the converter
splits torch's fused ``in_proj_weight``).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu import ops


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Frozen 2D sin-cos position table [grid², D] (reference semantics:
    mllm_npu/models/multimodal_projector/attention_resampler.py:33-79)."""
    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)   # w first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def _torch_bicubic_weights(src: int, tgt: int) -> np.ndarray:
    """Interpolation matrix [tgt, src] matching torch's
    upsample_bicubic2d (align_corners=False, A=-0.75): checkpoint pos
    tables must interpolate exactly like the reference (get_abs_pos,
    attention_resampler.py:12-30) or converted weights drift."""
    A = -0.75

    def cubic(x):
        x = abs(x)
        if x <= 1:
            return (A + 2) * x ** 3 - (A + 3) * x ** 2 + 1
        if x < 2:
            return A * x ** 3 - 5 * A * x ** 2 + 8 * A * x - 4 * A
        return 0.0

    W = np.zeros((tgt, src), np.float64)
    scale = src / tgt
    for i in range(tgt):
        coord = (i + 0.5) * scale - 0.5
        i0 = math.floor(coord)
        frac = coord - i0
        for k in range(-1, 3):
            w = cubic(k - frac)
            j = min(max(i0 + k, 0), src - 1)   # clamp at edges
            W[i, j] += w
    return W.astype(np.float32)


def interpolate_abs_pos(pos: jax.Array, tgt_len: int) -> jax.Array:
    """Bicubic-resize a square [L, C] pos table to [tgt_len, C] with
    torch-exact weights (static shapes — resolves at trace time)."""
    src = int(math.sqrt(pos.shape[0]))
    tgt = int(math.sqrt(tgt_len))
    if src == tgt:
        return pos
    W = jnp.asarray(_torch_bicubic_weights(src, tgt), jnp.float32)
    grid = pos.reshape(src, src, -1).astype(jnp.float32)
    out = jnp.einsum("ts,shc->thc", W, grid)
    out = jnp.einsum("ts,hsc->htc", W, out)
    return out.reshape(tgt * tgt, -1).astype(pos.dtype)


def adaptive_avg_pool_tokens(x: jax.Array, grid: int) -> jax.Array:
    """Exact AdaptiveAvgPool2d over a [B, s*s, D] token grid → [B, grid², D].

    Implemented as two static averaging matmuls (MXU-friendly; no gather
    loops). Matches torch's window convention floor(i*s/g)..ceil((i+1)*s/g).
    """
    B, L, D = x.shape
    s = int(math.sqrt(L))
    A = np.zeros((s, grid), np.float32)
    for i in range(grid):
        lo = (i * s) // grid
        hi = -(-(i + 1) * s // grid)
        A[lo:hi, i] = 1.0 / (hi - lo)
    A = jnp.asarray(A, x.dtype)
    xg = x.reshape(B, s, s, D)
    xg = jnp.einsum("bhwd,hg->bgwd", xg, A)
    xg = jnp.einsum("bgwd,wk->bgkd", xg, A)
    return xg.reshape(B, grid * grid, D)


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention semantics (bias on in/out projections).

    attn_impl="auto" rides the padded Pallas flash kernel on TPU for the
    vision-tower shapes (SigLIP S=729/D=72, Qwen S=1024/D=104 — measured
    1.7-1.85x over XLA eager on v5e) and falls back to the eager oracle
    elsewhere."""
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    attn_impl: str = "auto"
    quantization: Optional[str] = None   # None | "int8" | "int4" weights

    @nn.compact
    def __call__(self, q, k, v):
        from mllm_npu_tpu.ops.quant import QuantDense
        E, H = self.embed_dim, self.num_heads
        D = E // H
        dense = lambda name: QuantDense(E, quantization=self.quantization,
                                        use_bias=True, dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        name=name)
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        qh = dense("q_proj")(q).reshape(B, Lq, H, D)
        kh = dense("k_proj")(k).reshape(B, Lk, H, D)
        vh = dense("v_proj")(v).reshape(B, Lk, H, D)
        out = ops.multi_head_attention(qh, kh, vh, causal=False,
                                       impl=self.attn_impl)
        out = out.reshape(B, Lq, E)
        return dense("out_proj")(out)


class ViTBlock(nn.Module):
    """Pre-LN transformer block: LN→MHA→res, LN→MLP(GELU)→res."""
    width: int
    heads: int
    mlp_width: int
    ln_eps: float = 1e-6
    gelu_approx: bool = False   # True = tanh approx (SigLIP), False = erf
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quantization: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from mllm_npu_tpu.ops.quant import QuantDense
        ln = lambda name: nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                                       param_dtype=self.param_dtype, name=name)
        attn = TorchMHA(self.width, self.heads, self.dtype, self.param_dtype,
                        quantization=self.quantization, name="attn")
        h = ln("ln_1")(x)
        x = x + attn(h, h, h)
        h = ln("ln_2")(x)
        h = QuantDense(self.mlp_width, quantization=self.quantization,
                       dtype=self.dtype,
                       param_dtype=self.param_dtype, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=self.gelu_approx)
        h = QuantDense(self.width, quantization=self.quantization,
                       dtype=self.dtype,
                       param_dtype=self.param_dtype, name="mlp_proj")(h)
        return x + h


class ViTEncoder(nn.Module):
    """Stack of ViTBlocks via nn.scan (one trace per tower) with optional
    remat (the reference hardcodes ViT gradient checkpointing on,
    qwenvl_vit.py:196-200)."""
    width: int
    layers: int
    heads: int
    mlp_width: int
    ln_eps: float = 1e-6
    gelu_approx: bool = False
    remat: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    quantization: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        block_cls = ViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock, prevent_cse=False)

        def body(block, h, _):
            return block(h), None

        scan = nn.scan(body, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=self.layers)
        x, _ = scan(
            block_cls(self.width, self.heads, self.mlp_width, self.ln_eps,
                      self.gelu_approx, self.dtype, self.param_dtype,
                      self.quantization, name="blocks"),
            x, None)
        return x
