"""Int8 weight-only quantization (TPU-native serving path).

The reference has no quantized inference; this is a TPU headroom
feature: decode is HBM-bandwidth-bound, and int8 weights halve the
weight traffic of every matmul (the dominant decode cost), with
per-output-channel scales keeping accuracy.

Pieces:
- :func:`quantize_int8` — symmetric per-output-channel quantization of a
  [K, N] kernel to (int8 values, f32 scales[N]).
- :func:`int8_matmul` — x·W for int8 W: a Pallas kernel that DMAs the
  int8 tile (half the bytes), dequantizes in VMEM, and runs the bf16
  MXU matmul; jnp fallback off-TPU.
- :class:`Int8Dense` — flax module storing (kernel_q, scale); drop-in
  for the no-bias nn.Dense used across the LLM.
- :func:`quantize_dense_params` — convert a trained float param tree to
  the quantized module's structure.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QuantizedTensor(NamedTuple):
    values: jax.Array   # int8 [K, N]
    scale: jax.Array    # f32 [N]


def quantize_int8(w: jax.Array) -> QuantizedTensor:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q, scale)


def dequantize_int8(qt: QuantizedTensor, dtype=jnp.bfloat16) -> jax.Array:
    return (qt.values.astype(jnp.float32) * qt.scale[None, :]).astype(dtype)


def _matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                                  # [bm, bk] bf16
    w = w_ref[0].astype(x.dtype)                  # [bk, bn] int8 -> bf16
    acc_ref[...] += jax.lax.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(ki == n_k - 1)
    def _finish():
        scale = s_ref[0].astype(jnp.float32)      # [8, bn] (rows equal)
        o_ref[0] = (acc_ref[...] * scale[:1, :]).astype(o_ref.dtype)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fit_block(pref: int, S: int) -> int:
    """Largest 128-multiple <= pref dividing S (0 if none)."""
    b = min(pref, S)
    b -= b % 128
    while b >= 128:
        if S % b == 0:
            return b
        b -= 128
    return 0


def int8_matmul(x: jax.Array, qt: QuantizedTensor, *,
                block_m: int = 256,
                block_n: Optional[int] = None,
                block_k: Optional[int] = None,
                interpret: bool = False) -> jax.Array:
    """x [.., K] @ int8 W [K, N] with per-N scales → [.., N] (x dtype).

    The int8 weight tile is DMA'd at half the bytes of bf16 and
    converted in VMEM — the win for bandwidth-bound decode steps.
    Blocks auto-size toward ~2MB weight tiles: per-grid-step overhead
    (~1us) dominates with small tiles (a [1536, 32000] lm_head at
    512-blocks is 186 steps — slower than the XLA bf16 matvec).
    """
    *lead, K = x.shape
    M = 1
    for d in lead:
        M *= d
    Kw, N = qt.values.shape
    assert K == Kw, (K, Kw)
    x2 = x.reshape(M, K)

    M_p = _pad_to(max(M, 8), 8)
    bm = min(block_m, M_p)
    # bm must divide M_p: pad M up to a multiple of bm instead
    M_p = _pad_to(M_p, bm)
    if block_k is None:
        block_k = _fit_block(2048, K) or 128
    bk = block_k
    if block_n is None:
        target = max((2 * 1024 * 1024) // max(bk, 1), 128)
        block_n = _fit_block(target, N) or 128
    bn = block_n
    aligned = (N % 128 == 0 and K % 128 == 0
               and bn and bk and N % bn == 0 and K % bk == 0)
    if not aligned or not (_on_tpu() or interpret):
        # awkward shapes / CPU: jnp fallback (still fused dequant)
        out = jnp.dot(x2.astype(jnp.float32),
                      qt.values.astype(jnp.float32) * qt.scale[None, :],
                      preferred_element_type=jnp.float32)
        return out.astype(x.dtype).reshape(*lead, N)

    if M_p != M:
        x2 = jnp.pad(x2, ((0, M_p - M), (0, 0)))
    scale8 = jnp.broadcast_to(qt.scale[None, :].astype(jnp.float32), (8, N))

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=K // bk),
        grid=(M_p // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda mi, ni, ki: (0, mi, ki)),
            pl.BlockSpec((1, bk, bn), lambda mi, ni, ki: (0, ki, ni)),
            pl.BlockSpec((1, 8, bn), lambda mi, ni, ki: (0, 0, ni)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda mi, ni, ki: (0, mi, ni)),
        out_shape=jax.ShapeDtypeStruct((1, M_p, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_p * N * K,
            transcendentals=0,
            bytes_accessed=M_p * K * 2 + K * N + M_p * N * 2),
        interpret=interpret,
    )(x2[None], qt.values[None], scale8[None])
    return out[0, :M].reshape(*lead, N)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


class Int8Dense(nn.Module):
    """No-bias Dense with int8 weight storage + per-channel scales.

    Param structure: {"kernel_q": int8 [K, N], "scale": f32 [N]} —
    produced from a trained kernel by :func:`quantize_dense_params`.
    """
    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32   # scale dtype

    @nn.compact
    def __call__(self, x):
        K = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (K, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        qt = QuantizedTensor(kernel_q, scale)
        if _on_tpu():
            return int8_matmul(x.astype(self.dtype), qt)
        return jnp.dot(x.astype(self.dtype),
                       dequantize_int8(qt, self.dtype))


def quantize_dense_params(params, *, skip=("embed",)):
    """Walk a param pytree and convert every no-bias Dense ``kernel``
    leaf into the Int8Dense structure ({kernel_q, scale}). Handles both
    plain [K, N] kernels and scan-stacked [L, K, N] kernels (the LLM's
    ``scan_layers=True`` layout). ``skip`` substrings exclude paths
    (embedding tables stay float)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        joined = "/".join(str(p) for p in path)
        if path[-1] == "kernel" and leaf.ndim in (2, 3) \
                and not any(s in joined for s in skip):
            if leaf.ndim == 3:
                qt = jax.vmap(quantize_int8)(leaf)
            else:
                qt = quantize_int8(leaf)
            out[path[:-1] + ("kernel_q",)] = qt.values
            out[path[:-1] + ("scale",)] = qt.scale
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)
