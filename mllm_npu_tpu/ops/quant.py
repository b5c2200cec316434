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


# ---------------------------------------------------------------------------
# Tensor-parallel dispatch: like flash attention, the Pallas dequant
# matmuls are opaque to GSPMD — inside a pjit'd step on a real multi-chip
# mesh the compiler would replicate the quantized weights (per layer, per
# token: exactly the HBM traffic int8/int4 exist to remove). When an
# ops.flash_mesh(mesh) context is active during tracing and the mesh has
# a tensor axis > 1, the quantized Dense modules route through shard_map
# with the weight sharded the same way the GSPMD rules table lays it out
# (parallel/sharding.py LLAMA_RULES):
#   column mode (q/k/v/qkv, gate/up, lm_head): W sharded on N; x
#     replicated over tensor; output N-sharded, no collective.
#   row mode (o_proj, down_proj): W sharded on K; x sharded on its
#     feature axis (the producer is column-parallel, so this layout is
#     already local); per-shard partial sums psum'd over the tensor axis.
# Scales follow the kernel: int8 [N] shards on N for column / replicates
# for row; int4 [K/G, N] shards on N for column / on the group axis for
# row (shards hold whole groups).
# ---------------------------------------------------------------------------


def _active_mesh_axes():
    """(mesh, batch_axes, tensor_size) of the innermost flash_mesh
    context, or None. Lazy import: ops/__init__ imports this module's
    siblings, so quant.py reads the stack at call time."""
    from mllm_npu_tpu import ops as _ops
    stack = getattr(_ops, "_FLASH_MESH_STACK", None)
    if not stack:
        return None
    mesh, batch_axes, _head = stack[-1]
    if mesh is None:
        return None
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tsize = sizes.get("tensor", 1)
    if tsize <= 1:
        return None
    return mesh, batch_axes, sizes, tsize


def tp_quant_matmul(x: jax.Array, qt, *, mode: Optional[str],
                    bits: int, interpret: bool = False):
    """shard_map'd quantized matmul over the active flash_mesh.

    Returns None when no multi-device tensor axis is active or shapes
    don't divide — callers fall through to the plain (single-device /
    GSPMD) path. ``mode`` is "column" | "row" | None per the module's
    role in the transformer block.
    """
    if mode not in ("column", "row"):
        return None
    active = _active_mesh_axes()
    if active is None:
        return None
    mesh, batch_axes, sizes, tsize = active
    from jax.sharding import PartitionSpec as P

    Kw, N = qt.values.shape   # int4: Kw = K/2 (nibble-packed rows)
    if mode == "column":
        if N % tsize != 0:
            return None
        if bits == 4 and qt.scale.shape[1] % tsize != 0:
            return None
    else:
        if Kw % tsize != 0:
            return None
        # int4 row shards must hold whole quant groups (packing is
        # within-group, so whole-group shards unpack to contiguous
        # K-ranges that match x's feature sharding)
        if bits == 4 and qt.scale.shape[0] % tsize != 0:
            return None

    # leading batch dim over the data-like axes when divisible (serving
    # meshes are usually (1, 1, tensor); train never quantizes)
    b_axes = tuple(a for a in batch_axes if sizes.get(a, 1) > 1)
    bsz = 1
    for a in b_axes:
        bsz *= sizes[a]
    bspec = b_axes if (b_axes and x.ndim >= 2 and x.shape[0] % bsz == 0
                       and x.shape[0] >= bsz) else None
    mid = [None] * (x.ndim - 2) if x.ndim >= 2 else []

    if mode == "column":
        x_spec = P(*([bspec] + mid + [None])) if x.ndim >= 2 else P(None)
        w_spec = P(None, "tensor")
        s_spec = P("tensor") if bits == 8 else P(None, "tensor")
        o_spec = P(*([bspec] + mid + ["tensor"])) if x.ndim >= 2 \
            else P("tensor")
    else:
        x_spec = P(*([bspec] + mid + ["tensor"])) if x.ndim >= 2 \
            else P("tensor")
        w_spec = P("tensor", None)
        s_spec = P() if bits == 8 else P("tensor", None)
        o_spec = P(*([bspec] + mid + [None])) if x.ndim >= 2 else P(None)

    matmul = int8_matmul if bits == 8 else int4_matmul
    qt_cls = QuantizedTensor if bits == 8 else QuantizedTensor4

    def local(xl, wl, sl):
        out = matmul(xl, qt_cls(wl, sl), interpret=interpret)
        if mode == "row":
            out = jax.lax.psum(out, "tensor")
        return out

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(x_spec, w_spec, s_spec),
                       out_specs=o_spec, check_vma=False)
    return fn(x, qt.values, qt.scale)


# ---------------------------------------------------------------------------
# int4 (group-wise scales): decode at 8B scale is weight-streaming-bound,
# so int4 storage is the next ~2x after int8. Per-channel scales are too
# coarse at 4 bits; group-wise scales along K (group_size, default 256)
# are the standard RTN recipe.
#
# STORAGE IS NIBBLE-PACKED INT8, not jnp.int4: S4 arrays cannot cross
# the PJRT boundary on current TPU runtimes (observed live: an S4 jit
# *input* — which every param is — hits "Recursively calling jit" /
# UNIMPLEMENTED in the runtime; S4 works only as a jit-internal value).
# Packing two 4-bit values per int8 byte keeps the exact 2x HBM win and
# is runtime-agnostic.
#
# Packing layout (group-half, chosen so the kernel needs NO interleave):
# within each K-group of size G, byte row r of the packed group (G/2
# rows) holds value W[g*G + r] in the LOW nibble and W[g*G + G/2 + r]
# in the HIGH nibble. The matmul then computes
#   dot(x[:, gG : gG+G/2], lo) + dot(x[:, gG+G/2 : (g+1)G], hi)
# — two contiguous half-group dots per group, no row shuffle on the
# unpacked tile (a sublane interleave would serialize on the VPU).
# ---------------------------------------------------------------------------

class QuantizedTensor4(NamedTuple):
    values: jax.Array   # int8 [K // 2, N] — two nibbles per byte (see above)
    scale: jax.Array    # f32 [K // group, N]


def _pack_nibbles(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """lo/hi int values in [-8, 7] → int8 bytes (lo in bits 0-3)."""
    v = (lo.astype(jnp.int32) & 0xF) | ((hi.astype(jnp.int32) & 0xF) << 4)
    return jnp.where(v >= 128, v - 256, v).astype(jnp.int8)


def _unpack_lo_hi(packed: jax.Array):
    """int8 bytes → (lo, hi) sign-extended int32 nibbles."""
    p = packed.astype(jnp.int32)
    lo = (p << 28) >> 28
    hi = p >> 4          # p is sign-extended from int8, so this is exact
    return lo, hi


def quantize_int4(w: jax.Array, group_size: int = 256) -> QuantizedTensor4:
    """Symmetric group-wise int4 quantization: scales per (K-group, N).
    K not divisible by group_size falls back to one group (= per-channel
    scales over the whole K). Values are nibble-packed into int8
    [K/2, N] in the group-half layout (module docstring)."""
    w = w.astype(jnp.float32)
    K, N = w.shape
    G = group_size if K % group_size == 0 else K
    assert G % 2 == 0, f"int4 group size must be even, got {G} (K={K})"
    wg = w.reshape(K // G, G, N)
    amax = jnp.max(jnp.abs(wg), axis=1)                     # [K/G, N]
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    q = q.reshape(K // G, 2, G // 2, N)
    packed = _pack_nibbles(q[:, 0], q[:, 1]).reshape(K // 2, N)
    return QuantizedTensor4(packed, scale)


def dequantize_int4(qt: QuantizedTensor4, dtype=jnp.bfloat16) -> jax.Array:
    Kh, N = qt.values.shape
    K = 2 * Kh
    n_g = qt.scale.shape[0]
    lo, hi = _unpack_lo_hi(qt.values.reshape(n_g, Kh // n_g, N))
    v = jnp.stack([lo, hi], axis=1).astype(jnp.float32)  # [n_g, 2, G/2, N]
    v = v * qt.scale[:, None, None, :]
    return v.reshape(K, N).astype(dtype)


def _matmul4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, n_g, G):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                                  # [bm, bk] bf16
    w = w_ref[0]                                  # [bk/2, bn] packed int8
    s = s_ref[0]                                  # [n_g, bn] f32
    Gh = G // 2
    for g in range(n_g):                          # static unroll
        wp = w[g * Gh:(g + 1) * Gh, :]
        lo, hi = _unpack_lo_hi(wp)                # sign-extended nibbles
        xg = x[:, g * G:(g + 1) * G]
        part = jax.lax.dot(xg[:, :Gh], lo.astype(x.dtype),
                           preferred_element_type=jnp.float32)
        part += jax.lax.dot(xg[:, Gh:], hi.astype(x.dtype),
                            preferred_element_type=jnp.float32)
        acc_ref[...] += part * s[g][None, :]

    @pl.when(ki == n_k - 1)
    def _finish():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def int4_matmul(x: jax.Array, qt: QuantizedTensor4, *,
                block_m: int = 256,
                block_n: Optional[int] = None,
                block_k: Optional[int] = None,
                interpret: bool = False) -> jax.Array:
    """x [.., K] @ packed-int4 W [K/2, N] with group scales → [.., N]."""
    *lead, K = x.shape
    M = 1
    for d in lead:
        M *= d
    Kh, N = qt.values.shape
    assert K == 2 * Kh, (K, Kh)
    n_groups = qt.scale.shape[0]
    G = K // n_groups
    x2 = x.reshape(M, K)

    M_p = _pad_to(max(M, 8), 8)
    bm = min(block_m, M_p)
    M_p = _pad_to(M_p, bm)
    if block_k is None:
        # bk must be a multiple of the quant group so each K-tile holds
        # whole groups, AND the per-block scale slab [n_g, bn] must have
        # n_g % 8 == 0 (Mosaic block-shape rule) unless it spans the
        # whole group axis. Prefer 8 groups per tile; otherwise take the
        # full K (n_g == n_groups slabs are always legal) — at 13B's
        # K=5120/G=256 the 8-group tile doesn't divide K, and a partial
        # tile (n_g=5) fails to lower.
        bk = 8 * G if K % (8 * G) == 0 else K
    else:
        bk = block_k
    if block_n is None:
        target = max((2 * 1024 * 1024) // max(bk, 1), 128)
        block_n = _fit_block(target, N) or 128
    bn = block_n
    aligned = (N % 128 == 0 and K % 128 == 0 and G % 128 == 0
               and bk and bn and N % bn == 0 and K % bk == 0
               # explicit block_k must hold whole quant groups — a bk
               # that doesn't tile by G would run zero (or partial)
               # group iterations and silently corrupt the output
               and bk % G == 0 and bk >= G)
    if not aligned or not (_on_tpu() or interpret):
        out = jnp.dot(x2.astype(jnp.float32),
                      dequantize_int4(qt, jnp.float32),
                      preferred_element_type=jnp.float32)
        return out.astype(x.dtype).reshape(*lead, N)

    if M_p != M:
        x2 = jnp.pad(x2, ((0, M_p - M), (0, 0)))
    n_g = bk // G

    out = pl.pallas_call(
        functools.partial(_matmul4_kernel, n_k=K // bk, n_g=n_g, G=G),
        grid=(M_p // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((1, bm, bk), lambda mi, ni, ki: (0, mi, ki)),
            pl.BlockSpec((1, bk // 2, bn), lambda mi, ni, ki: (0, ki, ni)),
            pl.BlockSpec((1, n_g, bn), lambda mi, ni, ki: (0, ki, ni)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda mi, ni, ki: (0, mi, ni)),
        out_shape=jax.ShapeDtypeStruct((1, M_p, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_p * N * K,
            transcendentals=0,
            bytes_accessed=M_p * K * 2 + K * N // 2 + M_p * N * 2),
        interpret=interpret,
    )(x2[None], qt.values[None],
      qt.scale.reshape(n_groups, N)[None])
    return out[0, :M].reshape(*lead, N)


# ---------------------------------------------------------------------------
# Differentiable dispatch (frozen-quantized-base LoRA training): the
# Pallas matmuls have no AD rule, so training THROUGH a frozen int8/int4
# base (the reference's SFT recipe — LoRA on a frozen LLM,
# peft_models.py:15-99 — at 8B-on-16GB scale) needs a custom VJP.
# Forward = the normal quantized dispatch (TP shard_map / Pallas / jnp
# fallback); backward computes ONLY dx = g @ W_deq^T — the weights are
# frozen integer storage, so no dW is ever needed (and skipping the
# x^T·g products removes the single largest bwd matmul per layer).
# ---------------------------------------------------------------------------

def _quant_dispatch(x, values, scale, tp_mode, bits, interpret):
    if bits == 8:
        qt = QuantizedTensor(values, scale)
        y = tp_quant_matmul(x, qt, mode=tp_mode, bits=8,
                            interpret=interpret)
        if y is not None:
            return y
        if _on_tpu() or interpret:
            return int8_matmul(x, qt, interpret=interpret)
        return jnp.dot(x, dequantize_int8(qt, x.dtype))
    qt = QuantizedTensor4(values, scale)
    y = tp_quant_matmul(x, qt, mode=tp_mode, bits=4, interpret=interpret)
    if y is not None:
        return y
    if _on_tpu() or interpret:
        return int4_matmul(x, qt, interpret=interpret)
    return jnp.dot(x, dequantize_int4(qt, x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def quant_matmul(x, values, scale, tp_mode, bits, interpret=False):
    """Differentiable x @ W_q for frozen quantized W (int8 per-channel /
    packed-int4 group scales). See module-level dispatch note above."""
    return _quant_dispatch(x, values, scale, tp_mode, bits, interpret)


def _quant_matmul_fwd(x, values, scale, tp_mode, bits, interpret):
    return (_quant_dispatch(x, values, scale, tp_mode, bits, interpret),
            (values, scale))


def _quant_matmul_bwd(tp_mode, bits, interpret, res, g):
    import numpy as _np
    values, scale = res
    if bits == 8:
        w = dequantize_int8(QuantizedTensor(values, scale), g.dtype)
    else:
        w = dequantize_int4(QuantizedTensor4(values, scale), g.dtype)
    # dx = g @ W^T; the dequant convert fuses into the dot's LHS read
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)
    # frozen storage: float0 cotangent for the integer values, zero for
    # the (frozen) scales
    dvals = _np.zeros(values.shape, jax.dtypes.float0)
    return dx, dvals, jnp.zeros_like(scale)


quant_matmul.defvjp(_quant_matmul_fwd, _quant_matmul_bwd)


class Int4Dense(nn.Module):
    """No-bias Dense with int4 weight storage + group-wise scales.

    Param structure: {"kernel_q": packed int8 [K/2, N], "scale_g": f32
    [K/G, N]} — produced from a trained kernel by
    :func:`quantize_dense_params` with ``bits=4`` (nibble packing layout
    in the module docstring above). The group scale gets its own param
    name (vs the int8 per-channel "scale") so the sharding rules table
    can lay the group axis out along the kernel's K sharding without
    colliding with scan-stacked [L, N] int8 scales of the same rank.
    """
    features: int
    group_size: int = 256
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    tp_mode: Optional[str] = None   # "column" | "row" under a TP mesh

    @nn.compact
    def __call__(self, x):
        K = x.shape[-1]
        G = self.group_size if K % self.group_size == 0 else K
        assert K % 2 == 0 and G % 2 == 0, (K, G)
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (K // 2, self.features), jnp.int8)
        scale = self.param("scale_g", nn.initializers.ones,
                           (K // G, self.features), jnp.float32)
        return quant_matmul(x.astype(self.dtype), kernel_q, scale,
                            self.tp_mode, 4, False)


class Int8Dense(nn.Module):
    """No-bias Dense with int8 weight storage + per-channel scales.

    Param structure: {"kernel_q": int8 [K, N], "scale": f32 [N]} —
    produced from a trained kernel by :func:`quantize_dense_params`.
    """
    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32   # scale dtype
    tp_mode: Optional[str] = None   # "column" | "row" under a TP mesh

    @nn.compact
    def __call__(self, x):
        K = x.shape[-1]
        kernel_q = self.param("kernel_q", nn.initializers.zeros,
                              (K, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        return quant_matmul(x.astype(self.dtype), kernel_q, scale,
                            self.tp_mode, 8, False)


def quantize_dense_params(params, *, skip=("embed",), bits: int = 8,
                          group_size: int = 256):
    """Walk a param pytree and convert every no-bias Dense ``kernel``
    leaf into the Int8Dense/Int4Dense structure ({kernel_q, scale}).
    Handles both plain [K, N] kernels and scan-stacked [L, K, N] kernels
    (the LLM's ``scan_layers=True`` layout). ``skip`` substrings exclude
    paths (embedding tables stay float). ``bits=4`` uses group-wise
    scales (``group_size`` along K)."""
    import flax

    assert bits in (4, 8), bits
    if bits == 8:
        quant = quantize_int8
    else:
        def quant(w):
            return quantize_int4(w, group_size=group_size)

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        joined = "/".join(str(p) for p in path)
        if path[-1] == "kernel" and leaf.ndim in (2, 3) \
                and not any(s in joined for s in skip):
            if leaf.ndim == 3:
                qt = jax.vmap(quant)(leaf)
            else:
                qt = quant(leaf)
            out[path[:-1] + ("kernel_q",)] = qt.values
            scale_key = "scale" if bits == 8 else "scale_g"
            out[path[:-1] + (scale_key,)] = qt.scale
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


class QuantDense(nn.Module):
    """Dense with optional bias and optional int8/int4 weight storage.

    The vision towers (and the UNet's linear layers) use biased Dense
    layers, which :class:`Int8Dense`/:class:`Int4Dense` (built for the
    LLM's no-bias projections) can't represent. This module keeps
    nn.Dense's exact param naming when ``quantization is None``
    ("kernel"/"bias", lecun-normal/zeros init), and the quantized
    naming ("kernel_q" + "scale"/"scale_g" + "bias") otherwise — so
    :func:`quantize_dense_params` converts a trained float tree into
    this module's quantized structure in place (bias passes through
    untouched).

    Serving rationale: the SEED-X stack (Llama-2-13B + Qwen-ViT-G +
    SDXL) only fits one 16GB v5e with the LLM at int4 AND the 1.9B ViT
    tower quantized; the ViT encode is a one-shot compute-bound prefill
    op, so int8 costs ~nothing there while halving its HBM residency.
    """
    features: int
    quantization: Optional[str] = None   # None | "int8" | "int4"
    use_bias: bool = True
    group_size: int = 256
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    tp_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        K = x.shape[-1]
        if self.quantization in (None, "none"):
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (K, self.features), self.param_dtype)
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        elif self.quantization == "int8":
            kernel_q = self.param("kernel_q", nn.initializers.zeros,
                                  (K, self.features), jnp.int8)
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            y = quant_matmul(x.astype(self.dtype), kernel_q, scale,
                             self.tp_mode, 8, False)
        elif self.quantization == "int4":
            G = self.group_size if K % self.group_size == 0 else K
            assert K % 2 == 0 and G % 2 == 0, (K, G)
            kernel_q = self.param("kernel_q", nn.initializers.zeros,
                                  (K // 2, self.features), jnp.int8)
            scale = self.param("scale_g", nn.initializers.ones,
                               (K // G, self.features), jnp.float32)
            y = quant_matmul(x.astype(self.dtype), kernel_q, scale,
                             self.tp_mode, 4, False)
        else:
            raise ValueError(f"unknown quantization {self.quantization!r}")
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y
