"""Pallas TPU flash attention (forward + backward), GQA-native.

This is the framework's fused-attention capability — the TPU replacement
for the reference's `torch_npu.npu_fusion_attention` recipes
(reference: mllm_npu/acceleration/npu.py:36-73 — causal sparse_mode=3 and
varlen `actual_seq_*len` map here to `causal=True` and `segment_ids`).

Design (FlashAttention-2 schedule on the MXU):
  * layout [B, H, S, D]; grid (B, Hq, num_q_blocks, num_kv_blocks) with
    the KV dimension innermost; online-softmax state (m, l, acc) lives in
    VMEM scratch that persists across KV grid steps.
  * GQA is native: KV index maps select head ``hq * Hkv // Hq``, so K/V
    are never materialized per-q-head (the eager path repeats them).
  * causal blocks above the diagonal are predicated off with ``pl.when``.
  * fp32 accumulation; bf16/fp32 inputs.
  * backward = two kernels (dQ; dKV) using the saved logsumexp plus a
    precomputed ``delta = rowsum(dO * O)``, per the FA2 paper.

Numerics are parity-tested against ``ops.attention.dot_product_attention``
in tests/test_flash_attention.py (the analogue of the reference's
cross-backend attention parity harness, acceleration/acceleration.md:35).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
# v5e/v5p scoped-VMEM default (16MB) is too small for 256-blocks; the
# hardware allows more — raise it so larger tiles are available.
VMEM_LIMIT_BYTES = 64 * 1024 * 1024
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class SegmentIds(NamedTuple):
    q: jax.Array   # int32 [B, Sq]
    kv: jax.Array  # int32 [B, Sk]


def _below_or_on_diag(qi, bq, ki, bk):
    return (qi + 1) * bq - 1 >= ki * bk


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, scale, causal, block_q, block_k, num_kv_blocks):
    ki = pl.program_id(3)
    qi = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = True
    if causal:
        should_run = _below_or_on_diag(qi, block_q, ki, block_k)

    @pl.when(should_run)
    def _body():
        q = q_ref[0, 0]  # [bq, D]
        k = k_ref[0, 0]  # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s *= scale

        mask = None
        if qseg_ref is not None:
            rep = block_k // NUM_LANES
            qseg = jnp.tile(qseg_ref[0], (1, rep))       # [bq, bk]
            kseg = kseg_ref[0, :1, :]                    # [1, bk]
            mask = qseg == kseg
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            cmask = (rows + qi * block_q) >= (cols + ki * block_k)
            mask = cmask if mask is None else jnp.logical_and(mask, cmask)
        if mask is not None:
            s += jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)

        # PERF-CRITICAL: m/l scratch keep ALL 128 lanes equal so every
        # broadcast below is jnp.tile of a full vreg. Lane-slices like
        # m[:, :1] force a Mosaic lane-broadcast relayout that measured
        # 13x slower end-to-end on v5e.
        m_prev = m_scr[...]                # [bq, 128] (lanes equal)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]              # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)              # [bq, 128]
        p = jnp.exp(s - jnp.tile(m_next, (1, block_k // NUM_LANES)))
        alpha = jnp.exp(m_prev - m_next)                  # [bq, 128]
        l_corr = alpha * l_prev
        l_next = jnp.sum(p, axis=1)[:, None] + l_corr     # [bq, 128]

        m_scr[...] = m_next
        l_scr[...] = l_next

        # continuously-normalized accumulator (in-tree/FA1 style): acc is
        # always acc_true / l_so_far, so the final step is just a cast.
        l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        d_rep = acc_scr.shape[-1] // NUM_LANES
        acc_scr[...] *= jnp.tile(l_corr * l_inv, (1, d_rep))
        v = v_ref[0, 0]  # [bk, D]
        o_curr = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32)
        acc_scr[...] += o_curr * jnp.tile(l_inv, (1, d_rep))

    @pl.when(ki == num_kv_blocks - 1)
    def _finish():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)
        lse = m_scr[...] + jnp.log(l_safe)
        lse_ref[0, 0] = jnp.where(l == 0.0, -jnp.inf, lse)


def _fwd(q, k, v, segment_ids, scale, causal, block_q, block_k, interpret):
    B, Hq, Sq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    grid = (B, Hq, Sq // block_q, Sk // block_k)
    nkv = grid[3]

    kv_head = lambda h: h * Hkv // Hq

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, D),
                     lambda b, h, qi, ki: (b, kv_head(h), ki, 0)),
        pl.BlockSpec((1, 1, block_k, D),
                     lambda b, h, qi, ki: (b, kv_head(h), ki, 0)),
    ]
    args = [q, k, v]
    if segment_ids is not None:
        qseg = jnp.broadcast_to(segment_ids.q[:, :, None].astype(jnp.int32),
                                (B, Sq, NUM_LANES))
        kseg = jnp.broadcast_to(segment_ids.kv[:, None, :].astype(jnp.int32),
                                (B, 8, Sk))
        in_specs += [
            pl.BlockSpec((1, block_q, NUM_LANES),
                         lambda b, h, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 8, block_k), lambda b, h, qi, ki: (b, 0, ki)),
        ]
        args += [qseg, kseg]
    else:
        in_specs += [None, None]
        args += [None, None]

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, num_kv_blocks=nkv,
    )
    # pallas_call can't take None inputs; filter them while keeping kernel arity
    live = [a is not None for a in args]
    kernel_wrapped = _wrap_optional(kernel, live, n_out=2, n_scratch=3)

    o, lse = pl.pallas_call(
        kernel_wrapped,
        grid=grid,
        in_specs=[s for s in in_specs if s is not None],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, NUM_LANES),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sq, NUM_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(*[a for a in args if a is not None])
    return o, lse


def _wrap_optional(kernel, live, n_out, n_scratch):
    """Adapt a kernel with optional (None) input refs to pallas_call arity."""
    n_in = len(live)

    def wrapped(*refs):
        ins = []
        it = iter(refs[: sum(live)])
        for is_live in live:
            ins.append(next(it) if is_live else None)
        rest = refs[sum(live):]
        return kernel(*ins, *rest)

    del n_in, n_out, n_scratch
    return wrapped


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                   qseg_ref, kseg_ref,
                   dq_ref, dq_scr,
                   *, scale, causal, block_q, block_k, num_kv_blocks):
    ki = pl.program_id(3)
    qi = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    should_run = True
    if causal:
        should_run = _below_or_on_diag(qi, block_q, ki, block_k)

    @pl.when(should_run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]   # [bq, 128], lanes equal
        di = di_ref[0, 0]     # [bq, 128], lanes equal

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = None
        if qseg_ref is not None:
            rep = block_k // NUM_LANES
            qseg = jnp.tile(qseg_ref[0], (1, rep))
            kseg = kseg_ref[0, :1, :]
            mask = qseg == kseg
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            cmask = (rows + qi * block_q) >= (cols + ki * block_k)
            mask = cmask if mask is None else jnp.logical_and(mask, cmask)
        if mask is not None:
            s += jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)

        rep = block_k // NUM_LANES
        p = jnp.exp(s - jnp.tile(lse, (1, rep)))   # [bq, bk]
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.tile(di, (1, rep))) * scale
        dq_scr[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                   preferred_element_type=jnp.float32)

    @pl.when(ki == num_kv_blocks - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                    qseg_ref, kseg_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale, causal, block_q, block_k, num_q_blocks,
                    q_per_kv):
    # innermost grid dim walks (q-block, group-head) pairs so dK/dV
    # accumulate across the whole GQA group in VMEM — no per-q-head
    # HBM temporaries + group-sum afterwards
    t = pl.program_id(3)
    qi = t // q_per_kv
    ki = pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    should_run = True
    if causal:
        should_run = _below_or_on_diag(qi, block_q, ki, block_k)

    @pl.when(should_run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]   # [bq, 128], lanes equal
        di = di_ref[0, 0]     # [bq, 128], lanes equal

        # q-major throughout; dK/dV use transposed-LHS matmuls so no
        # sublane->lane relayouts are needed.
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = None
        if qseg_ref is not None:
            rep = block_k // NUM_LANES
            qseg = jnp.tile(qseg_ref[0], (1, rep))      # [bq, bk]
            kseg = kseg_ref[0, :1, :]                   # [1, bk]
            mask = qseg == kseg
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            cmask = (rows + qi * block_q) >= (cols + ki * block_k)
            mask = cmask if mask is None else jnp.logical_and(mask, cmask)
        if mask is not None:
            s += jnp.where(mask, 0.0, DEFAULT_MASK_VALUE)

        rep = block_k // NUM_LANES
        p = jnp.exp(s - jnp.tile(lse, (1, rep)))    # [bq, bk]
        # dv += p^T @ do  (contract over bq)
        dv_scr[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.tile(di, (1, rep))) * scale  # [bq, bk]
        # dk += ds^T @ q  (contract over bq)
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(t == num_q_blocks * q_per_kv - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd(residuals, do, *, scale, causal, block_q, block_k, interpret):
    q, k, v, segment_ids, o, lse = residuals
    B, Hq, Sq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    G = Hq // Hkv

    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (B, Hq, Sq, NUM_LANES))

    kv_head = lambda h: h * Hkv // Hq

    qseg3 = kseg_sub = None
    if segment_ids is not None:
        qseg3 = jnp.broadcast_to(
            segment_ids.q[:, :, None].astype(jnp.int32), (B, Sq, NUM_LANES))
        kseg_sub = jnp.broadcast_to(
            segment_ids.kv[:, None, :].astype(jnp.int32), (B, 8, Sk))

    # ---- dQ: grid (B, Hq, nq, nk)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, D),
                     lambda b, h, qi, ki: (b, kv_head(h), ki, 0)),
        pl.BlockSpec((1, 1, block_k, D),
                     lambda b, h, qi, ki: (b, kv_head(h), ki, 0)),
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_q, NUM_LANES),
                     lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_q, NUM_LANES),
                     lambda b, h, qi, ki: (b, h, qi, 0)),
    ]
    args = [q, k, v, do, lse, di]
    if segment_ids is not None:
        in_specs += [
            pl.BlockSpec((1, block_q, NUM_LANES),
                         lambda b, h, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 8, block_k), lambda b, h, qi, ki: (b, 0, ki)),
        ]
        args += [qseg3, kseg_sub]
    else:
        in_specs += [None, None]
        args += [None, None]

    kern = functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                             block_q=block_q, block_k=block_k,
                             num_kv_blocks=Sk // block_k)
    live = [a is not None for a in args]
    dq = pl.pallas_call(
        _wrap_optional(kern, live, 1, 1),
        grid=(B, Hq, Sq // block_q, Sk // block_k),
        in_specs=[s for s in in_specs if s is not None],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(*[a for a in args if a is not None])

    # ---- dKV: grid (B, Hkv, nk, nq*G); the inner dim sweeps
    # (q-block, group-head) so dk/dv land per KV head directly
    def q_head(h, t):
        return h * G + t % G

    def q_blk(t):
        return t // G

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D),
                     lambda b, h, ki, t: (b, q_head(h, t), q_blk(t), 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, ki, t: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, ki, t: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, block_q, D),
                     lambda b, h, ki, t: (b, q_head(h, t), q_blk(t), 0)),
        pl.BlockSpec((1, 1, block_q, NUM_LANES),
                     lambda b, h, ki, t: (b, q_head(h, t), q_blk(t), 0)),
        pl.BlockSpec((1, 1, block_q, NUM_LANES),
                     lambda b, h, ki, t: (b, q_head(h, t), q_blk(t), 0)),
    ]
    args = [q, k, v, do, lse, di]
    if segment_ids is not None:
        in_specs += [
            pl.BlockSpec((1, block_q, NUM_LANES),
                         lambda b, h, ki, t: (b, q_blk(t), 0)),
            pl.BlockSpec((1, 8, block_k), lambda b, h, ki, t: (b, 0, ki)),
        ]
        args += [qseg3, kseg_sub]
    else:
        in_specs += [None, None]
        args += [None, None]

    kern = functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                             block_q=block_q, block_k=block_k,
                             num_q_blocks=Sq // block_q, q_per_kv=G)
    live = [a is not None for a in args]
    dk, dv = pl.pallas_call(
        _wrap_optional(kern, live, 2, 2),
        grid=(B, Hkv, Sk // block_k, (Sq // block_q) * G),
        in_specs=[s for s in in_specs if s is not None],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, ki, t: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, ki, t: (b, h, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Sk, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, Sk, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(*[a for a in args if a is not None])

    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, segment_ids, scale, causal, block_q, block_k, interpret):
    o, _ = _fwd(q, k, v, segment_ids, scale, causal, block_q, block_k,
                interpret)
    return o


def _flash_fwd_rule(q, k, v, segment_ids, scale, causal, block_q, block_k,
                    interpret):
    o, lse = _fwd(q, k, v, segment_ids, scale, causal, block_q, block_k,
                  interpret)
    return o, (q, k, v, segment_ids, o, lse)


def _flash_bwd_rule(scale, causal, block_q, block_k, interpret, residuals,
                    do):
    return _bwd(residuals, do, scale=scale, causal=causal, block_q=block_q,
                block_k=block_k, interpret=interpret)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,       # [B, Sq, Hq, D]  (BSHD, model-side layout)
    k: jax.Array,       # [B, Sk, Hkv, D]
    v: jax.Array,
    *,
    causal: bool = False,
    segment_ids: Optional[SegmentIds] = None,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """GQA flash attention; returns [B, Sq, Hq, D].

    Sequence lengths must be multiples of the block sizes (the data layer
    always pads to lane multiples; block sizes are clamped to the seq len).
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    assert Hq % Hkv == 0
    if D % NUM_LANES != 0:
        raise ValueError(
            f"head_dim {D} must be a multiple of {NUM_LANES} for the flash "
            "kernel (lane-broadcast-free bookkeeping); use the eager path")
    if scale is None:
        scale = D ** -0.5

    def fit_block(pref: int, S: int) -> int:
        # largest 128-multiple <= pref that divides S
        b = min(pref, S)
        while b >= NUM_LANES:
            if S % b == 0:
                return b
            b -= NUM_LANES
        raise ValueError(
            f"seq len {S} must be a multiple of {NUM_LANES}; pad upstream "
            "(ops.flash_attention_padded does this automatically)")

    block_q = fit_block(block_q, Sq)
    block_k = fit_block(block_k, Sk)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = _flash(qt, kt, vt, segment_ids, scale, causal, block_q, block_k,
               interpret)
    return o.transpose(0, 2, 1, 3)
