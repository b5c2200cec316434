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
  * causal: KV blocks above the diagonal are predicated off with
    ``pl.when`` AND their index maps are clamped to the diagonal block,
    so the skipped steps re-address the previous block and Mosaic elides
    the DMA — no HBM traffic for masked-out blocks.
  * base-2 softmax: log2(e)·scale is folded into q on the way in (one
    fused HBM pass) and ``exp2`` replaces ``exp`` — kills the per-block
    `s *= scale` pass and the multiply inside exp's lowering.
  * full/partial block specialization: interior blocks (fully below the
    diagonal, no segment boundary possible ruled out only when packing
    is off) skip mask construction entirely; boundary blocks apply the
    mask as a 0/1 *multiply after exp2* — one pass, and fully-masked
    rows degrade to l == 0 (handled) instead of exp(0) == 1 garbage.
  * lse and the backward's delta are carried as narrow [B, H, S] f32
    (widened to 128 lanes only in VMEM scratch) — the wide HBM form
    cost ~256 MB of traffic per layer-step at the 8B train shape.
  * fp32 accumulation; bf16/fp32 inputs.
  * backward = two kernels (dQ; dKV) using the saved logsumexp plus a
    precomputed ``delta = rowsum(dO * O)``, per the FA2 paper.

Numerics are parity-tested against ``ops.attention.dot_product_attention``
in tests/test_flash_attention.py (the analogue of the reference's
cross-backend attention parity harness, acceleration/acceleration.md:35).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


class SegmentIds(NamedTuple):
    q: jax.Array   # int32 [B, Sq]
    kv: jax.Array  # int32 [B, Sk]


def _attention_cost(B, Hq, Sq, Sk, D, causal, n_dots):
    """Scheduler hint (the official kernels pass one too; it measurably
    helps Mosaic's pipelining at the 512-block train shapes)."""
    frac = 0.5 if causal else 1.0
    return pl.CostEstimate(
        flops=int(n_dots * 2 * B * Hq * Sq * Sk * D * frac),
        transcendentals=int(B * Hq * Sq * Sk * frac),
        bytes_accessed=int(2 * B * Hq * Sq * D * 2 + 2 * B * Sk * D * 2),
    )


def _widen8(x8):
    """[bq, 8] -> [bq, 128] lane replication via the MXU (a vector tile
    from 8 to 128 lanes lowers to a pathological ~2.5us Mosaic relayout;
    one tiny matmul against a constant 0.125-filled [8,128] is ~free —
    all 8 lanes are equal, so the 0.125-weighted sum is the identity)."""
    ones = jnp.full((8, NUM_LANES), 0.125, jnp.float32)
    return jax.lax.dot(x8, ones, preferred_element_type=jnp.float32)


def _narrow8(x_wide):
    """[bq, 128] (lanes equal) -> [bq, 8] via the MXU, avoiding the
    reverse lane-slice relayout."""
    sel = jnp.full((NUM_LANES, 8), 1.0 / NUM_LANES, jnp.float32)
    return jax.lax.dot(x_wide, sel, preferred_element_type=jnp.float32)


def _below_or_on_diag(qi, bq, ki, bk):
    return (qi + 1) * bq - 1 >= ki * bk


def _block_fully_visible(qi, bq, ki, bk):
    # every (row, col) pair in the block satisfies row >= col
    return (ki + 1) * bk - 1 <= qi * bq


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, causal, block_q, block_k, num_kv_blocks, packed,
                save_lse=True, inkernel_scale=None):
    """q arrives pre-scaled by scale·log2(e) (or `inkernel_scale` is the
    scale·log2(e) factor to apply to the logits tile in-kernel — cheaper
    when Sq is small relative to D); softmax runs in base 2."""
    ki = pl.program_id(3)
    qi = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    should_run = True
    needs_mask_dyn = packed
    if causal:
        should_run = _below_or_on_diag(qi, block_q, ki, block_k)
        needs_mask_dyn = jnp.logical_or(
            needs_mask_dyn,
            jnp.logical_not(_block_fully_visible(qi, block_q, ki, block_k)))

    def body(masked: bool):
        q = q_ref[0, 0]  # [bq, D], pre-scaled
        k = k_ref[0, 0]  # [bk, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if inkernel_scale is not None:
            s *= inkernel_scale

        # PERF-CRITICAL: m/l scratch keep ALL 128 lanes equal so every
        # broadcast below is jnp.tile of a full vreg. Lane-slices like
        # m[:, :1] force a Mosaic lane-broadcast relayout that measured
        # 13x slower end-to-end on v5e.
        m_prev = m_scr[...]                # [bq, 128] (lanes equal)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]              # [bq, 1]
        m_next = jnp.maximum(m_prev, m_curr)              # [bq, 128]
        p = jnp.exp2(s - jnp.tile(m_next, (1, block_k // NUM_LANES)))
        if masked:
            # 0/1 multiply AFTER exp2: one fused pass, and fully-masked
            # rows yield l == 0 instead of exp(0) == 1 garbage.
            mask = None
            if packed:
                rep = block_k // NUM_LANES
                qseg = jnp.tile(qseg_ref[0], (1, rep))       # [bq, bk]
                kseg = kseg_ref[0, :1, :]                    # [1, bk]
                mask = qseg == kseg
            if causal:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                cmask = (rows + qi * block_q) >= (cols + ki * block_k)
                mask = cmask if mask is None \
                    else jnp.logical_and(mask, cmask)
            p *= mask.astype(p.dtype)
        alpha = jnp.exp2(m_prev - m_next)                 # [bq, 128]
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

    if packed or causal:
        @pl.when(jnp.logical_and(should_run, needs_mask_dyn))
        def _masked():
            body(masked=True)

        @pl.when(jnp.logical_and(should_run,
                                 jnp.logical_not(needs_mask_dyn)))
        def _full():
            body(masked=False)
    else:
        body(masked=False)

    @pl.when(ki == num_kv_blocks - 1)
    def _finish():
        o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)
        if save_lse:
            l = l_scr[...]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            # natural-log lse, narrow [bq, 8] (empty rows → 0.0: bwd
            # then sees p = exp2(-huge - 0) == 0 — zero grads, no NaNs)
            lse = (m_scr[...] + jnp.log2(l_safe)) * LN2
            lse = jnp.where(l == 0.0, 0.0, lse)
            lse_ref[0, 0] = _narrow8(lse)


def _causal_kv_index(qi, ki, block_q, block_k, num_kv_blocks):
    """Clamp the kv block index to the last needed block for this q row
    so skipped (above-diagonal) steps re-fetch nothing."""
    last = jax.lax.div((qi + 1) * block_q - 1, block_k)
    return jnp.minimum(ki, jnp.minimum(last, num_kv_blocks - 1))


def _fwd(q, k, v, segment_ids, scale, causal, block_q, block_k, interpret,
         save_lse=True):
    B, Hq, Sq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    grid = (B, Hq, Sq // block_q, Sk // block_k)
    nkv = grid[3]
    packed = segment_ids is not None

    kv_head = lambda h: h * Hkv // Hq
    if causal:
        def kv_idx(b, h, qi, ki):
            return (b, kv_head(h),
                    _causal_kv_index(qi, ki, block_q, block_k, nkv), 0)

        def kseg_idx(b, h, qi, ki):
            return (b, 0, _causal_kv_index(qi, ki, block_q, block_k, nkv))
    else:
        def kv_idx(b, h, qi, ki):
            return (b, kv_head(h), ki, 0)

        def kseg_idx(b, h, qi, ki):
            return (b, 0, ki)

    # fold softmax scale and the base-2 conversion into q (one fused
    # HBM pass over q) — unless the logits tiles are smaller than q
    # itself (short-seq/decode-ish shapes), where an in-kernel multiply
    # is cheaper
    s_work = Sq * (0.5 if causal else 1.0)
    inkernel_scale = None
    if s_work < D:
        inkernel_scale = scale * LOG2E
    else:
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, D), kv_idx),
        pl.BlockSpec((1, 1, block_k, D), kv_idx),
    ]
    args = [q, k, v]
    if packed:
        qseg = jnp.broadcast_to(segment_ids.q[:, :, None].astype(jnp.int32),
                                (B, Sq, NUM_LANES))
        kseg = jnp.broadcast_to(segment_ids.kv[:, None, :].astype(jnp.int32),
                                (B, 8, Sk))
        in_specs += [
            pl.BlockSpec((1, block_q, NUM_LANES),
                         lambda b, h, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 8, block_k), kseg_idx),
        ]
        args += [qseg, kseg]
    else:
        in_specs += [None, None]
        args += [None, None]

    kernel = functools.partial(
        _fwd_kernel, causal=causal,
        block_q=block_q, block_k=block_k, num_kv_blocks=nkv,
        packed=packed, save_lse=save_lse, inkernel_scale=inkernel_scale,
    )
    # pallas_call can't take None inputs; filter them while keeping kernel arity
    live = [a is not None for a in args]
    kernel_wrapped = _wrap_optional(kernel, live)
    if not save_lse:
        # no lse output ref: insert a None placeholder after o_ref
        inner = kernel_wrapped

        def kernel_wrapped(*refs):  # noqa: F811
            n_in = sum(live)
            return inner(*refs[:n_in + 1], None, *refs[n_in + 1:])

    outs = pl.pallas_call(
        kernel_wrapped,
        grid=grid,
        in_specs=[s for s in in_specs if s is not None],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 8),
                         lambda b, h, qi, ki: (b, h, qi, 0)),
        ][: 2 if save_lse else 1] if True else None,
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sq, 8), jnp.float32),
        ][: 2 if save_lse else 1],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # NOTE: do NOT raise vmem_limit_bytes here — oversizing the
            # scoped-VMEM limit degrades Mosaic's pipelining (measured
            # 669us -> 481us at the 8B train shape just by removing it)
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=_attention_cost(B, Hq, Sq, Sk, D, causal, n_dots=2),
        interpret=interpret,
    )(*[a for a in args if a is not None])
    if not save_lse:
        return outs[0], None
    return outs


def _wrap_optional(kernel, live):
    """Adapt a kernel with optional (None) input refs to pallas_call arity."""

    def wrapped(*refs):
        ins = []
        it = iter(refs[: sum(live)])
        for is_live in live:
            ins.append(next(it) if is_live else None)
        rest = refs[sum(live):]
        return kernel(*ins, *rest)

    return wrapped


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                   qseg_ref, kseg_ref,
                   dq_ref, dq_scr, lse_scr, di_scr,
                   *, scale, causal, block_q, block_k, num_kv_blocks,
                   packed):
    """q pre-scaled by scale·log2(e); lse arrives in base-2 units."""
    ki = pl.program_id(3)
    qi = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)
        # widen narrow [bq, 8] lse/delta across lanes ONCE per q block
        lse_scr[...] = _widen8(lse_ref[0, 0])
        di_scr[...] = _widen8(di_ref[0, 0])

    should_run = True
    needs_mask_dyn = packed
    if causal:
        should_run = _below_or_on_diag(qi, block_q, ki, block_k)
        needs_mask_dyn = jnp.logical_or(
            needs_mask_dyn,
            jnp.logical_not(_block_fully_visible(qi, block_q, ki, block_k)))

    def body(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_scr[...]    # [bq, 128], lanes equal, base-2
        di = di_scr[...]      # [bq, 128], lanes equal

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        rep = block_k // NUM_LANES
        p = jnp.exp2(s - jnp.tile(lse, (1, rep)))   # [bq, bk]
        if masked:
            mask = None
            if packed:
                qseg = jnp.tile(qseg_ref[0], (1, rep))
                kseg = kseg_ref[0, :1, :]
                mask = qseg == kseg
            if causal:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                cmask = (rows + qi * block_q) >= (cols + ki * block_k)
                mask = cmask if mask is None \
                    else jnp.logical_and(mask, cmask)
            p *= mask.astype(p.dtype)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.tile(di, (1, rep))) * scale
        dq_scr[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                   preferred_element_type=jnp.float32)

    if packed or causal:
        @pl.when(jnp.logical_and(should_run, needs_mask_dyn))
        def _masked():
            body(masked=True)

        @pl.when(jnp.logical_and(should_run,
                                 jnp.logical_not(needs_mask_dyn)))
        def _full():
            body(masked=False)
    else:
        body(masked=False)

    @pl.when(ki == num_kv_blocks - 1)
    def _finish():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                    qseg_ref, kseg_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale, causal, block_q, block_k, num_q_blocks,
                    q_per_kv, packed):
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
    needs_mask_dyn = packed
    if causal:
        should_run = _below_or_on_diag(qi, block_q, ki, block_k)
        needs_mask_dyn = jnp.logical_or(
            needs_mask_dyn,
            jnp.logical_not(_block_fully_visible(qi, block_q, ki, block_k)))

    def body(masked: bool):
        q = q_ref[0, 0]       # pre-scaled by scale·log2(e)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]

        # kv-major layout: everything is computed transposed ([bk, bq])
        # so ALL four big matmuls contract in native MXU orientation —
        # the q-major form needed transposed-LHS contractions for dk/dv
        # (dim-0/dim-0), which cost a Mosaic relayout of p/ds per step.
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # widen the narrow [bq, 8] lse/delta DIRECTLY into [bk, bq] rows
        # via one narrow-K matmul each (ones[bk,8]·(1/8) @ lse8^T): each
        # output row is the lse vector — no lane/sublane relayout.
        ones8 = jnp.full((block_k, 8), 0.125, jnp.float32)
        lse_t = jax.lax.dot_general(ones8, lse_ref[0, 0],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        di_t = jax.lax.dot_general(ones8, di_ref[0, 0],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        pt = jnp.exp2(st - lse_t)                    # [bk, bq]
        if masked:
            mask = None
            if packed:
                rep = block_q // NUM_LANES
                kseg = jnp.tile(kseg_ref[0], (1, rep))      # [bk, bq]
                qseg = qseg_ref[0, :1, :]                   # [1, bq]
                mask = kseg == qseg
            if causal:
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (block_k, block_q), 0)       # k index
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (block_k, block_q), 1)       # q index
                cmask = (cols + qi * block_q) >= (rows + ki * block_k)
                mask = cmask if mask is None \
                    else jnp.logical_and(mask, cmask)
            pt *= mask.astype(pt.dtype)
        # dv += p^T @ do  — native: [bk, bq] @ [bq, D]
        dv_scr[...] += jax.lax.dot(pt.astype(do.dtype), do,
                                   preferred_element_type=jnp.float32)
        # dp^T = v @ do^T — native RHS-transposed: [bk, D] · [bq, D]^T
        dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        # dk needs plain q but the ref holds q·c (c = scale·log2(e)):
        # fold the 1/c into ds — ds_dk = p·(dp-di)·scale/c = ·ln2 — so
        # dk = ds_dk^T @ (q·c) lands true-scaled with no epilogue pass.
        dst = pt * (dpt - di_t) * LN2                # [bk, bq]
        dk_scr[...] += jax.lax.dot(dst.astype(q.dtype), q,
                                   preferred_element_type=jnp.float32)

    if packed or causal:
        @pl.when(jnp.logical_and(should_run, needs_mask_dyn))
        def _masked():
            body(masked=True)

        @pl.when(jnp.logical_and(should_run,
                                 jnp.logical_not(needs_mask_dyn)))
        def _full():
            body(masked=False)
    else:
        body(masked=False)

    @pl.when(t == num_q_blocks * q_per_kv - 1)
    def _finish():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd(residuals, do, *, scale, causal, block_q, block_k, interpret):
    q, k, v, segment_ids, o, lse = residuals
    B, Hq, Sq, D = q.shape
    _, Hkv, Sk, _ = k.shape
    G = Hq // Hkv
    packed = segment_ids is not None
    c = scale * LOG2E

    # pre-scale q and convert lse to base-2 (narrow [B, H, S, 8] f32)
    q_scaled = (q.astype(jnp.float32) * c).astype(q.dtype)
    lse2 = lse * LOG2E
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.broadcast_to(di[..., None], (B, Hq, Sq, 8))

    kv_head = lambda h: h * Hkv // Hq

    qseg3 = kseg_sub = qseg_sub = kseg3 = None
    if packed:
        qseg3 = jnp.broadcast_to(
            segment_ids.q[:, :, None].astype(jnp.int32), (B, Sq, NUM_LANES))
        kseg_sub = jnp.broadcast_to(
            segment_ids.kv[:, None, :].astype(jnp.int32), (B, 8, Sk))
        # transposed orientation for the kv-major dKV kernel
        qseg_sub = jnp.broadcast_to(
            segment_ids.q[:, None, :].astype(jnp.int32), (B, 8, Sq))
        kseg3 = jnp.broadcast_to(
            segment_ids.kv[:, :, None].astype(jnp.int32), (B, Sk, NUM_LANES))

    nkv = Sk // block_k
    nq = Sq // block_q

    # ---- dQ: grid (B, Hq, nq, nk)
    if causal:
        def kv_idx(b, h, qi, ki):
            return (b, kv_head(h),
                    _causal_kv_index(qi, ki, block_q, block_k, nkv), 0)

        def kseg_idx(b, h, qi, ki):
            return (b, 0, _causal_kv_index(qi, ki, block_q, block_k, nkv))
    else:
        def kv_idx(b, h, qi, ki):
            return (b, kv_head(h), ki, 0)

        def kseg_idx(b, h, qi, ki):
            return (b, 0, ki)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, D), kv_idx),
        pl.BlockSpec((1, 1, block_k, D), kv_idx),
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_q, 8), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_q, 8), lambda b, h, qi, ki: (b, h, qi, 0)),
    ]
    args = [q_scaled, k, v, do, lse2, di]
    if packed:
        in_specs += [
            pl.BlockSpec((1, block_q, NUM_LANES),
                         lambda b, h, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 8, block_k), kseg_idx),
        ]
        args += [qseg3, kseg_sub]
    else:
        in_specs += [None, None]
        args += [None, None]

    kern = functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                             block_q=block_q, block_k=block_k,
                             num_kv_blocks=nkv, packed=packed)
    live = [a is not None for a in args]
    dq = pl.pallas_call(
        _wrap_optional(kern, live),
        grid=(B, Hq, nq, nkv),
        in_specs=[s for s in in_specs if s is not None],
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=_attention_cost(B, Hq, Sq, Sk, D, causal, n_dots=3),
        interpret=interpret,
    )(*[a for a in args if a is not None])

    # ---- dKV: grid (B, Hkv, nk, nq*G); the inner dim sweeps
    # (q-block, group-head) so dk/dv land per KV head directly.
    # For causal, q blocks strictly above the needed range re-address the
    # first needed block (no DMA for skipped steps).
    def q_blk_raw(t):
        return t // G

    if causal:
        def q_blk(ki, t):
            first = jax.lax.div(ki * block_k, block_q)
            return jnp.maximum(t // G, jnp.minimum(first, nq - 1))
    else:
        def q_blk(ki, t):
            return t // G

    def q_head(h, t):
        return h * G + t % G

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D),
                     lambda b, h, ki, t: (b, q_head(h, t), q_blk(ki, t), 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, ki, t: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, ki, t: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, block_q, D),
                     lambda b, h, ki, t: (b, q_head(h, t), q_blk(ki, t), 0)),
        pl.BlockSpec((1, 1, block_q, 8),
                     lambda b, h, ki, t: (b, q_head(h, t), q_blk(ki, t), 0)),
        pl.BlockSpec((1, 1, block_q, 8),
                     lambda b, h, ki, t: (b, q_head(h, t), q_blk(ki, t), 0)),
    ]
    args = [q_scaled, k, v, do, lse2, di]
    if packed:
        in_specs += [
            pl.BlockSpec((1, 8, block_q),
                         lambda b, h, ki, t: (b, 0, q_blk(ki, t))),
            pl.BlockSpec((1, block_k, NUM_LANES),
                         lambda b, h, ki, t: (b, ki, 0)),
        ]
        args += [qseg_sub, kseg3]
    else:
        in_specs += [None, None]
        args += [None, None]

    # dk = ds^T @ q_scaled has an extra factor c folded into q; divide it
    # back out of the result (cheap [B,Hkv,S,D] pass, fused by XLA).
    kern = functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                             block_q=block_q, block_k=block_k,
                             num_q_blocks=nq, q_per_kv=G, packed=packed)
    live = [a is not None for a in args]
    dk, dv = pl.pallas_call(
        _wrap_optional(kern, live),
        grid=(B, Hkv, nkv, nq * G),
        in_specs=[s for s in in_specs if s is not None],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, ki, t: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, D),
                         lambda b, h, ki, t: (b, h, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Sk, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Sk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=_attention_cost(B, Hq, Sq, Sk, D, causal, n_dots=4),
        interpret=interpret,
    )(*[a for a in args if a is not None])

    return dq, dk, dv, None


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, segment_ids, scale, causal, block_q, block_k, interpret):
    # no-grad path: skip the lse output entirely (finish-step narrowing
    # measured ~35% of fwd time at decode-ish shapes with one kv block)
    o, _ = _fwd(q, k, v, segment_ids, scale, causal, block_q, block_k,
                interpret, save_lse=False)
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
    block_q: int = 512,
    block_k: int = 512,
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
