"""Reference (pure-jnp) attention ops.

These are the numerically-authoritative implementations: the Pallas
kernels in ``flash_attention.py`` are parity-tested against them (the
TPU-native analogue of the reference's GPU↔NPU attention parity harness,
reference: mllm_npu/acceleration/{npu,gpu}.py and acceleration.md:35).

Conventions (TPU-friendly BSHD layout):
  q: [B, Sq, Hq, D]   k/v: [B, Sk, Hkv, D]   with Hq % Hkv == 0 (GQA/MQA)
  segment_ids: int32 [B, S]; tokens attend only within equal segment ids
  (this is the varlen/packing capability — the equivalent of
  flash_attn_varlen / npu_fusion_attention actual_seq_len, reference:
  mllm_npu/acceleration/npu.py:55-73).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_attention_mask(
    *,
    q_len: int,
    kv_len: int,
    causal: bool = False,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_offset: int | jax.Array = 0,
    dtype=jnp.bool_,
) -> Optional[jax.Array]:
    """Build a boolean [B?, q_len, kv_len] mask (True = attend)."""
    mask = None
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 0)
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_len), 1)
        mask = (q_idx + q_offset) >= kv_idx
    if q_segment_ids is not None:
        assert kv_segment_ids is not None
        seg = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        mask = seg if mask is None else (mask[None] & seg)
    elif mask is not None:
        mask = mask[None]
    return None if mask is None else mask.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "logits_soft_cap", "scale"),
)
def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    attn_mask: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_offset: int | jax.Array = 0,
    scale: Optional[float] = None,
    logits_soft_cap: Optional[float] = None,
) -> jax.Array:
    """Eager multi-head attention with GQA, causal and segment masking.

    ``attn_mask``: optional extra boolean mask, broadcastable to
    [B, Hq, Sq, Sk] (True = attend). Softmax in fp32 for stability.
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    assert Hq % Hkv == 0, f"GQA requires Hq % Hkv == 0, got {Hq} % {Hkv}"
    G = Hq // Hkv

    if scale is None:
        scale = D ** -0.5

    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # [B, Sq, Hkv, G, D] x [B, Sk, Hkv, D] -> [B, Hkv, G, Sq, Sk]
    # HIGHEST precision: this is the numerics oracle for kernel parity.
    qf = qf.reshape(B, Sq, Hkv, G, D)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf,
                        precision=jax.lax.Precision.HIGHEST)

    if logits_soft_cap is not None:
        logits = jnp.tanh(logits / logits_soft_cap) * logits_soft_cap

    mask = make_attention_mask(
        q_len=Sq,
        kv_len=Sk,
        causal=causal,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
        q_offset=q_offset,
    )
    if mask is not None:
        logits = jnp.where(mask[:, None, None] if mask.ndim == 3 else mask,
                           logits, DEFAULT_MASK_VALUE)
    if attn_mask is not None:
        # accept [B?, Sk] (key padding), [B?, H', Sq, Sk] with H' in
        # {1, Hkv, Hq}, or a full 5-D [B, Hkv, G, Sq, Sk]
        if attn_mask.ndim == 2:
            am = attn_mask[:, None, None, None, :]
        elif attn_mask.ndim == 4:
            Hm = attn_mask.shape[1]
            if Hm == Hq and Hq != Hkv:
                am = attn_mask.reshape(attn_mask.shape[0], Hkv, G,
                                       *attn_mask.shape[2:])
            else:
                am = attn_mask[:, :, None]
        else:
            am = attn_mask
        logits = jnp.where(am, logits, DEFAULT_MASK_VALUE)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, vf,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


def decode_attention(
    q: jax.Array,          # [B, 1, Hq, D]
    k: jax.Array,          # [B, Sk, Hkv, D] (cache dtype, e.g. bf16)
    v: jax.Array,
    attn_mask: jax.Array,  # broadcastable to [B, 1, 1, Sk] (True=attend)
    *,
    k_cur: Optional[jax.Array] = None,   # [B, 1, Hkv, D] current token
    v_cur: Optional[jax.Array] = None,
    blk_k: Optional[jax.Array] = None,   # [B, n, Hkv, D] block buffer
    blk_v: Optional[jax.Array] = None,
    blk_mask: Optional[jax.Array] = None,  # [B, n] valid block entries
    scale: Optional[float] = None,
) -> jax.Array:
    """Single-token cached-decode attention, bandwidth-lean.

    Unlike :func:`dot_product_attention` (the fp32-HIGHEST numerics
    oracle), this keeps k/v in their cache dtype — the decode loop
    streams the whole KV cache every step, and upcasting it to fp32
    first doubles that traffic. Logits accumulate in fp32 via
    ``preferred_element_type``; softmax in fp32.

    ``k_cur``/``v_cur`` append the current token's key/value as a
    virtual extra cache column (always attended: causal attention
    includes self). This lets the caller treat the cache as READ-ONLY
    during the layer pass and write the new column once, outside the
    layer scan — threading the written cache back out through scan ys
    restacks the entire [L,B,S,H,D] cache every decode step (~400us of
    pure copy per 100MB cache on v5e, the dominant decode cost).

    ``blk_k``/``blk_v``/``blk_mask`` append a small block-local buffer
    of keys decoded EARLIER IN THE CURRENT decode block (deferred
    cache-write mode: the big cache stays loop-invariant across a whole
    block scan and is scattered into once per block, so XLA carries it
    with zero per-step copies). ``blk_mask[b, j]`` is True iff buffer
    entry j holds a real key for row b (step already executed and the
    row was active).
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    # fp8 is a STORAGE dtype only: the bandwidth win is the cache READ
    # (already realized by the time k/v reach this function). Doing the
    # dot/softmax math in fp8 would quantize q and the probabilities to
    # 3 mantissa bits (probs < ~2^-9 flush to zero) for no extra HBM
    # savings — so compute in bf16 whenever the cache is 8-bit.
    comp_dtype = jnp.bfloat16 if jnp.dtype(k.dtype).itemsize == 1 \
        else k.dtype
    kc = k if k.dtype == comp_dtype else k.astype(comp_dtype)
    vc = v if v.dtype == comp_dtype else v.astype(comp_dtype)
    qg = (q.astype(jnp.float32) * scale).astype(comp_dtype)
    qg = qg.reshape(B, Sq, Hkv, G, D)
    logits = jnp.einsum("bqhgd,bkhd->bhgqk", qg, kc,
                        preferred_element_type=jnp.float32)
    am = jnp.broadcast_to(attn_mask, (B, 1, 1, Sk)) \
        .reshape(B, 1, 1, 1, Sk)
    logits = jnp.where(am, logits, DEFAULT_MASK_VALUE)
    splits = [Sk]
    if blk_k is not None:
        n = blk_k.shape[1]
        blk_logits = jnp.einsum(
            "bqhgd,bnhd->bhgqn", qg, blk_k.astype(comp_dtype),
            preferred_element_type=jnp.float32)       # [B,Hkv,G,1,n]
        bm = blk_mask.reshape(B, 1, 1, 1, n)
        blk_logits = jnp.where(bm, blk_logits, DEFAULT_MASK_VALUE)
        logits = jnp.concatenate([logits, blk_logits], axis=-1)
        splits.append(splits[-1] + n)
    if k_cur is not None:
        self_logit = jnp.einsum(
            "bqhgd,bshd->bhgqs", qg, k_cur.astype(comp_dtype),
            preferred_element_type=jnp.float32)       # [B,Hkv,G,Sq,W]
        W = k_cur.shape[1]
        if W > 1 or Sq > 1:
            # multi-token verify window (batched speculative decode):
            # query i is the window's i-th token — causal within the
            # window, every window key older-or-self for its query
            q_idx = jax.lax.broadcasted_iota(jnp.int32, (Sq, W), 0)
            w_idx = jax.lax.broadcasted_iota(jnp.int32, (Sq, W), 1)
            cm = (q_idx >= w_idx)[None, None, None]
            self_logit = jnp.where(cm, self_logit, DEFAULT_MASK_VALUE)
        logits = jnp.concatenate([logits, self_logit], axis=-1)
    probs = jax.nn.softmax(logits, axis=-1).astype(comp_dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs[..., :Sk], vc,
                     preferred_element_type=jnp.float32)
    if blk_k is not None:
        out = out + jnp.einsum(
            "bhgqn,bnhd->bqhgd", probs[..., Sk:splits[1]],
            blk_v.astype(comp_dtype), preferred_element_type=jnp.float32)
    if k_cur is not None:
        out = out + jnp.einsum(
            "bhgqs,bshd->bqhgd", probs[..., splits[-1]:],
            v_cur.astype(comp_dtype), preferred_element_type=jnp.float32)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)
