"""Fused/compiled compute ops for the TPU build.

``multi_head_attention`` is the single entry point models use; it picks
the Pallas flash kernel on TPU and the eager jnp reference elsewhere
(mirrors the reference's acceleration-recipe substitution layer,
reference: mllm_npu/acceleration/npu.py — but resolved automatically
instead of by hand-edited recipes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mllm_npu_tpu.ops.attention import dot_product_attention
from mllm_npu_tpu.ops.flash_attention import SegmentIds, flash_attention
from mllm_npu_tpu.ops.norms import layer_norm, rms_norm
from mllm_npu_tpu.ops.rope import apply_rope, rope_cos_sin

__all__ = [
    "SegmentIds",
    "apply_rope",
    "dot_product_attention",
    "flash_attention",
    "layer_norm",
    "multi_head_attention",
    "rms_norm",
    "rope_cos_sin",
]

_FLASH_MIN_SEQ = 128


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    segment_ids: Optional[SegmentIds] = None,
    attn_mask: Optional[jax.Array] = None,
    q_offset: int | jax.Array = 0,
    scale: Optional[float] = None,
    impl: str = "auto",   # auto | flash | eager
    interpret: bool = False,
) -> jax.Array:
    """BSHD attention with automatic kernel selection.

    Flash path requirements: no dense ``attn_mask`` (use segment_ids),
    q_offset == 0 (prefill/training), seq lens multiples of 128.
    """
    B, Sq, Hq, D = q.shape
    Sk = k.shape[1]
    use_flash = impl == "flash"
    if impl == "auto":
        use_flash = (
            (_on_tpu() or interpret)
            and attn_mask is None
            and isinstance(q_offset, int) and q_offset == 0
            and Sq >= _FLASH_MIN_SEQ
            and Sq % 128 == 0 and Sk % 128 == 0
            and D in (64, 128, 256)
        )
    if use_flash:
        return flash_attention(
            q, k, v, causal=causal, segment_ids=segment_ids, scale=scale,
            interpret=interpret,
        )
    return dot_product_attention(
        q, k, v, causal=causal, attn_mask=attn_mask,
        q_segment_ids=None if segment_ids is None else segment_ids.q,
        kv_segment_ids=None if segment_ids is None else segment_ids.kv,
        q_offset=q_offset, scale=scale,
    )
