"""Fused/compiled compute ops for the TPU build.

``multi_head_attention`` is the single entry point models use; it picks
the Pallas flash kernel on TPU and the eager jnp reference elsewhere
(mirrors the reference's acceleration-recipe substitution layer,
reference: mllm_npu/acceleration/npu.py — but resolved automatically
instead of by hand-edited recipes).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mllm_npu_tpu.ops.attention import (decode_attention,
                                        dot_product_attention)
from mllm_npu_tpu.ops.flash_attention import SegmentIds, flash_attention
from mllm_npu_tpu.ops.norms import layer_norm, rms_norm
from mllm_npu_tpu.ops.rope import apply_rope, rope_cos_sin

__all__ = [
    "SegmentIds",
    "flash_mesh",
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


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention_padded(q, k, v, *, causal=False, segment_ids=None,
                           scale=None, interpret=False):
    """Flash attention for awkward shapes: pads seq lens to multiples of
    128 (masking padding via segment ids) and the head dim to a lane
    multiple (zero-padding leaves logits/outputs unchanged; the explicit
    ``scale`` keeps softmax temperature at the true head dim). Lets the
    ViT towers (SigLIP S=729 D=72, Qwen S=1024 D=104) ride the kernel."""
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    if scale is None:
        scale = D ** -0.5
    Sq_p, Sk_p = _pad_to(Sq, 128), _pad_to(Sk, 128)
    D_p = max(_pad_to(D, 128), 128)

    def pad(x, S_p):
        return jnp.pad(x, ((0, 0), (0, S_p - x.shape[1]), (0, 0),
                           (0, D_p - D)))

    qp, kp, vp = pad(q, Sq_p), pad(k, Sk_p), pad(v, Sk_p)
    if segment_ids is not None:
        qseg = jnp.pad(segment_ids.q + 1, ((0, 0), (0, Sq_p - Sq)))
        kseg = jnp.pad(segment_ids.kv + 1, ((0, 0), (0, Sk_p - Sk)))
        seg = SegmentIds(q=qseg, kv=kseg)
    elif Sq_p != Sq or Sk_p != Sk:
        qseg = jnp.pad(jnp.ones((B, Sq), jnp.int32),
                       ((0, 0), (0, Sq_p - Sq)))
        kseg = jnp.pad(jnp.ones((B, Sk), jnp.int32),
                       ((0, 0), (0, Sk_p - Sk)))
        seg = SegmentIds(q=qseg, kv=kseg)
    else:
        # only the head dim was padded: zero-padded D lanes change
        # nothing, so skip the segment machinery (keeps the fast
        # unmasked kernel path)
        seg = None
    # non-causal vision/UNet shapes prefer 1024 blocks: fewer grid
    # programs amortize per-program DMA/scratch setup. Measured on v5e
    # at the SDXL self-attention shapes (on-device loop): S=1024 H20
    # 0.701 -> 0.637 ms, S=4096 H10 1.848 -> 1.685 ms (~9%); 2048
    # blocks exceed the 16 MB scoped-vmem budget (compile OOM). Causal
    # (train) shapes keep the 512 default — the causal block-skip
    # granularity is worth more there.
    bq = bk = 512 if causal else 1024
    out = flash_attention(qp, kp, vp, causal=causal, segment_ids=seg,
                          scale=scale, block_q=bq, block_k=bk,
                          interpret=interpret)
    return out[:, :Sq, :, :D]


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
    use_padded = False
    if impl == "auto":
        ok_base = ((_on_tpu() or interpret)
                   and attn_mask is None
                   and isinstance(q_offset, int) and q_offset == 0
                   and Sq >= _FLASH_MIN_SEQ)
        use_flash = (ok_base and Sq % 128 == 0 and Sk % 128 == 0
                     and D % 128 == 0)
        # awkward shapes (vision towers): pad into the kernel when the
        # padding FLOP waste is bounded. Measured on v5e: padded flash
        # beats XLA eager 1.85x at the Qwen-ViT shape (waste 1.23x) and
        # 1.7x even at the SigLIP shape (waste ~2x) — eager is memory-
        # bound on the fp32 S² logits, so FLOP waste is the wrong cost
        # model until ~2x.
        if ok_base and not use_flash:
            pad_waste = (_pad_to(Sq, 128) * _pad_to(Sk, 128)
                         * max(_pad_to(D, 128), 128)) / (Sq * Sk * D)
            use_padded = pad_waste <= 2.05
    if use_flash and (Sq % 128 or Sk % 128 or D % 128):
        # impl="flash" on an awkward shape: ride the padded wrapper
        use_flash, use_padded = False, True
    if use_flash or use_padded:
        fn = flash_attention if use_flash else flash_attention_padded
        call = functools.partial(fn, causal=causal, scale=scale,
                                 interpret=interpret)
        sharded = _shard_mapped_flash(call, q, k, v, segment_ids)
        if sharded is not None:
            return sharded
        return call(q, k, v, segment_ids=segment_ids)
    return dot_product_attention(
        q, k, v, causal=causal, attn_mask=attn_mask,
        q_segment_ids=None if segment_ids is None else segment_ids.q,
        kv_segment_ids=None if segment_ids is None else segment_ids.kv,
        q_offset=q_offset, scale=scale,
    )


# -- mesh-aware dispatch ------------------------------------------------------
#
# pallas_call is opaque to GSPMD: inside a pjit'd step on a real multi-chip
# mesh the compiler would replicate its operands (an all-gather of Q/K/V per
# layer!). jax requires pallas kernels to run under Manual axes, i.e. inside
# shard_map. `flash_mesh(mesh)` makes multi_head_attention wrap the kernel in
# shard_map with batch/head sharding; compile_train_step enters it during
# tracing. Single-device meshes and non-divisible shapes fall through to the
# plain call.

_FLASH_MESH_STACK: list = []


@contextlib.contextmanager
def flash_mesh(mesh, batch_axes=("dcn_data", "data", "fsdp"),
               head_axis=("tensor", "seq")):
    """Route flash-attention calls through shard_map over `mesh` while
    tracing (batch on `batch_axes`, heads on `head_axis` — attention
    heads shard over BOTH the tensor axis and the Ulysses `seq` axis:
    inside attention each device holds the full sequence for a head
    subset, the Ulysses layout)."""
    head_axis = (head_axis,) if isinstance(head_axis, str) else \
        tuple(head_axis)
    _FLASH_MESH_STACK.append((mesh, tuple(batch_axes), head_axis))
    try:
        yield
    finally:
        _FLASH_MESH_STACK.pop()


def constrain_seq(x, *, seq_dim: int = 1):
    """Ulysses sequence parallelism: constrain an activation
    [batch, S, hidden] to be sequence-sharded on the mesh's `seq` axis
    between layers (GSPMD inserts the head<->sequence all-to-alls around
    each attention). No-op without an active flash_mesh or with seq=1.
    """
    if not _FLASH_MESH_STACK:
        return x
    mesh, batch_axes, _ = _FLASH_MESH_STACK[-1]
    if mesh is None:
        return x
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if sizes.get("seq", 1) <= 1:
        return x
    if x.shape[seq_dim] % sizes["seq"] != 0:
        return x
    from jax.sharding import NamedSharding
    b_axes = tuple(a for a in batch_axes if sizes.get(a, 1) > 1) or None
    if b_axes:
        bsz = 1
        for a in b_axes:
            bsz *= sizes[a]
        if x.shape[0] % bsz != 0:
            b_axes = None
    spec = [None] * x.ndim
    spec[0] = b_axes
    spec[seq_dim] = "seq"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))


def _shard_mapped_flash(call, q, k, v, segment_ids):
    if not _FLASH_MESH_STACK:
        return None
    mesh, batch_axes, head_axes = _FLASH_MESH_STACK[-1]
    if mesh is None:
        return None
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    b_axes = tuple(a for a in batch_axes if sizes.get(a, 1) > 1)
    bsz = 1
    for a in b_axes:
        bsz *= sizes[a]
    h_axes = tuple(a for a in head_axes if sizes.get(a, 1) > 1)
    hsz = 1
    for a in h_axes:
        hsz *= sizes[a]
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[2]
    use_b = bsz > 1 and B % bsz == 0
    use_h = hsz > 1 and Hq % hsz == 0 and Hkv % hsz == 0
    if not (use_b or use_h):
        if bsz == 1 and hsz == 1:
            return None     # single-device mesh: plain call is fine
        # multi-device mesh but unshardable shapes: still must run under
        # Manual axes — replicate (correct, not fast; callers should
        # keep B divisible)
        b_axes = ()
        use_h = False
    bspec = b_axes if (use_b and b_axes) else None
    hspec = h_axes if use_h else None
    qkv_spec = P(bspec, None, hspec, None)
    seg_spec = SegmentIds(q=P(bspec, None), kv=P(bspec, None)) \
        if segment_ids is not None else None

    if segment_ids is None:
        def local(q, k, v):
            return call(q, k, v, segment_ids=None)
        in_specs = (qkv_spec, qkv_spec, qkv_spec)
        args = (q, k, v)
    else:
        def local(q, k, v, seg):
            return call(q, k, v, segment_ids=seg)
        in_specs = (qkv_spec, qkv_spec, qkv_spec, seg_spec)
        args = (q, k, v, segment_ids)
    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=qkv_spec, check_vma=False)
    return fn(*args)
