"""Parameter/batch sharding rules (GSPMD PartitionSpecs).

The ZeRO-3 + (absent) TP of the reference collapse into one mechanism
here: a rules table mapping parameter paths to PartitionSpecs over the
(data, fsdp, tensor) mesh (SURVEY.md §2.5). Unmatched parameters fall
back to sharding their largest divisible axis on ``fsdp`` (ZeRO-3
behavior: every parameter sharded somewhere, reference
configs/deepspeed/zero3.json:17-28).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over '/'-joined param path, spec WITHOUT the scan-layer axis).
# A leading scan axis (from nn.scan stacking) is detected by ndim
# mismatch and padded with None.
LLAMA_RULES: list[tuple[str, P]] = [
    (r"embed_tokens/embedding$",                      P("tensor", "fsdp")),
    # kernel(_q)? covers the int8/int4 serving layout ({kernel_q, scale})
    # so --tensor-parallel keeps sharding quantized weights
    (r"(q_proj|k_proj|v_proj|qkv_proj)(/base)?/kernel(_q)?$",
     P("fsdp", "tensor")),
    (r"o_proj(/base)?/kernel(_q)?$",                  P("tensor", "fsdp")),
    (r"(gate_proj|up_proj|gate_up_proj)(/base)?/kernel(_q)?$",
     P("fsdp", "tensor")),
    (r"down_proj(/base)?/kernel(_q)?$",               P("tensor", "fsdp")),
    (r"lm_head/kernel(_q)?$",                         P("fsdp", "tensor")),
    # quant scales live on the kernel's output (N) axis: int8 [N] and
    # int4 [K/G, N] both resolve via left-padding of a 1-entry spec
    (r"(q_proj|k_proj|v_proj|qkv_proj|gate_proj|up_proj|gate_up_proj"
     r"|lm_head)(/base)?/(scale|scale_g)$",           P("tensor")),
    (r"(o_proj|down_proj)(/base)?/scale$",            P("fsdp")),
    # int4 group scales [K/G, N] on the row-parallel reducers: the group
    # axis follows the kernel's K sharding (tensor) so the shard_map TP
    # dispatch slices them locally
    (r"(o_proj|down_proj)(/base)?/scale_g$",          P("tensor", "fsdp")),
    (r"lora_a$",                                      P("fsdp", None)),
    (r"lora_b$",                                      P(None, "fsdp")),
    (r"(input_layernorm|post_attention_layernorm|norm)/weight$", P()),
]

VISION_RULES: list[tuple[str, P]] = [
    (r"patch_embedding/kernel$",            P(None, None, None, "tensor")),
    (r"conv1/kernel$",                      P(None, None, None, "tensor")),
    (r"attn/(q_proj|k_proj|v_proj)/kernel$", P("fsdp", "tensor")),
    (r"attn/out_proj/kernel$",              P("tensor", "fsdp")),
    (r"mlp_fc/kernel$",                     P("fsdp", "tensor")),
    (r"mlp_proj/kernel$",                   P("tensor", "fsdp")),
    (r"(kv_proj)/kernel$",                  P("fsdp", "tensor")),
    (r"(ln_1|ln_2|ln_q|ln_kv|ln_pre|ln_post|post_layernorm)/(scale|bias)$",
     P()),
]

UNET_RULES: list[tuple[str, P]] = [
    (r"(to_q|to_k|to_v)(/base)?/kernel$",   P("fsdp", "tensor")),
    (r"to_out(/base)?/kernel$",             P("tensor", "fsdp")),
    (r"ff/proj/kernel$",                    P("fsdp", "tensor")),
    (r"ff/out/kernel$",                     P("tensor", "fsdp")),
    (r"(time_emb_proj|linear_[12])/kernel$", P()),
    (r"(norm[123]?|group_norm|conv_norm_out)/(scale|bias)$", P()),
]

DEFAULT_RULES = LLAMA_RULES + VISION_RULES + UNET_RULES


def _pad_spec(spec: P, ndim: int) -> Optional[P]:
    """Left-pad a spec with None for stacked (scan) leading axes; None if
    the spec can't fit."""
    if len(spec) > ndim:
        return None
    return P(*([None] * (ndim - len(spec)) + list(spec)))


def _fallback_spec(shape: tuple, mesh: Mesh) -> P:
    """ZeRO-3-style fallback: shard the largest axis divisible by the
    fsdp axis size; replicate small params."""
    fsdp = mesh.shape.get("fsdp", 1)
    if fsdp == 1 or int(np.prod(shape)) < 2 ** 14:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp == 0 and shape[i] >= fsdp:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def _check_divisible(shape: tuple, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        if dim % size != 0:
            return False
    return True


def infer_param_specs(params: Any, mesh: Mesh,
                      rules: list[tuple[str, P]] = None) -> Any:
    """Map a param pytree to PartitionSpecs by path-regex rules."""
    rules = rules if rules is not None else DEFAULT_RULES
    compiled = [(re.compile(pat), spec) for pat, spec in rules]

    def _path_str(path) -> str:
        parts = []
        for k in path:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    def spec_for(path, leaf) -> P:
        pathstr = _path_str(path)
        for rex, spec in compiled:
            if rex.search(pathstr):
                padded = _pad_spec(spec, leaf.ndim)
                if padded is not None and _check_divisible(
                        leaf.shape, padded, mesh):
                    return padded
        fb = _fallback_spec(leaf.shape, mesh)
        if not _check_divisible(leaf.shape, fb, mesh):
            return P()
        return fb

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh, specs: Any = None) -> Any:
    specs = specs if specs is not None else infer_param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params,
        specs)


def batch_sharding(mesh: Mesh, batch: Any) -> Any:
    """Shard batch arrays along their leading dim over the batch-like
    axes — (dcn_data, data, fsdp) — when divisible (fsdp also consumes
    batch — ZeRO shards the batch too; dcn_data is cross-slice data
    parallelism); replicate otherwise (tiny masks etc.)."""
    axes = tuple(a for a in ("dcn_data", "data", "fsdp")
                 if mesh.shape.get(a, 1) > 1) or ("data",)
    dp = 1
    for a in axes:
        dp *= mesh.shape.get(a, 1)

    def spec_for(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % dp == 0 \
                and x.shape[0] >= dp:
            return NamedSharding(mesh, P(axes))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, batch)
