"""Torch-checkpoint → Flax parameter conversion (weight interop).

Loads reference-format checkpoints (HF Llama / SigLIP, qwen_vit_G.pt,
SEED-X pytorch_model.bin — reference pretrained/weight.md) into this
package's Flax parameter trees:

- nn.Linear weight [out, in] → kernel [in, out] (transposed)
- nn.Conv2d weight [out, in, kh, kw] → Conv kernel [kh, kw, in, out]
- torch MultiheadAttention in_proj_weight [3E, E] → split q/k/v kernels
- scan-stacked decoder layers: per-layer tensors stacked on axis 0
- vocab-resize with mean-init of new rows (reference
  peft_models.py:56-99: new input rows = mean of old, new output rows =
  3 × mean of old)
- ``remove_mismatched_weights`` semantics: shape-mismatched tensors are
  dropped with a warning instead of failing (reference utils.py:138-148)
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def _t(x) -> np.ndarray:
    import torch
    if isinstance(x, torch.Tensor):
        return x.detach().to(torch.float32).cpu().numpy()
    return np.asarray(x, np.float32)


def load_torch_file(path: str) -> Dict[str, Any]:
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)


def resize_embedding(emb: np.ndarray, new_vocab: int,
                     mean_mult: float = 1.0) -> np.ndarray:
    """Pad rows to new_vocab with mean_mult * mean(old rows)
    (reference peft_models.py:56-99)."""
    old_vocab, dim = emb.shape
    if new_vocab <= old_vocab:
        return emb[:new_vocab]
    mean = emb.mean(axis=0, keepdims=True) * mean_mult
    pad = np.repeat(mean, new_vocab - old_vocab, axis=0)
    return np.concatenate([emb, pad], axis=0)


# ---------------------------------------------------------------------------
# Llama
# ---------------------------------------------------------------------------

def torch_to_flax_llama(sd: Dict[str, Any], config,
                        vocab_size: Optional[int] = None) -> dict:
    """HF Llama state_dict → our LlamaForCausalLM params['params'].

    Handles both plain and LoRA-augmented targets (base/kernel) and both
    scan-stacked and per-layer ('layers_i') layouts per config.
    """
    L = config.num_hidden_layers
    lora = config.lora_rank > 0
    p = lambda w: np.ascontiguousarray(_t(w))

    def linear(key):
        return p(sd[key]).T  # [out,in] -> [in,out]

    def maybe_base(d: dict, name: str) -> dict:
        # LoRADense nests the frozen kernel under 'base'; only modules in
        # lora_targets are LoRA-wrapped (llama.py _dense_factory)
        return {"base": d} if lora and name in config.lora_targets else d

    def stack(keys_fmt: str, transform):
        return np.stack([transform(keys_fmt.format(i)) for i in range(L)])

    prefix = "model."
    if not any(k.startswith("model.") for k in sd):
        prefix = ""

    emb = p(sd[f"{prefix}embed_tokens.weight"])
    if vocab_size is not None and vocab_size != emb.shape[0]:
        emb = resize_embedding(emb, vocab_size, 1.0)

    def layer_tree(i_fmt):
        def lin(name):
            return stack(f"{prefix}layers.{{}}.{name}.weight", linear)
        attn = {
            n: maybe_base({"kernel": lin(f"self_attn.{n}")}, n)
            for n in ("q_proj", "k_proj", "v_proj", "o_proj")
        }
        mlp = {
            n: maybe_base({"kernel": lin(f"mlp.{n}")}, n)
            for n in ("gate_proj", "up_proj", "down_proj")
        }
        norms = {
            "input_layernorm": {"weight": stack(
                f"{prefix}layers.{{}}.input_layernorm.weight", lambda k: p(sd[k]))},
            "post_attention_layernorm": {"weight": stack(
                f"{prefix}layers.{{}}.post_attention_layernorm.weight",
                lambda k: p(sd[k]))},
        }
        return {"self_attn": attn, "mlp": mlp, **norms}

    if lora:
        def add_lora(tree, mod, in_dim, out_dim):
            """Trained adapters from the checkpoint when present (peft
            'lora_A.weight' [r,in] / 'lora_B.weight' [out,r], normalized
            by the callers from '.lora_A.default.weight'); otherwise
            fresh peft-style init (A he-uniform, B zero)."""
            a_key = f"{prefix}layers.0.{mod}.lora_A.weight"
            if a_key in sd:
                tree["lora_a"] = stack(
                    f"{prefix}layers.{{}}.{mod}.lora_A.weight", linear)
                tree["lora_b"] = stack(
                    f"{prefix}layers.{{}}.{mod}.lora_B.weight", linear)
                return
            tree["lora_a"] = np.stack([
                np.random.RandomState(1234 + i).uniform(
                    -1, 1, (in_dim, config.lora_rank)).astype(np.float32)
                * (3.0 / in_dim) ** 0.5 for i in range(L)])
            tree["lora_b"] = np.zeros(
                (L, config.lora_rank, out_dim), np.float32)

    layers = layer_tree(None)
    if lora:
        H, Hkv, D = (config.num_attention_heads, config.num_key_value_heads,
                     config.head_dim)
        hs, inter = config.hidden_size, config.intermediate_size
        dims = {"q_proj": (hs, H * D), "k_proj": (hs, Hkv * D),
                "v_proj": (hs, Hkv * D), "o_proj": (H * D, hs)}
        for name, (i_dim, o_dim) in dims.items():
            if name in config.lora_targets:
                add_lora(layers["self_attn"][name],
                         f"self_attn.{name}", i_dim, o_dim)
        for name, (i_dim, o_dim) in {
                "gate_proj": (hs, inter), "up_proj": (hs, inter),
                "down_proj": (inter, hs)}.items():
            if name in config.lora_targets:
                add_lora(layers["mlp"][name], f"mlp.{name}", i_dim, o_dim)

    tree = {
        "model": {
            "embed_tokens": {"embedding": emb},
            "layers": layers,
            "norm": {"weight": p(sd[f"{prefix}norm.weight"])},
        }
    }
    if not config.scan_layers:
        # unstack into layers_i
        import jax
        stacked = tree["model"].pop("layers")
        for i in range(L):
            tree["model"][f"layers_{i}"] = jax.tree_util.tree_map(
                lambda x, i=i: x[i], stacked)
    if not config.tie_word_embeddings:
        head_key = "lm_head.weight"
        if head_key in sd:
            head = p(sd[head_key])
        else:
            head = p(sd[f"{prefix}embed_tokens.weight"])
        if vocab_size is not None and vocab_size != head.shape[0]:
            head = resize_embedding(head, vocab_size, 3.0)
        tree["lm_head"] = {"kernel": head.T}
    return tree


# ---------------------------------------------------------------------------
# SigLIP vision tower (HF SiglipVisionModel)
# ---------------------------------------------------------------------------

def torch_to_flax_siglip(sd: Dict[str, Any], config) -> dict:
    p = lambda k: _t(sd[k])
    pre = "vision_model."
    if not any(k.startswith(pre) for k in sd):
        # maybe nested under 'vision_model.vision_model.' (the reference
        # wrapper) — find the right prefix
        cands = [k for k in sd if "patch_embedding.weight" in k]
        assert cands, f"no siglip keys in checkpoint: {list(sd)[:5]}"
        pre = cands[0].split("embeddings")[0]

    L = config.num_hidden_layers

    def lin(fmt, i):
        return {"kernel": p(fmt.format(i) + ".weight").T,
                "bias": p(fmt.format(i) + ".bias")}

    def stackl(fmt):
        ws = [lin(fmt, i) for i in range(L)]
        return {"kernel": np.stack([w["kernel"] for w in ws]),
                "bias": np.stack([w["bias"] for w in ws])}

    def stackln(fmt):
        return {"scale": np.stack([p(fmt.format(i) + ".weight")
                                   for i in range(L)]),
                "bias": np.stack([p(fmt.format(i) + ".bias")
                                  for i in range(L)])}

    enc = f"{pre}encoder.layers.{{}}"
    blocks = {
        "attn": {
            "q_proj": stackl(enc + ".self_attn.q_proj"),
            "k_proj": stackl(enc + ".self_attn.k_proj"),
            "v_proj": stackl(enc + ".self_attn.v_proj"),
            "out_proj": stackl(enc + ".self_attn.out_proj"),
        },
        "ln_1": stackln(enc + ".layer_norm1"),
        "ln_2": stackln(enc + ".layer_norm2"),
        "mlp_fc": stackl(enc + ".mlp.fc1"),
        "mlp_proj": stackl(enc + ".mlp.fc2"),
    }
    conv_w = p(f"{pre}embeddings.patch_embedding.weight")  # [out,in,kh,kw]
    tree = {
        "patch_embedding": {
            "kernel": conv_w.transpose(2, 3, 1, 0),
            "bias": p(f"{pre}embeddings.patch_embedding.bias"),
        },
        "position_embedding":
            p(f"{pre}embeddings.position_embedding.weight"),
        "encoder": {"blocks": blocks},
        "post_layernorm": {
            "scale": p(f"{pre}post_layernorm.weight"),
            "bias": p(f"{pre}post_layernorm.bias"),
        },
    }
    return tree


# ---------------------------------------------------------------------------
# torch nn.MultiheadAttention → TorchMHA
# ---------------------------------------------------------------------------

def convert_torch_mha(sd: Dict[str, Any], prefix: str) -> dict:
    E3, E = _t(sd[f"{prefix}in_proj_weight"]).shape
    E = E3 // 3
    w = _t(sd[f"{prefix}in_proj_weight"])
    b = _t(sd[f"{prefix}in_proj_bias"])
    qw, kw, vw = w[:E], w[E:2 * E], w[2 * E:]
    qb, kb, vb = b[:E], b[E:2 * E], b[2 * E:]
    return {
        "q_proj": {"kernel": qw.T, "bias": qb},
        "k_proj": {"kernel": kw.T, "bias": kb},
        "v_proj": {"kernel": vw.T, "bias": vb},
        "out_proj": {"kernel": _t(sd[f"{prefix}out_proj.weight"]).T,
                     "bias": _t(sd[f"{prefix}out_proj.bias"])},
    }


def torch_to_flax_resampler(sd: Dict[str, Any], prefix: str = "",
                            has_kv_proj: bool = True) -> dict:
    """Reference AttentionResampler state → our AttentionResampler params."""
    p = lambda k: _t(sd[prefix + k])
    tree = {
        "query": p("query"),
        "ln_q": {"scale": p("ln_q.weight"), "bias": p("ln_q.bias")},
        "ln_kv": {"scale": p("ln_kv.weight"), "bias": p("ln_kv.bias")},
        "attn": convert_torch_mha(sd, prefix + "attn."),
    }
    if has_kv_proj and prefix + "kv_proj.weight" in sd:
        tree["kv_proj"] = {"kernel": p("kv_proj.weight").T}
    return tree


# ---------------------------------------------------------------------------
# Qwen ViT
# ---------------------------------------------------------------------------

def torch_to_flax_qwen_vit(sd: Dict[str, Any], config) -> dict:
    p = lambda k: _t(sd[k])
    pre = ""
    if not any(k.startswith("conv1") for k in sd):
        cands = [k for k in sd if k.endswith("conv1.weight")]
        assert cands, "no qwen-vit keys found"
        pre = cands[0][:-len("conv1.weight")]

    L = config.layers

    def stackl(fmt, bias=True):
        ks = np.stack([p(fmt.format(i) + ".weight").T for i in range(L)])
        out = {"kernel": ks}
        if bias:
            out["bias"] = np.stack([p(fmt.format(i) + ".bias")
                                    for i in range(L)])
        return out

    def stackln(fmt):
        return {"scale": np.stack([p(fmt.format(i) + ".weight")
                                   for i in range(L)]),
                "bias": np.stack([p(fmt.format(i) + ".bias")
                                  for i in range(L)])}

    rb = pre + "transformer.resblocks.{}"

    def _visual_attn(i):
        # reference VisualAttention uses an nn.Linear 'in_proj'
        # ([3E, E] fused) + out_proj (qwenvl_vit.py:43-44)
        pre = rb.format(i) + ".attn."
        if pre + "in_proj_weight" in sd:
            return convert_torch_mha(sd, pre)
        w = _t(sd[pre + "in_proj.weight"])
        b = _t(sd[pre + "in_proj.bias"])
        E = w.shape[0] // 3
        qw, kw, vw = w[:E], w[E:2 * E], w[2 * E:]
        qb, kb, vb = b[:E], b[E:2 * E], b[2 * E:]
        return {
            "q_proj": {"kernel": qw.T, "bias": qb},
            "k_proj": {"kernel": kw.T, "bias": kb},
            "v_proj": {"kernel": vw.T, "bias": vb},
            "out_proj": {"kernel": _t(sd[pre + "out_proj.weight"]).T,
                         "bias": _t(sd[pre + "out_proj.bias"])},
        }

    def stack_mha():
        per = [_visual_attn(i) for i in range(L)]
        out = {}
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out[name] = {
                "kernel": np.stack([x[name]["kernel"] for x in per]),
                "bias": np.stack([x[name]["bias"] for x in per]),
            }
        return out

    backbone = {
        "conv1": {"kernel": p(pre + "conv1.weight").transpose(2, 3, 1, 0)},
        "positional_embedding": p(pre + "positional_embedding"),
        "ln_pre": {"scale": p(pre + "ln_pre.weight"),
                   "bias": p(pre + "ln_pre.bias")},
        "transformer": {"blocks": {
            "attn": stack_mha(),
            "ln_1": stackln(rb + ".ln_1"),
            "ln_2": stackln(rb + ".ln_2"),
            "mlp_fc": stackl(rb + ".mlp.c_fc"),
            "mlp_proj": stackl(rb + ".mlp.c_proj"),
        }},
    }
    tree = {"backbone": backbone}
    if pre + "attn_pool.query" in sd:
        tree["attn_pool"] = torch_to_flax_resampler(sd, pre + "attn_pool.")
        tree["ln_post"] = {"scale": p(pre + "ln_post.weight"),
                           "bias": p(pre + "ln_post.bias")}
        tree["proj"] = p(pre + "proj")
        if pre + "patch_pos_embed" in sd:
            tree["patch_pos_embed"] = p(pre + "patch_pos_embed")
    return tree


def torch_mha_in_proj_split():  # kept for docs/tests discoverability
    return convert_torch_mha


def merge_into(params: dict, sub: dict, path: tuple) -> dict:
    """Return params with params['params'][path...] replaced by sub."""
    import copy
    out = copy.deepcopy(jnp_tree_to_np(params))
    node = out["params"]
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = sub
    return out


def jnp_tree_to_np(tree):
    import jax
    return jax.tree_util.tree_map(np.asarray, tree)


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel / AutoencoderKL
# ---------------------------------------------------------------------------

def _lin(sd, key):
    out = {"kernel": _t(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        out["bias"] = _t(sd[key + ".bias"])
    return out


def _conv(sd, key):
    w = _t(sd[key + ".weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if key + ".bias" in sd:
        out["bias"] = _t(sd[key + ".bias"])
    return out


def _gn(sd, key):
    return {"scale": _t(sd[key + ".weight"]), "bias": _t(sd[key + ".bias"])}


def _resnet(sd, pre):
    out = {
        "norm1": _gn(sd, pre + ".norm1"),
        "conv1": _conv(sd, pre + ".conv1"),
        "norm2": _gn(sd, pre + ".norm2"),
        "conv2": _conv(sd, pre + ".conv2"),
    }
    if pre + ".time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, pre + ".time_emb_proj")
    if pre + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, pre + ".conv_shortcut")
    return out


def _transformer2d(sd, pre, n_layers):
    out = {
        "norm": _gn(sd, pre + ".norm"),
        "proj_in": _lin(sd, pre + ".proj_in"),
        "proj_out": _lin(sd, pre + ".proj_out"),
    }
    for k in range(n_layers):
        b = f"{pre}.transformer_blocks.{k}"
        out[f"blocks_{k}"] = {
            "norm1": {"scale": _t(sd[b + ".norm1.weight"]),
                      "bias": _t(sd[b + ".norm1.bias"])},
            "norm2": {"scale": _t(sd[b + ".norm2.weight"]),
                      "bias": _t(sd[b + ".norm2.bias"])},
            "norm3": {"scale": _t(sd[b + ".norm3.weight"]),
                      "bias": _t(sd[b + ".norm3.bias"])},
            "attn1": {
                "to_q": _lin(sd, b + ".attn1.to_q"),
                "to_k": _lin(sd, b + ".attn1.to_k"),
                "to_v": _lin(sd, b + ".attn1.to_v"),
                "to_out": _lin(sd, b + ".attn1.to_out.0"),
            },
            "attn2": {
                "to_q": _lin(sd, b + ".attn2.to_q"),
                "to_k": _lin(sd, b + ".attn2.to_k"),
                "to_v": _lin(sd, b + ".attn2.to_v"),
                "to_out": _lin(sd, b + ".attn2.to_out.0"),
            },
            "ff": {
                "proj": _lin(sd, b + ".ff.net.0.proj"),
                "out": _lin(sd, b + ".ff.net.2"),
            },
        }
    return out


def torch_to_flax_unet(sd: Dict[str, Any], config) -> dict:
    """diffusers UNet2DConditionModel state dict → our
    UNet2DConditionModel params['params'] (NHWC, flattened block names).
    """
    cfg = config
    tree = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if "add_embedding.linear_1.weight" in sd:
        tree["add_embedding"] = {
            "linear_1": _lin(sd, "add_embedding.linear_1"),
            "linear_2": _lin(sd, "add_embedding.linear_2"),
        }
    n_blocks = len(cfg.block_out_channels)
    for bi, btype in enumerate(cfg.down_block_types):
        for li in range(cfg.layers_per_block):
            tree[f"down_{bi}_res_{li}"] = _resnet(
                sd, f"down_blocks.{bi}.resnets.{li}")
            if btype == "CrossAttnDownBlock2D":
                tree[f"down_{bi}_attn_{li}"] = _transformer2d(
                    sd, f"down_blocks.{bi}.attentions.{li}",
                    cfg.transformer_layers_per_block[bi])
        if bi < n_blocks - 1:
            tree[f"down_{bi}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv")}
    tree["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    tree["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")
    tree["mid_attn"] = _transformer2d(sd, "mid_block.attentions.0",
                                      cfg.transformer_layers_per_block[-1])
    up_types = tuple(reversed(cfg.down_block_types))
    for bi, btype in enumerate(up_types):
        for li in range(cfg.layers_per_block + 1):
            tree[f"up_{bi}_res_{li}"] = _resnet(
                sd, f"up_blocks.{bi}.resnets.{li}")
            if btype == "CrossAttnDownBlock2D":
                tree[f"up_{bi}_attn_{li}"] = _transformer2d(
                    sd, f"up_blocks.{bi}.attentions.{li}",
                    cfg.transformer_layers_per_block[n_blocks - 1 - bi])
        if bi < n_blocks - 1:
            tree[f"up_{bi}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv")}
    return tree


def _unet_torch_key_to_flax(key: str):
    """One diffusers UNet state-dict key → (flax param path tuple,
    tensor transform). Covers every param family torch_to_flax_unet
    handles; raises KeyError on anything else (loud, not silent)."""
    import re

    def lin_or_conv(t):
        # weight [O,I] linear -> kernel [I,O]; [O,I,kh,kw] conv -> HWIO
        if t.ndim == 4:
            return t.transpose(2, 3, 1, 0)
        if t.ndim == 2:
            return t.T
        return t

    parts = key.split(".")
    # --- locate the top-level flax module name -------------------------
    if parts[0] in ("conv_in", "conv_out"):
        base, rest = (parts[0],), parts[1:]
    elif parts[0] in ("time_embedding", "add_embedding"):
        base, rest = (parts[0], parts[1]), parts[2:]
    elif parts[0] == "conv_norm_out":
        base, rest = ("conv_norm_out",), parts[1:]
    elif parts[0] in ("down_blocks", "up_blocks"):
        side = "down" if parts[0] == "down_blocks" else "up"
        bi = int(parts[1])
        kind = parts[2]
        if kind == "resnets":
            base = (f"{side}_{bi}_res_{int(parts[3])}",)
            rest = parts[4:]
        elif kind == "attentions":
            base = (f"{side}_{bi}_attn_{int(parts[3])}",)
            rest = parts[4:]
        elif kind in ("downsamplers", "upsamplers"):
            base = (f"{side}_{bi}_{kind[:-2]}", "conv")  # downsample/upsample
            rest = parts[5:]  # skip the ".0.conv"
        else:
            raise KeyError(key)
    elif parts[0] == "mid_block":
        if parts[1] == "resnets":
            base, rest = (f"mid_res_{int(parts[2])}",), parts[3:]
        elif parts[1] == "attentions":
            base, rest = ("mid_attn",), parts[3:]
        else:
            raise KeyError(key)
    else:
        raise KeyError(key)

    # --- walk the remaining diffusers path ------------------------------
    path = list(base)
    i = 0
    norm_names = {"norm", "norm1", "norm2", "norm3", "group_norm",
                  "conv_norm_out"}
    while i < len(rest) - 1:
        p = rest[i]
        if p == "transformer_blocks":
            path.append(f"blocks_{int(rest[i + 1])}")
            i += 2
        elif p == "ff":
            # ff.net.0.proj -> ff/proj ; ff.net.2 -> ff/out
            path.append("ff")
            if rest[i + 1] == "net" and rest[i + 2] == "0":
                path.append("proj")
                i += 4  # net, 0, proj
            else:
                path.append("out")
                i += 3  # net, 2
        elif p == "to_out":
            path.append("to_out")
            i += 2  # skip the ".0"
        else:
            path.append(p)
            i += 1
    leaf = rest[-1]
    last_mod = path[-1]
    is_norm = last_mod in norm_names
    if leaf == "weight":
        if is_norm:
            return tuple(path) + ("scale",), lambda t: t
        return tuple(path) + ("kernel",), lin_or_conv
    if leaf == "bias":
        return tuple(path) + ("bias",), lambda t: t
    raise KeyError(key)


def merge_partial_unet_state(unet_params: dict, unet_sd: Dict[str, Any],
                             strict: bool = True) -> dict:
    """Merge a PARTIAL diffusers UNet state dict (e.g. the to_k/to_v
    subset a SEED-X detokenizer checkpoint actually trains, reference
    adapter_modules.py:301-312) key-by-key over full base flax params.

    Raises on unknown keys / missing targets / shape mismatches when
    ``strict`` (a typo'd key must never be silently discarded)."""
    import flax

    flat = flax.traverse_util.flatten_dict(unet_params["params"])
    merged = 0
    for key, tensor in unet_sd.items():
        try:
            path, tf = _unet_torch_key_to_flax(key)
        except KeyError:
            if strict:
                raise KeyError(f"untranslatable UNet checkpoint key: "
                               f"{key!r}")
            continue
        if path not in flat:
            if strict:
                raise KeyError(f"UNet checkpoint key {key!r} maps to "
                               f"{'/'.join(path)} which is not in the "
                               f"model params")
            continue
        arr = tf(_t(tensor))
        if tuple(arr.shape) != tuple(flat[path].shape):
            raise ValueError(
                f"shape mismatch merging {key!r}: checkpoint "
                f"{arr.shape} vs model {flat[path].shape}")
        flat[path] = arr
        merged += 1
    out = dict(unet_params)
    out["params"] = flax.traverse_util.unflatten_dict(flat)
    return out


def _vae_attn(sd, pre):
    # new diffusers uses to_q/to_k/to_v/to_out.0; old used query/key/value
    names = (("to_q", "to_k", "to_v", "to_out.0")
             if pre + ".to_q.weight" in sd
             else ("query", "key", "value", "proj_attn"))
    return {
        "group_norm": _gn(sd, pre + ".group_norm"),
        "to_q": _lin(sd, f"{pre}.{names[0]}"),
        "to_k": _lin(sd, f"{pre}.{names[1]}"),
        "to_v": _lin(sd, f"{pre}.{names[2]}"),
        "to_out": _lin(sd, f"{pre}.{names[3]}"),
    }


def torch_to_flax_vae(sd: Dict[str, Any], config) -> dict:
    cfg = config
    n = len(cfg.block_out_channels)

    def coder(prefix, is_encoder):
        tree = {"conv_in": _conv(sd, prefix + ".conv_in"),
                "conv_norm_out": _gn(sd, prefix + ".conv_norm_out"),
                "conv_out": _conv(sd, prefix + ".conv_out"),
                "mid_res_0": _resnet(sd, prefix + ".mid_block.resnets.0"),
                "mid_res_1": _resnet(sd, prefix + ".mid_block.resnets.1"),
                "mid_attn": _vae_attn(sd,
                                      prefix + ".mid_block.attentions.0")}
        blocks = "down_blocks" if is_encoder else "up_blocks"
        per = cfg.layers_per_block + (0 if is_encoder else 1)
        for bi in range(n):
            for li in range(per):
                name = (f"down_{bi}_res_{li}" if is_encoder
                        else f"up_{bi}_res_{li}")
                tree[name] = _resnet(sd,
                                     f"{prefix}.{blocks}.{bi}.resnets.{li}")
            if bi < n - 1:
                if is_encoder:
                    tree[f"down_{bi}_downsample"] = _conv(
                        sd, f"{prefix}.{blocks}.{bi}.downsamplers.0.conv")
                else:
                    tree[f"up_{bi}_upsample"] = _conv(
                        sd, f"{prefix}.{blocks}.{bi}.upsamplers.0.conv")
        return tree

    return {
        "encoder": coder("encoder", True),
        "decoder": coder("decoder", False),
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# full-assembly checkpoints (SEED-X pytorch_model.bin)
# ---------------------------------------------------------------------------

def normalize_peft_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Peft-wrapped LM state dict → plain HF-Llama naming.

    The published SEED-X ``pytorch_model.bin`` stores the language model
    through peft (reference peft_models.py:15-99; LoraConfig with
    modules_to_save, seedx_llama2_13b_qwenvl_vitg.yaml:39-57), so keys
    look like ``base_model.model.model.layers.0.self_attn.q_proj.
    {base_layer.weight, lora_A.default.weight, lora_B.default.weight}``
    and ``...input_layernorm.{modules_to_save.default, original_module}.
    weight``. Normalization:

    - strip the ``base_model.model.`` wrapper and ``.base_layer.``;
    - ``.modules_to_save.default.`` → trained copy wins, the untrained
      ``.original_module.`` duplicate is dropped;
    - ``.lora_{A,B}.default.`` → ``.lora_{A,B}.`` (the names
      torch_to_flax_llama loads trained adapters from).
    """
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        if ".original_module." in k:
            continue  # untrained duplicate of a modules_to_save entry
        k = k.replace("base_model.model.", "")
        k = k.replace(".base_layer.", ".")
        k = k.replace(".modules_to_save.default.", ".")
        k = k.replace(".lora_A.default.", ".lora_A.")
        k = k.replace(".lora_B.default.", ".lora_B.")
        out[k] = v
    return out


def split_assembly_state(sd: Dict[str, Any]) -> Dict[str, Dict[str, Any]]:
    """Split a reference assembly state dict (keys like
    'language_model.*', 'vision_encoder.*', 'projector.*',
    'output_projector.*', 'patch_pos_embed') into per-component dicts
    with their prefixes stripped."""
    out: Dict[str, Dict[str, Any]] = {}
    for k, v in sd.items():
        if k == "patch_pos_embed":
            out.setdefault("__root__", {})[k] = v
            continue
        head, _, rest = k.partition(".")
        out.setdefault(head, {})[rest] = v
    return out


def torch_to_flax_assembly(sd: Dict[str, Any], *, lm_config,
                           vision_config=None, vision_kind: str = "qwen",
                           has_output_projector: bool = False) -> dict:
    """Reference SEED/MLLM assembly checkpoint → params subtrees keyed by
    attribute name (the format models.factory.init_assembly_params
    merges)."""
    parts = split_assembly_state(sd)
    tree: Dict[str, Any] = {}
    if "language_model" in parts:
        lm_sd = normalize_peft_keys(parts["language_model"])
        tree["language_model"] = torch_to_flax_llama(
            lm_sd, lm_config, vocab_size=lm_config.vocab_size)
    if "vision_encoder" in parts and vision_config is not None:
        conv = (torch_to_flax_qwen_vit if vision_kind == "qwen"
                else torch_to_flax_siglip)
        tree["vision_encoder"] = conv(parts["vision_encoder"],
                                      vision_config)
    if "projector" in parts:
        tree["projector"] = torch_to_flax_resampler(parts["projector"])
    if has_output_projector and "output_projector" in parts:
        tree["output_projector"] = torch_to_flax_resampler(
            parts["output_projector"])
    if "__root__" in parts:
        tree["patch_pos_embed"] = _t(parts["__root__"]["patch_pos_embed"])
    return tree


# ---------------------------------------------------------------------------
# perceiver resamplers (de-tokenizer, reference resampler.py)
# ---------------------------------------------------------------------------

def torch_to_flax_perceiver(sd: Dict[str, Any], prefix: str = "",
                            depth: Optional[int] = None) -> dict:
    """Reference Resampler/ResamplerXL(+V2) state → our resampler params.

    Reference naming: latents, proj_in, norm_out, layers.{i}.0.* =
    PerceiverAttention(norm1, norm2, to_q, to_kv, to_out), layers.{i}.1.*
    = FeedForward Sequential(0=LayerNorm, 1=Linear, 3=Linear); XL heads:
    unet_proj_1/2 + unet_attnpool (CLIP-style pool with separate
    q/k/v/c_proj)."""
    p = lambda k: _t(sd[prefix + k])
    if depth is None:
        depth = 1 + max(int(k[len(prefix) + 7:].split(".")[0])
                        for k in sd if k.startswith(prefix + "layers."))
    core = {}
    for i in range(depth):
        a = f"layers.{i}.0."
        f = f"layers.{i}.1."
        core[f"attn_{i}"] = {
            "norm1": {"scale": p(a + "norm1.weight"),
                      "bias": p(a + "norm1.bias")},
            "norm2": {"scale": p(a + "norm2.weight"),
                      "bias": p(a + "norm2.bias")},
            "to_q": {"kernel": p(a + "to_q.weight").T},
            "to_kv": {"kernel": p(a + "to_kv.weight").T},
            "to_out": {"kernel": p(a + "to_out.weight").T},
        }
        core[f"ff_{i}"] = {
            "norm": {"scale": p(f + "0.weight"), "bias": p(f + "0.bias")},
            "fc1": {"kernel": p(f + "1.weight").T},
            "fc2": {"kernel": p(f + "3.weight").T},
        }
    core["latents"] = p("latents")
    tree = {
        "core": core,
        "proj_in": {"kernel": p("proj_in.weight").T,
                    "bias": p("proj_in.bias")},
        "norm_out": {"scale": p("norm_out.weight"),
                     "bias": p("norm_out.bias")},
    }
    if prefix + "proj_out.weight" in sd:   # plain Resampler
        tree["proj_out"] = {"kernel": p("proj_out.weight").T,
                            "bias": p("proj_out.bias")}
    if prefix + "unet_proj_1.weight" in sd:   # XL variants
        tree["unet_proj_1"] = {"kernel": p("unet_proj_1.weight").T,
                               "bias": p("unet_proj_1.bias")}
        tree["unet_proj_2"] = {"kernel": p("unet_proj_2.weight").T,
                               "bias": p("unet_proj_2.bias")}
        ap = "unet_attnpool."
        tree["unet_attnpool"] = {
            "positional_embedding": p(ap + "positional_embedding"),
            "q_proj": {"kernel": p(ap + "q_proj.weight").T,
                       "bias": p(ap + "q_proj.bias")},
            "k_proj": {"kernel": p(ap + "k_proj.weight").T,
                       "bias": p(ap + "k_proj.bias")},
            "v_proj": {"kernel": p(ap + "v_proj.weight").T,
                       "bias": p(ap + "v_proj.bias")},
            "c_proj": {"kernel": p(ap + "c_proj.weight").T,
                       "bias": p(ap + "c_proj.bias")},
        }
    return tree


def split_adapter_state(sd: Dict[str, Any]) -> tuple:
    """Reference detokenizer checkpoint → (resampler_sd, unet_sd)."""
    res = {k[len("resampler."):]: v for k, v in sd.items()
           if k.startswith("resampler.")}
    unet = {k[len("unet."):]: v for k, v in sd.items()
            if k.startswith("unet.")}
    return res, unet


def quantize_llama_params(lm_params: dict, bits: int = 8,
                          group_size: int = 256) -> dict:
    """Convert a trained float Llama param tree to the int8/int4
    weight-only serving layout (build the model with
    LlamaConfig(quantization='int8'|'int4'); ops/quant.py). int4 uses
    group-wise scales — the next ~2x of weight-streaming decode
    bandwidth after int8. Embeddings and norms stay float."""
    from mllm_npu_tpu.ops.quant import quantize_dense_params

    return quantize_dense_params(lm_params, skip=("embed",), bits=bits,
                                 group_size=group_size)


def merge_lora_params(lm_params: dict, alpha: float) -> dict:
    """Fold trained LoRA adapters into their base kernels (peft
    ``merge_and_unload`` parity — the deployment step the reference
    leaves to peft): W' = W + (alpha/r)·A·B, collapsing each
    ``name/{base/kernel, lora_a, lora_b}`` LoRADense subtree to the
    plain ``name/kernel`` layout of ``LlamaConfig(lora_rank=0)``.
    Works on plain and scan-stacked ([L, ...]) adapters. Run BEFORE
    fuse_llama_projections / quantize_llama_params."""
    import flax

    flat = flax.traverse_util.flatten_dict(lm_params)
    out = {}
    for path, leaf in flat.items():
        if path[-1] == "lora_a":
            mod = path[:-1]
            b = flat[mod + ("lora_b",)]
            base = flat[mod + ("base", "kernel")]
            r = leaf.shape[-1]
            delta = jnp.einsum("...kr,...rn->...kn",
                               leaf.astype(jnp.float32),
                               b.astype(jnp.float32)) * (alpha / r)
            out[mod + ("kernel",)] = (
                base.astype(jnp.float32) + delta).astype(base.dtype)
        elif path[-1] == "lora_b" or path[-2:] == ("base", "kernel"):
            continue  # folded above
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


def fuse_llama_projections(lm_params: dict, shards: int = 1) -> dict:
    """Concatenate q/k/v kernels into qkv_proj and gate/up into
    gate_up_proj (build the model with
    LlamaConfig(fused_projections=True)). Serving-time transform: one
    matvec instead of three/two per block halves the decode loop's
    kernel-launch count and streams larger contiguous weight tiles.
    Works on plain [K, N] and scan-stacked [L, K, N] kernels; apply
    BEFORE quantize_llama_params. LoRA trees must be merged first.

    ``shards`` > 1 produces the tensor-parallel interleaved layout
    (LlamaConfig(fused_shards=shards)): the output axis is grouped as
    [s0: q0|k0|v0, s1: q1|k1|v1, ...] so each `tensor`-axis shard holds
    whole q/k/v head blocks and the module's split is shard-local —
    a plain-concat fused kernel sharded on the output axis straddles
    the q/k/v boundary and forces GSPMD resharding every decode step.
    Head/column counts must divide by ``shards``."""
    import flax

    flat = flax.traverse_util.flatten_dict(lm_params)
    assert not any("lora_a" in p or "base" in p for p in flat), \
        "merge LoRA adapters before fusing projections"

    def interleave(parts):
        """[..., K, Ni] kernels -> [..., K, sum(Ni)] grouped by shard."""
        if shards == 1:
            return jnp.concatenate(parts, axis=-1)
        split = []
        for p in parts:
            n = p.shape[-1]
            assert n % shards == 0, \
                f"fused output dim {n} not divisible by shards={shards}"
            split.append(p.reshape(*p.shape[:-1], shards, n // shards))
        inter = jnp.concatenate(split, axis=-1)   # [..., ts, sum(local)]
        return inter.reshape(*inter.shape[:-2], -1)

    out = {}
    for path, leaf in flat.items():
        if path[-1] != "kernel":
            out[path] = leaf
            continue
        name = path[-2]
        if name in ("k_proj", "v_proj", "up_proj"):
            continue  # folded into the fused kernel below
        if name == "q_proj":
            sib = lambda n: flat[path[:-2] + (n, "kernel")]
            out[path[:-2] + ("qkv_proj", "kernel")] = interleave(
                [leaf, sib("k_proj"), sib("v_proj")])
        elif name == "gate_proj":
            sib = lambda n: flat[path[:-2] + (n, "kernel")]
            out[path[:-2] + ("gate_up_proj", "kernel")] = interleave(
                [leaf, sib("up_proj")])
        else:
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)


def unstack_llama_params(lm_params: dict) -> dict:
    """Convert scan-stacked Llama params ('model'/'layers', every leaf
    [L, ...]) to the per-layer layout ('model'/'layers_{i}') of
    ``LlamaConfig(scan_layers=False)``.

    Serving transform for Pallas-kernel weight paths (int8): nn.scan
    slices each layer's weights out of the stacked array every step,
    and a Pallas custom call can't fuse that dynamic-slice into its
    operand the way an XLA dot does — so every int8 kernel gets
    MATERIALIZED as a copy per decoded token (profiled ~9ms/token of
    pure copy at llama-3-8b; unrolling measured 63 -> 90 tok/s on one
    v5e). Apply AFTER fuse_llama_projections / quantize_llama_params
    (both handle the stacked layout).
    """
    import flax

    out = dict(lm_params)
    model = dict(out["model"])
    layers = model.pop("layers")
    flat = flax.traverse_util.flatten_dict(layers)
    L = next(iter(flat.values())).shape[0]
    for i in range(L):
        model[f"layers_{i}"] = flax.traverse_util.unflatten_dict(
            {k: v[i] for k, v in flat.items()})
    out["model"] = model
    return out
