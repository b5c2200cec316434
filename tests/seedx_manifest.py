"""Offline SEED-X checkpoint key-layout builders.

Enumerates the exact state-dict layouts of the reference torch modules
that make up the published SEED-X ``pretrained/pytorch_model.bin`` and
``pretrained/detokenizer/pytorch_model.bin`` (reference
pretrained/weight.md:8-95):

- AttentionResampler (reference
  models/multimodal_projector/attention_resampler.py:85-122),
- VisionTransformerWithAttnPool / Qwen ViT (reference
  models/multimodal_encoder/qwenvl_vit.py:206-274),
- ResamplerXLV2 de-tokenizer head (reference
  models/generation/resampler.py:219-256; config
  configs/generation/sd_xl_qwenvl_vit_resampler.yaml).

The language-model part is NOT hand-enumerated — tests build a real
peft-wrapped HF Llama (peft is in the image) so those key names are
correct by construction.

Values are random so tests can assert value-level landing (a silently
dropped key would leave a default-initialized leaf with different
values).
"""

from __future__ import annotations

import numpy as np


def attention_resampler_sd(prefix: str, embed_dim: int, kv_dim: int,
                           num_queries: int, rs: np.random.RandomState
                           ) -> dict:
    """Reference AttentionResampler state_dict (attention_resampler.py:
    85-122): frozen sincos pos_embed + query + optional kv_proj +
    nn.MultiheadAttention + ln_q/ln_kv."""
    E = embed_dim
    r = lambda *s: rs.randn(*s).astype(np.float32)
    sd = {
        f"{prefix}pos_embed": r(num_queries, E),   # frozen sincos buffer
        f"{prefix}query": r(num_queries, E) * 0.02,
        f"{prefix}attn.in_proj_weight": r(3 * E, E),
        f"{prefix}attn.in_proj_bias": r(3 * E),
        f"{prefix}attn.out_proj.weight": r(E, E),
        f"{prefix}attn.out_proj.bias": r(E),
        f"{prefix}ln_q.weight": r(E),
        f"{prefix}ln_q.bias": r(E),
        f"{prefix}ln_kv.weight": r(E),
        f"{prefix}ln_kv.bias": r(E),
    }
    if kv_dim != E:
        sd[f"{prefix}kv_proj.weight"] = r(E, kv_dim)
    return sd


def qwen_vit_sd(cfg, prefix: str, rs: np.random.RandomState) -> dict:
    """Reference VisionTransformerWithAttnPool state_dict
    (qwenvl_vit.py:206-274): conv1 (bias=False), 256-entry positional
    embedding, ln_pre, resblocks with VisualAttention's fused
    'in_proj' nn.Linear (qwenvl_vit.py:43-44), attn_pool resampler,
    ln_post, proj matrix, optional 4-corner patch_pos_embed."""
    W, out = cfg.width, cfg.output_dim
    mlp_w = cfg.mlp_width
    r = lambda *s: rs.randn(*s).astype(np.float32)
    sd = {
        f"{prefix}conv1.weight": r(W, 3, cfg.patch_size, cfg.patch_size),
        f"{prefix}positional_embedding": r(cfg.pos_embed_size, W),
        f"{prefix}ln_pre.weight": r(W),
        f"{prefix}ln_pre.bias": r(W),
        f"{prefix}ln_post.weight": r(out),
        f"{prefix}ln_post.bias": r(out),
        f"{prefix}proj": r(out, out),
    }
    for i in range(cfg.layers):
        rb = f"{prefix}transformer.resblocks.{i}."
        sd.update({
            rb + "ln_1.weight": r(W), rb + "ln_1.bias": r(W),
            rb + "ln_2.weight": r(W), rb + "ln_2.bias": r(W),
            rb + "attn.in_proj.weight": r(3 * W, W),
            rb + "attn.in_proj.bias": r(3 * W),
            rb + "attn.out_proj.weight": r(W, W),
            rb + "attn.out_proj.bias": r(W),
            rb + "mlp.c_fc.weight": r(mlp_w, W),
            rb + "mlp.c_fc.bias": r(mlp_w),
            rb + "mlp.c_proj.weight": r(W, mlp_w),
            rb + "mlp.c_proj.bias": r(W),
        })
    sd.update(attention_resampler_sd(
        f"{prefix}attn_pool.", out, W, cfg.n_queries, rs))
    if cfg.patch_pos:
        sd[f"{prefix}patch_pos_embed"] = r(4, out)
    return sd


def resampler_xlv2_sd(prefix: str, rs: np.random.RandomState, *,
                      dim: int = 1024, depth: int = 4, dim_head: int = 64,
                      heads: int = 16, num_queries: int = 64,
                      embedding_dim: int = 4096, output1_dim: int = 768,
                      output2_dim: int = 1280, ff_mult: int = 4) -> dict:
    """Reference ResamplerXLV2 state_dict at the production SEED-X
    config (configs/generation/sd_xl_qwenvl_vit_resampler.yaml:4-15):
    latents + proj_in + depth×(PerceiverAttention, FeedForward) +
    norm_out + unet_proj_1/2 + unet_attnpool."""
    inner = dim_head * heads
    ff_inner = int(dim * ff_mult)
    r = lambda *s: rs.randn(*s).astype(np.float32)
    sd = {
        f"{prefix}latents": r(1, num_queries, dim) / dim ** 0.5,
        f"{prefix}proj_in.weight": r(dim, embedding_dim),
        f"{prefix}proj_in.bias": r(dim),
        f"{prefix}norm_out.weight": r(dim),
        f"{prefix}norm_out.bias": r(dim),
        f"{prefix}unet_proj_1.weight": r(output1_dim, dim),
        f"{prefix}unet_proj_1.bias": r(output1_dim),
        f"{prefix}unet_proj_2.weight": r(output2_dim, dim),
        f"{prefix}unet_proj_2.bias": r(output2_dim),
        f"{prefix}unet_attnpool.positional_embedding":
            r(num_queries + 1, dim),
    }
    for nm in ("q_proj", "k_proj", "v_proj"):
        sd[f"{prefix}unet_attnpool.{nm}.weight"] = r(dim, dim)
        sd[f"{prefix}unet_attnpool.{nm}.bias"] = r(dim)
    sd[f"{prefix}unet_attnpool.c_proj.weight"] = r(output2_dim, dim)
    sd[f"{prefix}unet_attnpool.c_proj.bias"] = r(output2_dim)
    for i in range(depth):
        a = f"{prefix}layers.{i}.0."
        f = f"{prefix}layers.{i}.1."
        sd.update({
            a + "norm1.weight": r(dim), a + "norm1.bias": r(dim),
            a + "norm2.weight": r(dim), a + "norm2.bias": r(dim),
            a + "to_q.weight": r(inner, dim),
            a + "to_kv.weight": r(2 * inner, dim),
            a + "to_out.weight": r(dim, inner),
            f + "0.weight": r(dim), f + "0.bias": r(dim),
            f + "1.weight": r(ff_inner, dim),
            f + "3.weight": r(dim, ff_inner),
        })
    return sd


def peft_llama_sd(lm_cfg, r: int = 4, alpha: int = 32,
                  seed: int = 0) -> dict:
    """REAL peft-wrapped HF Llama state_dict (torch values → numpy),
    with the production LoRA recipe of
    configs/models/seedx_llama2_13b_qwenvl_vitg.yaml:39-57 (all seven
    proj targets + layernorms in modules_to_save). Key names come from
    peft itself, so they are correct by construction."""
    import peft
    import torch
    from transformers import LlamaConfig as HFCfg
    from transformers import LlamaForCausalLM as HFL

    torch.manual_seed(seed)
    hf = HFL(HFCfg(
        vocab_size=lm_cfg.vocab_size, hidden_size=lm_cfg.hidden_size,
        intermediate_size=lm_cfg.intermediate_size,
        num_hidden_layers=lm_cfg.num_hidden_layers,
        num_attention_heads=lm_cfg.num_attention_heads,
        num_key_value_heads=lm_cfg.num_key_value_heads,
        attn_implementation="eager"))
    pc = peft.LoraConfig(
        r=r, lora_alpha=alpha,
        modules_to_save=["input_layernorm", "post_attention_layernorm",
                         "norm"],
        target_modules=["q_proj", "v_proj", "k_proj", "o_proj",
                        "gate_proj", "down_proj", "up_proj"],
        task_type="CAUSAL_LM", lora_dropout=0.05)
    pm = peft.get_peft_model(hf, pc)
    sd = {}
    with torch.no_grad():
        for k, v in pm.state_dict().items():
            t = v.float()
            if ".lora_B." in k or ".modules_to_save." in k:
                # make trained copies nonzero/distinct so a converter
                # that falls back to fresh init or the original_module
                # copy is caught by value
                t = torch.randn_like(t) * 0.1 + 0.5
            sd[k] = t.numpy()
    return sd
