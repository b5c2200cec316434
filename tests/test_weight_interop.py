"""Weight interop parity: convert tiny HF *torch* models into our Flax
modules and compare outputs logit-for-logit — the strongest form of the
reference's cross-backend parity testing (acceleration.md:35), applied
to whole models instead of one op."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                       LlamaForCausalLM)
from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
    SigLIPConfig, SigLIPVisionEncoder)
from mllm_npu_tpu.models.multimodal_projector.attention_resampler import (
    AttentionResampler)
from mllm_npu_tpu.utils.weights import (torch_to_flax_llama,
                                        torch_to_flax_resampler,
                                        torch_to_flax_siglip)


@pytest.mark.slow
def test_llama_logit_parity_with_hf():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama

    hf_cfg = HFLlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFLlama(hf_cfg).eval()

    ids = torch.randint(0, 128, (2, 12))
    with torch.no_grad():
        ref = hf(ids).logits.float().numpy()

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        attention_impl="eager")
    params = {"params": torch_to_flax_llama(hf.state_dict(), cfg)}
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    logits, _, _ = model.apply(params, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_siglip_parity_with_hf():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = SiglipVisionModel(hf_cfg).eval()

    imgs = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        ref = hf(imgs).last_hidden_state.float().numpy()

    cfg = SigLIPConfig(image_size=56, patch_size=14, hidden_size=64,
                       intermediate_size=128, num_hidden_layers=2,
                       num_attention_heads=4, remat=False)
    tree = torch_to_flax_siglip(hf.state_dict(), cfg)
    model = SigLIPVisionEncoder(cfg, dtype=jnp.float32)
    # our layout is NHWC
    out = model.apply({"params": tree},
                      jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-3)


def test_attention_resampler_parity_with_reference_arch():
    """Build a torch replica of the reference AttentionResampler and
    compare (covers in_proj split + pos-embed handling)."""
    import math
    import torch.nn as tnn

    grid, E, H, kv = 2, 32, 4, 24

    class TorchResampler(tnn.Module):
        # structural copy of reference attention_resampler.py:85-151
        def __init__(self):
            super().__init__()
            from mllm_npu_tpu.models.vit_common import get_2d_sincos_pos_embed
            self.pos_embed = tnn.Parameter(
                torch.from_numpy(get_2d_sincos_pos_embed(E, grid)).float(),
                requires_grad=False)
            self.query = tnn.Parameter(torch.randn(grid * grid, E) * 0.02)
            self.kv_proj = tnn.Linear(kv, E, bias=False)
            self.attn = tnn.MultiheadAttention(E, H)
            self.ln_q = tnn.LayerNorm(E)
            self.ln_kv = tnn.LayerNorm(E)

        def forward(self, x):
            pos = self.pos_embed  # same grid -> no interpolation
            x = self.kv_proj(x)
            x = self.ln_kv(x).permute(1, 0, 2)
            N = x.shape[1]
            q = self.ln_q(self.query)
            out = self.attn(
                q.unsqueeze(1).repeat(1, N, 1) + self.pos_embed.unsqueeze(1),
                x + pos.unsqueeze(1), x)[0]
            return out.permute(1, 0, 2)

    torch.manual_seed(0)
    tm = TorchResampler().eval()
    x = torch.randn(2, grid * grid, kv)
    with torch.no_grad():
        ref = tm(x).float().numpy()

    sd = tm.state_dict()
    tree = torch_to_flax_resampler(sd)
    model = AttentionResampler(grid_size=grid, embed_dim=E, num_heads=H,
                               kv_dim=kv)
    out = model.apply({"params": tree}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-4)


def test_perceiver_resampler_parity_with_reference_arch():
    """Torch replica of the reference deep perceiver ResamplerXL
    (resampler.py:163-220) vs our Flax ResamplerXL after conversion."""
    import math
    import torch.nn as tnn

    dim, depth, dim_head, heads, nq, emb, o1, o2 = 32, 2, 8, 4, 4, 24, 16, 24

    class TPerceiverAttention(tnn.Module):
        # structural copy of reference resampler.py:26-70
        def __init__(self):
            super().__init__()
            inner = dim_head * heads
            self.norm1 = tnn.LayerNorm(dim)
            self.norm2 = tnn.LayerNorm(dim)
            self.to_q = tnn.Linear(dim, inner, bias=False)
            self.to_kv = tnn.Linear(dim, inner * 2, bias=False)
            self.to_out = tnn.Linear(inner, dim, bias=False)

        def forward(self, x, latents):
            x = self.norm1(x)
            latents = self.norm2(latents)
            b, l, _ = latents.shape
            q = self.to_q(latents)
            kv = self.to_kv(torch.cat([x, latents], dim=-2))
            k, v = kv.chunk(2, dim=-1)

            def rs(t):
                b2, n, _ = t.shape
                return t.view(b2, n, heads, -1).transpose(1, 2)

            q, k, v = rs(q), rs(k), rs(v)
            scale = 1 / math.sqrt(math.sqrt(dim_head))
            w = (q * scale) @ (k * scale).transpose(-2, -1)
            w = torch.softmax(w.float(), dim=-1).type(w.dtype)
            out = (w @ v).permute(0, 2, 1, 3).reshape(b, l, -1)
            return self.to_out(out)

    def t_ff():
        return tnn.Sequential(tnn.LayerNorm(dim),
                              tnn.Linear(dim, dim * 4, bias=False),
                              tnn.GELU(),
                              tnn.Linear(dim * 4, dim, bias=False))

    class TResamplerXL(tnn.Module):
        # structural copy of reference resampler.py:163-220
        def __init__(self):
            super().__init__()
            self.latents = tnn.Parameter(torch.randn(1, nq, dim) / dim ** .5)
            self.proj_in = tnn.Linear(emb, dim)
            self.norm_out = tnn.LayerNorm(dim)
            self.layers = tnn.ModuleList([
                tnn.ModuleList([TPerceiverAttention(), t_ff()])
                for _ in range(depth)])
            self.unet_proj_1 = tnn.Linear(dim, o1)
            self.unet_proj_2 = tnn.Linear(dim, o2)
            self.unet_attnpool = _TorchAttnPool()

        def forward(self, x):
            latents = self.latents.repeat(x.size(0), 1, 1)
            x = self.proj_in(x)
            for attn, ff in self.layers:
                latents = attn(x, latents) + latents
                latents = ff(latents) + latents
            hidden = self.norm_out(latents)
            pe = torch.cat([self.unet_proj_1(hidden),
                            self.unet_proj_2(hidden)], dim=-1)
            pooled = self.unet_attnpool(hidden)
            return pe, pooled

    class _TorchAttnPool(tnn.Module):
        # structural copy of reference resampler.py:73-111
        def __init__(self):
            super().__init__()
            self.positional_embedding = tnn.Parameter(
                torch.randn(nq + 1, dim) / dim ** 0.5)
            self.k_proj = tnn.Linear(dim, dim)
            self.q_proj = tnn.Linear(dim, dim)
            self.v_proj = tnn.Linear(dim, dim)
            self.c_proj = tnn.Linear(dim, o2)

        def forward(self, x):
            import torch.nn.functional as F
            x = x.permute(1, 0, 2)
            x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
            x = x + self.positional_embedding[:, None, :]
            x, _ = F.multi_head_attention_forward(
                query=x, key=x, value=x, embed_dim_to_check=dim,
                num_heads=heads,
                q_proj_weight=self.q_proj.weight,
                k_proj_weight=self.k_proj.weight,
                v_proj_weight=self.v_proj.weight,
                in_proj_weight=None,
                in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias,
                                        self.v_proj.bias]),
                bias_k=None, bias_v=None, add_zero_attn=False,
                dropout_p=0, out_proj_weight=self.c_proj.weight,
                out_proj_bias=self.c_proj.bias,
                use_separate_proj_weight=True, training=False,
                need_weights=False)
            return x[0]

    torch.manual_seed(0)
    tm = TResamplerXL().eval()
    x = torch.randn(2, 6, emb)
    with torch.no_grad():
        ref_pe, ref_pool = tm(x)

    from mllm_npu_tpu.models.generation.resampler import ResamplerXL
    from mllm_npu_tpu.utils.weights import torch_to_flax_perceiver
    tree = torch_to_flax_perceiver(tm.state_dict())
    model = ResamplerXL(dim=dim, depth=depth, dim_head=dim_head,
                        heads=heads, num_queries=nq, embedding_dim=emb,
                        output1_dim=o1, output2_dim=o2)
    pe, pool = model.apply({"params": tree}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(pe), ref_pe.numpy(), atol=5e-4,
                               rtol=5e-3)
    np.testing.assert_allclose(np.asarray(pool), ref_pool.numpy(),
                               atol=5e-4, rtol=5e-3)


def test_qwen_vit_parity_with_reference_arch():
    """Torch structural replica of the reference Qwen-VL ViT
    (qwenvl_vit.py:206-310: conv1 → abs-pos → ln_pre → pre-LN blocks →
    attn-pool resampler → ln_post → proj) vs our Flax tower after
    conversion."""
    import math
    import torch.nn as tnn
    import torch.nn.functional as F

    from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
        QwenViTConfig, VisionTransformerWithAttnPool)
    from mllm_npu_tpu.utils.weights import torch_to_flax_qwen_vit

    cfg = QwenViTConfig(image_size=56, patch_size=14, width=64, layers=2,
                        heads=4, mlp_ratio=2.0, n_queries=4,
                        output_dim=32, remat=False, pos_embed_size=16)

    class TBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(cfg.width, eps=1e-6)
            self.ln_2 = tnn.LayerNorm(cfg.width, eps=1e-6)

            class A(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.in_proj = tnn.Linear(cfg.width, 3 * cfg.width)
                    self.out_proj = tnn.Linear(cfg.width, cfg.width)

                def forward(self, x):  # [B, L, C]
                    B, L, C = x.shape
                    qkv = self.in_proj(x)
                    q, k, v = qkv.chunk(3, dim=-1)
                    H = cfg.heads
                    D = C // H

                    def rs(t):
                        return t.view(B, L, H, D).transpose(1, 2)

                    q, k, v = rs(q), rs(k), rs(v)
                    w = torch.softmax(
                        (q @ k.transpose(-2, -1)) / math.sqrt(D), dim=-1)
                    out = (w @ v).transpose(1, 2).reshape(B, L, C)
                    return self.out_proj(out)

            self.attn = A()
            self.mlp = tnn.Sequential()
            self.mlp.add_module("c_fc", tnn.Linear(cfg.width,
                                                   cfg.mlp_width))
            self.mlp.add_module("gelu", tnn.GELU())
            self.mlp.add_module("c_proj", tnn.Linear(cfg.mlp_width,
                                                     cfg.width))

        def forward(self, x):
            x = x + self.attn(self.ln_1(x))
            return x + self.mlp(self.ln_2(x))

    class TQwen(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, cfg.width, cfg.patch_size,
                                    cfg.patch_size, bias=False)
            g = cfg.image_size // cfg.patch_size
            self.positional_embedding = tnn.Parameter(
                torch.randn(g * g, cfg.width) * cfg.width ** -0.5)
            self.ln_pre = tnn.LayerNorm(cfg.width, eps=1e-6)

            class T(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.resblocks = tnn.ModuleList(
                        [TBlock() for _ in range(cfg.layers)])

                def forward(self, x):
                    for b in self.resblocks:
                        x = b(x)
                    return x

            self.transformer = T()
            # attn_pool: same structure as the reference AttentionResampler
            from mllm_npu_tpu.models.vit_common import get_2d_sincos_pos_embed

            class TPool(tnn.Module):
                def __init__(self):
                    super().__init__()
                    grid = int(cfg.n_queries ** 0.5)
                    E = cfg.output_dim
                    self.pos_embed = tnn.Parameter(
                        torch.from_numpy(
                            get_2d_sincos_pos_embed(E, grid)).float(),
                        requires_grad=False)
                    self.query = tnn.Parameter(
                        torch.randn(cfg.n_queries, E) * 0.02)
                    self.kv_proj = tnn.Linear(cfg.width, E, bias=False)
                    self.attn = tnn.MultiheadAttention(E, max(E // 128, 1))
                    self.ln_q = tnn.LayerNorm(E, eps=1e-6)
                    self.ln_kv = tnn.LayerNorm(E, eps=1e-6)

                def forward(self, x):
                    from mllm_npu_tpu.models.vit_common import (
                        interpolate_abs_pos)
                    import numpy as _np
                    # same grid here: src 2x2 vs L=16? interpolate in torch
                    src = int(self.pos_embed.shape[0] ** 0.5)
                    tgt = int(x.shape[1] ** 0.5)
                    pos = self.pos_embed
                    if src != tgt:
                        pos = F.interpolate(
                            pos.reshape(1, src, src, -1).permute(0, 3, 1, 2),
                            size=(tgt, tgt), mode="bicubic",
                            align_corners=False
                        ).permute(0, 2, 3, 1).reshape(tgt * tgt, -1)
                    x = self.kv_proj(x)
                    x = self.ln_kv(x).permute(1, 0, 2)
                    N = x.shape[1]
                    q = self.ln_q(self.query)
                    out = self.attn(
                        q.unsqueeze(1).repeat(1, N, 1)
                        + self.pos_embed.unsqueeze(1),
                        x + pos.unsqueeze(1), x)[0]
                    return out.permute(1, 0, 2)

            self.attn_pool = TPool()
            self.ln_post = tnn.LayerNorm(cfg.output_dim, eps=1e-6)
            self.proj = tnn.Parameter(
                torch.randn(cfg.output_dim, cfg.output_dim)
                * cfg.output_dim ** -0.5)

        def forward(self, x):
            x = self.conv1(x)
            x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
            # same token count as the table? interpolate like get_abs_pos
            pos = self.positional_embedding
            x = x + pos
            x = self.ln_pre(x)
            x = self.transformer(x)
            x = self.attn_pool(x)
            x = self.ln_post(x)
            return x @ self.proj

    torch.manual_seed(0)
    tm = TQwen().eval()
    imgs = torch.randn(2, 3, 56, 56)
    with torch.no_grad():
        ref = tm(imgs).float().numpy()

    sd = tm.state_dict()
    # our converter expects the reference's 256-entry pos table name and
    # the bare attn_pool.* names — the replica matches except pos_embed
    sd["attn_pool.pos_embed"] = sd.pop("attn_pool.pos_embed") \
        if "attn_pool.pos_embed" in sd else sd["attn_pool.pos_embed"]
    tree = torch_to_flax_qwen_vit(sd, cfg)
    model = VisionTransformerWithAttnPool(cfg, dtype=jnp.float32)
    out = model.apply({"params": tree},
                      jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-3)
