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
