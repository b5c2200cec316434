"""Tiny-model builders + synthetic batches for CPU-runnable end-to-end
tests — the TPU build's analogue of the reference's DEBUG_FLAG fake
backend (reference: mllm_npu/models/mllm.py:221-222, qwenvl_vit.py:326-338,
peft_models.py:28-41), but usable from pytest instead of an env var.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                       LlamaForCausalLM)
from mllm_npu_tpu.models.mllm import SEED, GeneralizedMultimodalModel
from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
    SigLIPConfig, SigLIPVisionEncoder)
from mllm_npu_tpu.models.multimodal_projector.attention_resampler import (
    AttentionResampler)


from mllm_npu_tpu.utils.fake_tokenizer import FakeTokenizer  # noqa: F401  (back-compat re-export)


@dataclasses.dataclass
class TinySpec:
    batch: int = 2
    seq: int = 128
    max_images: int = 2
    image_size: int = 56
    nq: int = 4           # image tokens per image
    vocab: int = 4096     # matches FakeTokenizer's id range
    dtype: object = jnp.float32


def build_tiny_mllm(spec: TinySpec = TinySpec(), seed: bool = False,
                    llama_kw=None):
    lm_cfg = LlamaConfig.tiny(vocab_size=spec.vocab, **(llama_kw or {}))
    lm = LlamaForCausalLM(lm_cfg, dtype=spec.dtype)
    vis_cfg = SigLIPConfig.tiny(image_size=spec.image_size)
    vis = SigLIPVisionEncoder(vis_cfg, dtype=spec.dtype)
    grid = int(spec.nq ** 0.5)
    proj = AttentionResampler(grid_size=grid, embed_dim=lm_cfg.hidden_size,
                              num_heads=4, kv_dim=vis_cfg.hidden_size,
                              dtype=spec.dtype)
    kw = dict(language_model=lm, vision_encoder=vis, projector=proj,
              freeze_vision_encoder=True, lm_loss_scale=1.0,
              add_patch_pos=True, patch_pos_dim=lm_cfg.hidden_size)
    if seed:
        out_proj = AttentionResampler(
            grid_size=grid, embed_dim=vis_cfg.hidden_size,
            num_heads=4, kv_dim=lm_cfg.hidden_size, dtype=spec.dtype)
        # tiny siglip yields 16 tokens/image; vit_down pools 4x to match the
        # nq=4 recon tokens (mirrors the real 256->64 SEED-X config)
        model = SEED(output_projector=out_proj, rec_loss_scale=1.0,
                     vit_down=True, mse=False,
                     num_img_out_tokens=spec.nq, **kw)
    else:
        model = GeneralizedMultimodalModel(**kw)
    return model, lm_cfg, vis_cfg


def synthetic_batch(spec: TinySpec = TinySpec(), gen_images: int = 0,
                    cmp_images: int = 1, rng: int = 0):
    """Build a batch obeying the reference data contract: ids_cmp_mask has
    exactly nq True slots per selected comprehension image, in order;
    ids_gen_mask likewise for generation targets."""
    rs = np.random.RandomState(rng)
    B, S, N, nq = spec.batch, spec.seq, spec.max_images, spec.nq
    input_ids = rs.randint(10, spec.vocab, (B, S)).astype(np.int32)
    attention_mask = np.ones((B, S), np.int32)
    labels = input_ids.copy().astype(np.int32)
    images = rs.randn(N, spec.image_size, spec.image_size, 3).astype(
        np.float32)
    embeds_cmp_mask = np.zeros((N,), bool)
    embeds_gen_mask = np.zeros((N,), bool)
    ids_cmp_mask = np.zeros((B, S), bool)
    ids_gen_mask = np.zeros((B, S), bool)
    patch_positions = rs.rand(N, 2).astype(np.float32)

    pos = 4
    for i in range(cmp_images):
        embeds_cmp_mask[i] = True
        row = i % B
        ids_cmp_mask[row, pos:pos + nq] = True
        labels[row, pos:pos + nq] = -100
        pos += nq + 2
    for i in range(gen_images):
        embeds_gen_mask[cmp_images + i] = True
        row = i % B
        ids_gen_mask[row, pos:pos + nq] = True
        pos += nq + 2

    return {
        "input_ids": jnp.asarray(input_ids),
        "images": jnp.asarray(images),
        "attention_mask": jnp.asarray(attention_mask),
        "labels": jnp.asarray(labels),
        "embeds_cmp_mask": jnp.asarray(embeds_cmp_mask),
        "embeds_gen_mask": jnp.asarray(embeds_gen_mask),
        "ids_cmp_mask": jnp.asarray(ids_cmp_mask),
        "ids_gen_mask": jnp.asarray(ids_gen_mask),
        "patch_positions": jnp.asarray(patch_positions),
    }
