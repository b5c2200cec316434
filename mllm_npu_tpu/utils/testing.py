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


class FakeTokenizer:
    """Deterministic offline tokenizer for data-pipeline tests: special
    tokens (incl. the <img_xxxxx> ladder and <patch> spans) map to single
    dedicated ids; words hash into the remaining vocab."""

    def __init__(self, vocab_size: int = 4096, num_img_tokens: int = 100):
        from mllm_npu_tpu.constant import (BOI_TOKEN, BOP_TOKEN, EOI_TOKEN,
                                           EOP_TOKEN, IMG_TOKEN)
        self.vocab_size = vocab_size
        self.bos_token_id, self.eos_token_id, self.pad_token_id = 1, 2, 0
        self.bos_token, self.eos_token = "<s>", "</s>"
        self.special = {"<s>": 1, "</s>": 2, "<unk>": 0,
                        BOI_TOKEN: 10, EOI_TOKEN: 11,
                        BOP_TOKEN: 12, EOP_TOKEN: 13}
        for i in range(num_img_tokens):
            self.special[IMG_TOKEN.format(i)] = 20 + i
        self._rev = {v: k for k, v in self.special.items()}
        import re
        self._pattern = re.compile(
            "(" + "|".join(re.escape(t) for t in sorted(
                self.special, key=len, reverse=True)) + ")")
        self._word_base = 20 + num_img_tokens

    def encode(self, text: str, add_special_tokens: bool = False):
        ids = []
        for part in self._pattern.split(text):
            if not part:
                continue
            if part in self.special:
                ids.append(self.special[part])
            else:
                for w in part.split():
                    h = (hash(w) % (self.vocab_size - self._word_base))
                    ids.append(self._word_base + h)
        return ids

    def __call__(self, text, max_length=None, add_special_tokens=False,
                 truncation=False, padding=None, return_tensors=None):
        ids = self.encode(text, add_special_tokens=add_special_tokens)
        if truncation and max_length:
            ids = ids[:max_length]
        attn = [1] * len(ids)
        if padding == "max_length" and max_length:
            pad = max_length - len(ids)
            ids = ids + [self.pad_token_id] * pad
            attn = attn + [0] * pad
        out = {"input_ids": np.asarray([ids]),
               "attention_mask": np.asarray([attn])}
        return out

    def decode(self, ids, skip_special_tokens=False):
        toks = []
        for i in list(ids):
            i = int(i)
            if i in self._rev:
                if not skip_special_tokens:
                    toks.append(self._rev[i])
            else:
                toks.append(f"w{i}")
        return " ".join(toks)


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
