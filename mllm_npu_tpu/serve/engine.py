"""Inference engine: the model-side logic of the serve worker.

Implements both request branches of the reference worker
(reference serve/worker.py:164-320):
- comprehension (image_gen=False): b64 image → anyres tiling →
  '<patch>…</patch><img>…</img>Question: …\nAnswer:' prompt → jitted
  decode → special-token-stripped text
- generation (image_gen=True): '{caption}<img>' prompt → forced
  image-token ladder decode → output-projector features → (optional)
  SDXL de-tokenizer → b64 JPEG

Everything jit-compiled runs through MLLMGenerator; prompt-length
buckets keep recompiles bounded.
"""

from __future__ import annotations

import base64
import io
import logging
import re
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from mllm_npu_tpu.constant import (BOI_TOKEN, BOP_TOKEN, EOI_TOKEN,
                                   EOP_TOKEN, NUM_IMG_TOKENS)
from mllm_npu_tpu.data.utils import (grid_pinpoints_from_resolution_grids,
                                     process_anyres_image)
from mllm_npu_tpu.models.generation.generate import MLLMGenerator
from mllm_npu_tpu.models.generation.sampler import (SamplingConfig,
                                                    ladder_from_tokenizer)
from mllm_npu_tpu.data.tasks.image_caption import image_tokens_str

log = logging.getLogger(__name__)

DEFAULT_RESOLUTION_GRIDS = ("1x1", "1x2", "1x3", "2x1", "3x1", "1x4",
                            "4x1", "2x2")


class InferenceEngine:
    def __init__(self, *, model, lm_config, params, tokenizer,
                 image_transform, adapter=None,
                 resolution_grids=DEFAULT_RESOLUTION_GRIDS,
                 base_resolution: int = 448,
                 num_img_in_tokens: int = NUM_IMG_TOKENS,
                 num_img_out_tokens: int = NUM_IMG_TOKENS,
                 max_new_tokens: int = 512,
                 prompt_bucket: int = 128,
                 cache_dtype=jnp.bfloat16,
                 cast_params_bf16: bool = True,
                 quantize_int8: bool = False):
        self.tokenizer = tokenizer
        self.image_transform = image_transform
        self.adapter = adapter
        self.base_resolution = base_resolution
        self.grid_pinpoints = grid_pinpoints_from_resolution_grids(
            list(resolution_grids), base_resolution)
        self.num_img_in_tokens = num_img_in_tokens
        self.num_img_out_tokens = num_img_out_tokens
        self.prompt_bucket = prompt_bucket
        self.boi = tokenizer.encode(BOI_TOKEN, add_special_tokens=False)[0]
        self.eoi = tokenizer.encode(EOI_TOKEN, add_special_tokens=False)[0]
        self.bop = tokenizer.encode(BOP_TOKEN, add_special_tokens=False)[0]
        self.eop = tokenizer.encode(EOP_TOKEN, add_special_tokens=False)[0]
        ladder = ladder_from_tokenizer(tokenizer, num_img_out_tokens)
        eos = getattr(tokenizer, "eos_token_id", -1)
        self.generator = MLLMGenerator(
            model, lm_config, params,
            sampling=SamplingConfig(max_new_tokens=max_new_tokens,
                                    do_sample=False,
                                    eos_token_id=eos if eos is not None
                                    else -1,
                                    pad_token_id=getattr(
                                        tokenizer, "pad_token_id", 0) or 0),
            ladder=ladder, cache_dtype=cache_dtype,
            cast_params_bf16=cast_params_bf16,
            quantize_int8=quantize_int8)

    # -- helpers -----------------------------------------------------------

    def comprehension(self, input_text: str, image_b64: str,
                      max_new_tokens: Optional[int] = None) -> str:
        image = Image.open(io.BytesIO(
            base64.b64decode(image_b64))).convert("RGB")
        patches, patch_pos = process_anyres_image(
            image, self.image_transform, self.grid_pinpoints,
            self.base_resolution)
        n = patches.shape[0]
        image_tokens = "".join(
            image_tokens_str(self.num_img_in_tokens, BOP_TOKEN, EOP_TOKEN)
            for _ in range(n - 1))
        image_tokens += image_tokens_str(self.num_img_in_tokens)
        prompt = image_tokens + f"Question: {input_text}\nAnswer:"
        ids = [self.tokenizer.bos_token_id] + self.tokenizer.encode(
            prompt, add_special_tokens=False)
        ids = np.asarray(ids, np.int32)

        ids_cmp_mask = np.zeros_like(ids, bool)
        boi_idx = np.where((ids == self.boi) | (ids == self.bop))[0]
        eoi_idx = np.where((ids == self.eoi) | (ids == self.eop))[0]
        for b, e in zip(boi_idx, eoi_idx):
            ids_cmp_mask[b + 1:e] = True

        out = self.generator.generate(
            jnp.asarray(ids[None]),
            images=jnp.asarray(patches),
            embeds_cmp_mask=jnp.ones((n,), bool),
            ids_cmp_mask=jnp.asarray(ids_cmp_mask[None]),
            patch_positions=jnp.asarray(patch_pos),
            num_img_gen_tokens=self.num_img_out_tokens)
        gen_ids = np.asarray(out["generate_ids"][0])
        text = self._decode_text(gen_ids)
        text = re.sub(r"<[^>]*>", "", text)
        text = re.sub(r"\[(.*)\]", "", text)
        return text.split("\n")[0]

    def text_to_image_features(self, caption: str):
        prompt = f"{caption}{BOI_TOKEN}"
        ids = [self.tokenizer.bos_token_id] + self.tokenizer.encode(
            prompt, add_special_tokens=False)
        out = self.generator.generate_with_projection(
            jnp.asarray(np.asarray(ids, np.int32)[None]),
            tokenizer=self.tokenizer,
            num_img_gen_tokens=self.num_img_out_tokens)
        return out

    def generation(self, input_text: str, num_inference_steps: int = 50
                   ) -> str:
        if self.adapter is None:
            raise RuntimeError("no de-tokenizer adapter loaded")
        out = self.text_to_image_features(input_text)
        if not out.get("has_img_output"):
            raise RuntimeError("model produced no image tokens")
        # native resolution of the loaded denoiser (1024 for SDXL-base)
        size = (self.adapter.unet_module.config.sample_size
                * self.adapter.vae_module.config.spatial_scale_factor)
        images = self.adapter.generate(
            image_embeds=out["img_gen_feat"], height=size, width=size,
            num_inference_steps=num_inference_steps)
        buf = io.BytesIO()
        images[0].save(buf, format="JPEG")
        return base64.b64encode(buf.getvalue()).decode("utf-8")

    def _decode_text(self, gen_ids: np.ndarray) -> str:
        pad = self.generator.sampling.pad_token_id
        eos = self.generator.sampling.eos_token_id
        keep = gen_ids != pad
        if eos >= 0:
            hits = np.where(gen_ids == eos)[0]
            if len(hits):
                keep[hits[0]:] = False
        return self.tokenizer.decode(gen_ids[keep],
                                     skip_special_tokens=False)
