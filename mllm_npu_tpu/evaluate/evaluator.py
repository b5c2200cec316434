"""Eval-side model interface.

Two capabilities the seven benchmarks need (reference evaluate/*):
- ``generate_text(prompt, image_path=None, max_new_tokens)`` — greedy
  decode, optionally with an anyres-tiled image (reference mme.py:12-88)
- ``lm_loss(text_with_img_spans, image_paths)`` — forward loss for
  choice ranking (reference seed_bench2.py:65-234)
"""

from __future__ import annotations

import logging
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from mllm_npu_tpu.constant import (BOI_TOKEN, BOP_TOKEN, EOI_TOKEN,
                                   EOP_TOKEN, IGNORE_INDEX)
from mllm_npu_tpu.data.utils import process_anyres_image
from mllm_npu_tpu.data.tasks.image_caption import image_tokens_str

log = logging.getLogger(__name__)

RESOLUTION_GRIDS = ("1x1", "1x2", "1x3", "2x1", "3x1", "1x4", "4x1", "2x2")


class EvalModel:
    """Wraps an InferenceEngine (serve.engine) + raw forward access."""

    def __init__(self, engine, model=None, params=None, max_length=1024):
        self.engine = engine
        self.model = model if model is not None else engine.generator.model
        self.params = params if params is not None else engine.generator.params
        self.tokenizer = engine.tokenizer
        self.max_length = max_length

    # ---- text-only generation (mmlu/cmmlu/bbh/ceval) ----------------------

    def generate_text(self, prompt: str, max_new_tokens: int = 10) -> str:
        tok = self.tokenizer
        ids = [tok.bos_token_id] + tok.encode(prompt,
                                              add_special_tokens=False)
        if hasattr(self.engine, "generate_ids"):
            # BatchedInferenceEngine: rides the continuous-batching
            # engine — with a prefix cache, the few-shot preamble the
            # benchmark repeats on every item prefills ONCE (measured
            # on v5e at 8B: benchmarks/eval_speed.py --prefix_cache)
            toks = self.engine.generate_ids(ids, max_new_tokens)
            return self.engine._decode_text(toks)
        gen = self.engine.generator
        import dataclasses
        # per-call sampling override (keys its own compiled closure) —
        # no mutation of the shared generator, safe under the batched
        # engine's concurrency
        out = gen.generate(
            jnp.asarray(np.asarray(ids, np.int32)[None]),
            sampling=dataclasses.replace(gen.sampling,
                                         max_new_tokens=max_new_tokens))
        return self.engine._decode_text(np.asarray(out["generate_ids"][0]))

    def supports_concurrent_text(self) -> bool:
        return hasattr(self.engine, "generate_ids")

    def generate_text_many(self, prompts, max_new_tokens: int = 10):
        """Concurrent text generation through the batched engine: all
        items submit up front and decode together in the slot batch
        (plus prefix-cache reuse of a shared few-shot preamble).
        Greedy decode is per-slot deterministic, so results are
        identical to the serial loop — parity-tested in
        tests/test_evaluate.py."""
        import concurrent.futures as _f
        tok = self.tokenizer

        def one(p):
            ids = [tok.bos_token_id] + tok.encode(
                p, add_special_tokens=False)
            return self.engine._decode_text(
                self.engine.generate_ids(ids, max_new_tokens))

        # generate_ids blocks on a per-request Event; a small thread
        # pool keeps several requests in flight so the engine's slots
        # actually fill (the engine itself is single-drain-threaded)
        with _f.ThreadPoolExecutor(max_workers=8) as ex:
            return list(ex.map(one, prompts))

    # ---- image comprehension (mme/mmvet) ----------------------------------

    def generate_with_image(self, query: str, img_path: str,
                            prompt_template: str =
                            "Question: {}\nAnswer:") -> str:
        import base64
        import io
        image = Image.open(img_path).convert("RGB")
        buf = io.BytesIO()
        image.save(buf, format="JPEG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        # engine.comprehension builds the anyres prompt + masks
        return self.engine.comprehension(query, b64)

    # ---- loss ranking (seed_bench2) ---------------------------------------

    def lm_loss(self, text: str, image_paths: list[str]) -> float:
        """Forward loss on an interleaved sample where each '<img>' in
        ``text`` marks one image (anyres-tiled)."""
        tok = self.tokenizer
        eng = self.engine
        parts = text.split(BOI_TOKEN)
        assert len(parts) == len(image_paths) + 1, (
            f"{len(parts) - 1} <img> tags vs {len(image_paths)} images")

        input_ids = [tok.bos_token_id]
        all_patches, all_pos = [], []
        ids_cmp_spans = []
        for i, part in enumerate(parts):
            if i > 0:
                image = Image.open(image_paths[i - 1]).convert("RGB")
                patches, pos = process_anyres_image(
                    image, eng.image_transform, eng.grid_pinpoints,
                    eng.base_resolution)
                n = patches.shape[0]
                all_patches.append(patches)
                all_pos.append(pos)
                toks = "".join(
                    image_tokens_str(eng.num_img_in_tokens, BOP_TOKEN,
                                     EOP_TOKEN) for _ in range(n - 1))
                toks += image_tokens_str(eng.num_img_in_tokens)
                input_ids.extend(tok.encode(toks, add_special_tokens=False))
            if part:
                input_ids.extend(tok.encode(part,
                                            add_special_tokens=False))
        input_ids.append(tok.eos_token_id)
        input_ids = np.asarray(input_ids[:self.max_length], np.int32)

        ids_cmp_mask = np.zeros_like(input_ids, bool)
        starts = np.where((input_ids == eng.boi) | (input_ids == eng.bop))[0]
        ends = np.where((input_ids == eng.eoi) | (input_ids == eng.eop))[0]
        for b, e in zip(starts, ends):
            ids_cmp_mask[b + 1:e] = True

        images = (np.concatenate(all_patches, axis=0) if all_patches
                  else np.zeros((1,) + (eng.image_transform.image_size,) * 2
                                + (3,), np.float32))
        pos = (np.concatenate(all_pos, axis=0) if all_pos
               else np.full((1, 2), 0.5, np.float32))
        n = images.shape[0]

        labels = input_ids.copy()
        labels[ids_cmp_mask] = IGNORE_INDEX

        out = self.model.apply(
            self.params,
            input_ids=jnp.asarray(input_ids[None]),
            images=jnp.asarray(images),
            attention_mask=jnp.ones((1, len(input_ids)), jnp.int32),
            labels=jnp.asarray(labels[None]),
            embeds_gen_mask=jnp.zeros((n,), bool),
            embeds_cmp_mask=jnp.ones((n,), bool),
            ids_gen_mask=jnp.zeros_like(jnp.asarray(ids_cmp_mask[None])),
            ids_cmp_mask=jnp.asarray(ids_cmp_mask[None]),
            patch_positions=jnp.asarray(pos))
        return float(out["lm_loss"])


def strip_special(text: str) -> str:
    text = re.sub(r"<[^>]*>", "", text)
    text = re.sub(r"\[(.*)\]", "", text)
    return text
