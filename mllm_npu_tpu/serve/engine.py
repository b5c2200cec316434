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
                 quantize_int8: bool = False,
                 quantize_int4: bool = False,
                 fuse_projections: bool = False,
                 fuse_shards: int = 1,
                 unroll_layers: bool = False,
                 speculative_k: int = 0,
                 speculative_ngram: int = 3):
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
            quantize_int8=quantize_int8,
            quantize_int4=quantize_int4,
            fuse_projections=fuse_projections, fuse_shards=fuse_shards,
            unroll_layers=unroll_layers,
            # prompt-lookup speculative decode (greedy B=1 requests):
            # measured at 8B int8 on v5e — a (k+1)-position verify
            # forward costs 1.10x a single-token step, so accepted
            # tokens convert ~1:1 into decode speedup
            speculative_k=speculative_k,
            speculative_ngram=speculative_ngram)

    # -- helpers -----------------------------------------------------------

    def _prepare_comprehension(self, input_text: str, image_b64: str):
        """b64 image + question → (prompt ids, anyres patches, masks).
        Shared by the single-request and continuous-batching paths.
        A null/empty image means text-only chat: no patch tower run,
        and (in the batched engine) the request is prefix-cacheable."""
        if not image_b64:
            prompt = f"Question: {input_text}\nAnswer:"
            ids = [self.tokenizer.bos_token_id] + self.tokenizer.encode(
                prompt, add_special_tokens=False)
            return np.asarray(ids, np.int32), None, None, None
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
        return ids, patches, patch_pos, ids_cmp_mask

    def _strip_text(self, gen_ids: np.ndarray) -> str:
        text = self._decode_text(gen_ids)
        text = re.sub(r"<[^>]*>", "", text)
        text = re.sub(r"\[(.*)\]", "", text)
        return text.split("\n")[0]

    def comprehension(self, input_text: str, image_b64: str,
                      max_new_tokens: Optional[int] = None) -> str:
        ids, patches, patch_pos, ids_cmp_mask = \
            self._prepare_comprehension(input_text, image_b64)
        if patches is None:
            out = self.generator.generate(
                jnp.asarray(ids[None]),
                num_img_gen_tokens=self.num_img_out_tokens)
            gen_ids = np.asarray(out["generate_ids"][0])
            return self._strip_text(gen_ids)
        n = patches.shape[0]
        out = self.generator.generate(
            jnp.asarray(ids[None]),
            images=jnp.asarray(patches),
            embeds_cmp_mask=jnp.ones((n,), bool),
            ids_cmp_mask=jnp.asarray(ids_cmp_mask[None]),
            patch_positions=jnp.asarray(patch_pos),
            num_img_gen_tokens=self.num_img_out_tokens)
        gen_ids = np.asarray(out["generate_ids"][0])
        return self._strip_text(gen_ids)

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


class BatchedInferenceEngine(InferenceEngine):
    """InferenceEngine whose comprehension branch runs through the
    ContinuousBatchingEngine: concurrent HTTP requests share one static
    KV cache and decode together (aggregate tokens/s scales with slots
    until the MXU saturates — the reference's semaphore serializes the
    model instead, reference serve/worker.py:360-371).

    The de-tokenizer (image_gen) branch stays on the single-request
    generator — forced-ladder decodes are short and per-request.

    Thread model: callers (worker executor threads) prepare inputs and
    ``submit``; one drain thread owns every jitted engine call; a
    Condition hands off completion events.
    """

    def __init__(self, *, num_slots: int = 8, max_len: int = 2048,
                 max_prompt: int = 1024, block_steps: int = 16,
                 batch_prompt_bucket: int = 128, mesh=None,
                 prefill_chunk: Optional[int] = None,
                 prefix_cache: Optional[int] = None, **kw):
        super().__init__(**kw)
        import threading

        from mllm_npu_tpu.serve.batched_engine import \
            ContinuousBatchingEngine

        gen = self.generator
        self.batch_engine = ContinuousBatchingEngine(
            gen.model, gen.lm_config, gen.params,
            num_slots=num_slots, max_len=max_len,
            block_steps=block_steps, prompt_bucket=batch_prompt_bucket,
            max_prompt=max_prompt,
            eos_token_id=gen.sampling.eos_token_id,
            pad_token_id=gen.sampling.pad_token_id,
            cache_dtype=gen.cache_dtype, mesh=mesh,
            prefill_chunk=prefill_chunk, prefix_cache=prefix_cache,
            ladder=gen.ladder,
            speculative_k=gen.speculative_k,
            speculative_ngram=gen.speculative_ngram)
        if mesh is not None:
            # the engine sharded the params across the mesh; point the
            # single-request generator (image_gen branch) at the SAME
            # arrays so the unsharded copy can be freed — otherwise the
            # full weights exist twice in HBM, defeating --tensor-
            # parallel's purpose on memory-bound models
            gen.params = self.batch_engine.params
        self._cv = threading.Condition()
        self._inflight: dict = {}          # uid -> (Request, Event)
        self._engine_error: Optional[BaseException] = None
        self._drain = threading.Thread(target=self._drain_loop,
                                       daemon=True)
        self._drain.start()

    def _submit(self, input_text: str, image_b64: str,
                max_new_tokens: Optional[int], q=None):
        ids, patches, patch_pos, ids_cmp_mask = \
            self._prepare_comprehension(input_text, image_b64)
        return self._submit_ids(ids, patches, patch_pos, ids_cmp_mask,
                                max_new_tokens, q)

    def _submit_ids(self, ids, patches, patch_pos, ids_cmp_mask,
                    max_new_tokens: Optional[int], q=None):
        import threading

        eng = self.batch_engine
        want = max_new_tokens or self.generator.sampling.max_new_tokens
        mnt = min(want, eng.capacity_for(len(ids)))
        if mnt < 1:
            raise ValueError(
                f"prompt of {len(ids)} tokens exceeds the batched "
                f"engine's capacity (max_prompt={eng.max_prompt}, "
                f"max_len={eng.max_len})")
        if mnt < want:
            log.warning(
                "truncating max_new_tokens %d -> %d: prompt of %d "
                "tokens leaves only that much cache-row capacity "
                "(raise the worker's --max-cache-len for longer "
                "answers)", want, mnt, len(ids))
        ev = threading.Event()
        with self._cv:
            if self._engine_error is not None:
                raise RuntimeError("batched engine failed") \
                    from self._engine_error
            if patches is None:
                # text-only: eligible for the prompt-prefix KV cache
                req = eng.submit(ids, max_new_tokens=mnt)
            else:
                req = eng.submit(
                    ids, images=jnp.asarray(patches),
                    embeds_cmp_mask=jnp.ones((patches.shape[0],), bool),
                    ids_cmp_mask=ids_cmp_mask,
                    patch_positions=jnp.asarray(patch_pos),
                    max_new_tokens=mnt)
            # mutable entry: [req, done-event, stream queue, #sent]
            self._inflight[req.uid] = [req, ev, q, 0]
            self._cv.notify()
        return req, ev

    def _raise_if_failed(self, req):
        with self._cv:
            if self._engine_error is not None:
                raise RuntimeError("batched engine failed") \
                    from self._engine_error
        if req.error is not None:
            # per-request failure (isolated in the engine's _admit —
            # other slots kept serving); maps to error_code 1
            raise ValueError(f"request failed: {req.error}")

    def comprehension(self, input_text: str, image_b64: str,
                      max_new_tokens: Optional[int] = None) -> str:
        req, ev = self._submit(input_text, image_b64, max_new_tokens)
        ev.wait()
        self._raise_if_failed(req)
        return self._strip_text(np.asarray(req.tokens, np.int32))

    def generate_ids(self, ids, max_new_tokens: int) -> np.ndarray:
        """Raw-token-id text generation through the batched engine —
        the eval harness path (evaluate/evaluator.py): text-only
        requests are prompt-prefix-cacheable, so few-shot benchmarks
        whose items share a long dev-shot preamble prefill only the
        question suffix after the first item."""
        req, ev = self._submit_ids(np.asarray(ids, np.int32), None,
                                   None, None, max_new_tokens)
        ev.wait()
        self._raise_if_failed(req)
        return np.asarray(req.tokens, np.int32)

    def comprehension_stream(self, input_text: str, image_b64: str,
                             max_new_tokens: Optional[int] = None):
        """Generator of CUMULATIVE text snapshots — one per decode
        block as the drain thread distributes emissions (plus a final
        snapshot). The last yielded value equals comprehension()'s."""
        import queue as _queue

        q: "_queue.Queue" = _queue.Queue()
        req, ev = self._submit(input_text, image_b64, max_new_tokens, q)
        while True:
            toks = q.get()
            if toks is None:
                break
            yield self._strip_text(np.asarray(toks, np.int32))
        ev.wait()
        self._raise_if_failed(req)
        yield self._strip_text(np.asarray(req.tokens, np.int32))

    def _drain_loop(self):
        eng = self.batch_engine
        while True:
            with self._cv:
                while not self._inflight and self._engine_error is None:
                    self._cv.wait()
                if self._engine_error is not None:
                    return
            try:
                eng.step()
            except BaseException as e:  # noqa: BLE001 — fail loudly
                log.exception("batched engine drain loop failed")
                with self._cv:
                    self._engine_error = e
                    for _, (req, ev, q, _seen) in self._inflight.items():
                        req.done = True
                        if q is not None:
                            q.put(None)
                        ev.set()
                    self._inflight.clear()
                return
            with self._cv:
                done = []
                for uid, entry in self._inflight.items():
                    req, ev, q, seen = entry
                    if q is not None and len(req.tokens) > seen \
                            and not req.done:
                        q.put(list(req.tokens))
                        entry[3] = len(req.tokens)
                    if req.done:
                        if q is not None:
                            q.put(None)
                        ev.set()
                        done.append(uid)
                for uid in done:
                    self._inflight.pop(uid)
