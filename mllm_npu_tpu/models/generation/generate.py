"""End-to-end generation for the MLLM assemblies (jitted prefill + decode).

Mirrors the reference's two generate paths:
- comprehension (img2txt): GeneraliazedMultimodalModels.generate /
  SEED.generate text branch (reference mllm.py:153-208, 389-453)
- generation (txt2img): SEED.generate with the forced image-token ladder
  and hidden-window extraction feeding the output projector
  (reference mllm.py:445-488)

TPU design: one jit per (prompt_len, max_new_tokens) bucket; the decode
loop is a ``lax.while_loop`` over a static KV cache; the logits
processor is a pure jnp transform (sampler.apply_image_ladder).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.models.generation.sampler import (
    ImageTokenLadder, SamplingConfig, apply_image_ladder, decode_loop,
    extract_img_windows)
from mllm_npu_tpu.models.language_models.llama import init_cache


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def rebuild_llm(model, lm_config, params, transform, **cfg_updates):
    """Serving-time weight-layout transform: clone the assembly with an
    updated LlamaConfig and run ``transform`` over the LLM's param
    subtree (the shared machinery behind fuse / int8-quantize / unroll;
    also used by the benches). Returns (model, lm_config, params)."""
    lm_config = dataclasses.replace(lm_config, **cfg_updates)
    lm = model.language_model
    model = model.clone(
        language_model=type(lm)(lm_config, lm.dtype, lm.param_dtype))
    p = dict(params["params"])
    p["language_model"] = transform(p["language_model"])
    params = dict(params)
    params["params"] = p
    return model, lm_config, params


class MLLMGenerator:
    """Holds jitted prefill/decode closures for one (model, params) pair.

    ``model`` is a GeneralizedMultimodalModel or SEED flax module;
    ``lm_config`` its language model's LlamaConfig.
    """

    def __init__(self, model, lm_config, params, *,
                 sampling: SamplingConfig = SamplingConfig(),
                 ladder: Optional[ImageTokenLadder] = None,
                 prompt_bucket: int = 128,
                 cache_dtype=jnp.bfloat16,
                 cast_params_bf16: bool = False,
                 quantize_int8: bool = False,
                 quantize_int4: bool = False,
                 merge_lora: bool = False,
                 fuse_projections: bool = False,
                 fuse_shards: int = 1,
                 unroll_layers: bool = False,
                 speculative_k: int = 0,
                 speculative_ngram: int = 3):
        if lm_config.lora_rank > 0 and (merge_lora or fuse_projections
                                        or quantize_int8 or quantize_int4):
            # fold adapters into the base kernels for deployment (peft
            # merge_and_unload parity) — fused/int8 layouts require the
            # plain kernel layout, and merged decode also drops the
            # adapter matmuls from every step
            from mllm_npu_tpu.utils.weights import merge_lora_params
            alpha = lm_config.lora_alpha
            model, lm_config, params = rebuild_llm(
                model, lm_config, params,
                lambda p: merge_lora_params(p, alpha),
                lora_rank=0)
        if fuse_projections:
            # one qkv matvec + one gate_up matvec per block: fewer
            # kernel launches in the decode while_loop. fuse_shards > 1
            # = tensor-parallel interleaved layout (set it to the mesh's
            # tensor-axis size so shard slices never straddle q/k/v)
            from mllm_npu_tpu.utils.weights import fuse_llama_projections
            model, lm_config, params = rebuild_llm(
                model, lm_config, params,
                lambda p: fuse_llama_projections(p, shards=fuse_shards),
                fused_projections=True, fused_shards=fuse_shards)
        if cast_params_bf16:
            # inference is weight-bandwidth-bound (every decode step
            # streams all weights from HBM); bf16 storage halves it
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        if quantize_int8 or quantize_int4:
            # int8/int4 weight-only LLM: halve (or quarter) the weight
            # traffic (ops/quant.py). int4 uses group-wise scales.
            # LoRA'd LLMs were auto-merged above.
            assert not (quantize_int8 and quantize_int4), \
                "pick one of int8 / int4"
            from mllm_npu_tpu.utils.weights import quantize_llama_params
            bits = 4 if quantize_int4 else 8
            gs = lm_config.quant_group_size
            model, lm_config, params = rebuild_llm(
                model, lm_config, params,
                lambda p: quantize_llama_params(p, bits=bits,
                                                group_size=gs),
                quantization=f"int{bits}")
        if unroll_layers:
            # per-layer params instead of nn.scan's stacked layout:
            # scan slices every layer's weights out of the stacked
            # array each decode step, and Pallas custom calls (int8
            # matmul) can't fuse the slice — each kernel gets copied
            # per token (~9ms/token at 8B; unrolling measured
            # 63 -> 90 tok/s single-request on one v5e). Use for
            # int8 serving; bf16 XLA dots fuse the slice and don't
            # need it.
            from mllm_npu_tpu.utils.weights import unstack_llama_params
            model, lm_config, params = rebuild_llm(
                model, lm_config, params, unstack_llama_params,
                scan_layers=False)
        self.model = model
        self.lm_config = lm_config
        self.params = params
        self.sampling = sampling
        self.ladder = ladder
        self.prompt_bucket = prompt_bucket
        self.cache_dtype = cache_dtype
        # prompt-lookup speculative decoding (greedy, B=1): verify k
        # n-gram-proposed tokens per forward; 0 disables
        self.speculative_k = speculative_k
        self.speculative_ngram = speculative_ngram
        self._compiled = {}

    # -- model plumbing (apply with method=...) ---------------------------

    def _embed_and_scatter(self, params, input_ids, images,
                           embeds_cmp_mask, ids_cmp_mask, patch_positions):
        return self.model.apply(
            params, input_ids, images, embeds_cmp_mask, ids_cmp_mask,
            patch_positions, method=self.model.embed_and_scatter)

    def _lm_forward(self, params, inputs_embeds=None, input_ids=None,
                    cache=None, attn_mask=None, positions=None,
                    segment_ids=None, prefill=False):
        def fwd(m, **kw):
            return m.language_model(**kw)
        return self.model.apply(
            params, inputs_embeds=inputs_embeds, input_ids=input_ids,
            cache=cache, attn_mask=attn_mask, positions=positions,
            segment_ids=segment_ids, prefill=prefill, method=fwd)

    def _output_project(self, params, windows):
        def proj(m, x):
            return m.output_projector(x)
        return self.model.apply(params, windows, method=proj)

    # -- compiled path ----------------------------------------------------

    def _get_compiled(self, prompt_len: int, has_images: bool,
                      num_images: int, sampling=None):
        # sampling is a trace-time constant of the jitted closure, so a
        # per-call override participates in the cache key (frozen
        # dataclass -> hashable); callers never mutate self.sampling
        sampling = sampling if sampling is not None else self.sampling
        key = (prompt_len, has_images, num_images, sampling)
        if key in self._compiled:
            return self._compiled[key]

        cfg = self.lm_config
        ladder = self.ladder
        spec_k = self.speculative_k if not sampling.do_sample else 0
        max_len = prompt_len + sampling.max_new_tokens + spec_k

        def run(params, input_ids, prompt_mask, images, embeds_cmp_mask,
                ids_cmp_mask, patch_positions, rng):
            B, Sp = input_ids.shape
            if has_images:
                inputs_embeds, _ = self._embed_and_scatter(
                    params, input_ids, images, embeds_cmp_mask,
                    ids_cmp_mask, patch_positions)
            else:
                inputs_embeds, _ = self._embed_and_scatter(
                    params, input_ids, None, None, None, None)

            cache = init_cache(cfg, B, max_len, dtype=self.cache_dtype)
            # right-padded prompts: per-row lengths via prompt_mask —
            # positions restart-free cumsum, padding masked as segment 0,
            # decode attends only to real prompt keys + generated keys
            from mllm_npu_tpu.ops import SegmentIds
            pm = prompt_mask.astype(jnp.int32)
            row_len = pm.sum(axis=-1)                       # [B]
            positions_p = jnp.clip(jnp.cumsum(pm, axis=-1) - 1, 0, None)
            logits, hidden, cache = self._lm_forward(
                params, inputs_embeds=inputs_embeds, cache=cache,
                positions=positions_p,
                segment_ids=SegmentIds(q=pm, kv=pm),
                prefill=True)    # flash over the prompt; cache write only
            idx_last = (row_len - 1)[:, None]
            last_logits = jnp.take_along_axis(
                logits, idx_last[:, :, None], axis=1)[:, 0].astype(
                    jnp.float32)
            last_token_ids = jnp.take_along_axis(input_ids, idx_last,
                                                 axis=1)[:, 0]
            if ladder is not None:
                last_logits = apply_image_ladder(
                    last_logits, last_token_ids, ladder)
            rng, sub = jax.random.split(rng)
            from mllm_npu_tpu.models.generation.sampler import _sample
            first_token = _sample(last_logits, sub, sampling)
            first_hidden = jnp.take_along_axis(
                hidden, idx_last[:, :, None], axis=1)[:, 0]

            # keys valid over the whole cache: real prompt tokens +
            # everything decoded after position Sp
            base_valid = jnp.concatenate(
                [pm.astype(bool),
                 jnp.ones((B, max_len - Sp), bool)], axis=1)
            decode_am = base_valid[:, None, None, :]

            if spec_k > 0 and B == 1:
                from mllm_npu_tpu.models.generation.sampler import \
                    speculative_decode_loop

                def step_multi(toks, c):
                    pos_t = (row_len[:, None]
                             + (c["pos"] - Sp)
                             + jax.lax.broadcasted_iota(
                                 jnp.int32, (B, spec_k + 1), 1))
                    logits, h, c = self._lm_forward(
                        params, input_ids=toks, cache=c,
                        positions=pos_t, attn_mask=decode_am)
                    return logits, h, c

                tokens, hiddens, done, _ = speculative_decode_loop(
                    step_multi, cache, first_token, first_hidden,
                    sampling, input_ids, ladder=ladder, k=spec_k,
                    ngram=self.speculative_ngram, prompt_len=row_len[0])
                return tokens, hiddens

            def step(tok, cache):
                pos_t = (row_len + (cache["pos"] - Sp))[:, None]
                logits, h, cache = self._lm_forward(
                    params, input_ids=tok, cache=cache,
                    positions=pos_t, attn_mask=decode_am)
                return (logits[:, -1].astype(jnp.float32), h[:, -1], cache)

            tokens, hiddens, done = decode_loop(
                step, cache, first_token, first_hidden, rng, sampling,
                ladder=ladder)
            return tokens, hiddens

        jitted = jax.jit(run)
        self._compiled[key] = jitted
        return jitted

    # -- public API --------------------------------------------------------

    def generate(self, input_ids, *, prompt_mask=None, images=None,
                 embeds_cmp_mask=None, ids_cmp_mask=None,
                 patch_positions=None, rng=None,
                 num_img_gen_tokens: int = 64, max_gen_imgs: int = 4,
                 sampling=None):
        """input_ids: [B, Sp]; optional ``prompt_mask`` [B, Sp] enables
        right-padded batches with per-row prompt lengths. ``sampling``
        overrides the generator's SamplingConfig for this call (keys a
        separate compiled closure; safe under concurrency).

        Returns dict with generated ids [B, T], per-step hidden states,
        and (for SEED) image-generation features."""
        eff_sampling = sampling if sampling is not None else self.sampling
        # a window can never exceed the decode budget
        num_img_gen_tokens = min(num_img_gen_tokens,
                                 eff_sampling.max_new_tokens)
        input_ids = jnp.asarray(input_ids, jnp.int32)
        if input_ids.ndim == 1:
            input_ids = input_ids[None]
        B, Sp = input_ids.shape
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        has_images = images is not None
        n_img = 0 if images is None else int(images.shape[0])

        if prompt_mask is None:
            prompt_mask = jnp.ones((B, Sp), jnp.int32)
        else:
            prompt_mask = jnp.asarray(prompt_mask, jnp.int32)
        fn = self._get_compiled(Sp, has_images, n_img, sampling=sampling)
        tokens, hiddens = fn(self.params, input_ids, prompt_mask,
                             images, embeds_cmp_mask, ids_cmp_mask,
                             patch_positions, rng)

        out = {"generate_ids": tokens, "hidden_states": hiddens}
        if self.ladder is not None:
            windows, valid, text_mask = jax.vmap(
                lambda t, h: extract_img_windows(
                    t, h, self.ladder.eoi, num_img_gen_tokens,
                    max_gen_imgs, boi_token_id=self.ladder.boi)
            )(tokens, hiddens)
            out["img_windows"] = windows
            out["img_valid"] = valid
            out["text_mask"] = text_mask
        return out

    def generate_with_projection(self, input_ids, tokenizer=None, **kw):
        """SEED path: decode + project image windows through the output
        projector; returns reference-shaped dict (text, has_img_output,
        img_gen_feat, num_gen_imgs — reference mllm.py:483-488)."""
        out = self.generate(input_ids, **kw)
        result = {
            "generate_ids": out["generate_ids"],
        }
        if "img_windows" in out:
            valid = np.asarray(out["img_valid"])
            n = int(valid.sum())
            result["has_img_output"] = n > 0
            result["num_gen_imgs"] = n
            if n > 0:
                B, M = valid.shape
                win = out["img_windows"].reshape(
                    B * M, *out["img_windows"].shape[2:])
                feats = self._output_project(self.params, win)
                feats = feats.reshape(B, M, *feats.shape[1:])
                sel = np.argwhere(valid)
                result["img_gen_feat"] = jnp.stack(
                    [feats[b, m] for b, m in sel])
            else:
                result["img_gen_feat"] = None
        if tokenizer is not None:
            ids = np.asarray(out["generate_ids"][0])
            tm = np.asarray(out.get("text_mask",
                                    np.ones_like(ids, bool))[0])
            # trim at eos/pad
            keep = ids != self.sampling.pad_token_id
            if self.sampling.eos_token_id >= 0:
                eos = np.where(ids == self.sampling.eos_token_id)[0]
                if len(eos):
                    keep[eos[0]:] = False
            text_ids = ids[tm & keep]
            result["text"] = tokenizer.decode(text_ids,
                                              skip_special_tokens=False)
        return result
