"""Multimodal model assemblies (Flax).

Capability parity with the reference's two assemblies
(mllm_npu/models/mllm.py):

- :class:`GeneralizedMultimodalModel` — LLaVA-style comprehension:
  vision encoder → projector → scatter projected image tokens into the
  token-embedding sequence at ``ids_cmp_mask`` positions → LLM
  (reference mllm.py:46-151).
- :class:`SEED` — adds an output projector and a reconstruction loss
  between LLM hidden states at ``ids_gen_mask`` positions and (optionally
  4×-pooled) encoder targets, cosine or MSE (reference mllm.py:233-387).

TPU-first redesign notes:
- The data contract (images + embeds_cmp/gen_mask + ids_cmp/gen_mask +
  patch_positions) is preserved verbatim, but every shape is static:
  ``images`` is a fixed-capacity [N, H, W, 3] buffer with boolean
  validity masks; the reference's boolean fancy-indexing scatter
  (mllm.py:135 ``input_embeds[ids_cmp_mask] = ...``) becomes an
  order-preserving cumsum-gather + ``where`` that XLA compiles to pure
  vector ops.
- The reference's fake-image / 0.0-multiplier tricks (mllm.py:95-139)
  existed to keep ZeRO-3 graphs identical across ranks; under GSPMD all
  devices run one program, so they are structurally unnecessary — zero
  contributions fall out of the masked scatter.
- ``freeze_vision_encoder`` uses ``stop_gradient`` (+ optimizer masking
  in the trainer), the functional analogue of requires_grad_(False)
  (reference mllm.py:58, 70-77).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mllm_npu_tpu.models.language_models.llama import (causal_lm_loss,
                                                       packed_positions)
from mllm_npu_tpu.ops import SegmentIds


def _safe_unit(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """x / ||x|| with a gradient that is finite at x == 0 (padded image
    slots are exact zeros; x/(||x||+eps) has d||x||/dx = x/||x|| = 0/0
    there, and the 0 weight multiplies the NaN instead of masking it)."""
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True)
                             + eps * eps)


def cosine_loss(rec: jax.Array, target: jax.Array,
                weights: Optional[jax.Array] = None) -> jax.Array:
    """1 - cosine similarity, meaned (reference mllm.py:11-15); optional
    per-image weights for masking padded image slots."""
    target = _safe_unit(target)
    rec = _safe_unit(rec)
    per = 1.0 - jnp.sum(target * rec, axis=-1)   # [N, nq]
    if weights is None:
        return per.mean()
    w = weights[:, None].astype(per.dtype)
    denom = jnp.maximum(w.sum() * per.shape[1], 1.0)
    return (per * w).sum() / denom


def mse_loss(rec: jax.Array, target: jax.Array,
             weights: Optional[jax.Array] = None) -> jax.Array:
    per = (rec - target) ** 2   # [N, nq, D]
    if weights is None:
        return per.mean()
    w = weights[:, None, None].astype(per.dtype)
    denom = jnp.maximum(w.sum() * per.shape[1] * per.shape[2], 1.0)
    return (per * w).sum() / denom


def compact_selected(x: jax.Array, sel: jax.Array) -> jax.Array:
    """Move rows with sel=True to the front, preserving order (static
    shape replacement for ``x[sel]``); trailing rows are zeros.

    Sharding-preserving: an exclusive cumsum over the (small) leading
    axis plus a scatter-add — no argsort, no data-dependent gather from
    a sharded source, so GSPMD keeps the leading axis sharded and
    resolves the scatter with one all-reduce over a small buffer.
    """
    n = x.shape[0]
    m = sel.astype(jnp.int32)
    dest = jnp.cumsum(m) - m                      # exclusive cumsum [n]
    dest = jnp.where(sel, dest, n)                # unselected → dropped
    keep = sel.reshape((n,) + (1,) * (x.ndim - 1))
    updates = jnp.where(keep, x, jnp.zeros_like(x))
    return jnp.zeros_like(x).at[dest].add(updates, mode="drop")


def _row_major_slots(ids_mask: jax.Array) -> jax.Array:
    """[B, S] bool → [B, S] int32: the row-major ordinal of each True
    position (value undefined where False). Per-row cumsum + a [B]
    row-offset cumsum — keeps B (and S, under sequence parallelism)
    sharded, unlike a cumsum over the flattened B·S axis."""
    m = ids_mask.astype(jnp.int32)
    within = jnp.cumsum(m, axis=1) - m            # exclusive, per row
    counts = m.sum(axis=1)                        # [B]
    row_off = jnp.cumsum(counts) - counts         # exclusive, tiny
    return within + row_off[:, None]


def scatter_image_embeds(input_embeds: jax.Array,      # [B, S, D]
                         ids_mask: jax.Array,          # [B, S] bool
                         image_embeds: jax.Array,      # [N, nq, D] compacted
                         ) -> jax.Array:
    """input_embeds[ids_mask] = image_embeds.reshape(-1, D), statically.

    ``ids_mask`` must have exactly (num selected images × nq) True
    positions in row-major order — the reference's data contract
    (mllm_npu/models/mllm.py:135).

    Batch-sharding-preserving: everything stays [B, S, ...] — the only
    cross-batch op is a [B]-length cumsum and a gather from the (small)
    image-embed table, which GSPMD resolves by replicating the N·nq·D
    source rather than the B·S·D activation (the round-2 involuntary
    full rematerialization, MULTICHIP_r02).
    """
    D = input_embeds.shape[-1]
    flat_src = image_embeds.reshape(-1, D).astype(input_embeds.dtype)
    slot = jnp.clip(_row_major_slots(ids_mask), 0, flat_src.shape[0] - 1)
    gathered = jnp.take(flat_src, slot, axis=0)   # [B, S, D]
    return jnp.where(ids_mask[..., None], gathered, input_embeds)


def gather_masked_tokens(hidden: jax.Array,   # [B, S, D]
                         ids_mask: jax.Array,  # [B, S] bool
                         capacity: int) -> jax.Array:
    """hidden[ids_mask].reshape(n, -1, D) with a static capacity: returns
    [capacity, D] rows — the first ``ids_mask.sum()`` are the masked
    tokens in row-major order, the rest are zeros (mask downstream).

    Scatter-add into a small replicated [capacity, D] buffer (each slot
    written at most once, so add ≡ set) — keeps the B·S activation
    sharded; GSPMD emits local scatters + one all-reduce of the buffer.
    """
    B, S, D = hidden.shape
    slot = jnp.where(ids_mask, _row_major_slots(ids_mask), capacity)
    updates = jnp.where(ids_mask[..., None], hidden,
                        jnp.zeros_like(hidden))
    out = jnp.zeros((capacity, D), hidden.dtype)
    return out.at[slot.reshape(-1)].add(updates.reshape(-1, D),
                                        mode="drop")


def _patch_pos_bias(patch_positions: jax.Array, table: jax.Array) -> jax.Array:
    """[N, 2] normalized patch centers × [4, D] corner table → [N, 1, D]
    (reference mllm.py:112-118)."""
    rel = jnp.concatenate([patch_positions, 1 - patch_positions], axis=-1) / 2
    return (rel.astype(table.dtype) @ table)[:, None, :]


class GeneralizedMultimodalModel(nn.Module):
    """vision encoder + projector + LLM (LLaVA-style comprehension)."""
    language_model: nn.Module
    vision_encoder: nn.Module
    projector: nn.Module
    freeze_vision_encoder: bool = True
    lm_loss_scale: float = 1.0
    add_patch_pos: bool = False
    patch_pos_dim: int = 4096
    # chunked (fused-linear) CE: compute the LM loss from hidden states
    # in sequence chunks of this many positions, never materializing the
    # full [B, S, V] logits (llama.chunked_causal_lm_loss). 0 = dense.
    ce_loss_chunk: int = 0

    def setup(self):
        if self.add_patch_pos:
            self.patch_pos_embed = self.param(
                "patch_pos_embed",
                nn.initializers.normal(stddev=self.patch_pos_dim ** -0.5),
                (4, self.patch_pos_dim), jnp.float32)

    def forward_images(self, images, patch_positions=None):
        image_embeds = self.vision_encoder(images)
        if self.freeze_vision_encoder:
            image_embeds = jax.lax.stop_gradient(image_embeds)
        return image_embeds

    def project_images(self, image_embeds, patch_positions=None):
        image_embeds_lm = self.projector(image_embeds)
        if self.add_patch_pos and patch_positions is not None:
            image_embeds_lm = image_embeds_lm + _patch_pos_bias(
                patch_positions,
                self.patch_pos_embed.astype(image_embeds_lm.dtype))
        return image_embeds_lm

    def embed_and_scatter(self, input_ids, images, embeds_cmp_mask,
                          ids_cmp_mask, patch_positions):
        input_embeds = self.language_model.embed(input_ids)
        if images is None:
            return input_embeds, None
        image_embeds = self.forward_images(images)
        proj_in = compact_selected(image_embeds, embeds_cmp_mask)
        pp = None
        if patch_positions is not None:
            pp = compact_selected(patch_positions, embeds_cmp_mask)
        image_embeds_lm = self.project_images(proj_in, pp)
        input_embeds = scatter_image_embeds(
            input_embeds, ids_cmp_mask, image_embeds_lm)
        return input_embeds, image_embeds

    def _lm_loss(self, logits, last_hidden, labels):
        """Dense CE over precomputed logits, or the chunked fused-linear
        path from hidden states when ``ce_loss_chunk`` is set (then
        ``logits`` may be None — ``__call__`` skips the head matmul)."""
        if self.ce_loss_chunk:
            return self.language_model.loss_from_hidden(
                last_hidden, labels, chunk=self.ce_loss_chunk)
        return causal_lm_loss(logits, labels)

    def compute_losses(self, logits, last_hidden, image_embeds, labels,
                       embeds_gen_mask=None, ids_gen_mask=None):
        """Loss tail given LM outputs — split out of ``__call__`` so the
        pipelined forward (parallel/pipeline.py, which runs the decoder
        stack under shard_map and the head outside) can reuse the exact
        loss semantics."""
        lm_loss = self._lm_loss(logits, last_hidden, labels)
        total = self.lm_loss_scale * lm_loss
        return {"total_loss": total, "lm_loss": lm_loss}

    def __call__(self, input_ids, images, attention_mask, labels,
                 embeds_gen_mask=None, embeds_cmp_mask=None,
                 ids_gen_mask=None, ids_cmp_mask=None,
                 patch_positions=None):
        input_embeds, image_embeds = self.embed_and_scatter(
            input_ids, images, embeds_cmp_mask, ids_cmp_mask,
            patch_positions)
        seg = attention_mask.astype(jnp.int32) if attention_mask is not None \
            else None
        # attention_mask doubles as segment ids: binary for plain padded
        # rows, multi-valued for packed rows (collate_packed); positions
        # restart per segment either way
        positions = None if seg is None else packed_positions(seg)
        logits, last_hidden, _ = self.language_model(
            inputs_embeds=input_embeds, positions=positions,
            segment_ids=None if seg is None else SegmentIds(q=seg, kv=seg),
            with_logits=not self.ce_loss_chunk)
        return self.compute_losses(logits, last_hidden, image_embeds,
                                   labels, embeds_gen_mask, ids_gen_mask)


class SEED(GeneralizedMultimodalModel):
    """Comprehension + generation: adds output projector and rec loss."""
    output_projector: Optional[nn.Module] = None
    rec_loss_scale: float = 1.0
    vit_down: bool = False
    mse: bool = False
    num_img_out_tokens: int = 64

    def compute_losses(self, logits, last_hidden, image_embeds, labels,
                       embeds_gen_mask=None, ids_gen_mask=None):
        lm_loss = self._lm_loss(logits, last_hidden, labels)

        rec_loss = jnp.array(0.0, jnp.float32)
        if image_embeds is not None and ids_gen_mask is not None:
            N = image_embeds.shape[0]
            D = last_hidden.shape[-1]
            B, S = ids_gen_mask.shape
            assert N * self.num_img_out_tokens <= B * S, (
                f"gen-token capacity {N}x{self.num_img_out_tokens} exceeds "
                f"sequence budget {B}x{S}; lower max images or raise "
                "max_length")
            targets = compact_selected(image_embeds, embeds_gen_mask)
            if self.vit_down:
                n, L, C = targets.shape
                targets = targets.reshape(n, L // 4, 4, C).mean(axis=2)
            n_gen = embeds_gen_mask.sum()
            weights = (jnp.arange(N) < n_gen).astype(jnp.float32)

            out_tokens = gather_masked_tokens(
                last_hidden, ids_gen_mask,
                capacity=N * self.num_img_out_tokens)
            out_tokens = out_tokens.reshape(N, self.num_img_out_tokens, D)
            recon = self.output_projector(out_tokens)
            targets = jax.lax.stop_gradient(targets).astype(jnp.float32)
            recon = recon.astype(jnp.float32)
            if self.mse:
                rec_loss = mse_loss(recon, targets, weights)
            else:
                rec_loss = cosine_loss(recon, targets, weights)

        total = self.lm_loss_scale * lm_loss + self.rec_loss_scale * rec_loss
        return {"total_loss": total, "lm_loss": lm_loss,
                "rec_loss": rec_loss}
