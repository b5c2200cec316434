"""Discrete / contrastive front-ends for image features.

The shipped SEED-X config uses only the identity variant (reference
configs/generation/discrete_identity.yaml targets DiscreteModleIdentity,
discrete_models.py:136). The contrastive losses are provided
functionally with an optional mesh axis for the cross-device feature
gather (replacing torch.distributed concat_all_gather, reference
discrete_models.py:10-44).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class DiscreteModelIdentity(nn.Module):
    @nn.compact
    def __call__(self, image_embeds):
        return image_embeds

    def encode_image_embeds(self, image_embeds):
        return image_embeds


# reference spelling kept as an alias so `_target_` configs resolve
DiscreteModleIdentity = DiscreteModelIdentity


def all_gather_features(x: jax.Array, axis_name: Optional[str] = None
                        ) -> jax.Array:
    """Inside pjit/shard_map with a named axis, gather features across
    devices (differentiable-through-local-shard, like the reference's
    concat_all_gather with a straight-through local grad)."""
    if axis_name is None:
        return x
    gathered = jax.lax.all_gather(x, axis_name, tiled=True)
    return gathered


def contrastive_loss(image_feats: jax.Array, text_feats: jax.Array,
                     logit_scale: jax.Array,
                     axis_name: Optional[str] = None) -> jax.Array:
    """Symmetric InfoNCE (reference discrete_models.py:44-68)."""
    image_feats = image_feats / (jnp.linalg.norm(
        image_feats, axis=-1, keepdims=True) + 1e-8)
    text_feats = text_feats / (jnp.linalg.norm(
        text_feats, axis=-1, keepdims=True) + 1e-8)
    all_img = all_gather_features(image_feats, axis_name)
    all_txt = all_gather_features(text_feats, axis_name)
    logits_i = logit_scale * image_feats @ all_txt.T
    logits_t = logit_scale * text_feats @ all_img.T
    n = image_feats.shape[0]
    if axis_name is not None:
        offset = jax.lax.axis_index(axis_name) * n
    else:
        offset = 0
    labels = offset + jnp.arange(n)
    li = -jnp.take_along_axis(jax.nn.log_softmax(logits_i, axis=-1),
                              labels[:, None], axis=-1).mean()
    lt = -jnp.take_along_axis(jax.nn.log_softmax(logits_t, axis=-1),
                              labels[:, None], axis=-1).mean()
    return (li + lt) / 2


class DiscreteModelDistill(nn.Module):
    """Qformer-style distillation front-end (reference
    DiscreteModleOnlyDistill, discrete_models.py:71-133): resample image
    embeds through a perceiver and distill to the frozen targets with
    cosine loss."""
    resampler: nn.Module
    distill_scale: float = 1.0

    def encode_image_embeds(self, image_embeds):
        return self.resampler(image_embeds)

    def __call__(self, image_embeds, target_embeds=None):
        out = self.resampler(image_embeds)
        if target_embeds is None:
            return out
        t = target_embeds / (jnp.linalg.norm(target_embeds, axis=-1,
                                             keepdims=True) + 1e-8)
        o = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)
        loss = (1 - (t * o).sum(-1)).mean() * self.distill_scale
        return {"total_loss": loss, "distill_loss": loss, "output": out}
