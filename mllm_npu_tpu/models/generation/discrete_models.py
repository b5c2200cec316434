"""Discrete / contrastive front-ends for image features (TPU-native).

Capability parity with the reference's discrete-model family (reference
mllm_npu/models/generation/discrete_models.py): the shipped SEED-X
config uses only the identity variant (configs/generation/
discrete_identity.yaml → DiscreteModleIdentity, :136), but the training
variants — distillation through a quantizer (:71), stage-one image/text
contrastive (:149), stage-two contrastive+distill (:200), and
double-contrastive (:295) — are provided as Flax modules.

TPU redesign notes:
- the reference's ``concat_all_gather`` (torch.distributed, :10-34)
  becomes ``jax.lax.all_gather`` over a named mesh axis inside
  pjit/shard_map; on a single device (axis_name=None) it is a no-op.
- qformer / quantizer / distiller are injected submodules, exactly like
  the reference (its classes come entirely from external configs — the
  repo ships none); a :class:`VectorQuantizer` (VQ-VAE style,
  straight-through estimator) is provided in-repo so the quantized
  variants are runnable without external code.
- ``freeze_qformer`` uses ``stop_gradient`` instead of
  ``requires_grad_(False)``.

Injected qformer contract (mirrors the reference call sites): a Flax
module whose ``__call__(image_embeds=None, input_ids=None,
text_attention_mask=None)`` returns token embeddings [B, L, D] for
whichever input is given.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mllm_npu_tpu.models.mllm import cosine_loss


class DiscreteModelIdentity(nn.Module):
    """(reference DiscreteModleIdentity, discrete_models.py:136-147)."""

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
    devices (replacing the reference's concat_all_gather,
    discrete_models.py:10-34)."""
    if axis_name is None:
        return x
    return jax.lax.all_gather(x, axis_name, tiled=True)


def _smoothed_ce(logits: jax.Array, labels: jax.Array,
                 label_smoothing: float) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).squeeze(-1)
    smooth = -logp.mean(axis=-1)
    return ((1.0 - label_smoothing) * nll + label_smoothing * smooth).mean()


def contrastive_loss(image_feats: jax.Array, text_feats: jax.Array,
                     logit_scale: jax.Array,
                     axis_name: Optional[str] = None,
                     label_smoothing: float = 0.1):
    """Symmetric InfoNCE with label smoothing and i2t/t2i accuracies
    (reference contrastive_loss, discrete_models.py:44-68: sim is
    DIVIDED by the learnable logit_scale, init 0.07; CE label_smoothing
    0.1; targets offset by rank*batch). Returns (loss, i2t_acc, t2i_acc).

    Inputs are expected pre-normalized (the reference normalizes before
    calling); gather across `axis_name` replaces concat_all_gather.
    """
    all_img = all_gather_features(image_feats, axis_name)
    all_txt = all_gather_features(text_feats, axis_name)
    sim_i2t = (image_feats @ all_txt.T) / logit_scale
    sim_t2i = (text_feats @ all_img.T) / logit_scale
    n = image_feats.shape[0]
    offset = jax.lax.axis_index(axis_name) * n if axis_name else 0
    labels = offset + jnp.arange(n)
    loss = (_smoothed_ce(sim_i2t, labels, label_smoothing)
            + _smoothed_ce(sim_t2i, labels, label_smoothing)) / 2
    i2t_acc = (sim_i2t.argmax(-1) == labels).mean()
    t2i_acc = (sim_t2i.argmax(-1) == labels).mean()
    return loss, i2t_acc, t2i_acc


class VectorQuantizer(nn.Module):
    """VQ-VAE codebook with straight-through estimator — the quantizer
    the reference injects from external configs (consumed at
    discrete_models.py:98-100,245-247: returns quant_embeds / indices /
    commit_loss)."""
    codebook_size: int = 8192
    dim: int = 768
    beta: float = 0.25
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        codebook = self.param(
            "codebook", nn.initializers.variance_scaling(
                1.0, "fan_in", "uniform"),
            (self.codebook_size, self.dim), self.param_dtype)
        flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             - 2 * flat @ cb.T
             + jnp.sum(cb ** 2, axis=1)[None, :])
        indices = jnp.argmin(d, axis=1)
        quant = cb[indices].reshape(x.shape)
        commit = jnp.mean((jax.lax.stop_gradient(quant)
                           - x.astype(jnp.float32)) ** 2) * self.beta \
            + jnp.mean((quant - jax.lax.stop_gradient(
                x.astype(jnp.float32))) ** 2)
        # straight-through: grads flow to the encoder unchanged
        quant = x + jax.lax.stop_gradient(quant.astype(x.dtype) - x)
        return {"quant_embeds": quant,
                "indices": indices.reshape(x.shape[:-1]),
                "commit_loss": commit}


class DiscreteModelOnlyDistill(nn.Module):
    """qformer → quantizer → distiller, cosine distill to the raw image
    embeds + commitment loss (reference DiscreteModleOnlyDistill,
    discrete_models.py:71-133)."""
    qformer: nn.Module
    quantizer: nn.Module
    distiller: Optional[nn.Module] = None
    loss_type: str = "cosine"
    scale_commit_loss: float = 1.0
    freeze_qformer: bool = False

    def _qformer_embeds(self, image_embeds):
        out = self.qformer(image_embeds=image_embeds)
        if self.freeze_qformer:
            out = jax.lax.stop_gradient(out)
        return out

    def __call__(self, image_embeds, input_ids=None,
                 text_attention_mask=None, text_embeds=None):
        q = self._qformer_embeds(image_embeds)
        qout = self.quantizer(q)
        recon = self.distiller(qout["quant_embeds"]) \
            if self.distiller is not None else qout["quant_embeds"]
        if self.loss_type != "cosine":
            raise NotImplementedError(self.loss_type)
        distill = cosine_loss(recon, image_embeds)
        total = distill + self.scale_commit_loss * qout["commit_loss"]
        return {"total_loss": total, "distill_loss": distill,
                "commit_loss": qout["commit_loss"],
                "indices": qout["indices"]}

    def encode_image_embeds(self, image_embeds):
        q = self.qformer(image_embeds=image_embeds)
        qout = self.quantizer(q)
        out = qout["quant_embeds"]
        if self.distiller is not None:
            out = self.distiller(out)
        return out


class DiscreteModelStageOneContrastive(nn.Module):
    """Image/text contrastive over qformer outputs (reference
    DiscreteModleStageOneContrastive, discrete_models.py:149-197):
    image cls = LAST qformer token, text cls = FIRST; linear
    projections without bias; learnable logit_scale init 0.07."""
    qformer: nn.Module
    projection_dim: int = 1024
    image_cls_token_type: str = "last"
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeds, input_ids=None,
                 text_attention_mask=None, text_embeds=None):
        if self.image_cls_token_type != "last":
            raise NotImplementedError(self.image_cls_token_type)
        img = self.qformer(image_embeds=image_embeds)[:, -1, :]
        txt = self.qformer(input_ids=input_ids,
                           text_attention_mask=text_attention_mask)[:, 0, :]
        proj = lambda name: nn.Dense(self.projection_dim, use_bias=False,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype, name=name)
        img = proj("image_proj")(img)
        txt = proj("text_proj")(txt)
        img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-8)
        txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-8)
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(0.07), ())
        loss, i2t, t2i = contrastive_loss(img, txt, logit_scale,
                                          self.axis_name)
        return {"total_loss": loss, "i2t_acc": i2t, "t2i_acc": t2i}

    def encode_image_embeds(self, image_embeds):
        return self.qformer(image_embeds=image_embeds)


class DiscreteModelStageTwoContrastiveDistill(nn.Module):
    """Frozen qformer → quantizer; optional distiller (cosine to raw
    image embeds) and optional contrastive head over the quantized
    embeds (reference DiscreteModleStageTwoContrastiveDistill,
    discrete_models.py:200-292)."""
    qformer: nn.Module
    quantizer: nn.Module
    distiller: Optional[nn.Module] = None
    contrast_head: Optional[nn.Module] = None
    projection_dim: int = 1024
    distill_loss_type: str = "cosine"
    freeze_qformer: bool = True
    image_cls_token_type: str = "last"
    scale_commit_loss: float = 1.0
    scale_contrast_loss: float = 1.0
    scale_distill_loss: float = 1.0
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeds, input_ids=None,
                 text_attention_mask=None, text_embeds=None):
        q = self.qformer(image_embeds=image_embeds)
        if self.freeze_qformer:
            q = jax.lax.stop_gradient(q)
        qout = self.quantizer(q)
        out = {"indices": qout["indices"],
               "commit_loss": qout["commit_loss"],
               "total_loss": self.scale_commit_loss * qout["commit_loss"]}

        if self.distiller is not None:
            recon = self.distiller(qout["quant_embeds"])
            if self.distill_loss_type != "cosine":
                raise NotImplementedError(self.distill_loss_type)
            distill = cosine_loss(recon, image_embeds)
            out["distill_loss"] = distill
            out["total_loss"] += self.scale_distill_loss * distill

        if self.contrast_head is not None:
            if self.image_cls_token_type != "last":
                raise NotImplementedError(self.image_cls_token_type)
            txt = self.qformer(
                input_ids=input_ids,
                text_attention_mask=text_attention_mask)[:, 0, :]
            img = self.contrast_head(qout["quant_embeds"])[:, -1, :]
            proj = lambda name: nn.Dense(
                self.projection_dim, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype, name=name)
            img = proj("image_proj")(img)
            txt = proj("text_proj")(txt)
            img = img / (jnp.linalg.norm(img, -1, keepdims=True) + 1e-8)
            txt = txt / (jnp.linalg.norm(txt, -1, keepdims=True) + 1e-8)
            logit_scale = self.param("logit_scale",
                                     nn.initializers.constant(0.07), ())
            loss, i2t, t2i = contrastive_loss(img, txt, logit_scale,
                                              self.axis_name)
            out["contrast_loss"] = loss
            out["total_loss"] += self.scale_contrast_loss * loss
            out["i2t_acc"] = i2t
            out["t2i_acc"] = t2i
        return out

    def encode_image_embeds(self, image_embeds):
        return None


class DiscreteModelDistillWithDoubleContrastive(nn.Module):
    """Contrastive on the qformer cls AND on the distiller/contrast-head
    cls, plus quantized distillation (reference
    DiscreteModleDistillWithDoubleContrastive, discrete_models.py:
    295-437). share_contrast_head=True takes the head cls from the
    distiller's last token (:388-391); rec_qformer distills to the
    qformer embeds instead of the raw image embeds (:404-407)."""
    qformer: nn.Module
    quantizer: Optional[nn.Module] = None
    distiller: Optional[nn.Module] = None
    contrast_head: Optional[nn.Module] = None
    projection_dim: int = 1024
    distill_loss_type: str = "cosine"
    share_contrast_head: bool = True
    quantize_cls_token: bool = False
    rec_qformer: bool = False
    has_contrast: bool = False
    freeze_qformer: bool = False
    scale_commit_loss: float = 1.0
    scale_contrast_loss: float = 1.0
    scale_distill_loss: float = 1.0
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    def _contrast(self, img, txt, prefix, out):
        img = img / (jnp.linalg.norm(img, -1, keepdims=True) + 1e-8)
        txt = txt / (jnp.linalg.norm(txt, -1, keepdims=True) + 1e-8)
        logit_scale = self.param(f"logit_scale_{prefix}",
                                 nn.initializers.constant(0.07), ())
        loss, i2t, t2i = contrastive_loss(img, txt, logit_scale,
                                          self.axis_name)
        out[f"{prefix}_contrast_loss"] = loss
        out["total_loss"] += self.scale_contrast_loss * loss
        out[f"{prefix}_i2t_acc"] = i2t
        out[f"{prefix}_t2i_acc"] = t2i

    @nn.compact
    def __call__(self, image_embeds, input_ids=None,
                 text_attention_mask=None, text_embeds=None):
        assert int(self.share_contrast_head) \
            + int(self.contrast_head is not None) <= 1
        q = self.qformer(image_embeds=image_embeds)
        if self.freeze_qformer:
            q = jax.lax.stop_gradient(q)
        q_cls = q[:, -1, :]
        if not self.quantize_cls_token:
            q = q[:, :-1, :]

        txt_cls = None
        if self.has_contrast:
            txt_cls = self.qformer(
                input_ids=input_ids,
                text_attention_mask=text_attention_mask)[:, 0, :]

        out = {"total_loss": jnp.float32(0.0)}
        proj = lambda name: nn.Dense(self.projection_dim, use_bias=False,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype, name=name)
        ln = lambda name: nn.LayerNorm(dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=name)

        if not self.freeze_qformer and self.has_contrast:
            q_cls_n = ln("cls_norm_qformer")(q_cls)
            self._contrast(proj("image_proj_qformer")(q_cls_n),
                           proj("text_proj_qformer")(txt_cls),
                           "qformer", out)

        if self.quantizer is not None and self.distiller is not None:
            qout = self.quantizer(q)
            recon = self.distiller(qout["quant_embeds"])
            head_cls = None
            if self.share_contrast_head:
                head_cls = ln("cls_norm_head")(recon[:, -1, :])
                recon = recon[:, :-1, :]
            if self.contrast_head is not None:
                head_cls = ln("cls_norm_head")(
                    self.contrast_head(qout["quant_embeds"])[:, -1, :])

            out["indices"] = qout["indices"]
            out["commit_loss"] = qout["commit_loss"]
            out["total_loss"] += self.scale_commit_loss \
                * qout["commit_loss"]

            target = q if self.rec_qformer else image_embeds
            if self.distill_loss_type != "cosine":
                raise NotImplementedError(self.distill_loss_type)
            distill = cosine_loss(recon, target)
            out["distill_loss"] = distill
            out["total_loss"] += self.scale_distill_loss * distill

            if head_cls is not None and self.has_contrast:
                self._contrast(proj("image_proj_head")(head_cls),
                               proj("text_proj_head")(txt_cls),
                               "head", out)
        return out

    def encode_image_embeds(self, image_embeds):
        return self.qformer(image_embeds=image_embeds)


# reference spellings as aliases for `_target_` config resolution
DiscreteModleOnlyDistill = DiscreteModelOnlyDistill
DiscreteModleStageOneContrastive = DiscreteModelStageOneContrastive
DiscreteModleStageTwoContrastiveDistill = \
    DiscreteModelStageTwoContrastiveDistill
DiscreteModleDistillWithDoubleContrastive = \
    DiscreteModelDistillWithDoubleContrastive
