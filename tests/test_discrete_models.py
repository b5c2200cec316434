"""Discrete/contrastive front-end tests (reference discrete_models.py):
VQ quantizer numerics, every variant's loss surface, and the
cross-device contrastive gather on the 8-device CPU mesh — the
distributed-correctness coverage the reference lacks (SURVEY.md §4)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.models.generation.discrete_models import (
    DiscreteModelDistillWithDoubleContrastive, DiscreteModelIdentity,
    DiscreteModelOnlyDistill, DiscreteModelStageOneContrastive,
    DiscreteModelStageTwoContrastiveDistill, VectorQuantizer,
    contrastive_loss)


class TinyQFormer(nn.Module):
    """Injected-qformer contract: image OR text input → [B, L, D]."""
    dim: int = 16
    n_tokens: int = 4
    vocab: int = 32

    @nn.compact
    def __call__(self, image_embeds=None, input_ids=None,
                 text_attention_mask=None):
        if image_embeds is not None:
            h = nn.Dense(self.dim, name="img_proj")(image_embeds)
            return h[:, :self.n_tokens]
        emb = nn.Embed(self.vocab, self.dim, name="tok")(input_ids)
        if text_attention_mask is not None:
            emb = emb * text_attention_mask[..., None]
        return emb


class TinyDistiller(nn.Module):
    out_dim: int = 16
    # reference distillers used with share_contrast_head emit an extra
    # cls token (stripped off as the contrast-head cls,
    # discrete_models.py:388-391)
    add_cls: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim, name="proj")(x)
        if self.add_cls:
            cls = self.param("cls", nn.initializers.normal(0.02),
                             (1, 1, self.out_dim))
            h = jnp.concatenate(
                [h, jnp.broadcast_to(cls, (h.shape[0], 1, self.out_dim))],
                axis=1)
        return h


def _img_batch(b=4, l=4, d=16, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, l, d))


def test_identity():
    m = DiscreteModelIdentity()
    x = _img_batch()
    p = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(m.apply(p, x)), np.asarray(x))


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(codebook_size=16, dim=16)
    x = _img_batch()
    p = vq.init(jax.random.PRNGKey(0), x)
    out = vq.apply(p, x)
    assert out["quant_embeds"].shape == x.shape
    assert out["indices"].shape == x.shape[:-1]
    assert (np.asarray(out["indices"]) < 16).all()
    assert float(out["commit_loss"]) > 0

    # straight-through: d(quant)/d(x) is identity ⇒ encoder grads flow
    def f(xx):
        return jnp.sum(vq.apply(p, xx)["quant_embeds"] * 2.0)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 2.0, atol=1e-6)

    # quantized values come from the codebook
    cb = np.asarray(p["params"]["codebook"])
    q = np.asarray(out["quant_embeds"])
    idx = np.asarray(out["indices"])
    np.testing.assert_allclose(q, cb[idx], atol=1e-5)


def test_contrastive_loss_perfect_alignment():
    feats = jnp.eye(4, 8)
    loss_aligned, i2t, t2i = contrastive_loss(feats, feats,
                                              jnp.float32(0.07))
    assert float(i2t) == 1.0 and float(t2i) == 1.0
    # misaligned pairs score worse
    loss_mis, _, _ = contrastive_loss(feats, jnp.roll(feats, 1, axis=0),
                                      jnp.float32(0.07))
    assert float(loss_aligned) < float(loss_mis)


def test_contrastive_gather_matches_single_device():
    """all_gather path: contrastive loss over a sharded batch on the
    8-device mesh == the same loss computed on the full batch on one
    device (the reference's concat_all_gather semantics)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    n = len(jax.devices())
    B, D = 2 * n, 8
    img = jax.random.normal(jax.random.PRNGKey(0), (B, D))
    txt = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.float32(0.07)

    ref_loss, ref_i2t, _ = contrastive_loss(img, txt, scale)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))

    @jax.jit
    def sharded(img, txt):
        def f(i, t):
            loss, i2t, t2i = contrastive_loss(i, t, scale,
                                              axis_name="data")
            return (jax.lax.pmean(loss, "data"),
                    jax.lax.pmean(i2t, "data"))
        return shard_map(f, mesh=mesh,
                         in_specs=(P("data"), P("data")),
                         out_specs=(P(), P()))(img, txt)

    loss, i2t = sharded(img, txt)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(i2t), float(ref_i2t), rtol=1e-5)


def test_only_distill_variant():
    m = DiscreteModelOnlyDistill(
        qformer=TinyQFormer(), quantizer=VectorQuantizer(16, 16),
        distiller=TinyDistiller(16), scale_commit_loss=0.5)
    x = _img_batch()
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    for k in ("total_loss", "distill_loss", "commit_loss", "indices"):
        assert k in out
    assert np.isfinite(float(out["total_loss"]))
    enc = m.apply(p, x, method=m.encode_image_embeds)
    assert enc.shape == (4, 4, 16)
    g = jax.grad(lambda pp: m.apply(pp, x)["total_loss"])(p)
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


def _text_batch(b=4, l=4):
    ids = jnp.arange(b * l).reshape(b, l) % 32
    return ids, jnp.ones((b, l))


def test_stage_one_contrastive():
    m = DiscreteModelStageOneContrastive(qformer=TinyQFormer(),
                                         projection_dim=8)
    x = _img_batch()
    ids, mask = _text_batch()
    p = m.init(jax.random.PRNGKey(0), x, input_ids=ids,
               text_attention_mask=mask)
    out = m.apply(p, x, input_ids=ids, text_attention_mask=mask)
    assert np.isfinite(float(out["total_loss"]))
    assert 0.0 <= float(out["i2t_acc"]) <= 1.0
    # logit_scale is learnable and receives gradient
    g = jax.grad(lambda pp: m.apply(pp, x, input_ids=ids,
                                    text_attention_mask=mask)
                 ["total_loss"])(p)
    assert abs(float(g["params"]["logit_scale"])) > 0


def test_stage_two_contrastive_distill():
    m = DiscreteModelStageTwoContrastiveDistill(
        qformer=TinyQFormer(), quantizer=VectorQuantizer(16, 16),
        distiller=TinyDistiller(16), contrast_head=TinyDistiller(16),
        projection_dim=8, freeze_qformer=True)
    x = _img_batch()
    ids, mask = _text_batch()
    p = m.init(jax.random.PRNGKey(0), x, input_ids=ids,
               text_attention_mask=mask)
    out = m.apply(p, x, input_ids=ids, text_attention_mask=mask)
    for k in ("total_loss", "commit_loss", "distill_loss",
              "contrast_loss", "i2t_acc"):
        assert k in out, k
    # frozen qformer gets NO grad; quantizer/distiller/head do
    g = jax.grad(lambda pp: m.apply(pp, x, input_ids=ids,
                                    text_attention_mask=mask)
                 ["total_loss"])(p)
    q_leaves = jax.tree_util.tree_leaves(g["params"]["qformer"])
    img_proj_sum = sum(float(jnp.abs(l).sum())
                      for l in jax.tree_util.tree_leaves(
                          g["params"]["image_proj"]))
    assert img_proj_sum > 0
    # image path grads to qformer are cut; text path still flows (the
    # reference also keeps the text branch on the shared qformer live)
    img_proj_only = [g["params"]["qformer"]["img_proj"]]
    assert all(float(jnp.abs(l).sum()) == 0
               for l in jax.tree_util.tree_leaves(img_proj_only))


def test_double_contrastive():
    m = DiscreteModelDistillWithDoubleContrastive(
        qformer=TinyQFormer(n_tokens=5), quantizer=VectorQuantizer(16, 16),
        distiller=TinyDistiller(16, add_cls=True), projection_dim=8,
        share_contrast_head=True, has_contrast=True, rec_qformer=True)
    x = _img_batch(l=5)
    ids, mask = _text_batch()
    p = m.init(jax.random.PRNGKey(0), x, input_ids=ids,
               text_attention_mask=mask)
    out = m.apply(p, x, input_ids=ids, text_attention_mask=mask)
    for k in ("total_loss", "qformer_contrast_loss", "head_contrast_loss",
              "distill_loss", "commit_loss"):
        assert k in out, k
    assert np.isfinite(float(out["total_loss"]))


def test_stage1_config_instantiates():
    from mllm_npu_tpu.configs import instantiate, load_config

    cfg = load_config("generation/discrete_stage1_contrastive.yaml")
    m = instantiate(cfg, qformer=TinyQFormer(), axis_name=None)
    assert isinstance(m, DiscreteModelStageOneContrastive)
    x = _img_batch()
    ids, mask = _text_batch()
    p = m.init(jax.random.PRNGKey(0), x, input_ids=ids,
               text_attention_mask=mask)
    out = m.apply(p, x, input_ids=ids, text_attention_mask=mask)
    assert np.isfinite(float(out["total_loss"]))
