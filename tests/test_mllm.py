"""MLLM assembly tests: scatter/gather correctness, losses, SEED rec."""

import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.models.mllm import (compact_selected, gather_masked_tokens,
                                      scatter_image_embeds)
from mllm_npu_tpu.utils.testing import TinySpec, build_tiny_mllm, synthetic_batch
import pytest

SPEC = TinySpec()


def test_scatter_matches_boolean_assignment():
    rs = np.random.RandomState(0)
    B, S, D, N, nq = 2, 10, 4, 3, 2
    embeds = rs.randn(B, S, D).astype(np.float32)
    src = rs.randn(N, nq, D).astype(np.float32)
    mask = np.zeros((B, S), bool)
    mask[0, 1:3] = True   # image 0
    mask[1, 4:6] = True   # image 1
    expect = embeds.copy()
    expect[mask] = src[:2].reshape(-1, D)
    out = scatter_image_embeds(jnp.asarray(embeds), jnp.asarray(mask),
                               jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_compact_and_gather():
    x = jnp.arange(12).reshape(4, 3).astype(jnp.float32)
    sel = jnp.asarray([False, True, False, True])
    out = compact_selected(x, sel)
    np.testing.assert_array_equal(np.asarray(out[:2]),
                                  np.asarray(x)[[1, 3]])

    hidden = jnp.arange(24).reshape(1, 8, 3).astype(jnp.float32)
    mask = jnp.asarray([[0, 1, 1, 0, 0, 1, 0, 0]], bool)
    rows = gather_masked_tokens(hidden, mask, capacity=4)
    np.testing.assert_array_equal(np.asarray(rows[:3]),
                                  np.asarray(hidden[0])[[1, 2, 5]])


@pytest.mark.slow
def test_mllm_forward_losses():
    model, _, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=2)
    params = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(params, **batch)
    assert np.isfinite(float(out["total_loss"]))
    assert float(out["lm_loss"]) > 0


@pytest.mark.slow
def test_seed_forward_losses_and_gen_mask_effect():
    model, _, _ = build_tiny_mllm(SPEC, seed=True)
    batch = synthetic_batch(SPEC, cmp_images=1, gen_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(params, **batch)
    assert np.isfinite(float(out["total_loss"]))
    assert float(out["rec_loss"]) > 0

    # no gen images -> rec loss must be exactly 0 (weights mask all slots)
    batch0 = synthetic_batch(SPEC, cmp_images=1, gen_images=0)
    out0 = model.apply(params, **batch0)
    assert float(out0["rec_loss"]) == 0.0


@pytest.mark.slow
def test_frozen_vision_encoder_gets_zero_grads():
    model, _, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)

    def loss_fn(p):
        return model.apply(p, **batch)["total_loss"]

    g = jax.grad(loss_fn)(params)
    vis_g = jax.tree_util.tree_leaves(g["params"]["vision_encoder"])
    assert all(float(jnp.abs(x).sum()) == 0 for x in vis_g)
    proj_g = jax.tree_util.tree_leaves(g["params"]["projector"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in proj_g)


@pytest.mark.slow
def test_packed_rows_isolate_samples():
    """Logits of a sample packed behind another must equal its solo
    logits (segment-id attention + per-segment positions)."""
    import jax.numpy as jnp
    from mllm_npu_tpu.models.language_models.llama import (
        LlamaConfig, LlamaForCausalLM, packed_positions)

    cfg = LlamaConfig.tiny(attention_impl="eager")
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    a = rs.randint(10, 1000, (1, 6)).astype(np.int32)
    b = rs.randint(10, 1000, (1, 10)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(b))

    from mllm_npu_tpu.ops import SegmentIds
    packed = jnp.asarray(np.concatenate([a, b], axis=1))
    seg = jnp.asarray([[1] * 6 + [2] * 10], jnp.int32)
    pos = packed_positions(seg)
    logits_packed, _, _ = model.apply(
        params, packed, positions=pos,
        segment_ids=SegmentIds(q=seg, kv=seg))
    logits_solo, _, _ = model.apply(params, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(logits_packed[0, 6:]),
                               np.asarray(logits_solo[0]),
                               atol=2e-4, rtol=2e-4)


def test_pack_samples_collate():
    from mllm_npu_tpu.data.utils import pack_samples
    nq = 2
    def sample(L, n_img):
        am = np.zeros(L + 4, np.int32)
        am[:L] = 1
        ids = np.arange(100, 100 + L + 4).astype(np.int32)
        cmp = np.zeros(L + 4, bool)
        if n_img:
            cmp[1:1 + nq] = True
        return {
            "input_ids": ids, "attention_mask": am,
            "labels": ids.copy(),
            "ids_cmp_mask": cmp, "ids_gen_mask": np.zeros(L + 4, bool),
            "images": (np.ones((n_img, 8, 8, 3), np.float32)
                       if n_img else None),
            "embeds_cmp_mask": np.ones(n_img, bool) if n_img else None,
            "embeds_gen_mask": np.zeros(n_img, bool) if n_img else None,
        }

    batch = pack_samples([sample(6, 1), sample(5, 0), sample(4, 1)],
                         max_length=16, max_rows=1, max_images=4,
                         image_size=8)
    am = batch["attention_mask"][0]
    assert list(am[:15]) == [1] * 6 + [2] * 5 + [3] * 4
    assert am[15] == 0
    # first token of each packed sample is unsupervised
    assert batch["labels"][0, 0] == -100
    assert batch["labels"][0, 6] == -100
    assert batch["labels"][0, 11] == -100
    # image masks follow row-major order
    assert int(batch["embeds_cmp_mask"].sum()) == 2
    assert int(batch["ids_cmp_mask"][0].sum()) == 4


def test_chunked_ce_function_matches_dense_fast():
    """Fast-lane smoke for the fused-linear CE primitive itself: loss +
    grads (wrt hidden AND head kernel) match the dense-logits path.
    The full SEED-assembly composition is the slow test below."""
    from mllm_npu_tpu.models.language_models.llama import (
        causal_lm_loss, chunked_causal_lm_loss)

    rs = np.random.RandomState(0)
    B, S, D, V = 2, 24, 16, 64
    h = jnp.asarray(rs.randn(B, S, D).astype(np.float32))
    k = jnp.asarray(rs.randn(D, V).astype(np.float32) * 0.1)
    labels = rs.randint(0, V, (B, S)).astype(np.int32)
    labels[0, 5:9] = -100
    labels = jnp.asarray(labels)

    def dense(hk):
        h_, k_ = hk
        return causal_lm_loss(h_ @ k_, labels)

    def chunked(hk):
        h_, k_ = hk
        return chunked_causal_lm_loss(h_, k_, labels, chunk=8,
                                      compute_dtype=jnp.float32)

    l0, g0 = jax.value_and_grad(dense)((h, k))
    l1, g1 = jax.value_and_grad(chunked)((h, k))
    assert abs(float(l0) - float(l1)) < 1e-5 * max(1.0, abs(float(l0)))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_chunked_ce_matches_dense_loss_and_grads():
    """ce_loss_chunk (fused-linear CE, llama.chunked_causal_lm_loss)
    must reproduce the dense-logits loss AND grads bit-for-bit up to
    reduction order — on the SEED assembly so the rec-loss composition
    is covered too. Also: init under ce_loss_chunk still creates the
    lm_head params (identical tree structure)."""
    spec = TinySpec(batch=2, seq=96)
    model, _, _ = build_tiny_mllm(spec, seed=True)
    batch = synthetic_batch(spec, cmp_images=1, gen_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    cmodel = model.clone(ce_loss_chunk=32)   # S-1=95 pads to 96: 3 chunks

    def loss(m, p):
        return m.apply(p, **batch)["total_loss"]

    l0, g0 = jax.value_and_grad(lambda p: loss(model, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(cmodel, p))(params)
    assert abs(float(l0) - float(l1)) < 1e-4 * max(1.0, abs(float(l0)))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.abs(a - b).max() <= 5e-3 * (np.abs(a).max() + 1e-8)

    p2 = jax.eval_shape(lambda: cmodel.init(jax.random.PRNGKey(0), **batch))
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))
