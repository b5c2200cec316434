"""MLLM assembly tests: scatter/gather correctness, losses, SEED rec."""

import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.models.mllm import (compact_selected, gather_masked_tokens,
                                      scatter_image_embeds)
from mllm_npu_tpu.utils.testing import TinySpec, build_tiny_mllm, synthetic_batch

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


def test_mllm_forward_losses():
    model, _, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=2)
    params = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(params, **batch)
    assert np.isfinite(float(out["total_loss"]))
    assert float(out["lm_loss"]) > 0


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
