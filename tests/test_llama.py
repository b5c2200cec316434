"""Llama stack tests: shapes, KV-cache decode equivalence, loss."""

import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.models.language_models.llama import (
    LlamaConfig, LlamaForCausalLM, causal_lm_loss, init_cache)

CFG = LlamaConfig.tiny(attention_impl="eager")


def _init(cfg=CFG, seq=16, batch=2):
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch, seq), 0,
                             cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)
    return model, params, ids


def test_forward_shapes():
    model, params, ids = _init()
    logits, h, cache = model.apply(params, ids)
    assert logits.shape == (2, 16, CFG.vocab_size)
    assert h.shape == (2, 16, CFG.hidden_size)
    assert cache is None


def test_loss_finite_and_masked():
    model, params, ids = _init()
    logits, _, _ = model.apply(params, ids)
    labels = np.asarray(ids).copy()
    labels[:, :4] = -100
    loss = causal_lm_loss(logits, jnp.asarray(labels))
    assert np.isfinite(float(loss))
    # fully-masked labels give zero loss, not NaN
    loss0 = causal_lm_loss(logits, jnp.full_like(ids, -100))
    assert float(loss0) == 0.0


def test_cached_decode_matches_full_forward():
    """Prefill + step-by-step decode must reproduce the full forward logits."""
    cfg = CFG
    model, params, ids = _init(seq=12, batch=2)
    B, S = ids.shape

    full_logits, _, _ = model.apply(params, ids)

    max_len = 16
    cache = init_cache(cfg, B, max_len, dtype=jnp.float32)
    prefill = 5
    logits_p, _, cache = model.apply(params, ids[:, :prefill], cache=cache)
    step_logits = [logits_p[:, -1]]
    for t in range(prefill, S):
        lg, _, cache = model.apply(params, ids[:, t:t + 1], cache=cache)
        step_logits.append(lg[:, -1])
    stepped = jnp.stack(step_logits, axis=1)  # [B, S-prefill+1, V]
    np.testing.assert_allclose(
        stepped, full_logits[:, prefill - 1:], atol=2e-4, rtol=2e-4)


def test_scan_vs_loop_same_params_structure():
    cfg_loop = LlamaConfig.tiny(attention_impl="eager", scan_layers=False)
    model, params, ids = _init()
    model_l = LlamaForCausalLM(cfg_loop, dtype=jnp.float32)
    params_l = model_l.init(jax.random.PRNGKey(1), ids)
    # scan stacks params with a leading layer axis
    scan_kernel = params["params"]["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    loop_kernel = params_l["params"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert scan_kernel.shape == (CFG.num_hidden_layers,) + loop_kernel.shape


def test_grad_flows():
    model, params, ids = _init()

    def loss_fn(p):
        logits, _, _ = model.apply(p, ids)
        return causal_lm_loss(logits, ids)

    g = jax.grad(loss_fn)(params)
    leaf = g["params"]["model"]["layers"]["mlp"]["gate_proj"]["kernel"]
    assert np.isfinite(np.asarray(leaf)).all()
    assert float(jnp.abs(leaf).sum()) > 0


def test_lora_dropout_active_only_with_rng():
    cfg = LlamaConfig.tiny(attention_impl="eager", lora_rank=4,
                           lora_alpha=8.0, lora_dropout=0.5,
                           lora_targets=("q_proj",))
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, 8), 0,
                             cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)
    # make lora_b nonzero so the adapter path actually contributes
    import flax
    flat = flax.traverse_util.flatten_dict(params["params"])
    for k in flat:
        if k[-1] == "lora_b":
            flat[k] = jnp.ones_like(flat[k]) * 0.1
    params = {"params": flax.traverse_util.unflatten_dict(flat)}

    det1, _, _ = model.apply(params, ids)
    det2, _, _ = model.apply(params, ids)
    np.testing.assert_array_equal(np.asarray(det1), np.asarray(det2))

    r1, _, _ = model.apply(params, ids,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    r2, _, _ = model.apply(params, ids,
                           rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.abs(np.asarray(r1) - np.asarray(r2)).max() > 0
    assert np.abs(np.asarray(r1) - np.asarray(det1)).max() > 0


def test_fused_projections_match_unfused():
    """Serving-time qkv/gate_up fusion is numerically identical
    (utils.weights.fuse_llama_projections + fused_projections=True)."""
    import dataclasses

    from mllm_npu_tpu.utils.weights import fuse_llama_projections

    model, params, ids = _init()
    logits, _, _ = model.apply(params, ids)

    cfg2 = dataclasses.replace(CFG, fused_projections=True)
    model2 = LlamaForCausalLM(cfg2, dtype=jnp.float32)
    p2 = {"params": fuse_llama_projections(params["params"])}
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(
                model2.init(jax.random.PRNGKey(1), ids)))
    logits2, _, _ = model2.apply(p2, ids)
    np.testing.assert_allclose(logits, logits2, atol=1e-5)

    # cached decode path too
    cache = init_cache(CFG, 2, 24, dtype=jnp.float32)
    _, _, cache = model.apply(params, ids, cache=cache, prefill=True)
    l1, _, _ = model.apply(params, ids[:, :1], cache=cache)
    cache2 = init_cache(cfg2, 2, 24, dtype=jnp.float32)
    _, _, cache2 = model2.apply(p2, ids, cache=cache2, prefill=True)
    l2, _, _ = model2.apply(p2, ids[:, :1], cache=cache2)
    np.testing.assert_allclose(l1, l2, atol=1e-5)
