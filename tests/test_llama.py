"""Llama stack tests: shapes, KV-cache decode equivalence, loss."""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_scan_vs_loop_same_params_structure():
    cfg_loop = LlamaConfig.tiny(attention_impl="eager", scan_layers=False)
    model, params, ids = _init()
    model_l = LlamaForCausalLM(cfg_loop, dtype=jnp.float32)
    params_l = model_l.init(jax.random.PRNGKey(1), ids)
    # scan stacks params with a leading layer axis
    scan_kernel = params["params"]["model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    loop_kernel = params_l["params"]["model"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert scan_kernel.shape == (CFG.num_hidden_layers,) + loop_kernel.shape


@pytest.mark.slow
def test_grad_flows():
    model, params, ids = _init()

    def loss_fn(p):
        logits, _, _ = model.apply(p, ids)
        return causal_lm_loss(logits, ids)

    g = jax.grad(loss_fn)(params)
    leaf = g["params"]["model"]["layers"]["mlp"]["gate_proj"]["kernel"]
    assert np.isfinite(np.asarray(leaf)).all()
    assert float(jnp.abs(leaf).sum()) > 0


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_fused_interleaved_tp_layout():
    """fused_shards=2 (TP interleaved fused layout) is numerically
    identical to unfused, including when the fused kernels are sharded
    on a tensor=2 mesh — each shard then holds whole q/k/v (gate/up)
    head groups so the in-module split is shard-local (ADVICE r1,
    sharding.py:25)."""
    import dataclasses

    from mllm_npu_tpu.utils.weights import fuse_llama_projections

    model, params, ids = _init()
    logits, _, _ = model.apply(params, ids)

    cfg2 = dataclasses.replace(CFG, fused_projections=True,
                               fused_shards=2)
    model2 = LlamaForCausalLM(cfg2, dtype=jnp.float32)
    p2 = {"params": fuse_llama_projections(params["params"], shards=2)}
    logits2, _, _ = model2.apply(p2, ids)
    np.testing.assert_allclose(logits, logits2, atol=1e-5)

    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.parallel.sharding import shard_params

    mesh = build_mesh(MeshConfig(data=4, tensor=2))
    ps = shard_params(p2, mesh)
    logits3, _, _ = jax.jit(model2.apply)(ps, ids)
    np.testing.assert_allclose(logits, np.asarray(logits3), atol=1e-5)


@pytest.mark.slow
def test_sequence_classification_head():
    """SeqCls head parity surface (reference llama3.py:1691): pooled
    logits read at the last non-pad token; regression/single-label/
    multi-label loss dispatch."""
    from mllm_npu_tpu.models.language_models.llama import (
        LlamaForSequenceClassification, sequence_classification_loss)

    model = LlamaForSequenceClassification(CFG, num_labels=3,
                                           dtype=jnp.float32)
    ids = np.full((2, 16), 0, np.int32)
    ids[0, :10] = np.arange(10) + 5      # row 0: 10 real tokens, pad=0
    ids[1, :16] = np.arange(16) + 5      # row 1: full
    ids = jnp.asarray(ids)
    params = model.init(jax.random.PRNGKey(0), ids, pad_token_id=0)
    pooled = model.apply(params, ids, pad_token_id=0)
    assert pooled.shape == (2, 3)

    # pooling reads the token BEFORE the first pad: junk after the
    # first pad cannot change the pooled logits (causal attention)
    row2 = np.asarray(ids[0]).copy()
    row2[11:] = 999                       # junk after the pad at 10
    pooled2 = model.apply(params, jnp.asarray(row2[None]),
                          pad_token_id=0)
    np.testing.assert_allclose(np.asarray(pooled[:1]),
                               np.asarray(pooled2), atol=1e-5)

    loss = sequence_classification_loss(pooled, jnp.asarray([0, 2]))
    assert np.isfinite(float(loss))
    reg = LlamaForSequenceClassification(CFG, num_labels=1,
                                         dtype=jnp.float32)
    p1 = reg.init(jax.random.PRNGKey(0), ids, pad_token_id=0)
    r = reg.apply(p1, ids, pad_token_id=0)
    assert np.isfinite(float(sequence_classification_loss(
        r, jnp.asarray([0.5, -1.0]))))


def test_question_answering_head():
    """QA head parity surface (reference llama3.py:1813): start/end
    logits + clamped-ignored-index CE."""
    from mllm_npu_tpu.models.language_models.llama import (
        LlamaForQuestionAnswering, question_answering_loss)

    model = LlamaForQuestionAnswering(CFG, dtype=jnp.float32)
    ids = jnp.asarray(
        np.random.RandomState(0).randint(5, CFG.vocab_size, (2, 16)))
    params = model.init(jax.random.PRNGKey(0), ids)
    start, end = model.apply(params, ids)
    assert start.shape == (2, 16) and end.shape == (2, 16)
    loss = question_answering_loss(start, end, jnp.asarray([3, 5]),
                                   jnp.asarray([7, 9]))
    assert np.isfinite(float(loss))
    # out-of-range positions are ignored (clamped to ignored_index)
    loss_ign = question_answering_loss(
        start, end, jnp.asarray([99, 99]), jnp.asarray([99, 99]))
    assert float(loss_ign) == 0.0


@pytest.mark.slow
def test_merge_lora_matches_adapter_forward():
    """merge_lora_params (peft merge_and_unload parity): folding
    W + (alpha/r)AB into plain kernels reproduces the adapter model's
    logits exactly, in the lora_rank=0 layout (so fuse/int8 compose)."""
    import dataclasses

    import flax

    from mllm_npu_tpu.utils.weights import (fuse_llama_projections,
                                            merge_lora_params)

    cfg = LlamaConfig.tiny(attention_impl="eager", lora_rank=4,
                           lora_alpha=8.0,
                           lora_targets=("q_proj", "v_proj", "up_proj"))
    model = LlamaForCausalLM(cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 0,
                             cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids)
    flat = flax.traverse_util.flatten_dict(params["params"])
    rng = np.random.RandomState(0)
    for k in flat:   # zero-init B would make the merge trivially exact
        if k[-1] == "lora_b":
            flat[k] = jnp.asarray(rng.randn(*flat[k].shape) * 0.05,
                                  jnp.float32)
    params = {"params": flax.traverse_util.unflatten_dict(flat)}
    ref_logits, _, _ = model.apply(params, ids)

    cfg0 = dataclasses.replace(cfg, lora_rank=0)
    model0 = LlamaForCausalLM(cfg0, dtype=jnp.float32)
    p0 = {"params": merge_lora_params(params["params"], cfg.lora_alpha)}
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(
                model0.init(jax.random.PRNGKey(1), ids)))
    logits0, _, _ = model0.apply(p0, ids)
    np.testing.assert_allclose(np.asarray(ref_logits),
                               np.asarray(logits0), atol=2e-5)

    # merged layout composes with projection fusion
    cfgf = dataclasses.replace(cfg0, fused_projections=True)
    modelf = LlamaForCausalLM(cfgf, dtype=jnp.float32)
    pf = {"params": fuse_llama_projections(p0["params"])}
    logitsf, _, _ = modelf.apply(pf, ids)
    np.testing.assert_allclose(np.asarray(ref_logits),
                               np.asarray(logitsf), atol=2e-5)


def test_embedding_lookup_grad_matches_take():
    """The custom-VJP embed lookup (one-hot einsum backward — the
    GSPMD-friendly replacement for take's scatter-add, which forced an
    involuntary full rematerialization of the activation cotangent on
    sharded meshes) must be gradient-exact vs jnp.take, on both the
    single-einsum and the vocab-chunked backward path."""
    from mllm_npu_tpu.models.language_models import llama

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(37, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 37, size=(3, 5)), jnp.int32)
    ga = jax.grad(lambda t: jnp.sum(
        jnp.sin(llama.embedding_lookup(t, ids)) * 1.7))(table)
    gb = jax.grad(lambda t: jnp.sum(
        jnp.sin(jnp.take(t, ids, axis=0)) * 1.7))(table)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))

    # chunked path (vocab > 2 * chunk), duplicate ids included
    old = llama._EMBED_GRAD_VOCAB_CHUNK
    llama._EMBED_GRAD_VOCAB_CHUNK = 16
    llama._embedding_lookup_for.cache_clear()
    try:
        table2 = jnp.asarray(rng.normal(size=(100, 4)), jnp.float32)
        ids2 = jnp.asarray(rng.integers(0, 100, size=(64,)), jnp.int32)
        g2 = jax.grad(lambda t: jnp.sum(
            llama.embedding_lookup(t, ids2) ** 2))(table2)
        g2r = jax.grad(lambda t: jnp.sum(
            jnp.take(t, ids2, axis=0) ** 2))(table2)
        np.testing.assert_array_equal(np.asarray(g2), np.asarray(g2r))
    finally:
        llama._EMBED_GRAD_VOCAB_CHUNK = old
        llama._embedding_lookup_for.cache_clear()


@pytest.mark.slow   # two full fwd+bwd compiles (~17s CPU) for a pure
# numerics-equivalence check — correctness, not wiring
def test_dots_lite_remat_matches_no_remat():
    """remat_policy='dots_lite' (save post-RoPE q/k/v + o_proj output,
    recompute gate/up) must be gradient-identical to the un-rematted
    model."""
    import dataclasses

    base = LlamaConfig.tiny(remat=False)
    lite = dataclasses.replace(base, remat=True, remat_policy="dots_lite")
    ids = jnp.asarray(np.random.RandomState(0).randint(2, 100, (2, 32)),
                      jnp.int32)
    labels = jnp.asarray(np.random.RandomState(1).randint(2, 100, (2, 32)),
                         jnp.int32)

    ref = None
    for cfg in (base, lite):
        lm = LlamaForCausalLM(cfg, dtype=jnp.float32,
                              param_dtype=jnp.float32)
        params = lm.init(jax.random.PRNGKey(0), ids)

        def loss_fn(p):
            logits = lm.apply(p, ids)[0]
            oh = jax.nn.one_hot(labels, cfg.vocab_size)
            return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        if ref is None:
            ref = (loss, grads)
        else:
            assert abs(float(loss - ref[0])) < 1e-6
            for a, b in zip(jax.tree_util.tree_leaves(grads),
                            jax.tree_util.tree_leaves(ref[1])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=2e-7)


@pytest.mark.slow
def test_hoist_attn_remat_matches_no_remat():
    """remat_policy='hoist_attn' (flash outside the remat region) must be
    gradient-identical to the un-rematted model — same params, same
    structure, float-epsilon grads."""
    import dataclasses

    base = LlamaConfig.tiny(remat=False)
    hoist = dataclasses.replace(base, remat=True,
                                remat_policy="hoist_attn")
    ids = jnp.asarray(np.random.RandomState(0).randint(2, 100, (2, 32)),
                      jnp.int32)
    labels = jnp.asarray(np.random.RandomState(1).randint(2, 100, (2, 32)),
                         jnp.int32)

    ref = None
    for cfg in (base, hoist):
        lm = LlamaForCausalLM(cfg, dtype=jnp.float32,
                              param_dtype=jnp.float32)
        params = lm.init(jax.random.PRNGKey(0), ids)

        def loss_fn(p):
            logits = lm.apply(p, ids)[0]
            oh = jax.nn.one_hot(labels, cfg.vocab_size)
            return -jnp.mean(jnp.sum(oh * jax.nn.log_softmax(logits), -1))

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        if ref is None:
            ref = (loss, grads)
        else:
            assert abs(float(loss - ref[0])) < 1e-6
            for a, b in zip(jax.tree_util.tree_leaves(grads),
                            jax.tree_util.tree_leaves(ref[1])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=2e-7)
