"""Sharded train-step tests on the virtual 8-device CPU mesh:
DP, FSDP, TP, grad accumulation, frozen-param masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_npu_tpu.parallel import MeshConfig, build_mesh, infer_param_specs
from mllm_npu_tpu.train.train_state import (OptimizerConfig,
                                            compile_train_step,
                                            create_train_state,
                                            make_train_step,
                                            shard_train_state)
from mllm_npu_tpu.utils.testing import TinySpec, build_tiny_mllm, synthetic_batch

SPEC = TinySpec(batch=8, seq=128)


def _loss_fn(model):
    def loss_fn(params, batch):
        out = model.apply(params, **batch)
        return out["total_loss"], {"lm_loss": out["lm_loss"]}
    return loss_fn


def _setup(mesh_cfg: MeshConfig, grad_accum=1):
    mesh = build_mesh(mesh_cfg)
    model, _, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=2)
    params = model.init(jax.random.PRNGKey(0), **batch)
    opt_cfg = OptimizerConfig(lr=1e-3, warmup_steps=0, total_steps=10)
    state = create_train_state(params, opt_cfg)
    if grad_accum > 1:
        batch = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * grad_accum), batch)
    step = make_train_step(_loss_fn(model), grad_accum=grad_accum)
    jitted, state_sharding, batch_shardings = compile_train_step(
        step, state, batch, mesh)
    state = shard_train_state(state, state_sharding)
    batch = jax.tree_util.tree_map(jax.device_put, batch, batch_shardings)
    return jitted, state, batch


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(data=8, fsdp=1, tensor=1),
    MeshConfig(data=2, fsdp=4, tensor=1),
    MeshConfig(data=2, fsdp=2, tensor=2),
])
def test_train_step_runs_all_meshes(mesh_cfg):
    jitted, state, batch = _setup(mesh_cfg)
    new_state, loss, metrics = jitted(state, batch)
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["grad_norm"]))


def test_loss_identical_across_meshes():
    """Sharding must not change numerics (GSPMD correctness check)."""
    losses = []
    for cfg in [MeshConfig(data=8), MeshConfig(data=2, fsdp=2, tensor=2)]:
        jitted, state, batch = _setup(cfg)
        _, loss, _ = jitted(state, batch)
        losses.append(float(loss))
    assert abs(losses[0] - losses[1]) < 1e-4, losses


def test_grad_accum_matches_big_batch():
    jitted, state, batch = _setup(MeshConfig(data=8), grad_accum=2)
    new_state, loss, _ = jitted(state, batch)
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1


def test_frozen_params_unchanged_after_step():
    jitted, state, batch = _setup(MeshConfig(data=8))
    before = jax.tree_util.tree_map(
        np.asarray, state.params["params"]["vision_encoder"])
    lm_before = np.asarray(
        state.params["params"]["language_model"]["model"]["layers"]
        ["mlp"]["gate_proj"]["kernel"])
    new_state, _, _ = jitted(state, batch)
    after = new_state.params["params"]["vision_encoder"]
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    lm_after = np.asarray(
        new_state.params["params"]["language_model"]["model"]["layers"]
        ["mlp"]["gate_proj"]["kernel"])
    assert np.abs(lm_after - lm_before).max() > 0


def test_param_specs_use_tensor_axis():
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    model, _, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    specs = infer_param_specs(params, mesh)
    qspec = specs["params"]["language_model"]["model"]["layers"]["self_attn"][
        "q_proj"]["kernel"]
    assert "tensor" in jax.tree_util.tree_leaves(qspec, is_leaf=lambda x: x is not None) or \
        tuple(qspec)[-1] == "tensor"
