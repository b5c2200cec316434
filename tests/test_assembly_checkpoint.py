"""Full-assembly checkpoint loading (SEED-X pytorch_model.bin format):
synthesize a reference-layout torch state dict for a tiny assembly and
verify init_assembly_params slots every tensor into the Flax tree."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mllm_npu_tpu.models.factory import ModelBundle, init_assembly_params
from mllm_npu_tpu.utils.testing import TinySpec, build_tiny_mllm, synthetic_batch


def _torch_llama_sd(cfg):
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM as HFL
    hf = HFL(HFCfg(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        attn_implementation="eager"))
    return {f"language_model.{k}": v for k, v in hf.state_dict().items()}


def _torch_resampler_sd(prefix, grid, E, H, kv):
    import torch.nn as tnn
    from mllm_npu_tpu.models.vit_common import get_2d_sincos_pos_embed

    sd = {}
    sd[f"{prefix}.query"] = torch.randn(grid * grid, E) * 0.02
    sd[f"{prefix}.kv_proj.weight"] = torch.randn(E, kv)
    mha = tnn.MultiheadAttention(E, H)
    for k, v in mha.state_dict().items():
        sd[f"{prefix}.attn.{k}"] = v
    for nm in ("ln_q", "ln_kv"):
        sd[f"{prefix}.{nm}.weight"] = torch.randn(E)
        sd[f"{prefix}.{nm}.bias"] = torch.randn(E)
    return sd


@pytest.mark.slow
def test_assembly_checkpoint_loads(tmp_path):
    spec = TinySpec(batch=1, seq=32)
    model, lm_cfg, vis_cfg = build_tiny_mllm(spec, seed=True)

    sd = {}
    sd.update(_torch_llama_sd(lm_cfg))
    sd.update(_torch_resampler_sd("projector", 2, lm_cfg.hidden_size,
                                  4, vis_cfg.hidden_size))
    sd.update(_torch_resampler_sd("output_projector", 2,
                                  vis_cfg.hidden_size, 4,
                                  lm_cfg.hidden_size))
    sd["patch_pos_embed"] = torch.randn(4, lm_cfg.hidden_size)
    torch.save(sd, tmp_path / "pytorch_model.bin")

    bundle = ModelBundle(
        module=model, config=None, params=None,
        extras={"lm_config": lm_cfg,
                "mllm_checkpoint": str(tmp_path / "pytorch_model.bin")})
    batch = synthetic_batch(spec, cmp_images=1, gen_images=1)
    params = init_assembly_params(bundle, batch, jax.random.PRNGKey(0))

    # projector query must equal the checkpoint tensor (not random init)
    got = np.asarray(params["params"]["projector"]["query"])
    np.testing.assert_allclose(got, sd["projector.query"].numpy(),
                               atol=1e-6)
    got_ppe = np.asarray(params["params"]["patch_pos_embed"])
    np.testing.assert_allclose(got_ppe, sd["patch_pos_embed"].numpy(),
                               atol=1e-6)
    got_emb = np.asarray(
        params["params"]["language_model"]["model"]["embed_tokens"]
        ["embedding"])
    np.testing.assert_allclose(
        got_emb, sd["language_model.model.embed_tokens.weight"].numpy(),
        atol=1e-6)
    # loaded model still runs
    out = model.apply(params, **batch)
    assert np.isfinite(float(out["total_loss"]))


def test_8b_sharding_specs_divide():
    """The production 8B config's param shapes must divide cleanly over a
    v5p-8-style mesh (data2, fsdp2, tensor2) under the sharding rules —
    shape-level check via eval_shape (no 8B memory needed)."""
    from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                           LlamaForCausalLM)
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.parallel.sharding import infer_param_specs

    cfg = LlamaConfig.llama3_8b()
    model = LlamaForCausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ids))
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    specs = infer_param_specs(shapes, mesh)

    import numpy as _np
    flat_s = jax.tree_util.tree_leaves(shapes)
    flat_p = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: hasattr(x, "index") or x is None
        or str(type(x)).endswith("PartitionSpec'>"))
    from jax.sharding import PartitionSpec
    flat_p = [p for p in jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, PartitionSpec))]
    assert len(flat_s) == len(flat_p)
    sharded = 0
    for leaf, spec in zip(flat_s, flat_p):
        for dim, axis in zip(leaf.shape, tuple(spec)):
            if axis is None:
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else int(
                _np.prod([mesh.shape[a] for a in axis]))
            assert dim % size == 0, (leaf.shape, spec)
            sharded += 1
    # the big matrices must actually be sharded, not silently replicated:
    # scan-stacked layout has 7 stacked proj matrices + embed + lm_head,
    # each sharded on 2 axes
    assert sharded >= 14
