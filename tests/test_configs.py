"""Config system tests: our YAMLs instantiate + run; the REFERENCE's own
model YAML translates through the target table (DEBUG_FLAG tiny models,
like the reference's fake backend)."""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from mllm_npu_tpu.configs import instantiate, load_config

REF_CFG = Path("/root/reference/mllm_npu/configs/models/"
               "mllm_llama3_8b_siglip_vit.yaml")


@pytest.fixture(autouse=True)
def debug_flag(monkeypatch):
    monkeypatch.setenv("DEBUG_FLAG", "True")


def _assemble(cfg):
    llm = instantiate(cfg["mllm"]["language_model"])
    mllm = instantiate(cfg["mllm"]["mllm_model"], language_model=llm)
    return llm, mllm


def _forward(bundle, lm_cfg, vis_cfg):
    from mllm_npu_tpu.models.factory import init_assembly_params
    img = vis_cfg.image_size
    nq = bundle.module.projector.num_queries
    B, S, N = 1, max(4 * nq, 64), 1
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(5, lm_cfg.vocab_size, (B, S)),
                                 jnp.int32),
        "images": jnp.asarray(rs.randn(N, img, img, 3), jnp.float32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(rs.randint(5, lm_cfg.vocab_size, (B, S)),
                              jnp.int32),
        "embeds_cmp_mask": jnp.asarray([True]),
        "embeds_gen_mask": jnp.asarray([False]),
        "ids_cmp_mask": jnp.zeros((B, S), bool).at[0, 2:2 + nq].set(True),
        "ids_gen_mask": jnp.zeros((B, S), bool),
        "patch_positions": jnp.asarray(rs.rand(N, 2), jnp.float32),
    }
    params = init_assembly_params(bundle, batch)
    out = bundle.module.apply(params, **batch)
    assert np.isfinite(float(out["total_loss"]))
    return out


@pytest.mark.slow
def test_our_mllm_config_instantiates_and_runs():
    cfg = load_config("models/mllm_llama3_8b_siglip_vit.yaml")
    llm, mllm = _assemble(cfg)
    assert llm.config.lora_rank == 32
    assert llm.config.vocab_size == 128587
    vis_cfg = mllm.module.vision_encoder.config
    _forward(mllm, llm.config, vis_cfg)


@pytest.mark.skipif(not REF_CFG.exists(),
                    reason="reference repo not mounted")
@pytest.mark.slow
def test_reference_yaml_translates():
    """The reference repo's own YAML instantiates through the
    translation table (targets mllm_npu.* -> mllm_npu_tpu.*)."""
    with open(REF_CFG) as f:
        cfg = yaml.safe_load(f)
    llm, mllm = _assemble(cfg)
    assert llm.config.vocab_size == 128587
    vis_cfg = mllm.module.vision_encoder.config
    _forward(mllm, llm.config, vis_cfg)


@pytest.mark.parametrize("name", [
    "seedx_llama2_13b_qwenvl_vitg.yaml",
    "seedx_llama2_13b_qwenvl_vit.yaml",   # hub-path variant (ref parity)
])
def test_our_seedx_config_instantiates(name):
    cfg = load_config(f"models/{name}")
    llm = instantiate(cfg["mllm"]["language_model"])
    mllm = instantiate(cfg["mllm"]["mllm_model"], language_model=llm)
    assert mllm.module.vit_down and mllm.module.mse
    assert mllm.module.output_projector is not None


@pytest.mark.skipif(not REF_CFG.exists(),
                    reason="reference repo not mounted")
@pytest.mark.parametrize("ref_name", [
    "seedx_llama2_13b_qwenvl_vitg.yaml",
    "seedx_llama2_13b_qwenvl_vit.yaml",
])
def test_reference_seedx_yaml_translates(ref_name):
    ref = Path("/root/reference/mllm_npu/configs/models/") / ref_name
    with open(ref) as f:
        cfg = yaml.safe_load(f)
    llm = instantiate(cfg["mllm"]["language_model"])
    mllm = instantiate(cfg["mllm"]["mllm_model"], language_model=llm)
    assert mllm.module.vit_down and mllm.module.mse
    assert mllm.module.output_projector is not None
    assert llm.config.lora_rank == 32


def test_launch_scripts_are_valid_bash():
    """bash -n over every launch script (the reference ships these as
    the user-facing entry points, scripts/*.sh)."""
    import subprocess
    from pathlib import Path

    scripts = sorted((Path(__file__).resolve().parents[1] / "scripts")
                     .glob("*.sh"))
    assert scripts, "no launch scripts found"
    for sh in scripts:
        r = subprocess.run(["bash", "-n", str(sh)],
                           capture_output=True, text=True)
        assert r.returncode == 0, (sh, r.stderr)
