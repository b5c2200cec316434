"""Offline checkpoint converter: convert → orbax → fast-restore
roundtrip through the real serving load path (scripts/tools/
convert_checkpoint.py + worker --params-checkpoint)."""

import jax
import numpy as np
import pytest

CFG = "mllm_npu_tpu/configs/models/mllm_llama3_8b_siglip_vit.yaml"


@pytest.fixture(autouse=True)
def _debug(monkeypatch):
    monkeypatch.setenv("DEBUG_FLAG", "True")


@pytest.mark.slow
def test_convert_restore_roundtrip(tmp_path):
    from mllm_npu_tpu.models.factory import init_assembly_params
    from mllm_npu_tpu.utils.convert import (build_assembly_from_yaml,
                                            convert_model_checkpoint,
                                            restore_params)

    info = convert_model_checkpoint(CFG, str(tmp_path))
    assert info["n_params"] > 0

    bundle, _, _, example = build_assembly_from_yaml(CFG)
    want = init_assembly_params(bundle, example, jax.random.PRNGKey(0))
    got = restore_params(bundle, example, str(tmp_path))

    w = jax.tree_util.tree_leaves(want)
    g = jax.tree_util.tree_leaves(got)
    assert len(w) == len(g)
    for a, b in zip(w, g):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_missing_dir_raises(tmp_path):
    from mllm_npu_tpu.utils.convert import (build_assembly_from_yaml,
                                            restore_params)
    bundle, _, _, example = build_assembly_from_yaml(CFG)
    with pytest.raises(FileNotFoundError):
        restore_params(bundle, example, str(tmp_path / "nope"))


@pytest.mark.slow
def test_engine_builds_from_params_checkpoint(tmp_path):
    from mllm_npu_tpu.serve.worker import load_engine_from_config
    from mllm_npu_tpu.utils.convert import convert_model_checkpoint

    convert_model_checkpoint(CFG, str(tmp_path))
    eng = load_engine_from_config(CFG, max_new_tokens=4,
                                  params_checkpoint=str(tmp_path))
    assert eng is not None


@pytest.mark.slow
def test_restore_params_sharded_over_mesh(tmp_path):
    """restore_params(mesh=...) restores leaves directly in their TP
    sharded layout (no replicated staging copy)."""
    import jax
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.utils.convert import (build_assembly_from_yaml,
                                            convert_model_checkpoint,
                                            restore_params)

    convert_model_checkpoint(CFG, str(tmp_path))
    bundle, _, _, example = build_assembly_from_yaml(CFG)
    mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=2),
                      devices=jax.devices()[:2])
    params = restore_params(bundle, example, str(tmp_path), mesh=mesh)
    # at least one leaf is genuinely tensor-sharded
    from jax.sharding import NamedSharding
    sharded = [x for x in jax.tree_util.tree_leaves(params)
               if isinstance(getattr(x, "sharding", None), NamedSharding)
               and "tensor" in str(x.sharding.spec)]
    assert sharded, "no tensor-sharded leaves after mesh restore"


@pytest.mark.slow
def test_engine_with_generation_config_builds(tmp_path):
    """load_engine_from_config with a generation YAML (the SDXL adapter
    branch) — regression for a missing load_config import."""
    from mllm_npu_tpu.serve.worker import load_engine_from_config

    eng = load_engine_from_config(
        CFG, max_new_tokens=4,
        generation_config_path=(
            "mllm_npu_tpu/configs/generation/sd_xl_resampler.yaml"))
    assert eng is not None and eng.adapter is not None
