"""Config system: `_target_` YAML module trees + a tiny instantiate()
(hydra-equivalent; reference uses hydra.utils.instantiate —
train/train.py:231,243, serve/worker.py:70-97).

Reference configs translate 1:1: a translation table maps
``mllm_npu.*`` target paths onto this package's constructors, so YAML
files written for the reference resolve here unchanged. ``_recursive_:
False`` defers child instantiation exactly like hydra
(reference configs/dataset/pretrain_data.yaml:2).
"""

from __future__ import annotations

import dataclasses
import importlib
from pathlib import Path
from typing import Any

import yaml

CONFIG_DIR = Path(__file__).parent

# reference target path -> this package's target path (or callable)
TARGET_TRANSLATION = {
    "mllm_npu.models.mllm.GeneraliazedMultimodalModels.from_pretrained":
        "mllm_npu_tpu.models.factory.build_mllm",
    "mllm_npu.models.mllm.GeneraliazedMultimodalModels":
        "mllm_npu_tpu.models.factory.build_mllm",
    "mllm_npu.models.mllm.SEED.from_pretrained":
        "mllm_npu_tpu.models.factory.build_seed",
    "mllm_npu.models.mllm.SEED":
        "mllm_npu_tpu.models.factory.build_seed",
    "mllm_npu.models.multimodal_encoder.siglip_vit.SigLIPVisionEncoder"
    ".from_pretrained":
        "mllm_npu_tpu.models.factory.build_siglip",
    "mllm_npu.models.multimodal_encoder.qwenvl_vit"
    ".VisionTransformerWithAttnPool.from_pretrained":
        "mllm_npu_tpu.models.factory.build_qwen_vit",
    "mllm_npu.models.multimodal_encoder.qwenvl_vit"
    ".VisionTransformerWithAttnPool":
        "mllm_npu_tpu.models.factory.build_qwen_vit",
    "mllm_npu.models.multimodal_encoder.qwenvl_vit.VisionTransformer":
        "mllm_npu_tpu.models.factory.build_qwen_vit",
    "mllm_npu.models.multimodal_projector.attention_resampler"
    ".AttentionResampler":
        "mllm_npu_tpu.models.factory.build_attention_resampler",
    "mllm_npu.models.multimodal_projector.pooling_projection.SimplePooling":
        "mllm_npu_tpu.models.multimodal_projector.pooling_projection"
        ".SimplePooling",
    "mllm_npu.models.multimodal_projector.multilayer_perceptron.MLP":
        "mllm_npu_tpu.models.multimodal_projector.multilayer_perceptron.MLP",
    "mllm_npu.models.language_models.llama3.LlamaForCausalLM"
    ".from_pretrained":
        "mllm_npu_tpu.models.factory.build_llama3",
    "mllm_npu.models.language_models.llama2.LlamaForCausalLM"
    ".from_pretrained":
        "mllm_npu_tpu.models.factory.build_llama2",
    "mllm_npu.models.language_models.peft_models"
    ".get_peft_model_with_resize_embedding":
        "mllm_npu_tpu.models.factory.get_peft_model_with_resize_embedding",
    "mllm_npu.models.language_models.peft_models"
    ".get_model_with_resize_embedding":
        "mllm_npu_tpu.models.factory.get_model_with_resize_embedding",
    "mllm_npu.models.language_models.peft_models"
    ".get_full_model_with_resize_embedding":
        "mllm_npu_tpu.models.factory.get_full_model_with_resize_embedding",
    "mllm_npu.data.processor.init_processor":
        "mllm_npu_tpu.data.processor.init_processor",
    # peft.LoraConfig nodes become plain dicts consumed by our factories
    "peft.LoraConfig": "mllm_npu_tpu.configs.passthrough_dict",
}


def passthrough_dict(**kw) -> dict:
    return kw

_SPECIAL_KEYS = ("_target_", "_recursive_", "_convert_", "_partial_")


def resolve_target(path: str):
    path = TARGET_TRANSLATION.get(path, path)
    if path.startswith("mllm_npu."):
        path = "mllm_npu_tpu." + path[len("mllm_npu."):]
    parts = path.split(".")
    # import the longest importable module prefix, then getattr the rest
    for i in range(len(parts), 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:i]))
        except ImportError:
            continue
        obj = mod
        for attr in parts[i:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(f"cannot resolve target {path!r}")


def is_target_cfg(cfg: Any) -> bool:
    return isinstance(cfg, dict) and "_target_" in cfg


def instantiate(cfg: Any, **overrides):
    """hydra.utils.instantiate semantics (subset): resolve `_target_`,
    recursively instantiate dict/list children (unless `_recursive_:
    False`), call with remaining keys + overrides. `_partial_: True`
    returns a functools.partial."""
    import functools

    if not is_target_cfg(cfg):
        raise ValueError("instantiate() requires a dict with _target_")
    cfg = dict(cfg)
    target = resolve_target(cfg["_target_"])
    recursive = cfg.get("_recursive_", True)
    partial = cfg.get("_partial_", False)

    def build(v):
        if recursive and is_target_cfg(v):
            return instantiate(v)
        if recursive and isinstance(v, list):
            return [build(x) for x in v]
        return v

    kwargs = {k: build(v) for k, v in cfg.items()
              if k not in _SPECIAL_KEYS}
    kwargs.update(overrides)
    if partial:
        return functools.partial(target, **kwargs)
    return target(**kwargs)


def load_config(path: str | Path) -> dict:
    path = Path(path)
    if not path.exists():
        alt = CONFIG_DIR / path
        if alt.exists():
            path = alt
    with open(path) as f:
        return yaml.safe_load(f)
