"""Model factories targeted by `_target_` configs.

These are the constructors the YAML module tree resolves to (the
equivalents of the reference's ``*.from_pretrained`` targets +
peft_models recipes — reference configs/models/*.yaml). Because Flax
separates module definitions from parameters, factories return a
:class:`ModelBundle` (module + optional converted params + config); the
trainer/server merges bundles and initializes any missing params.

DEBUG_FLAG=True swaps every component for a tiny random model, exactly
like the reference's fake backend (reference mllm.py:221, qwenvl_vit.py:
326-338, peft_models.py:28-41).
"""

from __future__ import annotations

import dataclasses
import os
import re
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                       LlamaForCausalLM)
from mllm_npu_tpu.models.mllm import SEED, GeneralizedMultimodalModel
from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
    QwenViTConfig, VisionTransformerWithAttnPool)
from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
    SigLIPConfig, SigLIPVisionEncoder)
from mllm_npu_tpu.models.multimodal_projector.attention_resampler import (
    AttentionResampler)


def _debug() -> bool:
    return os.environ.get("DEBUG_FLAG", "False") == "True"


@dataclasses.dataclass
class ModelBundle:
    module: Any
    config: Any = None
    params: Optional[dict] = None     # converted weights (subtree) or None
    extras: dict = dataclasses.field(default_factory=dict)


def _maybe(path) -> Optional[str]:
    """Resolve a configured checkpoint path. A configured-but-absent
    path RAISES outside DEBUG (the reference's ``from_pretrained`` would
    throw too) — silently random-initializing a serving/eval model on a
    typo'd path was a round-1 footgun. Under DEBUG_FLAG missing paths
    are the expected mode and resolve to None (random tiny init).
    A hub-style id (``org/name`` with no local file) resolves through
    ``huggingface_hub.snapshot_download`` — the reference passes hub ids
    straight to ``from_pretrained`` which downloads the same way."""
    if not path:
        return None
    if Path(str(path)).exists():
        return str(path)
    if _debug():
        return None
    if re.fullmatch(r"[\w.\-]+/[\w.\-]+", str(path)):
        try:
            from huggingface_hub import snapshot_download
            return snapshot_download(str(path))
        except Exception as e:  # noqa: BLE001
            raise FileNotFoundError(
                f"checkpoint {path!r} is not a local path and hub "
                f"download failed ({type(e).__name__}: {e}) — "
                f"pre-download it into pretrained/ or fix the path "
                f"(DEBUG_FLAG=True for checkpoint-free tiny models)"
            ) from e
    raise FileNotFoundError(
        f"configured checkpoint path does not exist: {path!r} "
        f"(set DEBUG_FLAG=True for checkpoint-free tiny models)")


# ---------------------------------------------------------------------------
# Language models
# ---------------------------------------------------------------------------

def _build_llama(cfg: LlamaConfig, pretrained: Optional[str],
                 vocab_size: Optional[int], dtype) -> ModelBundle:
    if vocab_size is not None:
        cfg = dataclasses.replace(cfg, vocab_size=vocab_size)
    module = LlamaForCausalLM(cfg, dtype=dtype)
    params = None
    ckpt = _maybe(pretrained)
    if ckpt and not _debug():
        from mllm_npu_tpu.utils.weights import (load_torch_file,
                                                torch_to_flax_llama)
        sd = _load_hf_dir_or_file(ckpt)
        params = torch_to_flax_llama(sd, cfg, vocab_size=cfg.vocab_size)
    return ModelBundle(module=module, config=cfg, params=params)


def _load_hf_dir_or_file(path: str) -> dict:
    """Load a torch state dict from a .pt/.bin file, a sharded HF dir, or
    safetensors."""
    from mllm_npu_tpu.utils.weights import load_torch_file
    p = Path(path)
    if p.is_file():
        return load_torch_file(str(p))
    sd = {}
    bins = sorted(p.glob("pytorch_model*.bin")) + sorted(p.glob("*.pt"))
    if bins:
        for b in bins:
            sd.update(load_torch_file(str(b)))
        return sd
    sts = sorted(p.glob("*.safetensors"))
    if sts:
        from safetensors import safe_open
        for s in sts:
            with safe_open(str(s), framework="pt") as f:
                for k in f.keys():
                    sd[k] = f.get_tensor(k)
        return sd
    raise FileNotFoundError(f"no weights found under {path}")


def build_llama3(pretrained_model_name_or_path=None, vocab_size=None,
                 dtype=jnp.bfloat16, **kw) -> ModelBundle:
    if _debug():
        # keep DEBUG's no-remat default, but still honor explicit YAML
        # overrides (remat_policy: hoist_attn etc.) in tiny runs
        cfg = LlamaConfig.tiny(vocab_size=vocab_size or 1024, **kw)
    else:
        kw.setdefault("remat", True)
        kw.setdefault("remat_policy", "dots")
        cfg = LlamaConfig.llama3_8b(**kw)
    return _build_llama(cfg, pretrained_model_name_or_path, vocab_size,
                        dtype)


def build_llama2(pretrained_model_name_or_path=None, vocab_size=None,
                 dtype=jnp.bfloat16, **kw) -> ModelBundle:
    if _debug():
        cfg = LlamaConfig.tiny(vocab_size=vocab_size or 1024, **kw)
    else:
        kw.setdefault("remat", True)
        kw.setdefault("remat_policy", "dots")
        cfg = LlamaConfig.llama2_13b(**kw)
    return _build_llama(cfg, pretrained_model_name_or_path, vocab_size,
                        dtype)


def get_peft_model_with_resize_embedding(model: ModelBundle = None,
                                         peft_config=None,
                                         vocab_size=None,
                                         torch_dtype="bf16",
                                         **kw) -> ModelBundle:
    """LoRA-wrap + vocab resize (reference peft_models.py:15-99). The
    peft_config dict's r/lora_alpha/target_modules map onto LlamaConfig
    lora fields; vocab resize happens in the weight converter."""
    assert model is not None
    cfg = model.config
    r, alpha, targets = 32, 32.0, cfg.lora_targets
    dropout = 0.0
    if isinstance(peft_config, dict):
        r = peft_config.get("r", r)
        alpha = float(peft_config.get("lora_alpha", alpha))
        targets = tuple(peft_config.get("target_modules", targets))
        dropout = float(peft_config.get("lora_dropout", 0.0))
    cfg = dataclasses.replace(
        cfg, lora_rank=r, lora_alpha=alpha, lora_targets=targets,
        lora_dropout=dropout, vocab_size=vocab_size or cfg.vocab_size)
    module = LlamaForCausalLM(cfg, dtype=model.module.dtype)
    # re-convert weights under the LoRA layout if we had them
    params = None
    if model.params is not None:
        # model.params were converted without lora; rebuild is cheaper via
        # re-conversion; callers that need this path pass the checkpoint
        # again. For in-memory re-layout, wrap base kernels:
        params = _relayout_lora(model.params, cfg)
    return ModelBundle(module=module, config=cfg, params=params)


def get_model_with_resize_embedding(model: ModelBundle = None,
                                    vocab_size=None, **kw) -> ModelBundle:
    """Non-LoRA variant (reference peft_models.py:101-122): embeddings
    resized, whole model trainable."""
    assert model is not None
    cfg = dataclasses.replace(model.config,
                              vocab_size=vocab_size or model.config.vocab_size)
    module = LlamaForCausalLM(cfg, dtype=model.module.dtype)
    return ModelBundle(module=module, config=cfg, params=model.params)


def get_full_model_with_resize_embedding(model: ModelBundle = None,
                                         vocab_size=None, **kw
                                         ) -> ModelBundle:
    return get_model_with_resize_embedding(model=model,
                                           vocab_size=vocab_size, **kw)


def _relayout_lora(params: dict, cfg: LlamaConfig) -> dict:
    """Wrap plain proj kernels into base/{kernel} + zero adapters."""
    import numpy as np

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if k in cfg.lora_targets and "kernel" in v and k != "lm_head":
                    kern = v["kernel"]
                    i_dim, o_dim = kern.shape[-2], kern.shape[-1]
                    lead = kern.shape[:-2]
                    out[k] = {
                        "base": v,
                        "lora_a": np.random.RandomState(0).uniform(
                            -1, 1, lead + (i_dim, cfg.lora_rank)
                        ).astype(np.float32) * (3.0 / i_dim) ** 0.5,
                        "lora_b": np.zeros(lead + (cfg.lora_rank, o_dim),
                                           np.float32),
                    }
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


# ---------------------------------------------------------------------------
# Vision encoders / projectors
# ---------------------------------------------------------------------------

def build_siglip(pretrained_model_name_or_path=None, hidden_dim=1152,
                 output_dim=4096, dtype=jnp.bfloat16, **kw) -> ModelBundle:
    cfg = SigLIPConfig.tiny() if _debug() else SigLIPConfig.so400m_384()
    module = SigLIPVisionEncoder(cfg, hidden_dim=hidden_dim,
                                 output_dim=output_dim, dtype=dtype)
    params = None
    ckpt = _maybe(pretrained_model_name_or_path)
    if ckpt and not _debug():
        from mllm_npu_tpu.utils.weights import torch_to_flax_siglip
        sd = _load_hf_dir_or_file(ckpt)
        params = torch_to_flax_siglip(sd, cfg)
    return ModelBundle(module=module, config=cfg, params=params)


def build_qwen_vit(pretrained_model_name_or_path=None, heads=16,
                   image_size=448, layers=48, mlp_ratio=4.9231,
                   output_dim=4096, patch_size=14, width=1664,
                   patch_pos=False, dtype=jnp.bfloat16, **kw) -> ModelBundle:
    cfg = (QwenViTConfig.tiny() if _debug() else
           QwenViTConfig(image_size=image_size, patch_size=patch_size,
                         width=width, layers=layers, heads=heads,
                         mlp_ratio=mlp_ratio, output_dim=output_dim,
                         patch_pos=patch_pos))
    module = VisionTransformerWithAttnPool(cfg, dtype=dtype)
    params = None
    ckpt = _maybe(pretrained_model_name_or_path)
    if ckpt and not _debug():
        from mllm_npu_tpu.utils.weights import torch_to_flax_qwen_vit
        sd = _load_hf_dir_or_file(ckpt)
        params = torch_to_flax_qwen_vit(sd, cfg)
    return ModelBundle(module=module, config=cfg, params=params)


def build_attention_resampler(grid_size: int, embed_dim: int, num_heads: int,
                              kv_dim: Optional[int] = None,
                              dtype=jnp.bfloat16, **kw) -> ModelBundle:
    if _debug():
        # dims consistent with the tiny debug LLM (hidden 128) / encoders;
        # kv_proj existence is preserved (input width is shape-inferred)
        grid_size, embed_dim, num_heads = 2, 128, 4
        kv_dim = None if kv_dim is None else 64
    module = AttentionResampler(grid_size=grid_size, embed_dim=embed_dim,
                                num_heads=num_heads, kv_dim=kv_dim,
                                dtype=dtype)
    return ModelBundle(module=module, config=None, params=None)


# ---------------------------------------------------------------------------
# Assemblies
# ---------------------------------------------------------------------------

def _merge_assembly_params(child_bundles: dict) -> Optional[dict]:
    """Merge converted child params (if ALL children that have weights
    nest under their attribute names). Children without params stay
    missing — the caller must init-then-merge."""
    subtrees = {name: b.params for name, b in child_bundles.items()
                if b.params is not None}
    return subtrees or None


def build_mllm(language_model: ModelBundle = None,
               vision_encoder: ModelBundle = None,
               projector: ModelBundle = None,
               freeze_vision_encoder=True, lm_loss_scale=1.0,
               add_patch_pos=False,
               pretrained_model_name_or_path=None,
               pretrained_model_path=None, **kw) -> ModelBundle:
    lm_dim = language_model.config.hidden_size
    module = GeneralizedMultimodalModel(
        language_model=language_model.module,
        vision_encoder=vision_encoder.module,
        projector=projector.module,
        freeze_vision_encoder=freeze_vision_encoder,
        lm_loss_scale=lm_loss_scale,
        add_patch_pos=add_patch_pos,
        patch_pos_dim=lm_dim)
    params = _merge_assembly_params({
        "language_model": language_model,
        "vision_encoder": vision_encoder,
        "projector": projector})
    extras = {"lm_config": language_model.config,
              "mllm_checkpoint": _maybe(pretrained_model_name_or_path
                                        or pretrained_model_path)}
    return ModelBundle(module=module, config=None, params=params,
                       extras=extras)


def build_seed(language_model: ModelBundle = None,
               vision_encoder: ModelBundle = None,
               projector: ModelBundle = None,
               output_projector: ModelBundle = None,
               freeze_vision_encoder=True, lm_loss_scale=1.0,
               rec_loss_scale=1.0, add_patch_pos=False, vit_down=False,
               mse=False, num_img_out_tokens: Optional[int] = None,
               pretrained_model_name_or_path=None,
               pretrained_model_path=None, **kw) -> ModelBundle:
    if num_img_out_tokens is None:
        # production: 64 (constant.NUM_IMG_TOKENS); debug: the tiny
        # projector's query count so masks/windows stay consistent
        num_img_out_tokens = (projector.module.num_queries if _debug()
                              else 64)
    lm_dim = language_model.config.hidden_size
    module = SEED(
        num_img_out_tokens=num_img_out_tokens,
        language_model=language_model.module,
        vision_encoder=vision_encoder.module,
        projector=projector.module,
        output_projector=output_projector.module,
        freeze_vision_encoder=freeze_vision_encoder,
        lm_loss_scale=lm_loss_scale,
        rec_loss_scale=rec_loss_scale,
        add_patch_pos=add_patch_pos,
        patch_pos_dim=lm_dim,
        vit_down=vit_down,
        mse=mse)
    params = _merge_assembly_params({
        "language_model": language_model,
        "vision_encoder": vision_encoder,
        "projector": projector,
        "output_projector": output_projector})
    extras = {"lm_config": language_model.config,
              "mllm_checkpoint": _maybe(pretrained_model_name_or_path
                                        or pretrained_model_path)}
    return ModelBundle(module=module, config=None, params=params,
                       extras=extras)


def init_assembly_params(bundle: ModelBundle, example_batch: dict,
                         rng=None) -> dict:
    """Initialize the assembly, then overwrite subtrees that came from
    converted checkpoints (the analogue of the reference's
    load_zero3_checkpoint init-time loading, utils.py:151-215)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = bundle.module.init(rng, **example_batch)
    ckpt = bundle.extras.get("mllm_checkpoint") if bundle.extras else None
    if ckpt and not _debug():
        # full-assembly checkpoint (reference pytorch_model.bin) overrides
        # the per-component conversions
        from mllm_npu_tpu.utils.weights import torch_to_flax_assembly
        sd = _load_hf_dir_or_file(ckpt)
        lm_cfg = bundle.extras["lm_config"]
        vis = bundle.module.vision_encoder
        vis_kind = ("qwen" if "qwenvl" in type(vis).__module__
                    else "siglip")
        converted = torch_to_flax_assembly(
            sd, lm_config=lm_cfg, vision_config=vis.config,
            vision_kind=vis_kind,
            has_output_projector=hasattr(bundle.module,
                                         "output_projector"))
        merged = dict(bundle.params or {})
        merged.update(converted)
        bundle = dataclasses.replace(bundle, params=merged)
    if bundle.params:
        params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
        import flax
        flat = flax.traverse_util.flatten_dict(params["params"])
        for name, sub in bundle.params.items():
            if not isinstance(sub, dict):
                # root-level leaf (e.g. patch_pos_embed)
                subflat = {(): sub}
            else:
                subflat = flax.traverse_util.flatten_dict(sub)
            for k, v in subflat.items():
                key = (name,) + k
                if key in flat and flat[key].shape == jnp.shape(v):
                    flat[key] = jnp.asarray(v, flat[key].dtype)
                else:
                    import logging
                    logging.getLogger(__name__).warning(
                        "skipping mismatched weight %s", key)
        params = dict(params)
        params["params"] = flax.traverse_util.unflatten_dict(flat)
    return params


# ---------------------------------------------------------------------------
# de-tokenizer (SDXL adapter) factory
# ---------------------------------------------------------------------------

def build_sdxl_adapter(resampler: Optional[dict] = None,
                       unet_checkpoint: Optional[str] = None,
                       vae_checkpoint: Optional[str] = None,
                       adapter_checkpoint: Optional[str] = None,
                       vit_down: bool = False,
                       with_latent_image: bool = False,
                       dtype=jnp.float32,
                       scheduler=None):
    """Build the SDXL de-tokenizer stack (worker-side analogue of
    reference worker.py:88-109 / demo txt2img :57-88). Checkpoints load
    when present; otherwise random init (DEBUG/tiny workflows).

    ``resampler``: kwargs for ResamplerXL(V2); in DEBUG mode everything
    shrinks to the tiny configs."""
    import jax.numpy as jnp
    import numpy as np

    from mllm_npu_tpu.models.generation.adapter_modules import (
        SDXLAdapter, SDXLAdapterWithLatentImage)
    from mllm_npu_tpu.models.generation.resampler import ResamplerXL
    from mllm_npu_tpu.models.generation.schedulers import (
        EulerDiscreteScheduler)
    from mllm_npu_tpu.models.generation.unet import (UNetConfig,
                                                     UNet2DConditionModel)
    from mllm_npu_tpu.models.generation.vae import (AutoencoderKL,
                                                    VAEConfig)

    if _debug():
        ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
        rkw = dict(dim=32, depth=1, dim_head=8, heads=4, num_queries=4,
                   embedding_dim=128, output1_dim=32, output2_dim=32)
        if resampler and "embedding_dim" in resampler:
            # must match the SEED output projector's width
            rkw["embedding_dim"] = resampler["embedding_dim"]
    else:
        ucfg = UNetConfig.sdxl_base(
            in_channels=8 if with_latent_image else 4)
        vcfg = VAEConfig.sdxl()
        rkw = dict(dim=1024, depth=4, dim_head=64, heads=16,
                   num_queries=64, embedding_dim=4096, output1_dim=768,
                   output2_dim=1280)
        if resampler:
            rkw.update({k: v for k, v in resampler.items()
                        if not k.startswith("_")})

    unet = UNet2DConditionModel(ucfg, dtype=dtype)
    S = ucfg.sample_size
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
    unet_params = unet.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, S, S, ucfg.in_channels)), jnp.ones((1,)),
        jnp.ones((1, 4, ucfg.cross_attention_dim)),
        {"text_embeds": jnp.ones((1, pooled_dim)),
         "time_ids": jnp.ones((1, 6))})
    res_mod = ResamplerXL(**rkw, dtype=dtype)
    res_params = res_mod.init(jax.random.PRNGKey(1),
                              jnp.ones((1, 4, rkw["embedding_dim"])))
    vae = AutoencoderKL(vcfg, dtype=dtype)
    f = vcfg.spatial_scale_factor
    vae_params = vae.init(jax.random.PRNGKey(2),
                          jnp.ones((1, S * f, S * f, 3)))

    if not _debug():
        from mllm_npu_tpu.utils import weights as W
        import flax
        if _maybe(unet_checkpoint):
            sd = _load_hf_dir_or_file(unet_checkpoint)
            unet_params = {"params": W.torch_to_flax_unet(sd, ucfg)}
        if _maybe(vae_checkpoint):
            sd = _load_hf_dir_or_file(vae_checkpoint)
            vae_params = {"params": W.torch_to_flax_vae(sd, vcfg)}
        if _maybe(adapter_checkpoint):
            sd = _load_hf_dir_or_file(adapter_checkpoint)
            res_sd, unet_sd = W.split_adapter_state(sd)
            if res_sd:
                res_params = {"params": W.torch_to_flax_perceiver(res_sd)}
            if unet_sd:
                if "conv_in.weight" in unet_sd:
                    # full UNet state dict (full-ft adapter checkpoint)
                    unet_params = {"params": W.torch_to_flax_unet(
                        unet_sd, ucfg)}
                else:
                    # tuned subset (the to_k/to_v keys SEED-X actually
                    # trains, reference adapter_modules.py:301-312):
                    # merge key-by-key over the base UNet — dropping it
                    # silently would discard the detokenizer's training
                    unet_params = W.merge_partial_unet_state(
                        unet_params, unet_sd)

    cls = SDXLAdapterWithLatentImage if with_latent_image else SDXLAdapter
    adapter = cls(unet_module=unet, unet_params=unet_params,
                  resampler_module=res_mod, resampler_params=res_params,
                  vit_down=vit_down)
    adapter.init_pipe(vae, vae_params,
                      scheduler or EulerDiscreteScheduler())
    return adapter
