"""Converter validation against the REAL checkpoint key manifests
(VERDICT r2 #3 / missing #1).

`tests/diffusers_manifest.py` enumerates the exact diffusers
SDXL-base-1.0 UNet/VAE state-dict layouts offline (no diffusers in this
image). These tests feed full real-shape synthetic checkpoints through
the production converters and require:

- every checkpoint key is consumed (zero unconsumed keys),
- the converted tree matches the Flax model's init tree exactly
  (zero default-initialized leaves left behind),
- at the REAL shapes — the state dicts are zero-stride broadcast views,
  so the full 2.6B-param UNet costs no memory.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax

from mllm_npu_tpu.models.generation.unet import (UNetConfig,
                                                 UNet2DConditionModel)
from mllm_npu_tpu.models.generation.vae import AutoencoderKL, VAEConfig
from mllm_npu_tpu.utils.weights import (merge_partial_unet_state,
                                        torch_to_flax_unet,
                                        torch_to_flax_vae)

from diffusers_manifest import unet_state_dict_manifest, \
    vae_state_dict_manifest


class RecordingDict(dict):
    """Tracks which keys the converter actually reads."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _fake_state_dict(manifest):
    """{key: f32 zero array of the real shape} with zero memory (0-stride
    broadcast views; utils.weights._t passes same-dtype ndarrays through
    np.asarray without copying)."""
    return RecordingDict(
        {k: np.broadcast_to(np.float32(0), shape)
         for k, shape in manifest.items()})


def _flat_shapes(tree):
    return {"/".join(p): tuple(v.shape) for p, v in
            flax.traverse_util.flatten_dict(tree).items()}


def _assert_tree_matches_init(converted, model, init_fn, what):
    """converted tree keys+shapes == eval_shape(init) keys+shapes."""
    target = jax.eval_shape(init_fn)["params"]
    got, want = _flat_shapes(converted), _flat_shapes(target)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"{what}: leaves left default-initialized: " \
                        f"{missing[:8]} (+{max(0, len(missing) - 8)} more)"
    assert not extra, f"{what}: converter produced unknown leaves: " \
                      f"{extra[:8]}"
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"{what}: shape mismatches: {dict(list(bad.items())[:5])}"


# ---------------------------------------------------------------------------
# UNet — real SDXL-base layout
# ---------------------------------------------------------------------------

def test_unet_converter_consumes_real_sdxl_manifest():
    cfg = UNetConfig.sdxl_base()
    manifest = unet_state_dict_manifest(cfg)
    # sanity: the real SDXL-base UNet is ~2.57B params across ~1680 keys
    n_params = sum(int(np.prod(s)) for s in manifest.values())
    assert 2.4e9 < n_params < 2.7e9, n_params
    assert len(manifest) > 1500

    sd = _fake_state_dict(manifest)
    tree = torch_to_flax_unet(sd, cfg)

    unread = sorted(set(sd) - sd.read)
    assert not unread, f"UNet keys never consumed: {unread[:8]} " \
                       f"(+{max(0, len(unread) - 8)} more)"

    model = UNet2DConditionModel(cfg)
    sample = jnp.zeros((1, 16, 16, cfg.in_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    ehs = jnp.zeros((1, 7, cfg.cross_attention_dim), jnp.float32)
    added = {
        "text_embeds": jnp.zeros((1, 1280), jnp.float32),
        "time_ids": jnp.zeros((1, 6), jnp.float32),
    }
    _assert_tree_matches_init(
        tree, model,
        lambda: model.init(jax.random.PRNGKey(0), sample, t, ehs,
                           added),
        "sdxl unet")


@pytest.mark.slow
def test_partial_unet_merge_translates_every_real_key():
    """merge_partial_unet_state's key mapper must accept every key of the
    real SDXL manifest (the detokenizer ckpt trains an arbitrary subset,
    reference adapter_modules.py:301-312 — any real key may appear)."""
    from mllm_npu_tpu.utils.weights import _unet_torch_key_to_flax

    cfg = UNetConfig.sdxl_base()
    manifest = unet_state_dict_manifest(cfg)
    paths = set()
    for key, shape in manifest.items():
        path, tf = _unet_torch_key_to_flax(key)   # must not raise
        arr = tf(np.broadcast_to(np.float32(0), shape))
        paths.add((path, tuple(arr.shape)))
    # and those paths must be exactly the model's param tree
    model = UNet2DConditionModel(cfg)
    sample = jnp.zeros((1, 16, 16, cfg.in_channels), jnp.float32)
    ehs = jnp.zeros((1, 7, cfg.cross_attention_dim), jnp.float32)
    added = {"text_embeds": jnp.zeros((1, 1280), jnp.float32),
             "time_ids": jnp.zeros((1, 6), jnp.float32)}
    target = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), sample,
                           jnp.zeros((1,), jnp.float32), ehs,
                           added))["params"]
    want = {(p, tuple(v.shape))
            for p, v in flax.traverse_util.flatten_dict(target).items()}
    assert paths == want


def test_unet_converter_consumes_sd15_manifest():
    """The 4-block SD1.5 topology (IP-Adapter base, reference
    adapter_modules.py:29-137) — different block types/counts than SDXL."""
    cfg = UNetConfig.sd15()
    manifest = unet_state_dict_manifest(cfg)
    sd = _fake_state_dict(manifest)
    tree = torch_to_flax_unet(sd, cfg)
    unread = sorted(set(sd) - sd.read)
    assert not unread, f"SD1.5 UNet keys never consumed: {unread[:8]}"

    model = UNet2DConditionModel(cfg)
    sample = jnp.zeros((1, 16, 16, cfg.in_channels), jnp.float32)
    ehs = jnp.zeros((1, 7, cfg.cross_attention_dim), jnp.float32)
    _assert_tree_matches_init(
        tree, model,
        lambda: model.init(jax.random.PRNGKey(0), sample,
                           jnp.zeros((1,), jnp.float32), ehs),
        "sd15 unet")


# ---------------------------------------------------------------------------
# VAE — real SDXL layout (both attention-naming eras)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("legacy_attn", [False, True])
def test_vae_converter_consumes_real_sdxl_manifest(legacy_attn):
    cfg = VAEConfig()   # the real SDXL VAE: (128, 256, 512, 512) x2
    manifest = vae_state_dict_manifest(cfg, legacy_attn=legacy_attn)
    n_params = sum(int(np.prod(s)) for s in manifest.values())
    assert 8.0e7 < n_params < 9.0e7, n_params   # ~83.7M

    sd = _fake_state_dict(manifest)
    tree = torch_to_flax_vae(sd, cfg)
    unread = sorted(set(sd) - sd.read)
    assert not unread, f"VAE keys never consumed: {unread[:8]} " \
                       f"(+{max(0, len(unread) - 8)} more)"

    model = AutoencoderKL(cfg)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    _assert_tree_matches_init(
        tree, model,
        lambda: model.init(jax.random.PRNGKey(0), img),
        "sdxl vae")


# ---------------------------------------------------------------------------
# SEED-X pytorch_model.bin — peft-wrapped LM + qwen ViT + projectors
# (reference pretrained/weight.md:33, mllm.py:233-263 module names,
#  seedx_llama2_13b_qwenvl_vitg.yaml shapes)
# ---------------------------------------------------------------------------

from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                       LlamaForCausalLM)
from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
    QwenViTConfig, VisionTransformerWithAttnPool)
from mllm_npu_tpu.utils.weights import (normalize_peft_keys,
                                        split_adapter_state,
                                        torch_to_flax_assembly,
                                        torch_to_flax_llama,
                                        torch_to_flax_perceiver,
                                        torch_to_flax_qwen_vit)

from seedx_manifest import (attention_resampler_sd, peft_llama_sd,
                            qwen_vit_sd, resampler_xlv2_sd)

# real structure, reduced widths: key NAMES are depth/width-independent
# and the converters' shape handling is exercised by distinct in/out dims
_LM_CFG = LlamaConfig(vocab_size=512, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=3, num_attention_heads=4,
                      num_key_value_heads=4, lora_rank=4, lora_alpha=32,
                      tie_word_embeddings=False)


@pytest.mark.slow
def test_peft_lm_keys_load_trained_lora():
    """The published SEED-X bin stores the LM through peft; the
    converter must (a) consume every key, (b) load the TRAINED lora_A/
    lora_B and modules_to_save layernorms — not fresh-init them."""
    sd = peft_llama_sd(_LM_CFG, r=_LM_CFG.lora_rank)
    norm = RecordingDict(normalize_peft_keys(sd))
    tree = torch_to_flax_llama(norm, _LM_CFG,
                               vocab_size=_LM_CFG.vocab_size)
    unread = sorted(set(norm) - norm.read)
    assert not unread, f"LM keys never consumed: {unread[:8]}"

    # trained adapters land (peft lora_A.weight is [r, in] → ours [in, r])
    for i in range(_LM_CFG.num_hidden_layers):
        a = sd[f"base_model.model.model.layers.{i}.self_attn.q_proj."
               f"lora_A.default.weight"]
        b = sd[f"base_model.model.model.layers.{i}.self_attn.q_proj."
               f"lora_B.default.weight"]
        np.testing.assert_allclose(
            tree["model"]["layers"]["self_attn"]["q_proj"]["lora_a"][i],
            a.T, atol=1e-6)
        np.testing.assert_allclose(
            tree["model"]["layers"]["self_attn"]["q_proj"]["lora_b"][i],
            b.T, atol=1e-6)
        # modules_to_save trained copy wins over original_module
        trained = sd[f"base_model.model.model.layers.{i}."
                     f"input_layernorm.modules_to_save.default.weight"]
        np.testing.assert_allclose(
            tree["model"]["layers"]["input_layernorm"]["weight"][i],
            trained, atol=1e-6)

    model = LlamaForCausalLM(_LM_CFG)
    ids = jnp.ones((1, 8), jnp.int32)
    _assert_tree_matches_init(
        tree, model, lambda: model.init(jax.random.PRNGKey(0), ids),
        "peft llama")


def test_qwen_vit_manifest_consumed():
    """Reference VisionTransformerWithAttnPool layout (qwen_vit_G.pt
    contents; qwenvl_vit.py:206-274) at real depth: every key consumed
    except the deterministic sincos pos_embed buffer; converted tree
    matches our Flax tower's init exactly."""
    cfg = QwenViTConfig(width=64, layers=48, heads=4, n_queries=16,
                        output_dim=128, patch_pos=True, remat=False,
                        pos_embed_size=256)
    sd = RecordingDict(qwen_vit_sd(cfg, "", np.random.RandomState(0)))
    tree = torch_to_flax_qwen_vit(sd, cfg)
    unread = sorted(set(sd) - sd.read)
    assert unread == ["attn_pool.pos_embed"], unread  # frozen sincos

    model = VisionTransformerWithAttnPool(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    _assert_tree_matches_init(
        tree, model, lambda: model.init(jax.random.PRNGKey(0), img),
        "qwen vit")


@pytest.mark.slow
def test_assembly_converter_consumes_seedx_bin_layout():
    """Full SEED-X pytorch_model.bin layout: language_model.(peft) +
    vision_encoder.(qwen) + projector./output_projector.(resamplers) +
    patch_pos_embed (reference mllm.py:243-263 attribute names).
    Every component converts; trained values land."""
    rs = np.random.RandomState(1)
    vit_cfg = QwenViTConfig(width=48, layers=2, heads=4, n_queries=16,
                            output_dim=64, remat=False, pos_embed_size=64)
    hs = _LM_CFG.hidden_size
    sd = {}
    sd.update({f"language_model.{k}": v
               for k, v in peft_llama_sd(_LM_CFG, r=4).items()})
    sd.update(qwen_vit_sd(vit_cfg, "vision_encoder.", rs))
    # projector: vit_dim → lm hidden; output_projector: lm → vit_dim
    sd.update(attention_resampler_sd("projector.", hs,
                                     vit_cfg.output_dim, 16, rs))
    sd.update(attention_resampler_sd("output_projector.",
                                     vit_cfg.output_dim, hs, 16, rs))
    sd["patch_pos_embed"] = rs.randn(4, hs).astype(np.float32)

    tree = torch_to_flax_assembly(
        sd, lm_config=_LM_CFG, vision_config=vit_cfg, vision_kind="qwen",
        has_output_projector=True)
    assert set(tree) == {"language_model", "vision_encoder", "projector",
                         "output_projector", "patch_pos_embed"}

    np.testing.assert_allclose(tree["patch_pos_embed"],
                               sd["patch_pos_embed"], atol=1e-6)
    np.testing.assert_allclose(tree["projector"]["query"],
                               sd["projector.query"], atol=1e-6)
    np.testing.assert_allclose(
        tree["vision_encoder"]["backbone"]["conv1"]["kernel"],
        sd["vision_encoder.conv1.weight"].transpose(2, 3, 1, 0),
        atol=1e-6)
    # trained lora_B from the peft-wrapped LM section
    np.testing.assert_allclose(
        tree["language_model"]["model"]["layers"]["mlp"]["down_proj"]
            ["lora_b"][0],
        sd["language_model.base_model.model.model.layers.0.mlp."
           "down_proj.lora_B.default.weight"].T, atol=1e-6)

    # vision subtree matches the tower init (zero default leaves)
    model = VisionTransformerWithAttnPool(vit_cfg)
    img = jnp.zeros((1, vit_cfg.image_size, vit_cfg.image_size, 3),
                    jnp.float32)
    _assert_tree_matches_init(
        tree["vision_encoder"], model,
        lambda: model.init(jax.random.PRNGKey(0), img),
        "assembly vision encoder")


def test_detokenizer_bin_layout():
    """pretrained/detokenizer/pytorch_model.bin: 'resampler.*'
    (ResamplerXLV2 at the production config,
    sd_xl_qwenvl_vit_resampler.yaml) + 'unet.*' (the trained to_k/to_v
    subset, adapter_modules.py:287-291). split_adapter_state must
    partition it exactly; the perceiver converter must consume every
    resampler key and reproduce our ResamplerXLV2 init tree."""
    from mllm_npu_tpu.models.generation.resampler import ResamplerXLV2

    rs = np.random.RandomState(2)
    sd = resampler_xlv2_sd("resampler.", rs)
    # the trained unet subset: every real to_k/to_v key
    cfg = UNetConfig.sdxl_base()
    unet_keys = {k: s for k, s in unet_state_dict_manifest(cfg).items()
                 if ".to_k.weight" in k or ".to_v.weight" in k}
    assert len(unet_keys) > 100
    sd.update({f"unet.{k}": np.broadcast_to(np.float32(0), s)
               for k, s in unet_keys.items()})

    res_sd, unet_sd = split_adapter_state(sd)
    assert set(unet_sd) == set(unet_keys)
    assert len(res_sd) + len(unet_sd) == len(sd)

    res_rec = RecordingDict(res_sd)
    tree = torch_to_flax_perceiver(res_rec)
    unread = sorted(set(res_rec) - res_rec.read)
    assert not unread, f"resampler keys never consumed: {unread[:8]}"

    model = ResamplerXLV2(dim=1024, depth=4, dim_head=64, heads=16,
                          num_queries=64, embedding_dim=4096,
                          output1_dim=768, output2_dim=1280, ff_mult=4)
    x = jnp.zeros((1, 64, 4096), jnp.float32)
    _assert_tree_matches_init(
        tree, model, lambda: model.init(jax.random.PRNGKey(0), x),
        "detokenizer resampler")

    # and the unet subset merges into a real SDXL tree (key mapping for
    # every to_k/to_v is already proven by the full-manifest test above)
    from mllm_npu_tpu.utils.weights import _unet_torch_key_to_flax
    for k in list(unet_sd)[:8]:
        _unet_torch_key_to_flax(k)   # must not raise


@pytest.mark.slow
def test_hf_llama_bin_tolerates_inv_freq_buffers():
    """The published llama2 pytorch_model-*.bin shards include
    rotary_emb.inv_freq buffers (2023-era transformers); the converter
    must consume every weight and ignore ONLY those buffers."""
    cfg = dataclasses.replace(_LM_CFG, lora_rank=0)
    import torch
    from transformers import LlamaConfig as HFCfg
    from transformers import LlamaForCausalLM as HFL
    hf = HFL(HFCfg(vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
                   intermediate_size=cfg.intermediate_size,
                   num_hidden_layers=cfg.num_hidden_layers,
                   num_attention_heads=cfg.num_attention_heads,
                   num_key_value_heads=cfg.num_key_value_heads,
                   attn_implementation="eager"))
    sd = {k: v.float().numpy() for k, v in hf.state_dict().items()}
    for i in range(cfg.num_hidden_layers):
        sd[f"model.layers.{i}.self_attn.rotary_emb.inv_freq"] = \
            np.zeros((8,), np.float32)
    rec = RecordingDict(sd)
    tree = torch_to_flax_llama(rec, cfg, vocab_size=cfg.vocab_size)
    unread = sorted(set(rec) - rec.read)
    assert all("inv_freq" in k for k in unread), unread

    model = LlamaForCausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    _assert_tree_matches_init(
        tree, model, lambda: model.init(jax.random.PRNGKey(0), ids),
        "plain hf llama")
