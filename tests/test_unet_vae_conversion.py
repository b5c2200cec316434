"""UNet/VAE converter structural tests: synthesize a diffusers-style
state dict for the tiny configs, convert, and require the result to
match the Flax modules' init tree exactly (keys + shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import flax

from mllm_npu_tpu.models.generation.unet import (UNetConfig,
                                                 UNet2DConditionModel)
from mllm_npu_tpu.models.generation.vae import AutoencoderKL, VAEConfig
from mllm_npu_tpu.utils.weights import torch_to_flax_unet, torch_to_flax_vae


def _lin(sd, key, i, o, bias=True):
    sd[key + ".weight"] = torch.randn(o, i)
    if bias:
        sd[key + ".bias"] = torch.randn(o)


def _conv(sd, key, i, o, k=3, bias=True):
    sd[key + ".weight"] = torch.randn(o, i, k, k)
    if bias:
        sd[key + ".bias"] = torch.randn(o)


def _gn(sd, key, c):
    sd[key + ".weight"] = torch.randn(c)
    sd[key + ".bias"] = torch.randn(c)


def _resnet(sd, pre, cin, cout, temb):
    _gn(sd, pre + ".norm1", cin)
    _conv(sd, pre + ".conv1", cin, cout)
    if temb:
        _lin(sd, pre + ".time_emb_proj", temb, cout)
    _gn(sd, pre + ".norm2", cout)
    _conv(sd, pre + ".conv2", cout, cout)
    if cin != cout:
        _conv(sd, pre + ".conv_shortcut", cin, cout, k=1)


def _tblock(sd, pre, c, ctx, n_layers):
    _gn(sd, pre + ".norm", c)
    _lin(sd, pre + ".proj_in", c, c)
    _lin(sd, pre + ".proj_out", c, c)
    for k in range(n_layers):
        b = f"{pre}.transformer_blocks.{k}"
        for nm in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{nm}.weight"] = torch.randn(c)
            sd[f"{b}.{nm}.bias"] = torch.randn(c)
        for attn, kdim in (("attn1", c), ("attn2", ctx)):
            _lin(sd, f"{b}.{attn}.to_q", c, c, bias=False)
            _lin(sd, f"{b}.{attn}.to_k", kdim, c, bias=False)
            _lin(sd, f"{b}.{attn}.to_v", kdim, c, bias=False)
            _lin(sd, f"{b}.{attn}.to_out.0", c, c)
        _lin(sd, f"{b}.ff.net.0.proj", c, c * 8)
        _lin(sd, f"{b}.ff.net.2", c * 4, c)


def synth_unet_sd(cfg: UNetConfig) -> dict:
    sd = {}
    ch = cfg.block_out_channels
    temb = cfg.time_embed_dim
    _conv(sd, "conv_in", cfg.in_channels, ch[0])
    _lin(sd, "time_embedding.linear_1", ch[0], temb)
    _lin(sd, "time_embedding.linear_2", temb, temb)
    if cfg.projection_class_embeddings_input_dim:
        _lin(sd, "add_embedding.linear_1",
             cfg.projection_class_embeddings_input_dim, temb)
        _lin(sd, "add_embedding.linear_2", temb, temb)
    _gn(sd, "conv_norm_out", ch[0])
    _conv(sd, "conv_out", ch[0], cfg.out_channels)
    n = len(ch)
    for bi, btype in enumerate(cfg.down_block_types):
        cin = ch[max(bi - 1, 0)]
        for li in range(cfg.layers_per_block):
            _resnet(sd, f"down_blocks.{bi}.resnets.{li}",
                    cin if li == 0 else ch[bi], ch[bi], temb)
            if btype == "CrossAttnDownBlock2D":
                _tblock(sd, f"down_blocks.{bi}.attentions.{li}", ch[bi],
                        cfg.cross_attention_dim,
                        cfg.transformer_layers_per_block[bi])
        if bi < n - 1:
            _conv(sd, f"down_blocks.{bi}.downsamplers.0.conv", ch[bi],
                  ch[bi])
    _resnet(sd, "mid_block.resnets.0", ch[-1], ch[-1], temb)
    _resnet(sd, "mid_block.resnets.1", ch[-1], ch[-1], temb)
    _tblock(sd, "mid_block.attentions.0", ch[-1], cfg.cross_attention_dim,
            cfg.transformer_layers_per_block[-1])

    # up path: skip-concat input channels mirror the down path
    rev = list(reversed(ch))
    types = list(reversed(cfg.down_block_types))
    # reconstruct the skip stack exactly as the module builds it
    skips = [ch[0]]
    for bi in range(n):
        for li in range(cfg.layers_per_block):
            skips.append(ch[bi])
        if bi < n - 1:
            skips.append(ch[bi])
    h = ch[-1]
    for bi, btype in enumerate(types):
        cout = rev[bi]
        for li in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            _resnet(sd, f"up_blocks.{bi}.resnets.{li}", h + skip, cout,
                    temb)
            h = cout
            if btype == "CrossAttnDownBlock2D":
                _tblock(sd, f"up_blocks.{bi}.attentions.{li}", cout,
                        cfg.cross_attention_dim,
                        cfg.transformer_layers_per_block[n - 1 - bi])
        if bi < n - 1:
            _conv(sd, f"up_blocks.{bi}.upsamplers.0.conv", cout, cout)
    return sd


def _tree_struct(params):
    flat = flax.traverse_util.flatten_dict(params)
    return {"/".join(map(str, k)): tuple(np.shape(v))
            for k, v in flat.items()}


@pytest.mark.slow
def test_unet_conversion_matches_module_tree():
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    S = cfg.sample_size
    params = unet.init(
        jax.random.PRNGKey(0), jnp.ones((1, S, S, cfg.in_channels)),
        jnp.ones((1,)), jnp.ones((1, 4, cfg.cross_attention_dim)),
        {"text_embeds": jnp.ones((1, 32)), "time_ids": jnp.ones((1, 6))})
    sd = synth_unet_sd(cfg)
    tree = torch_to_flax_unet(sd, cfg)
    got = _tree_struct(tree)
    want = _tree_struct(params["params"])
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"missing: {missing[:8]}"
    assert not extra, f"extra: {extra[:8]}"
    mismatched = [k for k in want if got[k] != want[k]]
    assert not mismatched, \
        f"shape mismatch: {[(k, got[k], want[k]) for k in mismatched[:5]]}"
    # converted weights actually run
    out = unet.apply({"params": tree}, jnp.ones((1, S, S, cfg.in_channels)),
                     jnp.ones((1,)), jnp.ones((1, 4,
                                               cfg.cross_attention_dim)),
                     {"text_embeds": jnp.ones((1, 32)),
                      "time_ids": jnp.ones((1, 6))})
    assert np.isfinite(np.asarray(out)).all()


def synth_vae_sd(cfg: VAEConfig) -> dict:
    sd = {}
    ch = cfg.block_out_channels
    n = len(ch)
    # encoder
    _conv(sd, "encoder.conv_in", cfg.in_channels, ch[0])
    for bi in range(n):
        cin = ch[max(bi - 1, 0)]
        for li in range(cfg.layers_per_block):
            _resnet(sd, f"encoder.down_blocks.{bi}.resnets.{li}",
                    cin if li == 0 else ch[bi], ch[bi], None)
        if bi < n - 1:
            _conv(sd, f"encoder.down_blocks.{bi}.downsamplers.0.conv",
                  ch[bi], ch[bi])
    _resnet(sd, "encoder.mid_block.resnets.0", ch[-1], ch[-1], None)
    _resnet(sd, "encoder.mid_block.resnets.1", ch[-1], ch[-1], None)
    _gn(sd, "encoder.mid_block.attentions.0.group_norm", ch[-1])
    for nm in ("to_q", "to_k", "to_v", "to_out.0"):
        _lin(sd, f"encoder.mid_block.attentions.0.{nm}", ch[-1], ch[-1])
    _gn(sd, "encoder.conv_norm_out", ch[-1])
    _conv(sd, "encoder.conv_out", ch[-1], 2 * cfg.latent_channels)
    # decoder
    _conv(sd, "decoder.conv_in", cfg.latent_channels, ch[-1])
    _resnet(sd, "decoder.mid_block.resnets.0", ch[-1], ch[-1], None)
    _resnet(sd, "decoder.mid_block.resnets.1", ch[-1], ch[-1], None)
    _gn(sd, "decoder.mid_block.attentions.0.group_norm", ch[-1])
    for nm in ("to_q", "to_k", "to_v", "to_out.0"):
        _lin(sd, f"decoder.mid_block.attentions.0.{nm}", ch[-1], ch[-1])
    rev = list(reversed(ch))
    h = ch[-1]
    for bi in range(n):
        cout = rev[bi]
        for li in range(cfg.layers_per_block + 1):
            _resnet(sd, f"decoder.up_blocks.{bi}.resnets.{li}", h, cout,
                    None)
            h = cout
        if bi < n - 1:
            _conv(sd, f"decoder.up_blocks.{bi}.upsamplers.0.conv", cout,
                  cout)
    _gn(sd, "decoder.conv_norm_out", ch[0])
    _conv(sd, "decoder.conv_out", ch[0], cfg.in_channels)
    _conv(sd, "quant_conv", 2 * cfg.latent_channels,
          2 * cfg.latent_channels, k=1)
    _conv(sd, "post_quant_conv", cfg.latent_channels, cfg.latent_channels,
          k=1)
    return sd


@pytest.mark.slow
def test_vae_conversion_matches_module_tree():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    sd = synth_vae_sd(cfg)
    tree = torch_to_flax_vae(sd, cfg)
    got = _tree_struct(tree)
    want = _tree_struct(params["params"])
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"missing: {missing[:8]}"
    assert not extra, f"extra: {extra[:8]}"
    out = vae.apply({"params": tree}, jnp.ones((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(out)).all()


def _tiny_unet_and_params():
    cfg = UNetConfig.tiny()
    unet = UNet2DConditionModel(cfg)
    S = cfg.sample_size
    params = unet.init(
        jax.random.PRNGKey(0), jnp.ones((1, S, S, cfg.in_channels)),
        jnp.ones((1,)), jnp.ones((1, 4, cfg.cross_attention_dim)),
        {"text_embeds": jnp.ones((1, 32)), "time_ids": jnp.ones((1, 6))})
    return cfg, unet, params


@pytest.mark.slow
def test_partial_unet_merge_tuned_subset():
    """A SEED-X detokenizer adapter checkpoint's tuned subset — attn2
    to_k/to_v only (reference adapter_modules.py:301-312) — must merge
    key-by-key over the base UNet params, not be silently discarded
    (round-1 factory dropped any unet_sd with <=500 keys)."""
    from mllm_npu_tpu.utils.weights import merge_partial_unet_state

    cfg, unet, params = _tiny_unet_and_params()
    full_sd = synth_unet_sd(cfg)
    subset = {k: v for k, v in full_sd.items()
              if ".attn2.to_k." in k or ".attn2.to_v." in k}
    assert subset, "tiny config must have cross-attn blocks"
    merged = merge_partial_unet_state(params, subset)

    flat_base = flax.traverse_util.flatten_dict(params["params"])
    flat_merged = flax.traverse_util.flatten_dict(merged["params"])
    assert set(flat_base) == set(flat_merged)
    changed = {k for k in flat_base
               if not np.array_equal(np.asarray(flat_base[k]),
                                     np.asarray(flat_merged[k]))}
    # exactly the attn2 to_k/to_v kernels changed, nothing else
    want_changed = {k for k in flat_base
                    if k[-1] == "kernel" and k[-2] in ("to_k", "to_v")
                    and k[-3] == "attn2"}
    assert changed == want_changed, changed ^ want_changed
    # and the values are the transposed torch weights
    for tk, tv in subset.items():
        from mllm_npu_tpu.utils.weights import _unet_torch_key_to_flax
        path, tf = _unet_torch_key_to_flax(tk)
        np.testing.assert_array_equal(np.asarray(flat_merged[path]),
                                      tf(tv.numpy()))


@pytest.mark.slow
def test_partial_unet_merge_full_sd_equals_converter():
    """Merging the FULL synthetic state dict through the per-key
    translator must reproduce torch_to_flax_unet exactly — validates
    the key translation across every param family."""
    from mllm_npu_tpu.utils.weights import merge_partial_unet_state

    cfg, unet, params = _tiny_unet_and_params()
    sd = synth_unet_sd(cfg)
    merged = merge_partial_unet_state(params, sd)["params"]
    want = torch_to_flax_unet(sd, cfg)
    fm = flax.traverse_util.flatten_dict(merged)
    fw = flax.traverse_util.flatten_dict(want)
    assert set(fm) == set(fw)
    for k in fw:
        np.testing.assert_array_equal(np.asarray(fm[k]),
                                      np.asarray(fw[k]), err_msg=str(k))


@pytest.mark.slow
def test_partial_unet_merge_rejects_unknown_and_mismatched():
    import pytest

    from mllm_npu_tpu.utils.weights import merge_partial_unet_state

    cfg, unet, params = _tiny_unet_and_params()
    with pytest.raises(KeyError):
        merge_partial_unet_state(params, {"not.a.real.key":
                                          torch.randn(3, 3)})
    sd = synth_unet_sd(cfg)
    k = next(k for k in sd if ".attn2.to_k.weight" in k)
    with pytest.raises(ValueError):
        merge_partial_unet_state(params, {k: torch.randn(7, 9)})


def test_factory_missing_checkpoint_raises(monkeypatch, tmp_path):
    """Outside DEBUG a configured-but-absent checkpoint path must raise
    (reference from_pretrained throws), never silently random-init."""
    import pytest

    from mllm_npu_tpu.models import factory

    monkeypatch.delenv("DEBUG_FLAG", raising=False)
    with pytest.raises(FileNotFoundError):
        factory.build_llama3(
            pretrained_model_name_or_path=str(tmp_path / "nope"))
    # DEBUG mode keeps the checkpoint-free workflow working
    monkeypatch.setenv("DEBUG_FLAG", "True")
    bundle = factory.build_llama3(
        pretrained_model_name_or_path=str(tmp_path / "nope"))
    assert bundle.params is None
