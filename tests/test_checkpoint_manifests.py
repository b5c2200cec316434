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
