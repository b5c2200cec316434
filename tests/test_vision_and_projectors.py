"""Vision encoder + projector shape/numerics tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
    QwenViTConfig, VisionTransformer, VisionTransformerWithAttnPool)
from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
    SigLIPConfig, SigLIPVisionEncoder)
from mllm_npu_tpu.models.multimodal_projector.attention_resampler import (
    AttentionResampler)
from mllm_npu_tpu.models.multimodal_projector.multilayer_perceptron import MLP
from mllm_npu_tpu.models.multimodal_projector.pooling_projection import (
    SimplePooling)
from mllm_npu_tpu.models.vit_common import adaptive_avg_pool_tokens


def test_siglip_tokens():
    cfg = SigLIPConfig.tiny()
    model = SigLIPVisionEncoder(cfg)
    imgs = jnp.ones((2, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    n = (cfg.image_size // cfg.patch_size) ** 2
    assert out.shape == (2, n, cfg.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_qwen_vit_with_pool():
    cfg = QwenViTConfig.tiny(patch_pos=True)
    model = VisionTransformerWithAttnPool(cfg)
    imgs = jnp.ones((2, cfg.image_size, cfg.image_size, 3))
    pp = jnp.asarray([[0.25, 0.25], [0.75, 0.75]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs, pp)
    out = model.apply(params, imgs, pp)
    assert out.shape == (2, cfg.n_queries, cfg.output_dim)
    # patch positions shift outputs
    out2 = model.apply(params, imgs, 1 - pp)
    assert np.abs(np.asarray(out - out2)).max() > 0


@pytest.mark.slow
def test_qwen_vit_tokens_only():
    cfg = QwenViTConfig.tiny()
    model = VisionTransformer(cfg)
    imgs = jnp.ones((1, cfg.image_size, cfg.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    n = (cfg.image_size // cfg.patch_size) ** 2
    assert out.shape == (1, n, cfg.width)


def test_attention_resampler():
    model = AttentionResampler(grid_size=4, embed_dim=64, num_heads=4,
                               kv_dim=48)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 25, 48))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (3, 16, 64)
    assert model.num_queries == 16


def test_adaptive_pool_matches_mean():
    # divisible case: exact mean pooling
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 4))  # 4x4 grid
    out = adaptive_avg_pool_tokens(x, 2)
    xg = np.asarray(x).reshape(1, 4, 4, 4)
    expect = xg.reshape(1, 2, 2, 2, 2, 4).mean(axis=(2, 4)).reshape(1, 4, 4)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-6)


def test_simple_pooling_and_mlp():
    sp = SimplePooling(grid_size=2, input_dim=8, output_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 8))  # 3x3 grid
    params = sp.init(jax.random.PRNGKey(1), x)
    assert sp.apply(params, x).shape == (2, 4, 16)

    mlp = MLP(image_embed_dim=8, llm_embed_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    params = mlp.init(jax.random.PRNGKey(1), x)
    assert mlp.apply(params, x).shape == (2, 5, 16)
