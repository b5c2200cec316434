"""Unit tests: RoPE scaling variants, schedulers, norms."""

import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.ops.norms import layer_norm, rms_norm
from mllm_npu_tpu.ops.rope import apply_rope, rope_cos_sin
from mllm_npu_tpu.train.scheduler import get_scheduler


def test_rope_linear_scaling_stretches_positions():
    D = 16
    pos = jnp.arange(8)[None]
    cos1, _ = rope_cos_sin(pos, D)
    cos2, _ = rope_cos_sin(pos * 2, D)
    cos_scaled, _ = rope_cos_sin(pos * 2, D, scaling_type="linear",
                                 scaling_factor=2.0)
    # linear scaling halves effective positions: pos*2 / 2 == pos
    np.testing.assert_allclose(np.asarray(cos_scaled), np.asarray(cos1),
                               atol=1e-6)
    assert np.abs(np.asarray(cos2 - cos1)).max() > 0.01


def test_rope_dynamic_ntk_kicks_in_past_window():
    D = 16
    short = jnp.arange(8)[None]
    long = jnp.arange(32)[None]
    cos_s, _ = rope_cos_sin(short, D, scaling_type="dynamic",
                            scaling_factor=2.0, max_position_embeddings=16)
    cos_plain, _ = rope_cos_sin(short, D)
    # within the window: unchanged
    np.testing.assert_allclose(np.asarray(cos_s), np.asarray(cos_plain),
                               atol=1e-6)
    cos_l, _ = rope_cos_sin(long, D, scaling_type="dynamic",
                            scaling_factor=2.0, max_position_embeddings=16)
    cos_l_plain, _ = rope_cos_sin(long, D)
    assert np.abs(np.asarray(cos_l - cos_l_plain)).max() > 1e-3


def test_rope_rotation_preserves_norm():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 16))
    cos, sin = rope_cos_sin(jnp.arange(8)[None], 16)
    q2, _ = apply_rope(q, q, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q), axis=-1),
        np.linalg.norm(np.asarray(q2), axis=-1), rtol=1e-5)


def test_cosine_scheduler_min_ratio_floor():
    sched = get_scheduler("cosine", base_lr=1.0, warmup_steps=10,
                          total_steps=110, min_lr_ratio=0.05)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1.0) < 1e-6
    # floor at min_lr_ratio, never below (reference scheduler.py:20-33)
    assert abs(float(sched(110)) - 0.05) < 1e-6
    assert abs(float(sched(100000)) - 0.05) < 1e-6


def test_norm_semantics():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32)) * 3 + 1
    w = jnp.ones((32,))
    out = rms_norm(x, w)
    ms = np.mean(np.asarray(out) ** 2, axis=-1)
    np.testing.assert_allclose(ms, np.ones_like(ms), rtol=1e-2)
    out = layer_norm(x, w, jnp.zeros((32,)))
    np.testing.assert_allclose(np.mean(np.asarray(out), -1),
                               np.zeros((2, 6)), atol=1e-5)
