"""Parity tests: Pallas flash attention vs the jnp reference attention.

TPU-native analogue of the reference's cross-backend parity harness
(reference: mllm_npu/acceleration/{gpu,npu}.py + acceleration.md:35,
which claims ~1e-5 agreement). Kernels run in interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_npu_tpu.ops import SegmentIds, dot_product_attention
from mllm_npu_tpu.ops.flash_attention import flash_attention


def _make_qkv(key, B, Sq, Sk, Hq, Hkv, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Sq, Hq, D), dtype)
    k = jax.random.normal(kk, (B, Sk, Hkv, D), dtype)
    v = jax.random.normal(kv, (B, Sk, Hkv, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2), (8, 1)])
def test_flash_forward_parity(causal, hq, hkv):
    key = jax.random.PRNGKey(0)
    q, k, v = _make_qkv(key, 2, 256, 256, hq, hkv, 128)
    ref = dot_product_attention(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_segment_ids_parity():
    key = jax.random.PRNGKey(1)
    B, S = 2, 256
    q, k, v = _make_qkv(key, B, S, S, 4, 2, 128)
    # two packed sequences per row + padding segment 0
    seg = np.zeros((B, S), np.int32)
    seg[:, :100] = 1
    seg[:, 100:200] = 2
    seg = jnp.asarray(seg)
    ids = SegmentIds(q=seg, kv=seg)
    ref = dot_product_attention(q, k, v, causal=True,
                                q_segment_ids=seg, kv_segment_ids=seg)
    out = flash_attention(q, k, v, causal=True, segment_ids=ids,
                          interpret=True, block_q=128, block_k=128)
    # padding rows (seg==0 attends within itself) are still well-defined;
    # compare everything.
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_backward_parity(causal):
    key = jax.random.PRNGKey(2)
    q, k, v = _make_qkv(key, 1, 256, 256, 4, 2, 128)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=causal, interpret=True,
                            block_q=128, block_k=128)
        return jnp.sum(o * jnp.cos(o.astype(jnp.float32)))

    def loss_ref(q, k, v):
        o = dot_product_attention(q, k, v, causal=causal)
        return jnp.sum(o * jnp.cos(o.astype(jnp.float32)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name}")


def test_flash_backward_segment_ids():
    key = jax.random.PRNGKey(3)
    B, S = 1, 256
    q, k, v = _make_qkv(key, B, S, S, 4, 4, 128)
    seg = np.ones((B, S), np.int32)
    seg[:, 128:] = 2
    seg = jnp.asarray(seg)
    ids = SegmentIds(q=seg, kv=seg)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=True, segment_ids=ids,
                            interpret=True, block_q=128, block_k=128)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = dot_product_attention(q, k, v, causal=True,
                                  q_segment_ids=seg, kv_segment_ids=seg)
        return jnp.sum(o * o)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4,
                                   err_msg=f"d{name}")


def test_bf16_forward():
    key = jax.random.PRNGKey(4)
    q, k, v = _make_qkv(key, 1, 128, 128, 2, 2, 128, dtype=jnp.bfloat16)
    ref = dot_product_attention(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(
        out.astype(np.float32), ref.astype(np.float32), atol=2e-2, rtol=2e-2)


def test_padded_flash_matches_eager_awkward_shapes():
    """SigLIP-like shape: S=93 (not 128-multiple), D=72 (not lane mult)."""
    from mllm_npu_tpu.ops import flash_attention_padded
    key = jax.random.PRNGKey(7)
    q, k, v = _make_qkv(key, 2, 93, 93, 4, 4, 72)
    ref = dot_product_attention(q, k, v, causal=False)
    out = flash_attention_padded(q, k, v, causal=False, interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_padded_flash_with_segment_ids():
    from mllm_npu_tpu.ops import SegmentIds, flash_attention_padded
    key = jax.random.PRNGKey(8)
    B, S = 1, 200
    q, k, v = _make_qkv(key, B, S, S, 2, 2, 72)
    seg = np.ones((B, S), np.int32)
    seg[:, 100:] = 2
    seg = jnp.asarray(seg)
    ids = SegmentIds(q=seg, kv=seg)
    ref = dot_product_attention(q, k, v, causal=True,
                                q_segment_ids=seg, kv_segment_ids=seg)
    out = flash_attention_padded(q, k, v, causal=True, segment_ids=ids,
                                 interpret=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)
