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


def test_flash_shard_map_matches_unsharded():
    """flash_mesh context: the kernel runs under shard_map (Manual axes,
    batch+head sharded) and matches the unsharded call — validates the
    multi-chip dispatch GSPMD cannot provide for opaque pallas calls."""
    import numpy as np
    from jax.sharding import Mesh
    from mllm_npu_tpu import ops

    devs = np.asarray(jax.devices()).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "fsdp", "tensor"))
    B, S, Hq, Hkv, D = 4, 256, 4, 2, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, Hq, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, Hkv, D), jnp.float32)

    ref = ops.multi_head_attention(q, k, v, causal=True, impl="flash",
                                   interpret=True)

    with ops.flash_mesh(mesh):
        @jax.jit
        def f(q, k, v):
            return ops.multi_head_attention(q, k, v, causal=True,
                                            impl="flash", interpret=True)
        out = f(q, k, v)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # packed variant through the same path
    seg = jnp.asarray(np.repeat([[1] * 128 + [2] * 128], B, axis=0),
                      jnp.int32)
    sid = ops.SegmentIds(seg, seg)
    ref2 = ops.multi_head_attention(q, k, v, causal=True, segment_ids=sid,
                                    impl="flash", interpret=True)
    with ops.flash_mesh(mesh):
        out2 = jax.jit(lambda q, k, v: ops.multi_head_attention(
            q, k, v, causal=True, segment_ids=sid, impl="flash",
            interpret=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_train_step_flash_on_virtual_mesh():
    """Full jitted train step on the dp2/fsdp2/tp2 virtual mesh with the
    LLM on the FLASH path (interpret mode): compile_train_step's
    flash_mesh context must shard_map the pallas kernels — this is the
    multi-chip configuration GSPMD cannot partition by itself."""
    import numpy as np
    from mllm_npu_tpu.models.language_models.llama import (
        LlamaConfig, LlamaForCausalLM, causal_lm_loss)
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.train.train_state import (OptimizerConfig,
                                                compile_train_step,
                                                create_train_state,
                                                make_train_step,
                                                shard_train_state)

    cfg = LlamaConfig.tiny(attention_impl="flash",
                           attention_interpret=True)
    lm = LlamaForCausalLM(cfg, dtype=jnp.float32)
    B, S = 4, 256
    rs = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rs.randint(3, 1000, (B, S)), jnp.int32),
        "labels": jnp.asarray(rs.randint(3, 1000, (B, S)), jnp.int32),
    }
    params = lm.init(jax.random.PRNGKey(0), batch["input_ids"])
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))

    def loss_fn(p, b):
        logits, _, _ = lm.apply(p, b["input_ids"])
        loss = causal_lm_loss(logits, b["labels"])
        return loss, {"lm_loss": loss}

    # eager-attention parity loss BEFORE the step donates the params
    cfg_e = LlamaConfig.tiny(attention_impl="eager")
    lm_e = LlamaForCausalLM(cfg_e, dtype=jnp.float32)
    logits_e, _, _ = lm_e.apply(params, batch["input_ids"])
    le = float(causal_lm_loss(logits_e, batch["labels"]))

    state = create_train_state(params, OptimizerConfig(
        lr=1e-3, warmup_steps=0, total_steps=10))
    step = make_train_step(loss_fn)
    jitted, state_sharding, batch_sh = compile_train_step(
        step, state, batch, mesh)
    state = shard_train_state(state, state_sharding)
    batch = jax.tree_util.tree_map(jax.device_put, batch, batch_sh)
    state, loss, metrics = jitted(state, batch)
    l0 = float(loss)
    state, loss, _ = jitted(state, batch)
    assert np.isfinite(l0) and np.isfinite(float(loss))
    assert float(loss) < l0   # it learns
    # parity: the flash mesh step's first loss == eager loss
    np.testing.assert_allclose(l0, le, rtol=1e-4)


def test_flash_shard_map_seq_axis_heads():
    """Ulysses SP: with a seq axis in the mesh, flash heads shard over
    (tensor, seq) combined — parity with the unsharded call."""
    import numpy as np
    from jax.sharding import Mesh
    from mllm_npu_tpu import ops

    devs = np.asarray(jax.devices()).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "tensor", "seq"))
    B, S, Hq, Hkv, D = 2, 256, 4, 4, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (B, S, Hq, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, Hkv, D), jnp.float32)

    ref = ops.multi_head_attention(q, k, v, causal=True, impl="flash",
                                   interpret=True)
    with ops.flash_mesh(mesh, batch_axes=("data",)):
        @jax.jit
        def f(q, k, v):
            return ops.multi_head_attention(q, k, v, causal=True,
                                            impl="flash", interpret=True)
        out = f(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
