"""Int8 weight-only quantization tests (ops/quant.py): quantize
roundtrip, the dequant-matmul (CPU fallback + interpret-mode Pallas),
and end-to-end logits parity of a quantized tiny Llama."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.ops.quant import (Int8Dense, QuantizedTensor,
                                    dequantize_int8, int8_matmul,
                                    quantize_dense_params, quantize_int8)


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    qt = quantize_int8(w)
    assert qt.values.dtype == jnp.int8
    assert qt.scale.shape == (32,)
    wd = dequantize_int8(qt, jnp.float32)
    # symmetric per-channel: error bounded by scale/2 per element
    err = np.abs(np.asarray(wd - w))
    bound = np.asarray(qt.scale)[None, :] * 0.5 + 1e-7
    assert (err <= bound).all()
    # zero column stays exactly zero with scale 1
    w0 = w.at[:, 3].set(0.0)
    qt0 = quantize_int8(w0)
    assert float(qt0.scale[3]) == 1.0
    assert (np.asarray(qt0.values)[:, 3] == 0).all()


def test_int8_matmul_matches_dequant():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (4, 256), jnp.bfloat16)
    w = jax.random.normal(kw, (256, 128)) * 0.05
    qt = quantize_int8(w)
    ref = x.astype(jnp.float32) @ np.asarray(dequantize_int8(qt, jnp.float32))
    # pallas path in interpret mode (shapes aligned to blocks)
    out_p = int8_matmul(x, qt, block_m=8, block_n=128, block_k=256,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-1)
    # awkward-shape jnp fallback
    w2 = jax.random.normal(kw, (256, 100)) * 0.05
    out_f = int8_matmul(x, quantize_int8(w2))
    assert out_f.shape == (4, 100)


def test_int8_dense_module():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.bfloat16)
    m = Int8Dense(32)
    p = m.init(jax.random.PRNGKey(1), x)
    assert p["params"]["kernel_q"].dtype == jnp.int8
    # zero-init kernel → zero output
    out = m.apply(p, x)
    assert float(jnp.abs(out).max()) == 0.0


@pytest.mark.slow
def test_quantized_llama_logits_parity():
    from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                           LlamaForCausalLM)
    from mllm_npu_tpu.utils.weights import quantize_llama_params

    cfg = LlamaConfig.tiny()
    lm = LlamaForCausalLM(cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(3, 1000, (2, 16)),
                      jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), ids)
    logits, _, _ = lm.apply(params, ids)

    qcfg = LlamaConfig.tiny(quantization="int8")
    qlm = LlamaForCausalLM(qcfg, dtype=jnp.float32)
    qparams = {"params": quantize_llama_params(params["params"])}
    # structural match with the quantized module's init
    ref_struct = jax.tree_util.tree_structure(
        qlm.init(jax.random.PRNGKey(0), ids))
    assert jax.tree_util.tree_structure(qparams) == ref_struct
    qlogits, _, _ = qlm.apply(qparams, ids)

    a = np.asarray(logits, np.float32).reshape(-1)
    b = np.asarray(qlogits, np.float32).reshape(-1)
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
    # top-1 token agreement on most positions
    at = np.asarray(logits).argmax(-1)
    bt = np.asarray(qlogits).argmax(-1)
    assert (at == bt).mean() > 0.9


def test_scan_stacked_kernels_quantize():
    stacked = {"layers": {"q_proj": {
        "kernel": jax.random.normal(jax.random.PRNGKey(0), (3, 16, 8))}}}
    out = quantize_dense_params(stacked)
    q = out["layers"]["q_proj"]
    assert q["kernel_q"].shape == (3, 16, 8)
    assert q["kernel_q"].dtype == jnp.int8
    assert q["scale"].shape == (3, 8)


@pytest.mark.slow
def test_generator_quantize_int8_generates():
    """End-to-end: MLLMGenerator(quantize_int8=True) rebuilds the LLM in
    int8 layout and still decodes."""
    import numpy as np
    from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                           LlamaForCausalLM)
    from mllm_npu_tpu.models.generation.generate import MLLMGenerator
    from mllm_npu_tpu.models.generation.sampler import SamplingConfig
    from mllm_npu_tpu.models.mllm import GeneralizedMultimodalModel
    from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
        SigLIPConfig, SigLIPVisionEncoder)
    from mllm_npu_tpu.models.multimodal_projector.pooling_projection import (
        SimplePooling)

    cfg = LlamaConfig.tiny()
    lm = LlamaForCausalLM(cfg, dtype=jnp.float32)
    vcfg = SigLIPConfig.tiny()
    vis = SigLIPVisionEncoder(vcfg, dtype=jnp.float32)
    proj = SimplePooling(grid_size=2, input_dim=vcfg.hidden_size,
                         output_dim=cfg.hidden_size)
    model = GeneralizedMultimodalModel(language_model=lm,
                                       vision_encoder=vis, projector=proj)
    rs = np.random.RandomState(0)
    B, S, N = 1, 8, 1
    img_size = SigLIPConfig.tiny().image_size
    batch = dict(
        input_ids=jnp.asarray(rs.randint(3, 1000, (B, S)), jnp.int32),
        images=jnp.asarray(rs.randn(N, img_size, img_size, 3), jnp.float32),
        attention_mask=jnp.ones((B, S), jnp.int32),
        labels=jnp.asarray(rs.randint(3, 1000, (B, S)), jnp.int32),
        embeds_cmp_mask=jnp.asarray([True]),
        embeds_gen_mask=jnp.asarray([False]),
        ids_cmp_mask=jnp.zeros((B, S), bool).at[0, 2:6].set(True),
        ids_gen_mask=jnp.zeros((B, S), bool),
        patch_positions=jnp.asarray(rs.rand(N, 2), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)

    gen = MLLMGenerator(model, cfg, params,
                        sampling=SamplingConfig(max_new_tokens=4,
                                                do_sample=False,
                                                eos_token_id=-1,
                                                pad_token_id=0),
                        quantize_int8=True)
    # lm params are int8 now
    lm_leaves = jax.tree_util.tree_leaves(
        gen.params["params"]["language_model"])
    assert any(l.dtype == jnp.int8 for l in lm_leaves)
    out = gen.generate(batch["input_ids"], images=batch["images"],
                       embeds_cmp_mask=batch["embeds_cmp_mask"],
                       ids_cmp_mask=batch["ids_cmp_mask"],
                       patch_positions=batch["patch_positions"])
    ids = np.asarray(out["generate_ids"])
    assert ids.shape[1] == 4
    assert np.isfinite(ids).all()


# ---------------------------------------------------------------------------
# int4 (group-wise scales)
# ---------------------------------------------------------------------------

def test_int4_quantize_roundtrip_error():
    from mllm_npu_tpu.ops.quant import dequantize_int4, quantize_int4

    w = jax.random.normal(jax.random.PRNGKey(0), (512, 32)) * 0.1
    qt = quantize_int4(w, group_size=128)
    # nibble-packed int8 storage: [K/2, N] (S4 can't cross PJRT)
    assert qt.values.dtype == jnp.int8
    assert qt.values.shape == (256, 32)
    assert qt.scale.shape == (4, 32)
    wd = dequantize_int4(qt, jnp.float32)
    err = np.abs(np.asarray(wd - w))
    # symmetric 4-bit: error bounded by the group's scale/2
    bound = np.repeat(np.asarray(qt.scale), 128, axis=0) * 0.5 + 1e-7
    assert (err <= bound).all()
    # K not divisible by the group → one whole-K group (per-channel)
    qt2 = quantize_int4(w[:100], group_size=128)
    assert qt2.scale.shape == (1, 32)


def test_int4_matmul_matches_dequant():
    from mllm_npu_tpu.ops.quant import (dequantize_int4, int4_matmul,
                                        quantize_int4)

    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (4, 256), jnp.bfloat16)
    w = jax.random.normal(kw, (256, 128)) * 0.05
    qt = quantize_int4(w, group_size=128)
    ref = x.astype(jnp.float32) @ np.asarray(dequantize_int4(qt, jnp.float32))
    out_p = int4_matmul(x, qt, block_m=8, block_n=128, block_k=256,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-1)
    # awkward-shape jnp fallback
    w2 = jax.random.normal(kw, (256, 100)) * 0.05
    out_f = int4_matmul(x, quantize_int4(w2))
    assert out_f.shape == (4, 100)


def test_int4_dense_module():
    from mllm_npu_tpu.ops.quant import Int4Dense

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 256), jnp.bfloat16)
    m = Int4Dense(32)
    p = m.init(jax.random.PRNGKey(1), x)
    assert p["params"]["kernel_q"].dtype == jnp.int8
    assert p["params"]["kernel_q"].shape == (128, 32)   # packed K/2
    assert p["params"]["scale_g"].shape == (1, 32)
    out = m.apply(p, x)
    assert float(jnp.abs(out).max()) == 0.0


@pytest.mark.slow
def test_int4_llama_logits_parity():
    from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                           LlamaForCausalLM)
    from mllm_npu_tpu.utils.weights import quantize_llama_params

    cfg = LlamaConfig.tiny()
    lm = LlamaForCausalLM(cfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(3, 1000, (2, 16)),
                      jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), ids)
    logits, _, _ = lm.apply(params, ids)

    qcfg = LlamaConfig.tiny(quantization="int4", quant_group_size=32)
    qlm = LlamaForCausalLM(qcfg, dtype=jnp.float32)
    qparams = {"params": quantize_llama_params(params["params"], bits=4,
                                               group_size=32)}
    ref_struct = jax.tree_util.tree_structure(
        qlm.init(jax.random.PRNGKey(0), ids))
    assert jax.tree_util.tree_structure(qparams) == ref_struct
    qlogits, _, _ = qlm.apply(qparams, ids)

    a = np.asarray(logits, np.float32).reshape(-1)
    b = np.asarray(qlogits, np.float32).reshape(-1)
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    # NOTE: random-init tiny nets are the WORST case for 4-bit RTN —
    # ~10% per-weight error with zero trained redundancy to absorb it
    # (this seed measures cos ≈ 0.96). Real trained checkpoints behave
    # like published int4 group-RTN results; this test asserts the
    # mechanism (structure + strong correlation), not production quality.
    assert cos > 0.9, cos
    at = np.asarray(logits).argmax(-1)
    bt = np.asarray(qlogits).argmax(-1)
    assert (at == bt).mean() > 0.5, (at == bt).mean()


@pytest.mark.slow
def test_generator_quantize_int4_generates():
    """End-to-end: MLLMGenerator(quantize_int4=True) rebuilds the LLM in
    int4 layout and still decodes."""
    import numpy as np
    from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                           LlamaForCausalLM)
    from mllm_npu_tpu.models.generation.generate import MLLMGenerator
    from mllm_npu_tpu.models.generation.sampler import SamplingConfig
    from mllm_npu_tpu.models.mllm import GeneralizedMultimodalModel
    from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
        SigLIPConfig, SigLIPVisionEncoder)
    from mllm_npu_tpu.models.multimodal_projector.pooling_projection import (
        SimplePooling)

    cfg = LlamaConfig.tiny()
    lm = LlamaForCausalLM(cfg, dtype=jnp.float32)
    vcfg = SigLIPConfig.tiny()
    vis = SigLIPVisionEncoder(vcfg, dtype=jnp.float32)
    proj = SimplePooling(grid_size=2, input_dim=vcfg.hidden_size,
                         output_dim=cfg.hidden_size)
    model = GeneralizedMultimodalModel(language_model=lm,
                                       vision_encoder=vis, projector=proj)
    rs = np.random.RandomState(0)
    B, S, N = 1, 8, 1
    img_size = vcfg.image_size
    batch = dict(
        input_ids=jnp.asarray(rs.randint(3, 1000, (B, S)), jnp.int32),
        images=jnp.asarray(rs.randn(N, img_size, img_size, 3), jnp.float32),
        attention_mask=jnp.ones((B, S), jnp.int32),
        labels=jnp.asarray(rs.randint(3, 1000, (B, S)), jnp.int32),
        embeds_cmp_mask=jnp.asarray([True]),
        embeds_gen_mask=jnp.asarray([False]),
        ids_cmp_mask=jnp.zeros((B, S), bool).at[0, 2:6].set(True),
        ids_gen_mask=jnp.zeros((B, S), bool),
        patch_positions=jnp.asarray(rs.rand(N, 2), jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch)

    gen = MLLMGenerator(model, cfg, params,
                        sampling=SamplingConfig(max_new_tokens=4,
                                                do_sample=False,
                                                eos_token_id=-1,
                                                pad_token_id=0),
                        quantize_int4=True)
    flat = jax.tree_util.tree_flatten_with_path(
        gen.params["params"]["language_model"])[0]
    # int4 layout: group scales present, packed kernels stored int8
    assert any("scale_g" in jax.tree_util.keystr(k) for k, _ in flat)
    assert all(l.dtype != jnp.int4 for _, l in flat)   # S4 never a param
    out = gen.generate(batch["input_ids"], images=batch["images"],
                       embeds_cmp_mask=batch["embeds_cmp_mask"],
                       ids_cmp_mask=batch["ids_cmp_mask"],
                       patch_positions=batch["patch_positions"])
    ids = np.asarray(out["generate_ids"])
    assert ids.shape[1] == 4
    assert np.isfinite(ids).all()


@pytest.mark.slow
def test_generator_fused_int4_generates():
    """fuse_projections + quantize_int4 compose: fused qkv/gate_up
    kernels quantize group-wise like any other kernel leaf."""
    import numpy as np
    from mllm_npu_tpu.models.language_models.llama import (LlamaConfig,
                                                           LlamaForCausalLM)
    from mllm_npu_tpu.models.generation.generate import MLLMGenerator
    from mllm_npu_tpu.models.generation.sampler import SamplingConfig
    from mllm_npu_tpu.models.mllm import GeneralizedMultimodalModel
    from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
        SigLIPConfig, SigLIPVisionEncoder)
    from mllm_npu_tpu.models.multimodal_projector.pooling_projection import (
        SimplePooling)

    cfg = LlamaConfig.tiny()
    lm = LlamaForCausalLM(cfg, dtype=jnp.float32)
    vcfg = SigLIPConfig.tiny()
    vis = SigLIPVisionEncoder(vcfg, dtype=jnp.float32)
    proj = SimplePooling(grid_size=2, input_dim=vcfg.hidden_size,
                         output_dim=cfg.hidden_size)
    model = GeneralizedMultimodalModel(language_model=lm,
                                       vision_encoder=vis, projector=proj)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(3, 1000, (1, 8)), jnp.int32)
    batch = dict(input_ids=ids, images=None,
                 attention_mask=jnp.ones((1, 8), jnp.int32), labels=ids,
                 embeds_cmp_mask=None, embeds_gen_mask=None,
                 ids_cmp_mask=jnp.zeros((1, 8), bool),
                 ids_gen_mask=jnp.zeros((1, 8), bool),
                 patch_positions=None)
    params = model.init(jax.random.PRNGKey(0), **batch)
    gen = MLLMGenerator(model, cfg, params,
                        sampling=SamplingConfig(max_new_tokens=4,
                                                do_sample=False,
                                                eos_token_id=-1,
                                                pad_token_id=0),
                        fuse_projections=True, quantize_int4=True)
    assert gen.lm_config.fused_projections
    assert gen.lm_config.quantization == "int4"
    out = gen.generate(ids)
    assert np.asarray(out["generate_ids"]).shape[1] == 4


def test_quantized_kernels_get_tp_specs():
    """TP sharding rules must cover the quantized layout: kernel_q
    shards like kernel, scales shard on the kernel's output axis."""
    import numpy as np
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.parallel.sharding import infer_param_specs

    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    params = {
        "q_proj": {"kernel_q": jnp.zeros((256, 512), jnp.int8),
                   "scale": jnp.zeros((512,), jnp.float32)},
        "o_proj": {"kernel_q": jnp.zeros((256, 256), jnp.int8),
                   "scale_g": jnp.zeros((2, 256), jnp.float32)},
        "down_proj": {"kernel_q": jnp.zeros((256, 256), jnp.int8),
                      "scale_g": jnp.zeros((2, 256), jnp.float32)},
        # scan-stacked int8 row scale [L, N]: layers must NOT shard
        "up_proj": {"kernel_q": jnp.zeros((256, 512), jnp.int8),
                    "scale": jnp.zeros((512,), jnp.float32)},
    }
    stacked = {"o_proj": {"scale": jnp.zeros((4, 256), jnp.float32)}}
    specs = infer_param_specs(params, mesh)
    assert "tensor" in str(specs["q_proj"]["kernel_q"])
    assert str(specs["q_proj"]["scale"]).count("tensor") == 1
    assert "tensor" in str(specs["o_proj"]["kernel_q"])
    # int4 row scales: group axis follows the kernel's K (tensor)
    # sharding, output axis on fsdp
    assert str(specs["o_proj"]["scale_g"]) == "PartitionSpec('tensor', 'fsdp')"
    assert str(specs["down_proj"]["scale_g"]) == \
        "PartitionSpec('tensor', 'fsdp')"
    sspecs = infer_param_specs(stacked, mesh)
    # stacked int8 [L, N] row scale keeps N on fsdp, L unsharded
    assert str(sspecs["o_proj"]["scale"]) == "PartitionSpec(None, 'fsdp')"


# ---------------------------------------------------------------------------
# tensor-parallel shard_map dispatch (Pallas quant matmuls are opaque to
# GSPMD — under a multi-chip tensor axis the modules must route through
# shard_map with the weight actually sharded, ops/quant.py tp_quant_matmul)
# ---------------------------------------------------------------------------


def _tp_mesh(tensor=2):
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh

    if len(jax.devices()) < tensor:
        pytest.skip("needs >= %d devices" % tensor)
    return build_mesh(MeshConfig(data=1, fsdp=1, tensor=tensor),
                      devices=jax.devices()[:tensor])


@pytest.mark.slow
def test_tp_quant_matmul_column_row_parity():
    """shard_map'd int8/int4 matmuls match the dequantized reference in
    both TP roles (column: W sharded on N, no collective; row: W sharded
    on K, psum over tensor)."""
    from mllm_npu_tpu import ops
    from mllm_npu_tpu.ops.quant import (dequantize_int4, dequantize_int8,
                                        quantize_int4, quantize_int8,
                                        tp_quant_matmul)

    mesh = _tp_mesh(2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 256), jnp.float32)
    w_col = jnp.asarray(rng.randn(256, 512), jnp.float32)
    w_row = jnp.asarray(rng.randn(256, 512), jnp.float32)

    # no active mesh context -> dispatch declines
    assert tp_quant_matmul(x, quantize_int8(w_col), mode="column",
                           bits=8) is None

    with ops.flash_mesh(mesh):
        for bits, quant, deq in ((8, quantize_int8, dequantize_int8),
                                 (4, lambda w: quantize_int4(w, 128),
                                  dequantize_int4)):
            qt = quant(w_col)
            ref = x @ deq(qt, jnp.float32)
            out = tp_quant_matmul(x, qt, mode="column", bits=bits)
            assert out is not None
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
            qt = quant(w_row)
            ref = x @ deq(qt, jnp.float32)
            out = tp_quant_matmul(x, qt, mode="row", bits=bits)
            assert out is not None
            # row mode splits the K reduction across shards (psum)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)
        # mode=None / unknown declines even with an active mesh
        assert tp_quant_matmul(x, quantize_int8(w_col), mode=None,
                               bits=8) is None


def test_tp_quant_dense_modules_dispatch_under_mesh():
    """Int8Dense/Int4Dense with tp_mode route through shard_map inside a
    jit when a flash_mesh is active, and match their no-mesh output."""
    from mllm_npu_tpu import ops
    from mllm_npu_tpu.ops.quant import Int4Dense, Int8Dense

    mesh = _tp_mesh(2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 256), jnp.float32)

    for m in (Int8Dense(512, dtype=jnp.float32, tp_mode="column"),
              Int8Dense(512, dtype=jnp.float32, tp_mode="row"),
              Int4Dense(512, group_size=128, dtype=jnp.float32,
                        tp_mode="column"),
              Int4Dense(512, group_size=128, dtype=jnp.float32,
                        tp_mode="row")):
        p = m.init(jax.random.PRNGKey(1), x)
        # give the zero-init quant params real values
        p = jax.tree_util.tree_map(
            lambda a: (jax.random.randint(jax.random.PRNGKey(2), a.shape,
                                          -7, 8).astype(a.dtype)
                       if a.dtype in (jnp.int8, jnp.int4)
                       else jnp.abs(jax.random.normal(
                           jax.random.PRNGKey(3), a.shape, a.dtype))), p)
        ref = m.apply(p, x)

        def run(p, x, m=m):
            with ops.flash_mesh(mesh):
                return m.apply(p, x)

        out = jax.jit(run)(p, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_int4_engine_matches_direct_forward():
    """The batched engine's int4 decode (single-device AND tensor=2
    shard_map dispatch) must be token-exact vs a direct full re-forward
    of the SAME quantized model — quantization loss is allowed, engine
    drift is not. (This invariant caught the S4-params-at-the-PJRT-
    boundary failure that motivated the packed-int8 storage layout.)"""
    import dataclasses

    from mllm_npu_tpu.models.language_models.llama import LlamaForCausalLM
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.serve.batched_engine import ContinuousBatchingEngine
    from mllm_npu_tpu.utils.testing import (TinySpec, build_tiny_mllm,
                                            synthetic_batch)
    from mllm_npu_tpu.utils.weights import quantize_llama_params

    spec = TinySpec(batch=1, seq=64)
    model, lm_cfg, _ = build_tiny_mllm(spec)
    batch = synthetic_batch(spec, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    prompt = [3, 17, 42, 9]

    qcfg = dataclasses.replace(lm_cfg, quantization="int4",
                               quant_group_size=32)
    qlm = LlamaForCausalLM(qcfg, dtype=model.language_model.dtype)
    qm = model.clone(language_model=qlm)
    qp = jax.tree_util.tree_map(lambda x: x, params)
    qp["params"]["language_model"] = quantize_llama_params(
        params["params"]["language_model"], bits=4, group_size=32)

    lmp = {"params": qp["params"]["language_model"]}
    seq = list(prompt)
    for _ in range(6):
        logits, _, _ = qlm.apply(lmp, jnp.asarray([seq], jnp.int32))
        seq.append(int(np.asarray(logits)[0, len(seq) - 1].argmax()))
    direct = seq[4:]

    def run(mesh=None):
        eng = ContinuousBatchingEngine(
            qm, qcfg, qp, num_slots=2, max_len=32, block_steps=2,
            prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
            mesh=mesh)
        r = eng.submit(list(prompt), max_new_tokens=6)
        eng.run_until_idle()
        return r.tokens

    assert run() == direct
    if len(jax.devices()) >= 2:
        mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=2),
                          devices=jax.devices()[:2])
        assert run(mesh) == direct


# ---------------------------------------------------------------------------
# QLoRA-style training: frozen int8/int4 base + float LoRA adapters
# (reference SFT recipe peft_models.py:15-99, at 8B-on-one-chip scale)
# ---------------------------------------------------------------------------

def _lora_cfgs(quantization):
    import dataclasses
    from mllm_npu_tpu.models.language_models.llama import LlamaConfig
    base = LlamaConfig.tiny(vocab_size=256, lora_rank=4,
                            attention_impl="eager")
    q = dataclasses.replace(base, quantization=quantization,
                            quant_group_size=32)
    return base, q


@pytest.mark.parametrize("quantization", [
    "int8", pytest.param("int4", marks=pytest.mark.slow)])
def test_lora_quant_base_forward_matches_dequant(quantization):
    """LoRADense with a quantized frozen base: logits match the float
    model whose base kernels hold the dequantized weights."""
    from mllm_npu_tpu.models.language_models.llama import LlamaForCausalLM
    from mllm_npu_tpu.ops.quant import (dequantize_int4, dequantize_int8,
                                        QuantizedTensor4)
    from mllm_npu_tpu.utils.weights import quantize_llama_params

    fcfg, qcfg = _lora_cfgs(quantization)
    fmodel = LlamaForCausalLM(fcfg, dtype=jnp.float32)
    qmodel = LlamaForCausalLM(qcfg, dtype=jnp.float32)
    ids = jnp.asarray(np.random.RandomState(0).randint(5, 250, (2, 16)),
                      jnp.int32)
    fp = fmodel.init(jax.random.PRNGKey(0), ids)["params"]
    # nonzero lora_b so the adapter path contributes
    import flax
    flat = flax.traverse_util.flatten_dict(fp)
    for k in flat:
        if k[-1] == "lora_b":
            flat[k] = jnp.asarray(np.random.RandomState(1).randn(
                *flat[k].shape).astype(np.float32) * 0.05)
    fp = flax.traverse_util.unflatten_dict(flat)
    bits = 8 if quantization == "int8" else 4
    qp = quantize_llama_params(fp, bits=bits, group_size=32)

    # build the float reference with DEQUANTIZED kernels (so both models
    # see identical effective weights)
    deq = flax.traverse_util.flatten_dict(qp)
    out = {}
    for k, v in deq.items():
        if k[-1] == "kernel_q":
            if bits == 8:
                deq_fn = lambda vv, ss: dequantize_int8(
                    QuantizedTensor(vv, ss), jnp.float32)
                s_ = deq[k[:-1] + ("scale",)]
            else:
                deq_fn = lambda vv, ss: dequantize_int4(
                    QuantizedTensor4(vv, ss), jnp.float32)
                s_ = deq[k[:-1] + ("scale_g",)]
            w = jax.vmap(deq_fn)(v, s_) if v.ndim == 3 else deq_fn(v, s_)
            out[k[:-1] + ("kernel",)] = w
        elif k[-1] in ("scale", "scale_g"):
            continue
        else:
            out[k] = v
    fp_deq = flax.traverse_util.unflatten_dict(out)

    ql, _, _ = qmodel.apply({"params": qp}, ids)
    fl, _, _ = fmodel.apply({"params": fp_deq}, ids)
    np.testing.assert_allclose(np.asarray(ql), np.asarray(fl),
                               atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_lora_int8_train_step_trains_only_adapters():
    """End-to-end QLoRA train step on the dp2×fsdp2×tp2 mesh: gradients
    flow through the quantized matmul's custom VJP into the adapters;
    int storage + frozen base kernels stay bit-identical; optimizer
    state is allocated for trainable leaves only."""
    import flax
    from mllm_npu_tpu.models.language_models.llama import (
        LlamaForCausalLM, lora_frozen_patterns)
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.train.train_state import (OptimizerConfig,
                                                compile_train_step,
                                                create_train_state,
                                                make_train_step,
                                                shard_train_state)
    from mllm_npu_tpu.utils.weights import quantize_llama_params

    fcfg, qcfg = _lora_cfgs("int8")
    fmodel = LlamaForCausalLM(fcfg, dtype=jnp.float32)
    qmodel = LlamaForCausalLM(qcfg, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(5, 250, (8, 16)), jnp.int32)
    fp = fmodel.init(jax.random.PRNGKey(0), ids)["params"]
    qp = {"params": quantize_llama_params(fp, bits=8)}

    from mllm_npu_tpu.models.language_models.llama import causal_lm_loss

    def loss_fn(params, batch):
        logits, _, _ = qmodel.apply(params, batch["ids"])
        return causal_lm_loss(logits, batch["ids"]), {}

    opt_cfg = OptimizerConfig(
        lr=1e-2, warmup_steps=0, total_steps=10,
        frozen_patterns=lora_frozen_patterns() + ("embed_tokens",
                                                  "lm_head"))
    state = create_train_state(qp, opt_cfg)
    mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    batch = {"ids": ids}
    step = make_train_step(loss_fn)
    jitted, state_sharding, batch_shardings = compile_train_step(
        step, state, batch, mesh)
    state = shard_train_state(state, state_sharding)
    batch = jax.tree_util.tree_map(jax.device_put, batch, batch_shardings)

    before = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, state.params["params"]))
    new_state, loss, metrics = jitted(state, batch)
    assert np.isfinite(float(loss))
    after = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(np.asarray, new_state.params["params"]))

    changed = {"/".join(k) for k in after
               if not np.array_equal(before[k], after[k])}
    lora_keys = {"/".join(k) for k in after if k[-1] in ("lora_a",
                                                         "lora_b")}
    # every adapter updated; nothing else moved
    assert lora_keys and lora_keys <= changed, \
        sorted(lora_keys - changed)[:4]
    frozen_moved = {c for c in changed
                    if "lora_a" not in c and "lora_b" not in c
                    and "norm" not in c}
    assert not frozen_moved, sorted(frozen_moved)[:6]

    # optimizer moments exist only for trainable leaves
    mus = [x for x in jax.tree_util.tree_leaves(new_state.opt_state)
           if hasattr(x, "shape")]
    n_params = sum(int(np.prod(v.shape)) for v in after.values())
    n_trainable = sum(int(np.prod(v.shape)) for k, v in after.items()
                      if k[-1] in ("lora_a", "lora_b") or "norm" in
                      "/".join(k))
    n_mu = sum(int(np.prod(x.shape)) for x in mus)
    assert n_mu < 3 * n_trainable + 1000, (n_mu, n_trainable, n_params)


@pytest.mark.parametrize("quantization", ["int8", "int4"])
def test_quant_dense_bias_matches_dequant(quantization):
    """QuantDense (biased, for the vision towers / UNet linears) output
    matches dequantize->dense within quantization error."""
    from mllm_npu_tpu.ops.quant import QuantDense
    kx, kp = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(kx, (2, 8, 256), jnp.bfloat16)
    float_m = QuantDense(128, quantization=None, dtype=jnp.bfloat16)
    fp = float_m.init(kp, x)
    # nn.Dense-compatible naming on the float path
    assert set(fp["params"]) == {"kernel", "bias"}
    fp["params"]["bias"] = jax.random.normal(kp, (128,)) * 0.1
    ref = float_m.apply(fp, x)

    qp = {"params": quantize_dense_params(
        fp["params"], bits={"int8": 8, "int4": 4}[quantization],
        group_size=32)}
    quant_m = QuantDense(128, quantization=quantization, group_size=32,
                         dtype=jnp.bfloat16)
    scale_key = "scale" if quantization == "int8" else "scale_g"
    assert set(qp["params"]) == {"kernel_q", scale_key, "bias"}
    out = quant_m.apply(qp, x)
    atol = 0.15 if quantization == "int8" else 0.3   # int4 is coarser
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=atol)


@pytest.mark.parametrize("quantization", ["int8", "int4"])
def test_quantized_vit_tower_parity(quantization):
    """A tiny Qwen-ViT with quantized Dense weights (the SEED-X 16GB fit
    path) stays close to the float tower on identical weights."""
    from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
        QwenViTConfig, VisionTransformerWithAttnPool)
    import dataclasses as _dc
    cfg = QwenViTConfig.tiny(image_size=28, layers=2)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (1, 28, 28, 3))
    float_m = VisionTransformerWithAttnPool(cfg, dtype=jnp.float32)
    p = float_m.init(jax.random.PRNGKey(1), imgs)
    ref = float_m.apply(p, imgs)

    qcfg = _dc.replace(cfg, quantization=quantization)
    qm = VisionTransformerWithAttnPool(qcfg, dtype=jnp.float32)
    # quantize ONLY the encoder blocks' kernels (what the flag switches);
    # conv/pos/attn_pool/proj stay float
    qparams = jax.tree_util.tree_map(lambda x_: x_, p)   # copy
    blocks = p["params"]["backbone"]["transformer"]["blocks"]
    qblocks = quantize_dense_params(
        blocks, bits={"int8": 8, "int4": 4}[quantization], group_size=64)
    qparams["params"]["backbone"]["transformer"]["blocks"] = qblocks
    # structure must match what the quantized module expects
    expect = jax.eval_shape(
        lambda k: qm.init(k, imgs), jax.random.PRNGKey(1))
    got_keys = jax.tree_util.tree_structure(qparams)
    assert got_keys == jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda s: 0, expect))
    out = qm.apply(qparams, imgs)
    err = np.abs(np.asarray(out - ref)).max()
    scale = np.abs(np.asarray(ref)).max() + 1e-6
    # int4 at the tiny width runs one coarse group per column (K=64 <
    # group_size) — looser bound; the serving path uses int8 for the ViT
    tol = 0.12 if quantization == "int8" else 0.35
    assert err / scale < tol, (err, scale)
