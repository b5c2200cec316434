"""MFU / throughput harness for MLLM pretrain steps on real TPU chips.

Measures the full train step (vision encoder + projector + LLM fwd/bwd
+ optimizer) of a configurable-size MLLM, reports tokens/sec,
images/sec/chip, and MFU — the north-star metrics in BASELINE.md.

  python benchmarks/mfu.py --preset 1b --batch 8 --seq 1024
  python benchmarks/mfu.py --preset 8b --fsdp 4   # on a v5p-8 slice

Timing uses the on-device loop-slope method (see bench.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_BF16 = {
    # per-chip peak TFLOP/s
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "cpu": 1.0,
}


def llama_flops_per_token(cfg) -> float:
    """Dense decoder FLOPs/token (fwd+bwd ≈ 3× fwd, fwd ≈ 2×params-ish,
    computed exactly from the shapes)."""
    h, inter, L, V = (cfg.hidden_size, cfg.intermediate_size,
                      cfg.num_hidden_layers, cfg.vocab_size)
    hkv = cfg.num_key_value_heads * cfg.head_dim
    per_layer = 2 * (h * h + 2 * h * hkv + h * h)      # qkvo matmuls
    per_layer += 2 * 3 * h * inter                     # gate/up/down
    return L * per_layer + 2 * h * V                   # + lm head


def attention_flops_per_token(cfg, seq: int) -> float:
    # causal: ~ 2 * 2 * h * S / 2 per token per layer
    return cfg.num_hidden_layers * 2 * 2 * cfg.hidden_size * seq / 2


def lora_flops_per_token(cfg) -> float:
    """Forward FLOPs/token of the LoRA adapters (rank-r down+up on every
    default target: q/k/v/o/gate/up/down)."""
    h, inter, L, r = (cfg.hidden_size, cfg.intermediate_size,
                      cfg.num_hidden_layers, cfg.lora_rank)
    hkv = cfg.num_key_value_heads * cfg.head_dim
    per_layer = ((h + h)            # q_proj
                 + (h + hkv) * 2    # k_proj, v_proj
                 + (h + h)          # o_proj
                 + (h + inter) * 2  # gate_proj, up_proj
                 + (inter + h))     # down_proj
    return L * 2 * r * per_layer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset",
                   choices=["tiny", "500m", "1b", "2b", "3b", "8b", "13b"],
                   default="500m")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--images", type=int, default=8)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tensor", type=int, default=1)
    p.add_argument("--mesh_seq", type=int, default=1,
                   help="Ulysses sequence-parallel mesh axis")
    p.add_argument("--peak", choices=list(PEAK_BF16), default="v5e")
    p.add_argument("--lora", type=int, default=0, metavar="RANK",
                   help="LoRA SFT mode (the reference's SFT recipe, "
                        "peft_models.py:15-99): freeze the decoder base, "
                        "train adapters of this rank + layernorms + "
                        "embeddings/head + projector")
    p.add_argument("--quantize_base", default="none",
                   choices=["none", "int8", "int4"],
                   help="QLoRA: store the frozen LoRA base in int8/int4 "
                        "(required to fit 8B on one 16GB v5e)")
    p.add_argument("--steps", type=int, nargs=2, default=(3, 13))
    p.add_argument("--remat_policy", default="nothing",
                   choices=["nothing", "dots", "dots_lite",
                            "dots_no_batch", "hoist_attn"])
    p.add_argument("--mu_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adafactor"],
                   help="adafactor's factored second moment is the only "
                        "way 2B+ trainables fit one 16GB v5e (AdamW "
                        "bf16 params+mu+nu+grads alone exceed HBM)")
    p.add_argument("--param_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="parameter storage dtype: bfloat16 (pure-bf16 "
                        "Adam) fits ~2B-class training on one 16GB v5e "
                        "— 8 bytes/param incl. grads vs 16 for fp32")
    p.add_argument("--profile", default=None,
                   help="write a jax.profiler trace of one step here")
    p.add_argument("--no_remat", action="store_true",
                   help="disable gradient checkpointing (measures the "
                        "remat recompute cost when activations fit)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="microbatch accumulation steps (lax.scan inside "
                        "the jitted step, train_state.make_train_step): "
                        "effective batch = batch x grad_accum at the "
                        "HBM footprint of one microbatch")
    p.add_argument("--ce_chunk", type=int, default=0,
                   help="chunked (fused-linear) CE: compute the LM loss "
                        "in sequence chunks of this many positions "
                        "without materializing [B, S, V] logits")
    args = p.parse_args()

    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mllm_npu_tpu.models.language_models.llama import (
        LlamaConfig, LlamaForCausalLM)
    from mllm_npu_tpu.models.mllm import GeneralizedMultimodalModel
    from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
        SigLIPConfig, SigLIPVisionEncoder)
    from mllm_npu_tpu.models.multimodal_projector.attention_resampler \
        import AttentionResampler
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.train.train_state import (OptimizerConfig,
                                                compile_train_step,
                                                create_train_state,
                                                make_train_step,
                                                shard_train_state)

    if args.preset == "tiny":
        lm_cfg = LlamaConfig.tiny(attention_impl="auto",
                                  remat=not args.no_remat)
        vis_cfg = SigLIPConfig.tiny()
        nq, heads = 4, 4
    elif args.preset == "500m":
        # sized to fit one v5e chip with fp32 adam state
        lm_cfg = LlamaConfig(
            vocab_size=32000, hidden_size=1536, intermediate_size=4096,
            num_hidden_layers=16, num_attention_heads=16,
            num_key_value_heads=8, max_position_embeddings=4096,
            attention_impl="auto", remat=not args.no_remat,
            remat_policy=args.remat_policy)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 16
    elif args.preset == "1b":
        lm_cfg = LlamaConfig(
            vocab_size=32000, hidden_size=2048, intermediate_size=5632,
            num_hidden_layers=22, num_attention_heads=16,
            num_key_value_heads=8, max_position_embeddings=4096,
            attention_impl="auto", remat=not args.no_remat,
            remat_policy=args.remat_policy)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 16
    elif args.preset == "2b":
        # largest-class config that can train on ONE 16GB v5e with
        # --mu_dtype bfloat16 (VERDICT r1 item 5: prove the MFU
        # north-star nearer the 8B-class operating point)
        lm_cfg = LlamaConfig(
            vocab_size=32000, hidden_size=2560, intermediate_size=6912,
            num_hidden_layers=24, num_attention_heads=20,
            num_key_value_heads=4, max_position_embeddings=4096,
            attention_impl="auto", remat=not args.no_remat,
            remat_policy=args.remat_policy)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 20
    elif args.preset == "3b":
        # llama-3.2-3b-shaped decoder (32k vocab)
        lm_cfg = LlamaConfig(
            vocab_size=32000, hidden_size=3072, intermediate_size=8192,
            num_hidden_layers=28, num_attention_heads=24,
            num_key_value_heads=8, max_position_embeddings=4096,
            attention_impl="auto", remat=not args.no_remat,
            remat_policy=args.remat_policy)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 24
    elif args.preset == "8b":
        lm_cfg = LlamaConfig.llama3_8b(attention_impl="auto",
                                       remat=not args.no_remat,
                                       remat_policy=args.remat_policy)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 32
    else:  # 13b — the SEED-X flagship train assembly (Llama-2-13B +
        # Qwen-ViT-G-448, reference configs/models/
        # seedx_llama2_13b_qwenvl_vitg.yaml); QLoRA-only on a 16GB chip
        lm_cfg = LlamaConfig.llama2_13b(attention_impl="auto",
                                        remat=not args.no_remat,
                                        remat_policy=args.remat_policy)
        vis_cfg = None    # QwenViT-G, built below
        nq, heads = 64, 40

    if args.lora:
        import dataclasses as _dc
        lm_cfg = _dc.replace(
            lm_cfg, lora_rank=args.lora,
            quantization=args.quantize_base
            if args.quantize_base != "none" else lm_cfg.quantization)

    pd = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.param_dtype]
    lm = LlamaForCausalLM(lm_cfg, dtype=jnp.bfloat16, param_dtype=pd)
    if vis_cfg is not None:
        vis = SigLIPVisionEncoder(vis_cfg, dtype=jnp.bfloat16,
                                  param_dtype=pd)
        # (hidden, mlp, layers, tokens/img, px) for the FLOPs denominator
        vis_dims = (vis_cfg.hidden_size, vis_cfg.intermediate_size,
                    vis_cfg.num_hidden_layers, vis_cfg.num_patches,
                    vis_cfg.image_size)
        kv_dim = vis_cfg.hidden_size
    else:
        from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
            QwenViTConfig, VisionTransformerWithAttnPool)
        qcfg = QwenViTConfig.vit_g()
        vis = VisionTransformerWithAttnPool(qcfg, dtype=jnp.bfloat16,
                                            param_dtype=pd)
        grid = qcfg.image_size // qcfg.patch_size
        vis_dims = (qcfg.width, qcfg.mlp_width, qcfg.layers,
                    grid * grid, qcfg.image_size)
        kv_dim = qcfg.output_dim
    proj = AttentionResampler(grid_size=int(nq ** 0.5),
                              embed_dim=lm_cfg.hidden_size,
                              num_heads=heads, kv_dim=kv_dim,
                              dtype=jnp.bfloat16, param_dtype=pd)
    model = GeneralizedMultimodalModel(
        language_model=lm, vision_encoder=vis, projector=proj,
        freeze_vision_encoder=True, add_patch_pos=True,
        patch_pos_dim=lm_cfg.hidden_size, ce_loss_chunk=args.ce_chunk)

    B, S, N = args.batch, args.seq, args.images
    rs = np.random.RandomState(0)
    ids_cmp = np.zeros((B, S), bool)
    per_row = N // B if N >= B else 0
    pos = 2
    for b in range(B):
        for i in range(per_row):
            ids_cmp[b, pos + i * (nq + 2):pos + i * (nq + 2) + nq] = True
    batch = {
        "input_ids": jnp.asarray(
            rs.randint(5, lm_cfg.vocab_size, (B, S)), jnp.int32),
        "images": jnp.asarray(rs.randn(
            N, vis_dims[4], vis_dims[4], 3), jnp.bfloat16),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(rs.randint(5, lm_cfg.vocab_size, (B, S)),
                              jnp.int32),
        "embeds_cmp_mask": jnp.asarray([True] * N),
        "embeds_gen_mask": jnp.asarray([False] * N),
        "ids_cmp_mask": jnp.asarray(ids_cmp),
        "ids_gen_mask": jnp.zeros((B, S), bool),
        "patch_positions": jnp.asarray(rs.rand(N, 2), jnp.float32),
    }

    mesh = build_mesh(MeshConfig(data=-1, fsdp=args.fsdp,
                                 tensor=args.tensor, seq=args.mesh_seq))
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               **batch))
    # real init (sharded via jit out-shardings would be ideal; simple path)
    params = model.init(jax.random.PRNGKey(0), **batch)
    if args.param_dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    frozen = ["vision_encoder"]
    if args.lora:
        from mllm_npu_tpu.models.language_models.llama import \
            lora_frozen_patterns
        frozen.extend(lora_frozen_patterns())
    state = create_train_state(params, OptimizerConfig(
        lr=1e-4, warmup_steps=0, total_steps=1000,
        mu_dtype=args.mu_dtype, optimizer=args.optimizer,
        frozen_patterns=tuple(frozen)))
    del params

    def loss_fn(p, b):
        out = model.apply(p, **b)
        return out["total_loss"], {"lm_loss": out["lm_loss"]}

    if args.grad_accum > 1:
        batch = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * args.grad_accum), batch)
    step = make_train_step(loss_fn, grad_accum=args.grad_accum)
    jitted, state_sharding, batch_shardings = compile_train_step(
        step, state, batch, mesh)
    state = shard_train_state(state, state_sharding)
    batch = jax.tree_util.tree_map(jax.device_put, batch, batch_shardings)

    def run_n(n, state):
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss, _ = jitted(state, batch)
        # force completion
        _ = float(loss)
        return time.perf_counter() - t0, state

    # warm compile
    _, state = run_n(1, state)
    if args.profile:
        with jax.profiler.trace(args.profile):
            _, state = run_n(1, state)
    n1, n2 = args.steps
    t1, state = run_n(n1, state)
    t2, state = run_n(n2, state)
    per_step = (t2 - t1) / (n2 - n1)

    n_chips = len(jax.devices())
    tokens = B * S * args.grad_accum
    if args.lora:
        # frozen base (QLoRA): base matmuls do fwd + bwd-dx only (no dW)
        # = 2x fwd cost; attention, the lm head and the adapters still do
        # the full fwd+bwd (3x). Embedding gather/scatter FLOPs ~ 0.
        h, V = lm_cfg.hidden_size, lm_cfg.vocab_size
        base_fwd = llama_flops_per_token(lm_cfg) - 2 * h * V
        lm_tok_flops = (2 * base_fwd
                        + 3 * 2 * h * V
                        + 3 * attention_flops_per_token(lm_cfg, S)
                        + 3 * lora_flops_per_token(lm_cfg))
        step_flops = lm_tok_flops * tokens
    else:
        lm_tok_flops = llama_flops_per_token(lm_cfg) \
            + attention_flops_per_token(lm_cfg, S)
        step_flops = 3 * lm_tok_flops * tokens    # fwd + bwd
    vh, vinter, vL, vtok, _ = vis_dims
    vis_tokens = N * args.grad_accum * vtok
    vis_flops = 2 * (vh ** 2 * 4 + 2 * vh * vinter) \
        * vL * vis_tokens  # fwd only (frozen)
    step_flops += vis_flops
    peak = PEAK_BF16[args.peak] * 1e12 * n_chips
    mfu = step_flops / per_step / peak

    print(json.dumps({
        "preset": args.preset,
        "optimizer": args.optimizer,
        "lora": args.lora, "quantize_base": args.quantize_base,
        "params_m": round(n_params / 1e6, 1),
        "batch": B, "seq": S, "images": N, "chips": n_chips,
        "grad_accum": args.grad_accum,
        "sec_per_step": round(per_step, 4),
        "tokens_per_sec": round(tokens / per_step),
        "images_per_sec_per_chip": round(
            N * args.grad_accum / per_step / n_chips, 2),
        "model_tflops_per_step": round(step_flops / 1e12, 2),
        "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
