"""SDXL de-tokenizer benchmark at real SDXL-base shapes on TPU.

Times the jitted CFG denoise program (`SDXLAdapter._denoise_fn`) —
the TPU-native replacement for the reference's 50-step Python diffusion
loop (reference: mllm_npu/serve/worker.py:88-109 txt2img path; demo
txt2img) — at the production operating point: 2.6B-param UNet
(block_out (320,640,1280), transformer layers (1,2,10), cross-attn
2048), 1024x1024 output (128x128 latents), classifier-free guidance
(2x batch through the UNet per step), Euler scheduler, VAE decode.

Reported:
  - per-UNet-CFG-step time, via the slope between two jitted loop
    lengths (removes compile/dispatch/VAE constants)
  - end-to-end image latency at --steps_image steps (incl. VAE decode)

Weights are randomly initialized ON DEVICE via a jitted init (values
don't affect dense-matmul timing); bf16 params + activations.

Usage:
  python benchmarks/sdxl.py                 # 1024x1024, 30-step image
  python benchmarks/sdxl.py --size 768
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def unet_forward_flops(cfg, latent: int) -> float:
    """Analytic matmul/conv FLOPs of one UNet forward at `latent`×`latent`
    (batch 1). Mirrors UNet2DConditionModel.__call__'s block structure;
    norms/activations/time-MLPs (per-sample, not per-pixel) are omitted
    — they are <0.1% of the total."""
    conv = lambda hw, cin, cout, k=3: 2.0 * hw * hw * k * k * cin * cout

    def resnet(hw, cin, cout):
        f = conv(hw, cin, cout) + conv(hw, cout, cout)
        if cin != cout:
            f += conv(hw, cin, cout, k=1)
        return f

    def t2d(hw, ch, layers, ctx_len=64):
        s = hw * hw
        f = 2 * 2.0 * s * ch * ch               # proj_in + proj_out
        per = (4 * 2.0 * s * ch * ch            # attn1 q/k/v/out
               + 2 * 2.0 * s * s * ch           # attn1 QK^T + PV
               + 2 * 2.0 * s * ch * ch          # attn2 q + out
               + 2 * 2.0 * ctx_len * cfg.cross_attention_dim * ch  # k,v
               + 2 * 2.0 * s * ctx_len * ch     # attn2 QK^T + PV
               + 2.0 * s * ch * (8 * ch)        # GEGLU proj (C -> 8C)
               + 2.0 * s * (4 * ch) * ch)       # GEGLU out
        return f + layers * per

    chans = cfg.block_out_channels
    types = cfg.down_block_types
    tlpb = cfg.transformer_layers_per_block
    n = len(chans)
    total = conv(latent, cfg.in_channels, chans[0])
    hw, h_ch = latent, chans[0]
    skips = [(hw, chans[0])]
    for bi in range(n):
        ch = chans[bi]
        for _ in range(cfg.layers_per_block):
            total += resnet(hw, h_ch, ch)
            h_ch = ch
            if types[bi] == "CrossAttnDownBlock2D":
                total += t2d(hw, ch, tlpb[bi])
            skips.append((hw, ch))
        if bi < n - 1:
            hw //= 2
            total += conv(hw, ch, ch)
            skips.append((hw, ch))
    total += 2 * resnet(hw, chans[-1], chans[-1]) \
        + t2d(hw, chans[-1], tlpb[-1])
    for bi, (btype, ch) in enumerate(zip(reversed(types), reversed(chans))):
        for _ in range(cfg.layers_per_block + 1):
            s_hw, s_ch = skips.pop()
            total += resnet(hw, h_ch + s_ch, ch)
            h_ch = ch
            if btype == "CrossAttnDownBlock2D":
                total += t2d(hw, ch, tlpb[n - 1 - bi])
        if bi < n - 1:
            hw *= 2
            total += conv(hw, ch, ch)
    total += conv(latent, chans[0], cfg.out_channels)
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024,
                   help="output image size (latents = size/8)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps_image", type=int, default=30,
                   help="denoise steps for the end-to-end latency row")
    p.add_argument("--slope_steps", type=int, nargs=2, default=(10, 30))
    p.add_argument("--guidance", type=float, default=7.5)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--attn", choices=["auto", "eager", "flash"],
                   default="auto",
                   help="UNet attention dispatch (A/B the Pallas flash "
                        "self-attention vs the eager jnp path)")
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="per-chip bf16 peak (v5e 197, v5p 459) for the "
                        "%%-of-peak column")
    p.add_argument("--solver_study", action="store_true",
                   help="quality/speed study for the denoise leg: "
                        "euler-50 as truth proxy; compare euler-30 vs "
                        "DPM-Solver++2M-20/15 final images (PSNR) and "
                        "wall times on identical noise/embeds, then "
                        "exit. Justifies serving the transaction at "
                        "dpm-20 (seedx.py --scheduler dpm --steps 20)")
    p.add_argument("--quant", choices=["none", "int8", "int4"],
                   default="none",
                   help="int8/int4 weight-only storage on the UNet's "
                        "transformer-block projections (ops/quant.py "
                        "QuantDense) — VERDICT r4 #3 measured "
                        "substitution; prints a one-step eps-error "
                        "quality proxy vs the bf16 UNet")
    p.add_argument("--ballast_gb", type=float, default=0.0,
                   help="allocate this many GB of device HBM before "
                        "timing — reproduces the SEED-X transaction's "
                        "residency (13.7GB of LLM/ViT/UNet weights) to "
                        "isolate whether denoise slowdown is an "
                        "HBM-pressure effect")
    args = p.parse_args()

    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp

    from mllm_npu_tpu.models.generation.adapter_modules import SDXLAdapter
    from mllm_npu_tpu.models.generation.resampler import ResamplerXL
    from mllm_npu_tpu.models.generation.schedulers import (
        EulerDiscreteScheduler)
    from mllm_npu_tpu.models.generation.unet import (UNet2DConditionModel,
                                                     UNetConfig)
    from mllm_npu_tpu.models.generation.vae import AutoencoderKL, VAEConfig

    ballast = None
    if args.ballast_gb > 0:
        n = int(args.ballast_gb * 2**30 / 2)
        ballast = jax.device_put(jnp.zeros((n,), jnp.bfloat16))
        jax.block_until_ready(ballast)

    dtype = jnp.bfloat16
    ucfg = UNetConfig.sdxl_base(sample_size=args.size // 8,
                                attention_impl=args.attn)
    vcfg = VAEConfig.sdxl()
    unet = UNet2DConditionModel(ucfg, dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype, param_dtype=dtype)
    res = ResamplerXL(dim=1024, depth=4, dim_head=64, heads=16,
                      num_queries=64, embedding_dim=4096,
                      output1_dim=768, output2_dim=1280,
                      dtype=dtype, param_dtype=dtype)

    B, S = args.batch, ucfg.sample_size
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)

    t0 = time.time()
    unet_params = jax.jit(unet.init)(
        jax.random.PRNGKey(0),
        jnp.ones((1, S, S, ucfg.in_channels), dtype), jnp.ones((1,)),
        jnp.ones((1, 64, ucfg.cross_attention_dim), dtype),
        {"text_embeds": jnp.ones((1, pooled_dim), dtype),
         "time_ids": jnp.ones((1, 6), dtype)})
    # param shapes are input-size independent (convs); init small
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(1), jnp.ones((1, 64, 64, 3), dtype))
    res_params = jax.jit(res.init)(
        jax.random.PRNGKey(2), jnp.ones((1, 64, 4096), dtype))
    n_unet = sum(int(x.size) for x in jax.tree_util.tree_leaves(unet_params))
    print(f"init done in {time.time()-t0:.1f}s; unet params "
          f"{n_unet/1e9:.2f}B", file=sys.stderr)

    quant_info = None
    if args.quant != "none":
        import dataclasses as _dc

        from mllm_npu_tpu.models.generation.unet import \
            quantize_unet_params
        q_ucfg = _dc.replace(ucfg, quantization=args.quant)
        q_unet = UNet2DConditionModel(q_ucfg, dtype=dtype,
                                      param_dtype=dtype)
        bits = 8 if args.quant == "int8" else 4
        q_params = jax.jit(lambda p: quantize_unet_params(p, bits=bits)
                           )(unet_params)
        jax.block_until_ready(q_params)
        # quality proxy: one UNet eps prediction on fixed inputs, rel
        # RMS error vs the bf16 UNet (same weights pre-quantization)
        kq = jax.random.PRNGKey(7)
        xs = jax.random.normal(kq, (1, S, S, ucfg.in_channels), dtype)
        cs = jax.random.normal(kq, (1, 64, ucfg.cross_attention_dim),
                               dtype)
        added = {"text_embeds": jnp.ones((1, pooled_dim), dtype),
                 "time_ids": jnp.ones((1, 6), dtype)}
        ts_in = jnp.full((1,), 500.0)
        o_f = jax.jit(unet.apply)(unet_params, xs, ts_in, cs, added)
        o_q = jax.jit(q_unet.apply)(q_params, xs, ts_in, cs, added)
        d = (o_q.astype(jnp.float32) - o_f.astype(jnp.float32))
        rms = float(jnp.sqrt(jnp.mean(o_f.astype(jnp.float32) ** 2)))
        quant_info = {
            "quant": args.quant,
            "eps_rel_rms_err": round(
                float(jnp.sqrt(jnp.mean(d ** 2))) / rms, 5),
            "eps_rel_max_err": round(float(jnp.max(jnp.abs(d))) / rms, 5),
            "quant_params_bytes_gb": round(sum(
                int(x.size * x.dtype.itemsize)
                for x in jax.tree_util.tree_leaves(q_params)) / 2**30, 2),
            "bf16_params_bytes_gb": round(sum(
                int(x.size * x.dtype.itemsize)
                for x in jax.tree_util.tree_leaves(unet_params)) / 2**30,
                2),
        }
        print(f"quant quality proxy: {quant_info}", file=sys.stderr)
        unet, unet_params = q_unet, q_params   # time the quantized UNet

    adapter = SDXLAdapter(unet_module=unet, unet_params=unet_params,
                          resampler_module=res, resampler_params=res_params)
    adapter.init_pipe(vae, vae_params, scheduler=EulerDiscreteScheduler())

    key = jax.random.PRNGKey(3)
    # fp32: the Euler step carries fp32 latents through the fori_loop
    latents = jax.random.normal(key, (B, S, S, 4), jnp.float32)
    pe = jax.random.normal(key, (B, 64, 768 + 1280), dtype)
    pe_neg = jnp.zeros_like(pe)
    pooled = jax.random.normal(key, (B, 1280), dtype)
    pooled_neg = jnp.zeros_like(pooled)
    time_ids = jnp.asarray(
        [[args.size, args.size, 0, 0, args.size, args.size]] * B,
        jnp.float32)

    if args.solver_study:
        from mllm_npu_tpu.models.generation.schedulers import (
            DPMSolverPP2MScheduler)
        import numpy as _np
        dpm_adapter = SDXLAdapter(
            unet_module=unet, unet_params=unet_params,
            resampler_module=res, resampler_params=res_params)
        dpm_adapter.init_pipe(vae, vae_params,
                              scheduler=DPMSolverPP2MScheduler())

        def run_once(ad, n):
            run = ad._denoise_fn(n, args.size, args.size)
            out = run(unet_params, vae_params, latents, pe, pe_neg,
                      pooled, pooled_neg, time_ids, args.guidance)
            jax.block_until_ready(out)           # compile + warm
            t1 = time.perf_counter()
            out = run(unet_params, vae_params, latents, pe, pe_neg,
                      pooled, pooled_neg, time_ids, args.guidance)
            jax.block_until_ready(out)
            return _np.asarray(out, _np.float32), \
                time.perf_counter() - t1

        def psnr(a, b):
            # images are [-1, 1] pre-postprocess; peak-to-peak 2.0
            mse = float(_np.mean((a - b) ** 2))
            return round(10 * _np.log10(4.0 / mse), 2)

        truth, t_truth = run_once(adapter, 50)
        e30, t_e30 = run_once(adapter, 30)
        d20, t_d20 = run_once(dpm_adapter, 20)
        d15, t_d15 = run_once(dpm_adapter, 15)
        print(json.dumps({
            "study": "solver", "size": args.size, "attn": args.attn,
            "guidance": args.guidance,
            "truth": "euler-50",
            "euler30": {"s": round(t_e30, 3),
                        "psnr_vs_truth_db": psnr(e30, truth)},
            "dpm20": {"s": round(t_d20, 3),
                      "psnr_vs_truth_db": psnr(d20, truth)},
            "dpm15": {"s": round(t_d15, 3),
                      "psnr_vs_truth_db": psnr(d15, truth)},
            "euler50_s": round(t_truth, 3),
        }))
        return

    def timed(num_steps):
        run = adapter._denoise_fn(num_steps, args.size, args.size)
        out = run(unet_params, vae_params, latents, pe, pe_neg, pooled,
                  pooled_neg, time_ids, args.guidance)
        jax.block_until_ready(out)  # compile + warm
        ts = []
        for _ in range(args.reps):
            t1 = time.perf_counter()
            out = run(unet_params, vae_params, latents, pe, pe_neg,
                      pooled, pooled_neg, time_ids, args.guidance)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t1)
        return min(ts), sorted(ts)[len(ts) // 2]

    n_lo, n_hi = args.slope_steps
    best_lo, med_lo = timed(n_lo)
    best_hi, med_hi = timed(n_hi)
    per_step = (med_hi - med_lo) / (n_hi - n_lo)
    per_step_best = (best_hi - best_lo) / (n_hi - n_lo)
    best_img, med_img = timed(args.steps_image)

    # efficiency denominator (VERDICT r3 weak #1): model FLOPs per CFG
    # step = 2x batch through the UNet; achieved TF/s vs chip peak
    step_flops = 2 * B * unet_forward_flops(ucfg, S)
    tflops = step_flops / per_step / 1e12

    print(json.dumps({
        "size": args.size, "batch": B, "guidance": args.guidance,
        "attn": args.attn,
        "unet_params_b": round(n_unet / 1e9, 3),
        "per_unet_cfg_step_ms": round(per_step * 1e3, 2),
        "per_unet_cfg_step_ms_best": round(per_step_best * 1e3, 2),
        "model_tflops_per_cfg_step": round(step_flops / 1e12, 2),
        "achieved_tflops_per_sec": round(tflops, 1),
        "pct_of_peak": round(100 * tflops / args.peak_tflops, 1),
        "image_latency_s": round(med_img, 3),
        "image_steps": args.steps_image,
        "ballast_gb": args.ballast_gb,
        "quant": quant_info,
    }))
    del ballast


if __name__ == "__main__":
    main()
