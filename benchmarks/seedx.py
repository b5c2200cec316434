"""SEED-X 13B flagship transaction benchmark — the reference's actual
published model (Llama-2-13B + Qwen-ViT-G-448 + SDXL; reference
configs/models/seedx_llama2_13b_qwenvl_vitg.yaml, served by
mllm_npu/serve/worker.py:65-109) on ONE TPU chip, end to end.

Measures the core serving transaction (reference worker.py:285-320):
  image+prompt → ViT encode + resampler + LLM prefill → first token,
  → text decode tok/s (comprehension),
  → 64 forced-ladder image tokens → output projector → SDXL resampler
    → 30-step CFG UNet denoise → VAE decode → image out (generation),
and prints the HBM budget that makes the stack fit a 16GB v5e:
int4 LLM (6.7GB) + int8 ViT-G (2.0GB) + bf16 UNet/VAE (5.3GB).

  python benchmarks/seedx.py --runs 5
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("--prompt_tokens", type=int, default=512)
    p.add_argument("--images", type=int, default=1,
                   help="448px input images (SEED-X uses the plain "
                        "qwen_448 transform, one patch per image)")
    p.add_argument("--decode_tokens", type=int, default=32)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--scheduler", choices=["euler", "dpm"],
                   default="euler",
                   help="dpm = DPM-Solver++ 2M (second order): "
                        "euler-30-class quality in ~20 steps — run "
                        "with --steps 20 (study: sdxl.py "
                        "--solver_study)")
    p.add_argument("--steps", type=int, default=30,
                   help="denoise steps (reference InferenceService "
                        "default, serve/worker.py:300)")
    p.add_argument("--no_sdxl", action="store_true",
                   help="comprehension-only stack (no UNet resident)")
    p.add_argument("--profile", type=str, default=None,
                   help="write a jax.profiler trace of the in-transaction "
                        "denoise run to this directory (diagnose the "
                        "resident-HBM slowdown step by step)")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="CPU wiring smoke (tiny configs, not a benchmark)")
    args = p.parse_args()

    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    import functools

    import jax.numpy as jnp
    import numpy as np

    from mllm_npu_tpu.models.language_models.llama import (
        LlamaConfig, LlamaForCausalLM, init_cache)
    from mllm_npu_tpu.models.mllm import SEED
    from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
        QwenViTConfig, VisionTransformerWithAttnPool)
    from mllm_npu_tpu.models.multimodal_projector.attention_resampler \
        import AttentionResampler

    # ---- build the stack (synthetic weights, real shapes) ----------------
    if args.tiny:
        lm_cfg = LlamaConfig.tiny(quantization="int4", scan_layers=False)
        vis_cfg = QwenViTConfig.tiny(image_size=28, quantization="int8")
        nq = 4
        args.prompt_tokens = min(args.prompt_tokens, 32)
        args.image_size = 64
        args.steps = 2
        args.decode_tokens = 8
    else:
        lm_cfg = LlamaConfig.llama2_13b(quantization="int4",
                                        fused_projections=args.fused,
                                        scan_layers=False)
        vis_cfg = QwenViTConfig.vit_g(quantization="int8")
        nq = 64

    grid = int(nq ** 0.5)
    feat_dim = 4096 if not args.tiny else vis_cfg.output_dim
    heads = 32 if not args.tiny else 4
    lm = LlamaForCausalLM(lm_cfg, dtype=jnp.bfloat16)
    vis = VisionTransformerWithAttnPool(vis_cfg, dtype=jnp.bfloat16)
    # input projector: ViT tokens (4096) → 64 × LLM hidden (5120); the
    # reference's attention resampler slots (seedx yaml projector:)
    proj = AttentionResampler(grid_size=grid, embed_dim=lm_cfg.hidden_size,
                              num_heads=heads, kv_dim=vis_cfg.output_dim,
                              dtype=jnp.bfloat16)
    # output projector: LLM hidden (5120) → 64 × 4096 diffusion features
    out_proj = AttentionResampler(grid_size=grid, embed_dim=feat_dim,
                                  num_heads=heads,
                                  kv_dim=lm_cfg.hidden_size,
                                  dtype=jnp.bfloat16)
    model = SEED(language_model=lm, vision_encoder=vis, projector=proj,
                 output_projector=out_proj, freeze_vision_encoder=True,
                 add_patch_pos=True, patch_pos_dim=lm_cfg.hidden_size,
                 vit_down=True, mse=True, num_img_out_tokens=nq)

    B, S, N = 1, args.prompt_tokens, args.images
    rs = np.random.RandomState(0)
    ids_cmp = np.zeros((B, S), bool)
    for i in range(N):
        ids_cmp[0, 2 + i * (nq + 2):2 + i * (nq + 2) + nq] = True
    input_ids = jnp.asarray(rs.randint(5, lm_cfg.vocab_size, (B, S)),
                            jnp.int32)
    images = jnp.asarray(rs.randn(N, vis_cfg.image_size,
                                  vis_cfg.image_size, 3), jnp.bfloat16)
    embeds_cmp = jnp.ones((N,), bool)
    ppos = jnp.asarray(rs.rand(N, 2), jnp.float32)

    t0 = time.time()
    params = model.init(
        jax.random.PRNGKey(0), input_ids, images,
        jnp.ones((B, S), jnp.int32), input_ids,
        jnp.zeros((N,), bool), embeds_cmp,
        jnp.zeros((B, S), bool), jnp.asarray(ids_cmp), ppos)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    print(f"MLLM init {time.time()-t0:.1f}s", file=sys.stderr)

    def tree_bytes(t):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(t))

    budget = {
        "llm_int4_gb": round(tree_bytes(
            params["params"]["language_model"]) / 2**30, 2),
        "vit_int8_gb": round(tree_bytes(
            params["params"]["vision_encoder"]) / 2**30, 2),
        "projectors_gb": round(
            (tree_bytes(params["params"]["projector"])
             + tree_bytes(params["params"]["output_projector"])) / 2**30,
            3),
    }

    # ---- SDXL de-tokenizer ------------------------------------------------
    adapter = None
    if not args.no_sdxl:
        from mllm_npu_tpu.models.generation.adapter_modules import (
            SDXLAdapter)
        from mllm_npu_tpu.models.generation.resampler import ResamplerXL
        from mllm_npu_tpu.models.generation.schedulers import (
            DPMSolverPP2MScheduler, EulerDiscreteScheduler)
        from mllm_npu_tpu.models.generation.unet import (
            UNet2DConditionModel, UNetConfig)
        from mllm_npu_tpu.models.generation.vae import (AutoencoderKL,
                                                        VAEConfig)
        dtype = jnp.bfloat16
        if args.tiny:
            ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
            args.image_size = (ucfg.sample_size
                               * vcfg.spatial_scale_factor)
            res = ResamplerXL(dim=32, depth=1, dim_head=8, heads=4,
                              num_queries=4, embedding_dim=feat_dim,
                              output1_dim=32, output2_dim=32,
                              dtype=dtype, param_dtype=dtype)
        else:
            ucfg = UNetConfig.sdxl_base(sample_size=args.image_size // 8)
            vcfg = VAEConfig.sdxl()
            res = ResamplerXL(dim=1024, depth=4, dim_head=64, heads=16,
                              num_queries=64, embedding_dim=4096,
                              output1_dim=768, output2_dim=1280,
                              dtype=dtype, param_dtype=dtype)
        unet = UNet2DConditionModel(ucfg, dtype=dtype, param_dtype=dtype)
        vae = AutoencoderKL(vcfg, dtype=dtype, param_dtype=dtype)
        Sl = ucfg.sample_size
        pooled_dim = (ucfg.projection_class_embeddings_input_dim
                      - 6 * ucfg.addition_time_embed_dim)
        t0 = time.time()
        unet_params = jax.jit(unet.init)(
            jax.random.PRNGKey(1),
            jnp.ones((1, Sl, Sl, ucfg.in_channels), dtype), jnp.ones((1,)),
            jnp.ones((1, 64, ucfg.cross_attention_dim), dtype),
            {"text_embeds": jnp.ones((1, pooled_dim), dtype),
             "time_ids": jnp.ones((1, 6), dtype)})
        vae_params = jax.jit(vae.init)(
            jax.random.PRNGKey(2), jnp.ones((1, 64, 64, 3), dtype))
        res_params = jax.jit(res.init)(
            jax.random.PRNGKey(3), jnp.ones((1, nq, feat_dim), dtype))
        print(f"SDXL init {time.time()-t0:.1f}s", file=sys.stderr)
        adapter = SDXLAdapter(unet_module=unet, unet_params=unet_params,
                              resampler_module=res,
                              resampler_params=res_params,
                              vit_down=True)
        # --scheduler dpm: second-order DPM-Solver++ 2M — reaches
        # euler-30 quality in ~20 steps (order proven in
        # tests/test_detokenizer.py; image-space study:
        # benchmarks/sdxl.py --solver_study), cutting the denoise leg
        # — the transaction's dominant term — by ~1/3
        sched = (DPMSolverPP2MScheduler() if args.scheduler == "dpm"
                 else EulerDiscreteScheduler())
        adapter.init_pipe(vae, vae_params,
                          scheduler=sched,
                          visual_encoder=(
                              vis, {"params":
                                    params["params"]["vision_encoder"]}))
        budget["unet_bf16_gb"] = round(tree_bytes(unet_params) / 2**30, 2)
        budget["vae_bf16_gb"] = round(tree_bytes(vae_params) / 2**30, 3)
        budget["sdxl_resampler_gb"] = round(tree_bytes(res_params) / 2**30,
                                            3)

    # ---- jitted phases ----------------------------------------------------
    max_len = S + max(args.decode_tokens, nq) + 2

    @jax.jit
    def prefill(params, input_ids, images, embeds_cmp, ids_cmp, ppos):
        embeds, _ = model.apply(params, input_ids, images, embeds_cmp,
                                ids_cmp, ppos,
                                method=model.embed_and_scatter)
        cache = init_cache(lm_cfg, B, max_len, dtype=jnp.bfloat16)

        def fwd(m, **kw):
            return m.language_model(**kw)
        logits, _, cache = model.apply(params, inputs_embeds=embeds,
                                       cache=cache, prefill=True,
                                       method=fwd)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    @functools.partial(jax.jit, static_argnums=(3,))
    def decode_n(params, tok, cache, n):
        """n greedy steps; also returns the last-hidden window of the
        final `nq` steps (the forced-ladder image-token hiddens) and the
        emitted token chain (for the burst parity check)."""
        def fwd(m, ids, **kw):
            return m.language_model(ids, **kw)

        def body(i, carry):
            tok, cache, win, chain = carry
            logits, h, cache = model.apply(params, tok[:, None],
                                           cache=cache, method=fwd)
            win = jnp.roll(win, -1, axis=1).at[:, -1].set(
                h[:, -1].astype(jnp.bfloat16))
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            chain = chain.at[:, i].set(nxt)
            return (nxt, cache, win, chain)
        win0 = jnp.zeros((B, nq, lm_cfg.hidden_size), jnp.bfloat16)
        chain0 = jnp.zeros((B, n), jnp.int32)
        tok, cache, win, chain = jax.lax.fori_loop(
            0, n, body, (tok, cache, win0, chain0))
        return tok, win, chain

    @functools.partial(jax.jit, donate_argnums=(2,))
    def ladder_burst(params, toks, cache):
        """The forced image-token ladder is a KNOWN constant once
        ``<img>`` is emitted (reference mllm.py:28-43 forces it one
        step at a time) — equivalently, full-width ladder speculation
        (sampler.ladder_propose): ONE nq-token forward yields the same
        hiddens as nq sequential decode steps. Cache is donated so the
        KV append is in-place, as the serving engine does."""
        def fwd(m, ids, **kw):
            return m.language_model(ids, **kw)
        _, h, cache = model.apply(params, toks, cache=cache, method=fwd)
        return h.astype(jnp.bfloat16), cache

    @jax.jit
    def project(params, win):
        def oproj(m, x):
            return m.output_projector(x)
        return model.apply(params, win, method=oproj)

    ids_cmp_j = jnp.asarray(ids_cmp)

    def run_prefill():
        t0 = time.perf_counter()
        tok, cache = prefill(params, input_ids, images, embeds_cmp,
                             ids_cmp_j, ppos)
        _ = int(tok[0])
        return time.perf_counter() - t0, tok, cache

    _, tok, cache = run_prefill()          # compile
    prefill_ts = []
    for _ in range(args.runs):
        dt, tok, cache = run_prefill()
        prefill_ts.append(dt)

    # decode slope (cancels harness round-trip)
    n1, n2 = args.decode_tokens // 4, args.decode_tokens
    for n in (n1, n2):
        jax.block_until_ready(decode_n(params, tok, cache, n))

    def timed_decode(n):
        best = 1e9
        for _ in range(max(args.runs, 3)):
            t0 = time.perf_counter()
            out, _, _ = decode_n(params, tok, cache, n)
            _ = int(out[0])
            best = min(best, time.perf_counter() - t0)
        return best

    per_tok = (timed_decode(n2) - timed_decode(n1)) / (n2 - n1)

    # forced-ladder image-token leg: 64 decode steps with hidden capture
    jax.block_until_ready(decode_n(params, tok, cache, nq))
    t0 = time.perf_counter()
    _, win, chain = decode_n(params, tok, cache, nq)
    jax.block_until_ready(win)
    img_decode_s = time.perf_counter() - t0

    # ladder burst: the nq forced tokens in ONE multi-token forward
    # (what the serving engine's ladder-aware speculation converges to)
    burst_toks = jnp.concatenate([tok[:, None], chain[:, :nq - 1]],
                                 axis=1)                    # [B, nq]

    def run_burst():
        cb = jax.tree_util.tree_map(jnp.copy, cache)  # donated per call
        jax.block_until_ready(cb)
        t0 = time.perf_counter()
        win_b, _ = ladder_burst(params, burst_toks, cb)
        jax.block_until_ready(win_b)
        return time.perf_counter() - t0, win_b

    _, win_b = run_burst()                                  # compile
    img_burst_s = min(run_burst()[0] for _ in range(max(args.runs, 3)))
    # parity: the burst hiddens ARE the sequential hiddens (same tokens,
    # same positions; multi-token vs per-step attention is exact math).
    # Scale-aware bound: bf16 rounding scales with the hidden magnitude,
    # so a fixed absolute max|d| threshold is regime-dependent (too
    # tight on a large-activation checkpoint, too loose on a small
    # one). Use a per-row cosine floor instead — a positions/
    # cache-offset bug decorrelates whole rows at any magnitude —
    # plus an RMS-relative max|d| report for the log.
    wf = win.astype(jnp.float32)
    bf = win_b.astype(jnp.float32)
    dw = float(jnp.max(jnp.abs(bf - wf)))
    rms = float(jnp.sqrt(jnp.mean(wf * wf)))
    norm = lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    cos_min = float(jnp.min(jnp.sum(norm(wf) * norm(bf), axis=-1)))
    assert cos_min > 0.999, \
        (f"burst hidden mismatch: min row cosine={cos_min}, "
         f"max|d|={dw} (hidden RMS={rms})")
    win = win_b

    feats = project(params, win)
    jax.block_until_ready(feats)           # compile
    t0 = time.perf_counter()
    feats = project(params, win)
    jax.block_until_ready(feats)
    project_s = time.perf_counter() - t0

    out = {
        "model": "seedx_llama2_13b_qwenvl_vitg",
        "llm": "llama2-13b int4", "vit": "qwen-vit-g int8",
        "prompt_tokens": S, "images_448": N,
        "hbm_budget": budget,
        "first_token_p50_ms": round(
            statistics.median(prefill_ts) * 1e3, 1),
        "first_token_min_ms": round(min(prefill_ts) * 1e3, 1),
        "decode_ms_per_token": round(per_tok * 1e3, 2),
        "decode_tokens_per_sec": round(1.0 / per_tok, 1),
    }

    if adapter is not None:
        # image-out leg through the adapter's real public path
        # (negative ViT pass + ResamplerXL + 30-step CFG UNet + VAE
        # + host fetch → PIL)
        imgs = adapter.generate(image_embeds=feats,
                                height=args.image_size,
                                width=args.image_size,
                                num_inference_steps=args.steps)  # compile
        ts = []
        for _ in range(max(args.runs // 2, 2)):
            t0 = time.perf_counter()
            imgs = adapter.generate(image_embeds=feats,
                                    height=args.image_size,
                                    width=args.image_size,
                                    num_inference_steps=args.steps)
            ts.append(time.perf_counter() - t0)
        denoise_s = statistics.median(ts)

        # attribute generate() time: embeds (neg+resampler) vs
        # device-side denoise+VAE vs host fetch+PIL — the isolated
        # sdxl.py number only covers the middle term, so this is what
        # explains any in-transaction vs isolated gap
        import numpy as _np

        from mllm_npu_tpu.models.generation.adapter_modules import (
            _postprocess_u8, compute_time_ids)
        t0 = time.perf_counter()
        pe, pe_neg, pooled, pooled_neg = adapter.get_image_embeds(
            image_embeds=feats, return_negative=True, image_size=448)
        jax.block_until_ready((pe, pooled))
        embeds_s = time.perf_counter() - t0
        B = pe.shape[0]
        f = adapter.vae_module.config.spatial_scale_factor
        lat = jax.random.normal(
            jax.random.PRNGKey(42),
            (B, args.image_size // f, args.image_size // f, 4),
            jnp.float32) * adapter.scheduler.init_noise_sigma
        tids = jnp.asarray(_np.repeat(
            compute_time_ids((args.image_size, args.image_size), (0, 0),
                             args.image_size), B, axis=0))
        run = adapter._denoise_fn(args.steps, args.image_size,
                                  args.image_size)
        if args.profile:
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        imgs_dev = run(adapter.unet_params, adapter.vae_params, lat, pe,
                       pe_neg, pooled, pooled_neg, tids, jnp.float32(7.5))
        jax.block_until_ready(imgs_dev)
        device_denoise_s = time.perf_counter() - t0
        if args.profile:
            jax.profiler.stop_trace()
            print(f"profile trace written to {args.profile}",
                  file=sys.stderr)
        t0 = time.perf_counter()
        u8 = _np.asarray(_postprocess_u8(imgs_dev))
        fetch_s = time.perf_counter() - t0

        out["image_out"] = {
            "size": args.image_size, "steps": args.steps,
            "scheduler": args.scheduler,
            "img_token_decode_ms": round(img_decode_s * 1e3, 1),
            "img_token_burst_ms": round(img_burst_s * 1e3, 1),
            "project_ms": round(project_s * 1e3, 2),
            "denoise_vae_s": round(denoise_s, 3),
            "breakdown": {
                "embeds_s": round(embeds_s, 3),
                "device_denoise_vae_s": round(device_denoise_s, 3),
                "device_ms_per_cfg_step": round(
                    device_denoise_s / args.steps * 1e3, 1),
                "host_fetch_pil_s": round(fetch_s, 3),
            },
            # the production transaction uses the ladder BURST: serve
            # with `worker --speculative-k 63` and ONE verify tick
            # spans the 64 forced tokens (ladder-aware drafting emits
            # k+1/tick; k = ladder width - 1 -> one forward — the
            # engine path is parity-tested at full ladder width in
            # tests/test_batched_engine.py::
            # test_speculative_full_ladder_burst_single_tick). The
            # sequential figure is kept for comparison
            "transaction_s": round(
                statistics.median(prefill_ts) + img_burst_s
                + project_s + denoise_s, 3),
            "transaction_sequential_ladder_s": round(
                statistics.median(prefill_ts) + img_decode_s
                + project_s + denoise_s, 3),
        }
        assert imgs[0].size == (args.image_size, args.image_size)

    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        out["hbm_in_use_gb"] = round(
            stats.get("bytes_in_use", 0) / 2**30, 2)
        out["hbm_peak_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / 2**30, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
