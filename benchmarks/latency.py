"""Serving latency harness: image+prompt → first-token latency and
decode throughput (BASELINE.md metric #2).

Measures the two jitted phases separately:
- prefill: vision encode + projector + scatter + LLM forward over the
  prompt with cache write + first-token argmax
- decode: per-token step latency (cache read/write + single-token LLM)

  python benchmarks/latency.py --preset 500m --runs 20
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
    p.add_argument("--preset", choices=["tiny", "500m", "8b", "13b"],
               default="500m")
    p.add_argument("--runs", type=int, default=20)
    p.add_argument("--prompt_tokens", type=int, default=512)
    p.add_argument("--patches", type=int, default=5)
    p.add_argument("--decode_tokens", type=int, default=32)
    p.add_argument("--fp32_weights", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only LLM (ops/quant.py)")
    p.add_argument("--int4", action="store_true",
                   help="int4 group-scale weight-only LLM (half int8's "
                        "weight streaming)")
    p.add_argument("--fused", action="store_true",
                   help="fused qkv/gate_up projections")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="also measure prompt-lookup speculative decode "
                        "(sampler.speculative_decode_loop) with K "
                        "proposals per verify forward. Reports the "
                        "per-verify-forward cost (the hardware fact: "
                        "decode is weight-streaming-bound, so a K+1-"
                        "token verify costs ~one single-token step) and "
                        "this run's tokens/verify (acceptance — "
                        "workload-dependent; random weights decode "
                        "degenerately-repetitive text, which prompt-"
                        "lookup accepts at a high rate, so this harness "
                        "lands near the BEST case; real speedup = "
                        "tokens-per-verify x step/verify-cost ratio)")
    p.add_argument("--spec_ngram", type=int, default=3)
    args = p.parse_args()
    assert not (args.int8 and args.int4), "pick one of --int8 / --int4"

    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mllm_npu_tpu.models.language_models.llama import (
        LlamaConfig, LlamaForCausalLM, init_cache)
    from mllm_npu_tpu.models.mllm import GeneralizedMultimodalModel
    from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
        SigLIPConfig, SigLIPVisionEncoder)
    from mllm_npu_tpu.models.multimodal_projector.attention_resampler \
        import AttentionResampler

    if args.preset == "tiny":
        lm_cfg = LlamaConfig.tiny()
        vis_cfg = SigLIPConfig.tiny()
        nq, heads = 4, 4
    elif args.preset == "8b":
        # Llama-3-8B on one 16GB v5e: int8 weights are REQUIRED (bf16
        # alone is 16GB); the model is built quantized from the start so
        # init allocates int8 kernels directly (a float init + convert
        # would OOM). --fused likewise folds into the initial config.
        assert args.int8 or args.int4, \
            "8B on a 16GB chip requires --int8 or --int4"
        # scan_layers=False: nn.scan's per-layer weight slicing
        # materializes a full copy of each int8 kernel every decode
        # step (pallas operands can't fuse a dynamic-slice the way XLA
        # dots do) — profiled at ~9ms/token of pure copy at 8B.
        # Unrolled layers feed the kernels straight from HBM.
        lm_cfg = LlamaConfig.llama3_8b(
            quantization="int4" if args.int4 else "int8",
            fused_projections=args.fused,
            scan_layers=False)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 32
    elif args.preset == "13b":
        # SEED-X flagship: Llama-2-13B + Qwen-ViT-G-448 (the reference's
        # published serving stack, configs/models/
        # seedx_llama2_13b_qwenvl_vitg.yaml). HBM budget on a 16GB v5e:
        # int4 LLM 6.7GB + int8 ViT-G 2.0GB + MHA KV cache 0.82MB/token;
        # int8 LLM is 13.2GB and does NOT leave room for the ViT tower.
        assert args.int4, "13B on a 16GB chip requires --int4"
        lm_cfg = LlamaConfig.llama2_13b(
            quantization="int4", fused_projections=args.fused,
            scan_layers=False)
        from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
            QwenViTConfig)
        vis_cfg = QwenViTConfig.vit_g(quantization="int8")
        nq, heads = 64, 32
    else:
        lm_cfg = LlamaConfig(
            vocab_size=32000, hidden_size=1536, intermediate_size=4096,
            num_hidden_layers=16, num_attention_heads=16,
            num_key_value_heads=8, max_position_embeddings=4096)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 16

    lm = LlamaForCausalLM(lm_cfg, dtype=jnp.bfloat16)
    if args.preset == "13b":
        from mllm_npu_tpu.models.multimodal_encoder.qwenvl_vit import (
            VisionTransformerWithAttnPool)
        vis = VisionTransformerWithAttnPool(vis_cfg, dtype=jnp.bfloat16)
        vis_kv_dim = vis_cfg.output_dim
    else:
        vis = SigLIPVisionEncoder(vis_cfg, dtype=jnp.bfloat16)
        vis_kv_dim = vis_cfg.hidden_size
    proj = AttentionResampler(grid_size=int(nq ** 0.5),
                              embed_dim=lm_cfg.hidden_size,
                              num_heads=heads, kv_dim=vis_kv_dim,
                              dtype=jnp.bfloat16)
    model = GeneralizedMultimodalModel(
        language_model=lm, vision_encoder=vis, projector=proj,
        freeze_vision_encoder=True, add_patch_pos=True,
        patch_pos_dim=lm_cfg.hidden_size)

    B, S, N = 1, args.prompt_tokens, args.patches
    rs = np.random.RandomState(0)
    ids_cmp = np.zeros((B, S), bool)
    pos = 2
    for i in range(N):
        ids_cmp[0, pos + i * (nq + 2):pos + i * (nq + 2) + nq] = True
    input_ids = jnp.asarray(rs.randint(5, lm_cfg.vocab_size, (B, S)),
                            jnp.int32)
    images = jnp.asarray(rs.randn(N, vis_cfg.image_size,
                                  vis_cfg.image_size, 3), jnp.bfloat16)
    embeds_cmp = jnp.ones((N,), bool)
    ppos = jnp.asarray(rs.rand(N, 2), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), input_ids, images,
        jnp.ones((B, S), jnp.int32), input_ids,
        jnp.zeros((N,), bool), embeds_cmp,
        jnp.zeros((B, S), bool), jnp.asarray(ids_cmp), ppos)
    if not args.fp32_weights:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            params)
    from mllm_npu_tpu.models.generation.generate import rebuild_llm
    from mllm_npu_tpu.utils.weights import (fuse_llama_projections,
                                            quantize_llama_params)
    if args.fused and args.preset != "8b":
        model, lm_cfg, params = rebuild_llm(
            model, lm_cfg, params, fuse_llama_projections,
            fused_projections=True)
    if args.int8 and args.preset != "8b":
        model, lm_cfg, params = rebuild_llm(
            model, lm_cfg, params, quantize_llama_params,
            quantization="int8")
    if args.int4 and args.preset != "8b":
        gs = lm_cfg.quant_group_size
        model, lm_cfg, params = rebuild_llm(
            model, lm_cfg, params,
            lambda p_: quantize_llama_params(p_, bits=4, group_size=gs),
            quantization="int4")

    max_len = S + args.decode_tokens + (
        args.speculative + 1 if args.speculative else 0)

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

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def decode_n(params, tok, cache, n):
        def fwd(m, ids, **kw):
            return m.language_model(ids, **kw)

        def body(i, carry):
            tok, cache = carry
            logits, _, cache = model.apply(params, tok[:, None],
                                           cache=cache, method=fwd)
            return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), \
                cache
        tok, cache = jax.lax.fori_loop(0, n, body, (tok, cache))
        return tok

    ids_cmp_j = jnp.asarray(ids_cmp)
    tok, cache = prefill(params, input_ids, images, embeds_cmp, ids_cmp_j,
                         ppos)
    _ = int(tok[0])  # force

    prefill_times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        tok, cache = prefill(params, input_ids, images, embeds_cmp,
                             ids_cmp_j, ppos)
        _ = int(tok[0])
        prefill_times.append(time.perf_counter() - t0)

    # slope between two decode lengths: cancels the fixed dispatch+fetch
    # round-trip of the harness (~26 ms through the axon relay), which
    # would otherwise inflate ms/token at small decode counts
    n1, n2 = args.decode_tokens // 4, args.decode_tokens
    for n in (n1, n2):
        _ = int(decode_n(params, tok, cache, n)[0])   # compile

    def timed(n):
        best = 1e9
        for _ in range(max(args.runs // 2, 5)):
            t0 = time.perf_counter()
            _ = int(decode_n(params, tok, cache, n)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    per_tok = (timed(n2) - timed(n1)) / (n2 - n1)

    # fixed harness round-trip (dispatch + value fetch): prefill numbers
    # include exactly one of these; subtract for on-host latency
    @jax.jit
    def _null(x):
        return x + 1
    _ = float(_null(jnp.zeros(()))[()])
    rtt = min(float('inf'), *[
        (lambda t0: (float(_null(jnp.zeros(()))[()]), time.perf_counter()
                     - t0)[1])(time.perf_counter())
        for _ in range(10)])

    out = {
        "harness_rtt_ms": round(rtt * 1e3, 2),
        "first_token_onhost_ms": round(
            (statistics.median(prefill_times) - rtt) * 1e3, 2),
        "preset": args.preset, "int8": args.int8, "int4": args.int4,
        "prompt_tokens": S, "image_patches": N,
        "first_token_p50_ms": round(
            statistics.median(prefill_times) * 1e3, 2),
        "first_token_min_ms": round(min(prefill_times) * 1e3, 2),
        "decode_ms_per_token": round(per_tok * 1e3, 3),
        "decode_tokens_per_sec": round(1.0 / per_tok, 1),
    }

    if args.speculative:
        # Prompt-lookup speculative decode (models/generation/sampler.py
        # speculative_decode_loop — the path MLLMGenerator takes with
        # speculative_k > 0). See --speculative help for how to read
        # the numbers.
        from mllm_npu_tpu.models.generation.sampler import (
            SamplingConfig, speculative_decode_loop)
        k = args.speculative

        def make_spec(n_tokens):
            scfg = SamplingConfig(max_new_tokens=n_tokens,
                                  do_sample=False, eos_token_id=-1)

            @jax.jit
            def run(params_, tok, cache_, ids):
                def step_multi(toks, c):
                    # params_ from run's args — closing over the outer
                    # `params` would bake 8GB of weights into the
                    # program as constants
                    pos_t = c["pos"] + jax.lax.broadcasted_iota(
                        jnp.int32, (1, k + 1), 1)

                    def fwd(m, ids_, **kw):
                        return m.language_model(ids_, **kw)
                    logits, h, c = model.apply(params_, toks, cache=c,
                                               positions=pos_t,
                                               method=fwd)
                    return logits, h, c

                tokens, _, _, n_iters = speculative_decode_loop(
                    step_multi, cache_, tok,
                    jnp.zeros((1, lm_cfg.hidden_size), jnp.bfloat16),
                    scfg, ids, k=k, ngram=args.spec_ngram)
                return tokens, n_iters
            return run

        def spec_timed(n_tokens):
            run = make_spec(n_tokens)
            toks, n_iters = run(params, tok, cache, input_ids)
            jax.block_until_ready(toks)   # compile + warm
            best = 1e9
            for _ in range(max(args.runs // 2, 5)):
                t0 = time.perf_counter()
                toks, n_iters = run(params, tok, cache, input_ids)
                jax.block_until_ready(toks)
                best = min(best, time.perf_counter() - t0)
            return best, int(n_iters)

        ns1, ns2 = args.decode_tokens // 4, args.decode_tokens
        (t_lo, iters_lo), (t_hi, iters_hi) = spec_timed(ns1), \
            spec_timed(ns2)
        per_tok_spec = (t_hi - t_lo) / (ns2 - ns1)
        d_iters = max(iters_hi - iters_lo, 1)
        per_verify = (t_hi - t_lo) / d_iters
        out.update({
            "spec_k": k, "spec_ngram": args.spec_ngram,
            "spec_verify_iters": iters_hi,
            # this run's acceptance: tokens emitted per verify forward
            "spec_tokens_per_verify": round((ns2 - ns1) / d_iters, 2),
            # the hardware fact: a (K+1)-position verify forward vs one
            # single-token step (≈1 when decode is weight-bound)
            "spec_verify_ms": round(per_verify * 1e3, 3),
            "spec_verify_vs_step_cost": round(per_verify / per_tok, 3),
            "spec_ms_per_token": round(per_tok_spec * 1e3, 3),
            "spec_tokens_per_sec": round(1.0 / per_tok_spec, 1),
        })

    print(json.dumps(out))


if __name__ == "__main__":
    main()
