"""Serving throughput: continuous-batching aggregate tokens/sec.

Measures the ContinuousBatchingEngine at the 500m preset with N
concurrent synthetic requests, against the single-request decode rate
(benchmarks/latency.py). Decode is HBM-bandwidth-bound, so batching
slots multiplies tokens/sec until compute saturates.

Timing uses two different decode lengths and takes the slope, which
cancels the fixed host<->device round-trip of the measurement harness
(the axon relay adds ~26 ms per value fetch; a naive total/steps figure
would understate throughput).

  python benchmarks/throughput.py --slots 8 --prompt_tokens 128
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["tiny", "500m", "8b", "13b"],
               default="500m")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--prompt_tokens", type=int, default=128)
    p.add_argument("--max_len", type=int, default=512)
    p.add_argument("--block_steps", type=int, default=32)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int4", action="store_true",
                   help="int4 group-scale weight-only LLM")
    p.add_argument("--kv", choices=["bf16", "fp8", "f32"],
                   default="bf16",
                   help="KV cache storage dtype: fp8 (e4m3) halves the "
                        "cache's HBM footprint + per-tick read traffic "
                        "— decisive for no-GQA models (13b preset: "
                        "0.8 MB/token/slot bf16)")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--unroll", action="store_true",
                   help="per-layer params (scan_layers=False): int8 "
                        "kernels read weights without scan-slice copies")
    p.add_argument("--prefill_chunk", type=int, default=None,
                   help="admit prompts N tokens per tick (chunked "
                        "prefill) instead of one monolithic prefill")
    p.add_argument("--prefix_cache", type=int, default=None,
                   help="enable the prompt-prefix KV cache (N entries)")
    p.add_argument("--prefix_probe", type=int, default=0, metavar="PL",
                   help="measure time-to-first-token for a prompt whose "
                        "first PL tokens are a cached shared prefix "
                        "(system prompt) vs a cold prompt of the same "
                        "length; requires --prefix_cache")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="per-slot prompt-lookup speculative decode in "
                        "the batching engine (one K+1-wide verify per "
                        "tick instead of a block_steps scan); reports "
                        "realized aggregate tok/s + tokens/verify for "
                        "THIS harness's workload (random-weight decode "
                        "is degenerately repetitive — near best-case; "
                        "real-text acceptance: spec_acceptance.py)")
    p.add_argument("--mixed_sampling", action="store_true",
                   help="with --speculative: half the slots sample "
                        "(temperature 0.8) — they ride the same verify "
                        "forward at 1 token/tick")
    p.add_argument("--kv_parity", type=int, default=0, metavar="N",
                   help="decode N greedy tokens from the same prompt "
                        "with --kv and with the other cache dtype "
                        "(bf16<->fp8), report token match-rate + "
                        "longest shared prefix — the fp8 quality row "
                        "next to its speed row (VERDICT r4 #2b)")
    p.add_argument("--stall_probe", type=int, default=0, metavar="SP",
                   help="measure the decode stall a long (SP-token) "
                        "prompt admission inflicts on running slots: "
                        "per-tick wall times before/during admission "
                        "(the chunked-prefill value proposition — "
                        "compare --prefill_chunk on/off)")
    args = p.parse_args()
    assert not (args.int8 and args.int4), "pick one of --int8 / --int4"

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
    from mllm_npu_tpu.serve.batched_engine import ContinuousBatchingEngine

    if args.preset == "tiny":
        lm_cfg = LlamaConfig.tiny()
        vis_cfg = SigLIPConfig.tiny()
        nq, heads = 4, 4
    elif args.preset == "8b":
        # flagship on one 16GB v5e: int8 + unrolled layers required
        # (see benchmarks/latency.py 8b preset for the rationale)
        assert (args.int8 or args.int4) and args.unroll, \
            "8B needs --int8/--int4 --unroll"
        lm_cfg = LlamaConfig.llama3_8b(
            quantization="int4" if args.int4 else "int8",
            fused_projections=args.fused,
            scan_layers=False)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 32
    elif args.preset == "13b":
        # SEED-X flagship LLM (Llama-2-13B has NO GQA — 40 kv heads —
        # so the bf16 KV cache, 0.8 MB/token/slot, not the int4
        # weights, bounds slots x context on one 16GB v5e); the
        # Qwen-ViT-G int8 tower is kept resident as it is in serving
        assert (args.int8 or args.int4) and args.unroll, \
            "13B needs --int8/--int4 --unroll"
        lm_cfg = LlamaConfig.llama2_13b(
            quantization="int4" if args.int4 else "int8",
            fused_projections=args.fused,
            scan_layers=False)
        vis_cfg = None                      # Qwen-ViT-G, built below
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
            QwenViTConfig, VisionTransformerWithAttnPool)
        vis_cfg = QwenViTConfig.vit_g(quantization="int8")
        vis = VisionTransformerWithAttnPool(vis_cfg, dtype=jnp.bfloat16)
        kv_dim = vis_cfg.output_dim
    else:
        vis = SigLIPVisionEncoder(vis_cfg, dtype=jnp.bfloat16)
        kv_dim = vis_cfg.hidden_size
    proj = AttentionResampler(grid_size=int(nq ** 0.5),
                              embed_dim=lm_cfg.hidden_size,
                              num_heads=heads, kv_dim=kv_dim,
                              dtype=jnp.bfloat16)
    model = GeneralizedMultimodalModel(
        language_model=lm, vision_encoder=vis, projector=proj,
        freeze_vision_encoder=True, add_patch_pos=True,
        patch_pos_dim=lm_cfg.hidden_size)

    rs = np.random.RandomState(0)
    S = args.prompt_tokens
    ids = jnp.asarray(rs.randint(5, lm_cfg.vocab_size, (1, S)), jnp.int32)
    if args.preset == "13b":
        # init WITH an image so the int8 ViT-G tower params materialize
        # and stay resident — throughput is then measured at the true
        # serving HBM headroom (flax only creates called modules)
        img = jnp.asarray(rs.randn(1, vis_cfg.image_size,
                                   vis_cfg.image_size, 3), jnp.bfloat16)
        # the scatter below needs nq True positions after the 2-token
        # lead-in; a shorter prompt silently truncates the numpy slice
        # and the image-embed count no longer matches the resampler
        assert S >= nq + 2, (
            f"--preset 13b needs --prompt_tokens >= {nq + 2} "
            f"(the {nq} image-embed positions + 2 lead-in tokens); "
            f"got {S}")
        ids_cmp = np.zeros((1, S), bool)
        ids_cmp[0, 2:2 + nq] = True
        params = model.init(
            jax.random.PRNGKey(0), ids, img,
            jnp.ones((1, S), jnp.int32), ids, None,
            jnp.ones((1,), bool),
            jnp.zeros((1, S), bool), jnp.asarray(ids_cmp),
            jnp.asarray(rs.rand(1, 2), jnp.float32))
    else:
        params = model.init(
            jax.random.PRNGKey(0), ids, None,
            jnp.ones((1, S), jnp.int32), ids, None, None,
            jnp.zeros((1, S), bool), jnp.zeros((1, S), bool), None)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    from mllm_npu_tpu.models.generation.generate import rebuild_llm
    from mllm_npu_tpu.utils.weights import (fuse_llama_projections,
                                            quantize_llama_params,
                                            unstack_llama_params)
    if args.fused and args.preset not in ("8b", "13b"):
        model, lm_cfg, params = rebuild_llm(
            model, lm_cfg, params, fuse_llama_projections,
            fused_projections=True)
    if args.int8 and args.preset not in ("8b", "13b"):
        model, lm_cfg, params = rebuild_llm(
            model, lm_cfg, params, quantize_llama_params,
            quantization="int8")
    if args.int4 and args.preset not in ("8b", "13b"):
        gs = lm_cfg.quant_group_size
        model, lm_cfg, params = rebuild_llm(
            model, lm_cfg, params,
            lambda p_: quantize_llama_params(p_, bits=4, group_size=gs),
            quantization="int4")
    if args.unroll and args.preset not in ("8b", "13b"):
        model, lm_cfg, params = rebuild_llm(
            model, lm_cfg, params, unstack_llama_params,
            scan_layers=False)

    # One engine; time blocks 2..N of a continuous run (slope past the
    # first timed point cancels prefill + compile + fixed RTT).
    # prefix-probe mode: the cache aligns prefixes to the prompt bucket,
    # so the bucket must be the shared-prefix length (not the full
    # prompt) for the shared prefix to be reusable
    bucket = args.prefix_probe if args.prefix_probe else S
    kv_map = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn,
              "f32": jnp.float32}
    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=args.slots,
        max_len=args.max_len, block_steps=args.block_steps,
        prompt_bucket=bucket, eos_token_id=-1,
        cache_dtype=kv_map[args.kv],
        prefill_chunk=args.prefill_chunk,
        prefix_cache=args.prefix_cache,
        speculative_k=args.speculative,
        enable_sampling=args.mixed_sampling)

    if args.kv_parity:
        other = "bf16" if args.kv != "bf16" else "fp8"
        N = args.kv_parity
        assert eng.capacity_for(S) >= N, "raise --max_len for kv_parity"
        eng2 = ContinuousBatchingEngine(
            model, lm_cfg, params, num_slots=args.slots,
            max_len=args.max_len, block_steps=args.block_steps,
            prompt_bucket=bucket, eos_token_id=-1,
            cache_dtype=kv_map[other])

        def stream(e):
            r = e.submit(np.asarray(ids[0]), max_new_tokens=N)
            e.run_until_idle()
            return r.tokens

        a, b = stream(eng), stream(eng2)
        match = sum(x == y for x, y in zip(a, b))
        shared = 0
        for x, y in zip(a, b):
            if x != y:
                break
            shared += 1
        print(json.dumps({
            "preset": args.preset, "int8": args.int8, "int4": args.int4,
            "kv_a": args.kv, "kv_b": other, "prompt_tokens": S,
            "decoded": N, "match_rate": round(match / N, 4),
            "shared_prefix": shared,
        }))
        return
    if args.prefix_probe:
        _prefix_probe(args, eng, lm_cfg, rs)
        return
    if args.stall_probe:
        _stall_probe(args, eng, ids, lm_cfg, rs)
        return
    if args.speculative:
        # emissions per tick vary with acceptance: meter tokens
        # distributed to requests over a window of ticks (the pipelined
        # one-tick lag cancels in the slope)
        W = args.speculative + 1
        n_warm, n_meas = 6, 24
        budget = W * (n_warm + n_meas) + 8
        assert eng.capacity_for(S) >= budget, \
            "raise --max_len for the speculative budget"
        reqs = [eng.submit(np.asarray(ids[0]), max_new_tokens=budget,
                           do_sample=args.mixed_sampling and (i % 2 == 1),
                           temperature=0.8, seed=i)
                for i in range(args.slots)]
        for _ in range(n_warm):
            eng.step()
        count = lambda: sum(len(r.tokens) for r in reqs)
        c0, t0 = count(), time.perf_counter()
        for _ in range(n_meas):
            eng.step()
        dt = time.perf_counter() - t0
        emitted = count() - c0
        print(json.dumps({
            "preset": args.preset, "slots": args.slots,
            "int8": args.int8, "int4": args.int4, "fused": args.fused,
            "speculative_k": args.speculative,
            "mixed_sampling": args.mixed_sampling,
            "prompt_tokens": S,
            "agg_tokens_per_sec": round(emitted / dt, 1),
            "tokens_per_verify_per_slot": round(
                emitted / (n_meas * args.slots), 2),
            "verify_ticks_per_sec": round(n_meas / dt, 2),
        }))
        return
    n_warm, n_meas = 2, 8
    budget = args.block_steps * (n_warm + n_meas) + 2
    reqs = [eng.submit(np.asarray(ids[0]), max_new_tokens=budget)
            for _ in range(args.slots)]
    for _ in range(n_warm):
        eng.step()            # includes compile of prefill+decode
    # the engine isolates per-request failures (a production property);
    # a benchmark must NOT silently time an empty engine — surface the
    # first admission error (e.g. HBM OOM at this slots x context
    # x kv-dtype operating point) instead of printing garbage
    errs = [r.error for r in reqs if getattr(r, "error", None)]
    if errs:
        raise SystemExit(
            f"{len(errs)}/{args.slots} requests failed at admission — "
            f"first error:\n{errs[0]}")
    t0 = time.perf_counter()
    for _ in range(n_meas):
        eng.step()
    dt = time.perf_counter() - t0
    n_tok = n_meas * args.block_steps * args.slots
    tok_per_sec = n_tok / dt
    per_tok_ms = 1e3 * args.slots / tok_per_sec

    print(json.dumps({
        "preset": args.preset, "slots": args.slots,
        "int8": args.int8, "int4": args.int4, "fused": args.fused,
        "kv": args.kv,
        "prompt_tokens": S, "block_steps": args.block_steps,
        "agg_tokens_per_sec": round(tok_per_sec, 1),
        "step_ms_all_slots": round(per_tok_ms, 3),
    }))


def _prefix_probe(args, eng, lm_cfg, rs):
    """Time-to-first-token with a cached shared prefix vs cold.

    Serving reality: every request in a deployment repeats the system
    prompt / few-shot preamble; the prefix cache prefills only the
    suffix. This probe measures exactly that: admission wall time for a
    prompt whose first --prefix_probe tokens are already cached vs a
    same-length cold prompt (medians of 3, all graphs pre-compiled)."""
    import time

    import numpy as np

    assert eng.prefix_cache is not None, "--prefix_probe needs " \
        "--prefix_cache N"
    S = args.prompt_tokens
    PL = args.prefix_probe
    assert 0 < PL < S, f"--prefix_probe must be in (0, {S})"

    def make_prompt(sys_seed, sfx_seed):
        sysp = np.random.RandomState(sys_seed).randint(
            5, lm_cfg.vocab_size, (PL,)).astype(np.int32)
        sfx = np.random.RandomState(10_000 + sfx_seed).randint(
            5, lm_cfg.vocab_size, (S - PL,)).astype(np.int32)
        return np.concatenate([sysp, sfx])

    def admit_ms(prompt):
        r = eng.submit(prompt, max_new_tokens=2)
        t0 = time.perf_counter()
        ticks = 0
        while not r.tokens:
            eng.step()
            ticks += 1
            assert ticks < 1000, "admission never produced a token"
        dt = 1e3 * (time.perf_counter() - t0)
        eng.run_until_idle()
        assert r.done and not r.error, r.error
        return dt

    # warm every graph: one cold admission (monolithic prefill + embeds)
    # and one hit admission (chunk graphs + first-token head)
    admit_ms(make_prompt(999, 0))
    admit_ms(make_prompt(999, 1))

    cold, warm = [], []
    for i in range(3):
        cold.append(admit_ms(make_prompt(i, 2 * i)))       # new prefix
        warm.append(admit_ms(make_prompt(i, 2 * i + 1)))   # cached hit
    cold.sort(), warm.sort()
    st = eng.stats()["prefix_cache"]
    print(json.dumps({
        "preset": args.preset, "prompt_tokens": S, "shared_prefix": PL,
        "prefill_chunk": args.prefill_chunk,
        "ttft_ms_cold_p50": round(cold[1], 2),
        "ttft_ms_prefix_hit_p50": round(warm[1], 2),
        "ttft_speedup": round(cold[1] / warm[1], 2),
        "prefix_cache": st,
    }))


def _stall_probe(args, eng, ids, lm_cfg, rs):
    """Decode-stall measurement: per-tick wall times of a steadily
    decoding engine before vs during the admission of a long prompt.

    Monolithic prefill executes the whole prompt on-device inside one
    tick, so every active slot's next block is delayed by the full
    prefill; chunked prefill (--prefill_chunk) bounds the per-tick
    added latency to one chunk. STATUS.md item 7 — at the 500m scale
    pipelined dispatch hid the ~30 ms prefill entirely; this probe
    exists to measure the bound where prefill latency exceeds a decode
    block (8B-class prompts)."""
    import time

    import numpy as np

    SP = args.stall_probe
    S = args.prompt_tokens
    # chunked admission admits ONE request per tick — warm long enough
    # for every short slot to be active before the baseline window
    n_warm, n_base, n_dur = args.slots + 4, 10, 16
    need = (n_warm + n_base + n_dur + 3) * args.block_steps
    assert args.max_len >= S + need + args.block_steps, (
        f"--max_len too small for the probe: need >= "
        f"{S + need + args.block_steps}")
    assert args.max_len >= SP + 4 + args.block_steps, "--max_len < probe"

    long_ids = rs.randint(5, lm_cfg.vocab_size, (SP,)).astype(np.int32)
    short = np.asarray(ids[0])

    # warm ALL compiles out of band: the long bucket's prefill (or its
    # chunk graphs) and the decode block
    r = eng.submit(long_ids, max_new_tokens=1)
    eng.run_until_idle()
    assert r.done and not r.error, r.error

    for _ in range(args.slots - 1):
        eng.submit(short, max_new_tokens=need)
    for _ in range(n_warm):
        eng.step()

    def tick():
        t0 = time.perf_counter()
        eng.step()
        return time.perf_counter() - t0

    base = [tick() for _ in range(n_base)]
    probe = eng.submit(long_ids, max_new_tokens=4)
    dur = [tick() for _ in range(n_dur)]

    base_ms = sorted(1e3 * t for t in base)
    dur_ms = [1e3 * t for t in dur]
    print(json.dumps({
        "preset": args.preset, "slots": args.slots,
        "block_steps": args.block_steps,
        "prefill_chunk": args.prefill_chunk,
        "probe_prompt": SP,
        "tick_ms_p50_baseline": round(base_ms[len(base_ms) // 2], 2),
        "tick_ms_max_baseline": round(base_ms[-1], 2),
        "tick_ms_during_admission": [round(t, 2) for t in dur_ms],
        "tick_ms_max_admission": round(max(dur_ms), 2),
        "stall_ms": round(max(dur_ms) - base_ms[len(base_ms) // 2], 2),
        "probe_done": probe.done,
    }))


if __name__ == "__main__":
    main()
