"""Eval-harness throughput at flagship scale (VERDICT r4 #6).

Rounds 2-4 proved the 7 benchmarks' FORMAT (byte-parity fixtures at
DEBUG size); this measures the harness's CAPABILITY at the 8B serving
stack: items/sec through the real `mllm_npu_tpu.evaluate` code path
(EvalModel -> InferenceEngine -> MLLMGenerator) with synthetic weights
(throughput rows, not accuracy rows), plus the projected wall-clock for
the full published benchmark sizes.

Two probes:
  mmlu  — one synthetic subject at realistic 5-shot prompt lengths
          (~700 word-tokens), 10-token greedy answers, letter extract
  mme   — one synthetic task dir: real JPEG decode + anyres tiling +
          SigLIP tower + short decode per item

The first item of each probe compiles its prompt bucket; items/s is
reported over the steady-state items that follow (per-item recompiles
would destroy it — that is exactly what this probe exists to catch).

  python benchmarks/eval_speed.py --preset 8b --int8 --fused --unroll
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# full-benchmark sizes for the wall-clock projection
MMLU_FULL_ITEMS = 14042       # 57 subjects, official test split
MME_FULL_ITEMS = 2374         # QA pairs over 14 tasks


def _mk_mmlu(root: Path, n_items: int, words_q: int = 60):
    """Synthetic subject at realistic item sizes: ~60-word questions +
    4 choices -> the 5-shot prompt lands around 700 word-tokens."""
    import pandas as pd
    rs = __import__("numpy").random.RandomState(0)

    def item(i):
        q = " ".join(f"word{rs.randint(0, 5000)}"
                     for _ in range(words_q)) + f" question {i}?"
        choices = [" ".join(f"c{rs.randint(0, 5000)}"
                            for _ in range(12)) for _ in range(4)]
        return [q, *choices, "ABCD"[i % 4]]

    (root / "dev").mkdir(parents=True)
    (root / "test").mkdir()
    pd.DataFrame([item(i) for i in range(5)]).to_csv(
        root / "dev" / "synthetic_dev.csv", header=False, index=False)
    pd.DataFrame([item(100 + i) for i in range(n_items)]).to_csv(
        root / "test" / "synthetic_test.csv", header=False, index=False)


def _mk_mme(root: Path, n_images: int):
    from PIL import Image
    rs = __import__("numpy").random.RandomState(0)
    task = root / "color"
    task.mkdir(parents=True)
    for i in range(n_images):
        arr = (rs.rand(768, 1024, 3) * 255).astype("uint8")
        Image.fromarray(arr).save(task / f"img{i:03d}.jpg")
        (task / f"img{i:03d}.txt").write_text(
            "Is the dominant color of this image red? Please answer "
            "yes or no.\tYes\n"
            "Is the dominant color of this image blue? Please answer "
            "yes or no.\tNo\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["tiny", "8b"], default="8b")
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int4", action="store_true")
    p.add_argument("--fused", action="store_true")
    p.add_argument("--unroll", action="store_true")
    p.add_argument("--mmlu_items", type=int, default=10)
    p.add_argument("--mme_images", type=int, default=5)
    p.add_argument("--probe", choices=["both", "mmlu", "mme"],
                   default="both")
    p.add_argument("--slots", type=int, default=4,
                   help="batched-engine slots for --prefix_cache runs")
    p.add_argument("--prefix_cache", type=int, default=0, metavar="N",
                   help="route text benchmarks through the batched "
                        "engine with an N-entry prompt-prefix KV "
                        "cache: the few-shot preamble every item "
                        "repeats prefills once, items after the first "
                        "prefill only their question suffix")
    args = p.parse_args()

    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mllm_npu_tpu.data.processor import ImageProcessor
    from mllm_npu_tpu.evaluate import mm_benchmarks as mm
    from mllm_npu_tpu.evaluate import text_benchmarks as tb
    from mllm_npu_tpu.evaluate.evaluator import EvalModel
    from mllm_npu_tpu.models.language_models.llama import (
        LlamaConfig, LlamaForCausalLM)
    from mllm_npu_tpu.models.mllm import GeneralizedMultimodalModel
    from mllm_npu_tpu.models.multimodal_encoder.siglip_vit import (
        SigLIPConfig, SigLIPVisionEncoder)
    from mllm_npu_tpu.models.multimodal_projector.attention_resampler \
        import AttentionResampler
    from mllm_npu_tpu.serve.engine import InferenceEngine
    from mllm_npu_tpu.utils.fake_tokenizer import FakeTokenizer

    if args.preset == "tiny":
        lm_cfg = LlamaConfig.tiny()
        vis_cfg = SigLIPConfig.tiny()
        nq, heads = 4, 4
    else:
        assert args.int8 or args.int4, "8B needs --int8 or --int4"
        lm_cfg = LlamaConfig.llama3_8b(
            quantization="int4" if args.int4 else "int8",
            fused_projections=args.fused,
            scan_layers=not args.unroll)
        vis_cfg = SigLIPConfig.so400m_384()
        nq, heads = 64, 32

    lm = LlamaForCausalLM(lm_cfg, dtype=jnp.bfloat16)
    vis = SigLIPVisionEncoder(vis_cfg, dtype=jnp.bfloat16)
    proj = AttentionResampler(grid_size=int(nq ** 0.5),
                              embed_dim=lm_cfg.hidden_size,
                              num_heads=heads,
                              kv_dim=vis_cfg.hidden_size,
                              dtype=jnp.bfloat16)
    model = GeneralizedMultimodalModel(
        language_model=lm, vision_encoder=vis, projector=proj,
        freeze_vision_encoder=True, add_patch_pos=True,
        patch_pos_dim=lm_cfg.hidden_size)

    B, S, N = 1, nq + 16, 1
    rs = np.random.RandomState(0)
    ids_cmp = np.zeros((B, S), bool)
    ids_cmp[0, 2:2 + nq] = True
    input_ids = jnp.asarray(rs.randint(5, lm_cfg.vocab_size, (B, S)),
                            jnp.int32)
    images = jnp.asarray(rs.randn(N, vis_cfg.image_size,
                                  vis_cfg.image_size, 3), jnp.bfloat16)
    t0 = time.time()
    params = model.init(
        jax.random.PRNGKey(0), input_ids, images,
        jnp.ones((B, S), jnp.int32), input_ids,
        jnp.zeros((N,), bool), jnp.ones((N,), bool),
        jnp.zeros((B, S), bool), jnp.asarray(ids_cmp),
        jnp.asarray(rs.rand(N, 2), jnp.float32))
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    print(f"init {time.time() - t0:.1f}s", file=sys.stderr)

    tok = FakeTokenizer(vocab_size=min(4096, lm_cfg.vocab_size))
    common = dict(
        model=model, lm_config=lm_cfg, params=params, tokenizer=tok,
        image_transform=ImageProcessor(height=vis_cfg.image_size,
                                       width=vis_cfg.image_size),
        base_resolution=vis_cfg.image_size,
        num_img_in_tokens=nq, num_img_out_tokens=nq,
        max_new_tokens=10)
    if args.prefix_cache:
        # 512-token buckets: the cache aligns prefixes to the bucket,
        # and each suffix chunk is a full-width forward — 128-token
        # chunks cost MORE than they save at 8B (each chunk re-streams
        # the full weights + a host RTT: measured 2.72 items/s vs 4.5
        # single-request before this was raised)
        from mllm_npu_tpu.serve.engine import BatchedInferenceEngine
        engine = BatchedInferenceEngine(
            num_slots=args.slots, max_len=2048, max_prompt=1536,
            batch_prompt_bucket=512,
            prefix_cache=args.prefix_cache, **common)
    else:
        engine = InferenceEngine(**common)
    em = EvalModel(engine)

    out = {"preset": args.preset, "int8": args.int8, "int4": args.int4,
           "fused": args.fused, "unroll": args.unroll}

    if args.probe in ("both", "mmlu"):
        with tempfile.TemporaryDirectory() as td:
            root = Path(td) / "mmlu"
            _mk_mmlu(root, args.mmlu_items)
            import os
            cwd = os.getcwd()
            os.chdir(td)
            try:
                # warm: first 2 items compile the prompt buckets
                t0 = time.time()
                tb.mmlu_eval(em, str(root), max_items_per_subject=2)
                warm_s = time.time() - t0
                t0 = time.time()
                tb.mmlu_eval(em, str(root),
                             max_items_per_subject=args.mmlu_items)
                all_s = time.time() - t0
            finally:
                os.chdir(cwd)
        # steady-state: the warm pass compiled the prompt buckets; the
        # full pass is entirely compiled-path items
        steady = all_s / args.mmlu_items
        out["mmlu"] = {
            "items": args.mmlu_items,
            "first2_with_compile_s": round(warm_s, 1),
            "steady_items_per_sec": round(1.0 / steady, 2),
            "steady_sec_per_item": round(steady, 2),
            "projected_full_mmlu_hours": round(
                MMLU_FULL_ITEMS * steady / 3600, 2),
        }
        print(json.dumps(out["mmlu"]), file=sys.stderr)

    if args.probe in ("both", "mme"):
        with tempfile.TemporaryDirectory() as td:
            root = Path(td) / "mme"
            _mk_mme(root, args.mme_images)
            import os
            cwd = os.getcwd()
            os.chdir(td)
            try:
                t0 = time.time()
                mm.mme_eval(em, str(root), max_items=1)
                warm_s = time.time() - t0
                t0 = time.time()
                mm.mme_eval(em, str(root), max_items=args.mme_images)
                all_s = time.time() - t0
            finally:
                os.chdir(cwd)
        # each image = 2 QA pairs through the engine; warm pass
        # already compiled the anyres/prefill graphs
        steady = all_s / (2 * args.mme_images)
        out["mme"] = {
            "images": args.mme_images,
            "first_with_compile_s": round(warm_s, 1),
            "steady_qa_per_sec": round(1.0 / steady, 2),
            "steady_sec_per_qa": round(steady, 2),
            "projected_full_mme_hours": round(
                MME_FULL_ITEMS * steady / 3600, 2),
        }
        print(json.dumps(out["mme"]), file=sys.stderr)

    if args.prefix_cache:
        out["prefix_cache"] = \
            engine.batch_engine.stats()["prefix_cache"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
