"""Sample-packing training throughput (VERDICT r4 #7; SURVEY §5.7's
"headroom the reference leaves on the table").

The reference pads every sample to max_length (its collates,
mllm_npu/data/*.py) — at a realistic document-length mix most of each
row is padding. This repo's packing collate (data/utils.py
pack_samples) first-fits samples into full rows with per-sample
segment ids; the models feed them to the flash kernel and restart
positions per segment (models/mllm.py:232-241).

This probe measures the SAME jitted train step (fixed [B, S] shape, so
identical HBM footprint) on two batches built from one seeded sample
stream:

  padded: one sample per row, rest padding        (the reference's fill)
  packed: first-fit multi-sample rows, segment ids (this repo's fill)

and reports real (non-pad) tokens/sec for each. The interesting
question is whether the step gets SLOWER when rows are full (the flash
kernel skips fully-masked key blocks on padded rows, and packed rows do
more real attention work) — i.e. how much of the fill-ratio win
survives as wall-clock throughput.

  python benchmarks/packing.py --lora 32 --quantize_base int8 --batch 2
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def draw_lengths(rs, n, seq):
    """Seeded doc-length mix: lognormal around ~320 tokens, clamped —
    the regime of caption/OCR/conversation mixtures (median well under
    max_length, occasional near-full docs)."""
    ls = np.exp(rs.normal(np.log(320.0), 0.6, size=n))
    return np.clip(ls.astype(np.int64), 32, seq)


import numpy as np  # noqa: E402  (used by draw_lengths)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["tiny", "8b"], default="8b")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--lora", type=int, default=32)
    p.add_argument("--quantize_base", default="int8",
                   choices=["none", "int8", "int4"])
    p.add_argument("--ce_chunk", type=int, default=512)
    p.add_argument("--steps", type=int, nargs=2, default=(3, 13))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    import jax.numpy as jnp

    from mllm_npu_tpu.models.language_models.llama import (
        LlamaConfig, LlamaForCausalLM, lora_frozen_patterns)
    from mllm_npu_tpu.models.mllm import GeneralizedMultimodalModel
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.train.train_state import (OptimizerConfig,
                                                compile_train_step,
                                                create_train_state,
                                                make_train_step,
                                                shard_train_state)
    from mllm_npu_tpu.constant import IGNORE_INDEX

    if args.preset == "tiny":
        lm_cfg = LlamaConfig.tiny()
    else:
        lm_cfg = LlamaConfig.llama3_8b(attention_impl="auto", remat=True,
                                       remat_policy="nothing")
    if args.lora:
        import dataclasses as _dc
        lm_cfg = _dc.replace(
            lm_cfg, lora_rank=args.lora,
            quantization=args.quantize_base
            if args.quantize_base != "none" else lm_cfg.quantization)

    lm = LlamaForCausalLM(lm_cfg, dtype=jnp.bfloat16,
                          param_dtype=jnp.bfloat16)
    model = GeneralizedMultimodalModel(
        language_model=lm, vision_encoder=None, projector=None,
        ce_loss_chunk=args.ce_chunk)

    B, S = args.batch, args.seq
    rs = np.random.RandomState(args.seed)

    # one sample stream; padded takes the first B, packed first-fits
    # from the same stream until no sample fits any row
    lengths = draw_lengths(rs, 64, S)
    V = lm_cfg.vocab_size

    def blank():
        return {
            "input_ids": np.zeros((B, S), np.int32),
            "attention_mask": np.zeros((B, S), np.int32),
            "labels": np.full((B, S), IGNORE_INDEX, np.int32),
        }

    def fill(batch, r, off, L, seg):
        ids = rs.randint(5, V, (L,)).astype(np.int32)
        batch["input_ids"][r, off:off + L] = ids
        batch["attention_mask"][r, off:off + L] = seg
        lab = ids.copy()
        lab[0] = IGNORE_INDEX
        batch["labels"][r, off:off + L] = lab

    padded = blank()
    for r in range(B):
        fill(padded, r, 0, int(lengths[r]), 1)
    padded_real = int(lengths[:B].sum())

    packed = blank()
    row_fill = [0] * B
    row_seg = [0] * B
    packed_real = 0
    for L in lengths:
        L = int(L)
        placed = False
        for r in range(B):
            if row_fill[r] + L <= S:
                row_seg[r] += 1
                fill(packed, r, row_fill[r], L, row_seg[r])
                row_fill[r] += L
                packed_real += L
                placed = True
                break
        if not placed and all(S - f < 32 for f in row_fill):
            break

    common = {"images": None, "embeds_gen_mask": None,
              "embeds_cmp_mask": None, "ids_gen_mask": None,
              "ids_cmp_mask": None, "patch_positions": None}
    padded = {**{k: jnp.asarray(v) for k, v in padded.items()}, **common}
    packed = {**{k: jnp.asarray(v) for k, v in packed.items()}, **common}

    mesh = build_mesh(MeshConfig(data=-1, fsdp=1, tensor=1))
    params = model.init(jax.random.PRNGKey(0), **padded)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
    frozen = list(lora_frozen_patterns()) if args.lora else []
    state = create_train_state(params, OptimizerConfig(
        lr=1e-4, warmup_steps=0, total_steps=1000,
        mu_dtype="bfloat16", frozen_patterns=tuple(frozen)))
    del params

    def loss_fn(p, b):
        out = model.apply(p, **b)
        return out["total_loss"], {"lm_loss": out["lm_loss"]}

    step = make_train_step(loss_fn)
    jitted, state_sharding, batch_shardings = compile_train_step(
        step, state, padded, mesh)
    state = shard_train_state(state, state_sharding)

    def measure(batch, state):
        batch = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s) if x is not None else None,
            batch, batch_shardings,
            is_leaf=lambda x: x is None)
        state, loss, _ = jitted(state, batch)   # compile + warm
        _ = float(loss)
        n1, n2 = args.steps

        def run_n(n, state):
            t0 = time.perf_counter()
            for _ in range(n):
                state, loss, _ = jitted(state, batch)
            _ = float(loss)
            return time.perf_counter() - t0, state

        t1, state = run_n(n1, state)
        t2, state = run_n(n2, state)
        return (t2 - t1) / (n2 - n1), state

    pad_s, state = measure(padded, state)
    pack_s, state = measure(packed, state)

    print(json.dumps({
        "preset": args.preset, "batch": B, "seq": S,
        "lora": args.lora, "quantize_base": args.quantize_base,
        "length_mix": "lognormal(ln320, 0.6) clamp [32, seq], seed %d"
                      % args.seed,
        "padded": {
            "real_tokens_per_step": padded_real,
            "fill_pct": round(100 * padded_real / (B * S), 1),
            "sec_per_step": round(pad_s, 4),
            "real_tokens_per_sec": round(padded_real / pad_s, 1)},
        "packed": {
            "real_tokens_per_step": packed_real,
            "fill_pct": round(100 * packed_real / (B * S), 1),
            "sec_per_step": round(pack_s, 4),
            "real_tokens_per_sec": round(packed_real / pack_s, 1)},
        "throughput_ratio": round(
            (packed_real / pack_s) / (padded_real / pad_s), 2),
    }))


if __name__ == "__main__":
    main()
