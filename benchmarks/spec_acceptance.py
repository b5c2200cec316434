"""Prompt-lookup speculative decode: REAL-TEXT acceptance measurement
(VERDICT r3 #3 — replaces the synthetic full-acceptance headline).

Prompt-lookup acceptance is a pure function of the token stream being
generated and the proposer (ngram, k) — the model only sets the cost of
a verify forward, which benchmarks/latency.py measures on-chip (a
(k+1)-position verify costs 1.10x a single-token step at 8B int8,
1.11x at int4; decode is weight-streaming-bound). So this harness
simulates generation of real checked-in documents token-for-token:
the document's first part is the prompt, the rest is what the model
"generates"; at each step the proposer drafts k tokens from the
history and acceptance is the longest prefix matching the actual
continuation. Realized speedup = tokens-per-verify / verify-cost-ratio.

Documents: README.md and MIGRATION.md (technical prose — the
summarize/extract/doc-grounded-QA serving regime prompt lookup targets)
plus a low-repetition control (random word salad, the worst case).
Tokenization is word-level (utils.fake_tokenizer hashing); BPE splits
rare words into more tokens and slightly RAISES repetition, so
word-level is the conservative side.

  python benchmarks/spec_acceptance.py --k 8 --ngram 3
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mllm_npu_tpu.utils.fake_tokenizer import FakeTokenizer  # noqa: E402


def propose(history: list, k: int, ngram: int):
    """Most recent earlier occurrence of the trailing n-gram; the k
    tokens that followed it (sampler.py:245-255 semantics)."""
    n = len(history)
    if n < ngram + 1:
        return []
    gram = history[n - ngram:]
    # scan backwards for the most recent match strictly before the
    # suffix itself
    for p in range(n - 2, ngram - 2, -1):
        if history[p - ngram + 1:p + 1] == gram:
            return history[p + 1:p + 1 + k]
    return []


def simulate_gen(prompt: list, gen: list, k: int, ngram: int):
    """Simulate generating ``gen`` after ``prompt`` with prompt-lookup;
    return per-verify emitted-token counts (accepted + 1 correction)."""
    history = list(prompt)
    t = 0
    per_verify = []
    while t < len(gen):
        drafts = propose(history, k, ngram)
        acc = 0
        for d in drafts:
            if t + acc < len(gen) and d == gen[t + acc]:
                acc += 1
            else:
                break
        emit = min(acc + 1, len(gen) - t)
        history.extend(gen[t:t + emit])
        t += emit
        per_verify.append(emit)
    return per_verify


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--ngram", type=int, default=3)
    p.add_argument("--prompt_frac", type=float, default=0.3)
    p.add_argument("--verify_ratio_int8", type=float, default=1.10,
                   help="measured (k+1)-verify / single-step cost at 8B "
                        "int8 (benchmarks/latency.py --speculative)")
    p.add_argument("--verify_ratio_int4", type=float, default=1.11)
    p.add_argument("--base_tps_int8", type=float, default=90.4,
                   help="measured single-request decode tok/s, 8B int8")
    p.add_argument("--base_tps_int4", type=float, default=138.9)
    args = p.parse_args()

    root = Path(__file__).resolve().parents[1]
    tok = FakeTokenizer(vocab_size=32000)
    texts = {name: (root / name).read_text(errors="ignore")
             for name in ("README.md", "MIGRATION.md")}
    rs = np.random.RandomState(0)

    # Serving regimes (prompt tokens ++ generated tokens):
    # - continue:   generate the document's tail from its head — free
    #               continuation, the regime where lookup helps least
    # - extract:    prompt = full doc, output = sentences copied from it
    #               (extractive summary / quote-grounded QA — the regime
    #               prompt lookup was built for)
    # - edit:       prompt = full doc, output = a chunk with every ~8th
    #               word changed (code-edit / rewrite regime)
    # - random:     i.i.d. word salad, the no-repetition worst case
    workloads = {}
    for name, text in texts.items():
        tokens = tok.encode(text)
        split = int(len(tokens) * args.prompt_frac)
        workloads[f"continue:{name}"] = (tokens[:split], tokens[split:])
        sents = [s for s in text.split(". ") if len(s.split()) > 5]
        picks = rs.choice(len(sents), size=min(12, len(sents)),
                          replace=False)
        summary = ". ".join(sents[i] for i in sorted(picks))
        workloads[f"extract:{name}"] = (tokens, tok.encode(summary))
        chunk = tokens[len(tokens) // 3:len(tokens) // 3 + 600]
        edited = [(t if (i % 8) else int(rs.randint(200, 32000)))
                  for i, t in enumerate(chunk)]
        workloads[f"edit:{name}"] = (tokens, edited)
    workloads["random-control"] = (
        list(rs.randint(200, 32000, 1200)),
        list(rs.randint(200, 32000, 2800)))

    out = {"k": args.k, "ngram": args.ngram, "workloads": {}}
    regime_pv = {}
    for name, (prompt, gen) in workloads.items():
        pv = simulate_gen(prompt, gen, args.k, args.ngram)
        regime = name.split(":")[0]
        regime_pv.setdefault(regime, []).extend(pv)
        tpv = sum(pv) / len(pv)
        out["workloads"][name] = {
            "tokens_generated": sum(pv),
            "verifies": len(pv),
            "tokens_per_verify": round(tpv, 3),
            "p50": statistics.median(pv),
            "full_runs_pct": round(
                100 * sum(1 for x in pv if x == args.k + 1) / len(pv), 1),
            "realized_tps_8b_int8": round(
                args.base_tps_int8 * tpv / args.verify_ratio_int8, 1),
        }

    out["by_regime"] = {}
    for regime, pv in regime_pv.items():
        tpv = sum(pv) / len(pv)
        out["by_regime"][regime] = {
            "tokens_per_verify": round(tpv, 3),
            "realized_tps_8b_int8": round(
                args.base_tps_int8 * tpv / args.verify_ratio_int8, 1),
            "realized_tps_8b_int4": round(
                args.base_tps_int4 * tpv / args.verify_ratio_int4, 1),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
