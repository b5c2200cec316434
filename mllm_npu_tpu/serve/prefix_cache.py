"""Prompt-prefix KV cache for the continuous-batching engine.

Serving workloads repeat prompt prefixes constantly — the system
prompt, few-shot preambles, the chat history of a multi-turn session.
The reference recomputes the full prompt for every request
(reference serve/worker.py:195-284 runs a fresh ``generate`` per call);
this module caches the KV blocks of previously-prefilled prompt
prefixes on device and lets a new request prefill ONLY its uncached
suffix — prefill FLOPs and time-to-first-token drop proportionally to
the shared-prefix fraction.

Design (fits the engine's static-shape discipline):

- entries are keyed by the exact token prefix they cover and hold the
  per-request prefill KV ``[L, 1, plen, Hkv, D]`` sliced at a
  *granularity* boundary (the engine's prompt bucket). Causal attention
  makes the slice trivially valid: KV at position ``i`` depends only on
  tokens ``<= i``, so any cut of a longer prompt's KV is the exact KV
  of that prefix;
- lookup is longest-prefix match over the store (linear scan — the
  store is small and host-side), capped so at least one real token is
  left to prefill (the last token's logits produce the first sampled
  token);
- admission seeds the engine's chunked-prefill loop with the cached
  blocks and ``filled = hit_len``, so the suffix runs through the
  existing chunk machinery unchanged (positions offset, causal +
  q_offset attention over the seeded cache);
- eviction is LRU by entry count (each entry's HBM footprint is
  ``2 * L * plen * Hkv * D * cache_dtype`` — bound max_entries to the
  budget);
- text-only: entries never cover image-conditioned positions (image KV
  depends on pixel content, not just token ids). Requests with images
  neither hit nor populate the store.

Greedy outputs are bit-identical with and without the cache (tested in
tests/test_batched_engine.py: prefix-hit vs cold-engine token parity).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PrefixEntry:
    tokens: Tuple[int, ...]      # the exact prefix covered
    k: jnp.ndarray               # [L, 1, plen, Hkv, D]
    v: jnp.ndarray
    tick: int = 0                # LRU stamp


class PrefixCache:
    """LRU store of prompt-prefix KV blocks (device-resident).

    ``granularity`` is the alignment of stored/served prefixes — the
    engine passes its prompt bucket so hits always land on a chunk
    boundary of the chunked-prefill loop.
    """

    def __init__(self, max_entries: int, granularity: int):
        assert max_entries > 0 and granularity > 0
        self.max_entries = max_entries
        self.granularity = granularity
        self._store: Dict[Tuple[int, ...], PrefixEntry] = {}
        self._tick = 0
        # observability (exposed via engine.stats())
        self.hits = 0
        self.misses = 0
        self.tokens_saved = 0

    def __len__(self) -> int:
        return len(self._store)

    def lookup(self, prompt: np.ndarray, *,
               align: Optional[int] = None) -> Optional[PrefixEntry]:
        """Longest cached prefix of ``prompt``, cut to ``align``
        (defaults to granularity) and to ``<= len(prompt) - 1`` so the
        suffix prefill still produces the last real token's logits.
        Returns None when no usable prefix is cached."""
        g = self.granularity if align is None else align
        Sp = int(prompt.shape[0])
        usable = ((Sp - 1) // g) * g
        if usable <= 0:
            self.misses += 1
            return None
        best: Optional[PrefixEntry] = None
        best_len = 0
        ptup = tuple(int(t) for t in prompt[:usable])
        for toks, entry in self._store.items():
            bound = min(len(toks), usable)
            common = 0
            for a, b in zip(toks[:bound], ptup[:bound]):
                if a != b:
                    break
                common += 1
            n = (common // g) * g
            if n > best_len:
                best, best_len = entry, n
        if best is None or best_len <= 0:
            self.misses += 1
            return None
        self._tick += 1
        best.tick = self._tick
        self.hits += 1
        self.tokens_saved += best_len
        if best_len == len(best.tokens):
            return best
        # cut the entry to the matched aligned length (causal KV slice)
        return PrefixEntry(best.tokens[:best_len],
                           best.k[:, :, :best_len],
                           best.v[:, :, :best_len], best.tick)

    def insert(self, prompt: np.ndarray, k: jnp.ndarray,
               v: jnp.ndarray) -> None:
        """Store the longest granularity-aligned prefix of ``prompt``
        from its freshly-computed prefill KV (``[L, 1, bucket, ...]``).
        No-op if the aligned prefix is empty or already covered."""
        g = self.granularity
        Sp = int(prompt.shape[0])
        cut = (Sp // g) * g
        if cut <= 0:
            return
        key = tuple(int(t) for t in prompt[:cut])
        existing = self._store.get(key)
        if existing is not None:
            self._tick += 1
            existing.tick = self._tick
            return
        self._tick += 1
        # device-side slice; jax.jit caches the slice computation
        self._store[key] = PrefixEntry(
            key, jax.lax.slice_in_dim(k, 0, cut, axis=2),
            jax.lax.slice_in_dim(v, 0, cut, axis=2), self._tick)
        while len(self._store) > self.max_entries:
            lru = min(self._store.values(), key=lambda e: e.tick)
            del self._store[lru.tokens]

    def stats(self) -> dict:
        return {"entries": len(self._store), "hits": self.hits,
                "misses": self.misses,
                "tokens_saved": self.tokens_saved}
