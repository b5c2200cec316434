"""Jit-compiled autoregressive decoding for the MLLM assemblies.

Replaces HF ``model.generate`` (reference call sites:
mllm_npu/models/mllm.py:198-207, 445-451) with a TPU-native design:
prefill (one forward over the prompt, flash attention) + a
``lax.while_loop`` decode over a preallocated static KV cache — the
jit-compatible equivalent of the reference's DynamicCache decode loop.

Includes:
- greedy / temperature / top-p sampling (reference generation_config:
  mllm.py:169-175 — do_sample=False ⇒ greedy is the parity mode)
- :class:`ImageTokenLadderProcessor` — functional port of
  ``AutoImageTokenGenerationProcessor`` (reference mllm.py:18-43): once
  ``<img>`` is emitted, force-decode the full ``<img_00000>…<img_00063>
  </img>`` ladder; otherwise suppress bare image tokens.
- hidden-state capture for every decoded position, so SEED can extract
  the 64-token windows before each ``</img>`` for the de-tokenizer
  (reference mllm.py:458-476).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    max_new_tokens: int = 120
    temperature: float = 0.7
    top_p: float = 0.5
    do_sample: bool = False       # reference parity default: greedy
    eos_token_id: int = -1
    pad_token_id: int = 0


@dataclasses.dataclass(frozen=True)
class ImageTokenLadder:
    """Token ids of [<img>, <img_00000>, ..., <img_NNNNN>, </img>]."""
    ids: tuple

    @property
    def boi(self) -> int:
        return self.ids[0]

    @property
    def eoi(self) -> int:
        return self.ids[-1]


def ladder_from_tokenizer(tokenizer, num_img_gen_tokens: int = 64
                          ) -> ImageTokenLadder:
    from mllm_npu_tpu.constant import BOI_TOKEN, EOI_TOKEN, IMG_TOKEN
    text = "".join([BOI_TOKEN] + [IMG_TOKEN.format(i)
                                  for i in range(num_img_gen_tokens)]
                   + [EOI_TOKEN])
    ids = tokenizer.encode(text, add_special_tokens=False)
    assert len(ids) == num_img_gen_tokens + 2, (
        "image ladder tokens must each encode to one id")
    return ImageTokenLadder(ids=tuple(ids))


def apply_image_ladder(logits: jax.Array, last_token: jax.Array,
                       ladder: ImageTokenLadder) -> jax.Array:
    """Vectorized AutoImageTokenGenerationProcessor semantics
    (reference mllm.py:28-43): if the last token is in the ladder (except
    its final ``</img>``), force the successor; else zero out non-initial
    ladder tokens so they are never sampled spontaneously."""
    ladder_ids = jnp.asarray(ladder.ids, jnp.int32)          # [L]
    prev_ids = ladder_ids[:-1]                               # [L-1]
    next_ids = ladder_ids[1:]                                # [L-1]

    # match: is last_token one of prev_ids?  [B, L-1]
    eq = last_token[:, None] == prev_ids[None, :]
    in_ladder = eq.any(axis=-1)                              # [B]
    forced_next = (eq.astype(jnp.int32)
                   * next_ids[None, :]).sum(axis=-1)         # [B]

    B, V = logits.shape
    # suppression: zero out ladder[1:] (reference sets scores to 0.0 —
    # with raw logits the analogue is a large negative bias)
    suppress = jnp.zeros((V,), bool).at[next_ids].set(True)
    suppressed = jnp.where(suppress[None, :], NEG_INF, logits)

    # forcing: one-hot max
    row_max = logits.max(axis=-1, keepdims=True)
    forced = jnp.where(
        jax.nn.one_hot(forced_next, V, dtype=bool),
        row_max + 10.0, NEG_INF)

    return jnp.where(in_ladder[:, None], forced, suppressed)


def ladder_propose(cur: jax.Array, props: jax.Array,
                   ladder: ImageTokenLadder) -> jax.Array:
    """Ladder-aware speculative proposals: once the last token is inside
    the image ladder, the next tokens are KNOWN constants — the
    AutoImageTokenGenerationProcessor semantics force them at verify
    (apply_image_ladder), so proposing the successor chain is accepted
    by construction and the 64-token ladder advances k+1 tokens per
    verify forward instead of one per decode step. Positions past the
    ladder's end (``</img>``) fall back to the caller's prompt-lookup
    proposals. cur: scalar last token; props: [k] proposals to
    override. (Reference behavior anchor: mllm.py:28-43 forces these
    tokens one at a time through its per-step logits processor.)"""
    ids = jnp.asarray(ladder.ids, jnp.int32)                 # [L]
    L = ids.shape[0]
    idx = jnp.max(jnp.where(cur == ids[:-1], jnp.arange(L - 1), -1))
    src = idx + 1 + jnp.arange(props.shape[0])
    from_ladder = ids[jnp.clip(src, 0, L - 1)]
    use = jnp.logical_and(idx >= 0, src <= L - 1)
    return jnp.where(use, from_ladder, props)


def sample_rows(logits: jax.Array, rngs: jax.Array, temperature: jax.Array,
                top_p: jax.Array, do_sample: jax.Array) -> jax.Array:
    """Per-row temperature + top-p nucleus sampling, branchless mix with
    greedy rows. logits [B, V] f32; rngs [B] PRNG keys; temperature /
    top_p [B] f32; do_sample [B] bool. The single shared implementation
    of nucleus sampling — used by SamplingConfig-driven decode and by
    the batched engine's per-slot sampling (one copy so cutoff fixes
    can't diverge)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_mask = cum - probs > top_p[:, None]
    # min over the KEPT entries → mask the cut ones with +inf
    cutoff_val = jnp.where(cutoff_mask, jnp.inf,
                           sorted_logits).min(axis=-1, keepdims=True)
    filtered = jnp.where(scaled < cutoff_val, NEG_INF, scaled)
    sampled = jax.vmap(jax.random.categorical)(rngs, filtered) \
        .astype(jnp.int32)
    return jnp.where(do_sample, sampled, greedy)


def _sample(logits: jax.Array, rng: jax.Array, cfg: SamplingConfig
            ) -> jax.Array:
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    B = logits.shape[0]
    return sample_rows(
        logits, jax.random.split(rng, B),
        jnp.full((B,), cfg.temperature, jnp.float32),
        jnp.full((B,), cfg.top_p, jnp.float32),
        jnp.ones((B,), bool))


def decode_loop(step_fn: Callable, cache: Any, first_token: jax.Array,
                first_hidden: jax.Array, rng: jax.Array,
                cfg: SamplingConfig,
                ladder: Optional[ImageTokenLadder] = None):
    """Generic decode loop.

    step_fn(token [B,1], cache) -> (logits [B,V], hidden [B,D], cache).
    Returns (tokens [B, T], hiddens [B, T, D], done_mask).
    first_token/first_hidden come from the prefill step.

    Design note: a chunked variant (blocks of 16 steps with deferred
    cache writes, mirroring the ContinuousBatchingEngine's block
    decode) was measured on v5e at the 500m single-request config and
    LOST slightly (657 vs 682 tok/s bf16, 828 vs 837 int8): unlike a
    ``lax.scan`` ys-restack, the while_loop carry already updates the
    cache in place, so the block buffer only adds attention/concat
    overhead. Keep the per-token loop here; the batched engine is where
    deferred writes pay (its cache is carried through a scan).
    """
    B = first_token.shape[0]
    T = cfg.max_new_tokens
    Dh = first_hidden.shape[-1]

    tokens0 = jnp.zeros((B, T), jnp.int32)
    hidden0 = jnp.zeros((B, T, Dh), first_hidden.dtype)
    tokens0 = tokens0.at[:, 0].set(first_token)
    hidden0 = hidden0.at[:, 0].set(first_hidden)
    done0 = (first_token == cfg.eos_token_id)

    def cond(state):
        t, tokens, hidden, cache, done, rng = state
        return jnp.logical_and(t < T, ~done.all())

    def body(state):
        t, tokens, hidden, cache, done, rng = state
        cur = jax.lax.dynamic_slice_in_dim(tokens, t - 1, 1, axis=1)
        logits, h, cache = step_fn(cur, cache)
        if ladder is not None:
            logits = apply_image_ladder(logits, cur[:, 0], ladder)
        rng, sub = jax.random.split(rng)
        nxt = _sample(logits, sub, cfg)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t))
        hidden = jax.lax.dynamic_update_slice(
            hidden, h[:, None, :].astype(hidden.dtype), (0, t, 0))
        done = jnp.logical_or(done, nxt == cfg.eos_token_id)
        return (t + 1, tokens, hidden, cache, done, rng)

    state = (jnp.asarray(1, jnp.int32), tokens0, hidden0, cache, done0, rng)
    _, tokens, hidden, cache, done, _ = jax.lax.while_loop(cond, body, state)
    return tokens, hidden, done


def speculative_decode_loop(step_multi: Callable, cache: Any,
                            first_token: jax.Array,    # [1]
                            first_hidden: jax.Array,   # [1, D]
                            cfg: SamplingConfig,
                            context_ids: jax.Array,    # [1, Sp]
                            ladder: Optional[ImageTokenLadder] = None,
                            k: int = 5, ngram: int = 3,
                            prompt_len: Optional[jax.Array] = None):
    """Prompt-lookup speculative GREEDY decode, B == 1 (draft-model-free
    speculation: the next k tokens are proposed by matching the context's
    trailing n-gram against its own history — prompts/answers with
    repetition accept long runs; zero acceptance still emits >= 1
    token/step, so worst case equals normal decode + k wasted verify
    positions).

    step_multi(toks [1, k+1], cache) -> (logits [1, k+1, V],
    hidden [1, k+1, D], cache). The verify forward writes k+1 keys at
    [pos, pos+k]; only the accepted prefix advances ``pos`` — rejected
    keys are overwritten by the next iteration (per-row positions make
    rollback free). Output is token-for-token identical to decode_loop
    for greedy sampling. Returns (tokens, hidden, done, n_iters) —
    n_iters counts verify forwards (= model calls), used by tests to
    assert acceptance rates.

    The caller must size the KV cache and token buffer with +k headroom
    (see generate.py)."""
    assert not cfg.do_sample, "speculative decode is greedy-only"
    assert first_token.shape[0] == 1, "speculative decode is B=1"
    T = cfg.max_new_tokens
    Dh = first_hidden.shape[-1]
    Tp = T + k + 1
    Sp = context_ids.shape[1]

    tokens0 = jnp.zeros((1, Tp), jnp.int32).at[:, 0].set(first_token)
    hidden0 = jnp.zeros((1, Tp, Dh), first_hidden.dtype) \
        .at[:, 0].set(first_hidden)
    done0 = first_token[0] == cfg.eos_token_id

    # ``context_ids`` is the right-padded prompt bucket; grams matched
    # over pad positions would degrade acceptance on every bucketed
    # prompt. Right-align the real tokens at index Sp (roll the pad
    # garbage to the front) and bar matches whose gram touches it.
    if prompt_len is None:
        offset = jnp.asarray(0, jnp.int32)
        ctx0 = context_ids[0]
    else:
        offset = (Sp - prompt_len).astype(jnp.int32)
        ctx0 = jnp.roll(context_ids[0], offset)
    L = Sp + Tp

    def cond(state):
        t, tokens, hidden, cache, cur, done, _ = state
        return jnp.logical_and(t < T, jnp.logical_not(done))

    def body(state):
        t, tokens, hidden, cache, cur, done, it = state
        # ---- propose: most recent earlier occurrence of the trailing
        # n-gram; take the k tokens that followed it
        C = jnp.concatenate([ctx0, tokens[0]])              # [L]
        end = Sp + t                                        # ctx length
        gram = jax.lax.dynamic_slice(C, (end - ngram,), (ngram,))
        pos_idx = jnp.arange(L)
        match = jnp.ones((L,), bool)
        for i in range(ngram):                              # static
            s = ngram - 1 - i
            match &= (jnp.roll(C, s) == gram[i]) & (pos_idx >= s)
        match &= pos_idx <= end - 2     # strictly before the suffix
        match &= pos_idx >= offset + ngram - 1   # gram fully in real tokens
        p_star = jnp.max(jnp.where(match, pos_idx, -1))
        props = jax.lax.dynamic_slice(
            C, (jnp.clip(p_star + 1, 0, L - k),), (k,))
        props = jnp.where(p_star >= 0, props, cfg.pad_token_id)
        if ladder is not None:
            # inside the forced image ladder the continuation is a
            # known constant — propose it (100% acceptance)
            props = ladder_propose(cur[0], props, ladder)

        # ---- verify: one forward over [cur, props...]
        toks_in = jnp.concatenate([cur, props])[None]       # [1, k+1]
        logits, h, cache = step_multi(toks_in, cache)
        lg = logits[0].astype(jnp.float32)                  # [k+1, V]
        if ladder is not None:
            lg = apply_image_ladder(lg, toks_in[0], ladder)
        g = jnp.argmax(lg, axis=-1).astype(jnp.int32)       # [k+1]

        # ---- accept the matching prefix (+ the bonus token)
        acc = (props == g[:k]).astype(jnp.int32)
        m = jnp.cumprod(acc).sum()
        e = jnp.minimum(m + 1, T - t)                       # emit count
        is_eos = g == cfg.eos_token_id
        eos_idx = jnp.min(jnp.where(is_eos, jnp.arange(k + 1), k + 1))
        e = jnp.minimum(e, eos_idx + 1)
        done = jnp.logical_or(eos_idx < e, t + e >= T)

        tokens = jax.lax.dynamic_update_slice(tokens, g[None], (0, t))
        hidden = jax.lax.dynamic_update_slice(
            hidden, h[:, :, :].astype(hidden.dtype), (0, t, 0))
        # pos advances by the number of finalized keys: cur's plus the
        # accepted proposals'; the new cur is the last emitted token
        cache = {**cache, "pos": cache["pos"] - (k + 1) + e}
        cur = jnp.take(g, e - 1)[None]
        return (t + e, tokens, hidden, cache, cur, done, it + 1)

    state = (jnp.asarray(1, jnp.int32), tokens0, hidden0, cache,
             first_token, done0, jnp.asarray(0, jnp.int32))
    t_f, tokens, hidden, cache, _, done, n_iters = jax.lax.while_loop(
        cond, body, state)
    # zero the speculative tail beyond the last emitted token (parity
    # with decode_loop's zeros-initialized buffer)
    keep = jnp.arange(Tp) < t_f
    tokens = jnp.where(keep[None, :], tokens, 0)
    hidden = jnp.where(keep[None, :, None], hidden, 0)
    return tokens[:, :T], hidden[:, :T], done[None], n_iters


def extract_img_windows(tokens: jax.Array,     # [T] generated ids
                        hiddens: jax.Array,    # [T, D]
                        eoi_token_id: int,
                        num_img_gen_tokens: int,
                        max_imgs: int,
                        boi_token_id: Optional[int] = None):
    """Static-shape port of the reference's per-image hidden-window
    extraction (mllm.py:462-476): for each ``</img>`` at index e, take
    hiddens[e-n : e]. Returns (windows [max_imgs, n, D], valid [max_imgs],
    text_mask [T])."""
    T, D = hiddens.shape
    is_eoi = tokens == eoi_token_id
    # indices of first `max_imgs` eoi positions, in order
    order = jnp.argsort(jnp.logical_not(is_eoi), stable=True)[:max_imgs]
    valid = jnp.take(is_eoi, order)
    starts = jnp.clip(order - num_img_gen_tokens, 0, T - 1)

    def take_window(s):
        return jax.lax.dynamic_slice_in_dim(hiddens, s, num_img_gen_tokens,
                                            axis=0)

    windows = jax.vmap(take_window)(starts)     # [max_imgs, n, D]

    # text mask: drop ladder tokens (img window + eoi + boi positions)
    pos = jnp.arange(T)
    in_window = ((pos[None, :] >= starts[:, None])
                 & (pos[None, :] < order[:, None])
                 & valid[:, None]).any(axis=0)
    text_mask = ~(in_window | is_eoi)
    if boi_token_id is not None:
        text_mask = text_mask & (tokens != boi_token_id)
    return windows, valid, text_mask
