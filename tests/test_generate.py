"""Generation tests: ladder processor, window extraction, jitted greedy
decode vs naive full-forward loop."""

import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.models.generation.sampler import (
    ImageTokenLadder, SamplingConfig, apply_image_ladder,
    extract_img_windows)
from mllm_npu_tpu.models.generation.generate import MLLMGenerator
from mllm_npu_tpu.utils.testing import TinySpec, build_tiny_mllm, synthetic_batch
import pytest

SPEC = TinySpec(batch=1, seq=32)


def test_apply_image_ladder_forcing_and_suppression():
    ladder = ImageTokenLadder(ids=(5, 6, 7, 8))
    logits = jnp.zeros((2, 16))
    # row 0: last token = 6 (in ladder) -> force 7
    # row 1: last token = 3 (not in ladder) -> suppress 6,7,8
    out = apply_image_ladder(logits, jnp.asarray([6, 3]), ladder)
    assert int(out[0].argmax()) == 7
    assert float(out[1, 6]) < -1e20 and float(out[1, 8]) < -1e20
    assert float(out[1, 5]) == 0.0   # boi itself not suppressed


def test_extract_img_windows():
    T, D, n = 16, 4, 3
    eoi, boi = 9, 5
    tokens = np.zeros((T,), np.int32)
    hiddens = np.arange(T * D, dtype=np.float32).reshape(T, D)
    # image span: boi at 4, img tokens 5..7, eoi at 8
    tokens[4] = boi
    tokens[8] = eoi
    w, valid, text_mask = extract_img_windows(
        jnp.asarray(tokens), jnp.asarray(hiddens), eoi, n, max_imgs=2,
        boi_token_id=boi)
    assert bool(valid[0]) and not bool(valid[1])
    np.testing.assert_array_equal(np.asarray(w[0]), hiddens[5:8])
    tm = np.asarray(text_mask)
    assert not tm[4] and not tm[8] and not tm[5:8].any()
    assert tm[0] and tm[9]


@pytest.mark.slow
def test_greedy_generate_matches_naive_loop():
    model, lm_cfg, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)

    prompt = jnp.asarray([[3, 17, 42, 9, 100, 7]], jnp.int32)
    T = 8
    gen = MLLMGenerator(
        model, lm_cfg, params,
        sampling=SamplingConfig(max_new_tokens=T, do_sample=False,
                                eos_token_id=-1),
        cache_dtype=jnp.float32)
    out = gen.generate(prompt)
    got = np.asarray(out["generate_ids"][0])

    # naive: full forward each step, argmax last logits
    def lm(ids):
        def fwd(m, ids):
            return m.language_model(ids)
        return model.apply(params, ids, method=fwd)

    ids = np.asarray(prompt)
    naive = []
    for _ in range(T):
        logits, _, _ = lm(jnp.asarray(ids))
        nxt = int(np.argmax(np.asarray(logits[0, -1].astype(jnp.float32))))
        naive.append(nxt)
        ids = np.concatenate([ids, [[nxt]]], axis=1)
    np.testing.assert_array_equal(got, np.asarray(naive, np.int32))


@pytest.mark.slow
def test_generate_with_images_runs():
    model, lm_cfg, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)

    nq = SPEC.nq
    Sp = 16
    prompt = np.full((1, Sp), 7, np.int32)
    ids_cmp = np.zeros((1, Sp), bool)
    ids_cmp[0, 2:2 + nq] = True
    embeds_cmp = np.zeros((SPEC.max_images,), bool)
    embeds_cmp[0] = True
    gen = MLLMGenerator(
        model, lm_cfg, params,
        sampling=SamplingConfig(max_new_tokens=4, do_sample=False,
                                eos_token_id=-1),
        cache_dtype=jnp.float32)
    out = gen.generate(
        jnp.asarray(prompt), images=batch["images"],
        embeds_cmp_mask=jnp.asarray(embeds_cmp),
        ids_cmp_mask=jnp.asarray(ids_cmp),
        patch_positions=batch["patch_positions"])
    assert out["generate_ids"].shape == (1, 4)
    # image content must influence decoding vs no image
    out2 = gen.generate(jnp.asarray(prompt))
    assert out["generate_ids"].shape == out2["generate_ids"].shape


@pytest.mark.slow
def test_padded_batch_matches_individual_generation():
    """Right-padded batch with different prompt lengths must produce the
    same tokens as generating each prompt alone."""
    model, lm_cfg, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    T = 6
    gen = MLLMGenerator(
        model, lm_cfg, params,
        sampling=SamplingConfig(max_new_tokens=T, do_sample=False,
                                eos_token_id=-1),
        cache_dtype=jnp.float32)

    a = [3, 17, 42, 9]
    b = [100, 7, 55, 81, 23, 64, 12, 30]
    Sp = len(b)
    ids = np.zeros((2, Sp), np.int32)
    mask = np.zeros((2, Sp), np.int32)
    ids[0, :len(a)] = a
    mask[0, :len(a)] = 1
    ids[1] = b
    mask[1] = 1
    out = gen.generate(jnp.asarray(ids), prompt_mask=jnp.asarray(mask))
    got = np.asarray(out["generate_ids"])

    solo_a = np.asarray(gen.generate(
        jnp.asarray([a], jnp.int32))["generate_ids"][0])
    solo_b = np.asarray(gen.generate(
        jnp.asarray([b], jnp.int32))["generate_ids"][0])
    np.testing.assert_array_equal(got[0], solo_a)
    np.testing.assert_array_equal(got[1], solo_b)


@pytest.mark.slow
def test_unrolled_layers_match_scan():
    """unroll_layers=True (per-layer params, scan_layers=False — the
    int8 serving layout) is token-for-token identical to the scan
    model, composed with fused projections + int8 quantization."""
    spec = TinySpec(batch=1, seq=32)
    model, lm_cfg, _ = build_tiny_mllm(spec)
    batch = synthetic_batch(spec, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    prompt = jnp.asarray([[3, 17, 42, 9, 100]], jnp.int32)
    cfg = SamplingConfig(max_new_tokens=8, do_sample=False,
                         eos_token_id=-1)

    base = MLLMGenerator(model, lm_cfg, params, sampling=cfg,
                         cache_dtype=jnp.float32)
    ref = np.asarray(base.generate(prompt)["generate_ids"][0])

    unrolled = MLLMGenerator(model, lm_cfg, params, sampling=cfg,
                             cache_dtype=jnp.float32,
                             unroll_layers=True)
    got = np.asarray(unrolled.generate(prompt)["generate_ids"][0])
    np.testing.assert_array_equal(got, ref)

    # int8 + fused + unrolled compose (the 8B serving stack); int8
    # changes numerics so just require a successful full decode
    q = MLLMGenerator(model, lm_cfg, params, sampling=cfg,
                      cache_dtype=jnp.float32, quantize_int8=True,
                      fuse_projections=True, unroll_layers=True)
    out = np.asarray(q.generate(prompt)["generate_ids"][0])
    assert out.shape == ref.shape


@pytest.mark.slow
def test_speculative_decode_matches_plain_greedy():
    """Prompt-lookup speculation is exact: greedy tokens AND hidden
    states match the plain loop token-for-token, on repetitive prompts
    (exercising long accepted runs) and non-repetitive ones."""
    spec = TinySpec(batch=1, seq=32)
    model, lm_cfg, _ = build_tiny_mllm(spec)
    batch = synthetic_batch(spec, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    cfg = SamplingConfig(max_new_tokens=12, do_sample=False,
                         eos_token_id=-1)
    plain = MLLMGenerator(model, lm_cfg, params, sampling=cfg,
                          cache_dtype=jnp.float32)
    spec_gen = MLLMGenerator(model, lm_cfg, params, sampling=cfg,
                             cache_dtype=jnp.float32, speculative_k=4,
                             speculative_ngram=2)
    prompts = [
        [7, 9, 11, 7, 9, 11, 7, 9],          # repetitive: accepts runs
        [3, 17, 42, 9, 100],                 # arbitrary
        [250, 4],                            # short
    ]
    for p in prompts:
        ids = jnp.asarray([p], jnp.int32)
        a = plain.generate(ids)
        b = spec_gen.generate(ids)
        np.testing.assert_array_equal(np.asarray(a["generate_ids"]),
                                      np.asarray(b["generate_ids"]))
        np.testing.assert_allclose(
            np.asarray(a["hidden_states"], np.float32),
            np.asarray(b["hidden_states"], np.float32),
            rtol=2e-4, atol=2e-4)


def test_speculative_padded_prompt_still_accepts():
    """Bucketed (right-padded) prompts must not poison the n-gram
    lookup: with prompt_len passed, a period-3 prompt padded 8->16
    accepts full k-runs, finishing max_new_tokens=12 with k=4 in
    <= ceil(12/5)+1 verify forwards. Without the pad-aware path the
    trailing gram contains pad ids and acceptance collapses to ~12
    forwards (ADVICE r1, sampler.py:232)."""
    from mllm_npu_tpu.models.generation.sampler import \
        speculative_decode_loop

    real = [7, 9, 11, 7, 9, 11, 7, 9]          # next is 11, period 3
    Sp, V, k, T = 16, 32, 4, 12
    ctx = jnp.asarray([real + [0] * (Sp - len(real))], jnp.int32)

    def step_multi(toks, cache):
        # oracle model: continues the 7->9->11->7 cycle for any input
        nxt = jnp.where(toks == 7, 9, jnp.where(toks == 9, 11, 7))
        logits = jax.nn.one_hot(nxt, V) * 10.0
        h = jnp.zeros(toks.shape + (4,), jnp.float32)
        return logits, h, {**cache, "pos": cache["pos"] + toks.shape[1]}

    cfg = SamplingConfig(max_new_tokens=T, do_sample=False,
                         eos_token_id=-1)
    cache0 = {"pos": jnp.asarray([len(real)], jnp.int32)}
    first = jnp.asarray([11], jnp.int32)       # greedy next after ...7,9
    fh = jnp.zeros((1, 4), jnp.float32)

    tokens, _, _, n_iters = speculative_decode_loop(
        step_multi, cache0, first, fh, cfg, ctx, k=k, ngram=2,
        prompt_len=jnp.asarray(len(real), jnp.int32))
    expect = [11, 7, 9, 11, 7, 9, 11, 7, 9, 11, 7, 9]
    np.testing.assert_array_equal(np.asarray(tokens[0]), expect)
    assert int(n_iters) <= (T + k) // (k + 1) + 1, int(n_iters)


def test_ladder_propose_overrides_and_falls_back():
    """Ladder-aware speculative proposals (sampler.ladder_propose):
    inside the forced ladder the successor chain is proposed (accepted
    by construction at verify); past the ladder's end and outside it
    the caller's prompt-lookup proposals pass through."""
    from mllm_npu_tpu.models.generation.sampler import ladder_propose
    ladder = ImageTokenLadder(ids=(5, 6, 7, 8, 9))
    props = jnp.asarray([101, 102, 103, 104], jnp.int32)
    # mid-ladder: cur=6 -> 7,8,9 then fall back past the end
    out = np.asarray(ladder_propose(jnp.asarray(6), props, ladder))
    np.testing.assert_array_equal(out, [7, 8, 9, 104])
    # ladder start (boi): full chain
    out = np.asarray(ladder_propose(jnp.asarray(5), props, ladder))
    np.testing.assert_array_equal(out, [6, 7, 8, 9])
    # final </img> is not a forcing position
    out = np.asarray(ladder_propose(jnp.asarray(9), props, ladder))
    np.testing.assert_array_equal(out, np.asarray(props))
    # not in ladder: untouched
    out = np.asarray(ladder_propose(jnp.asarray(3), props, ladder))
    np.testing.assert_array_equal(out, np.asarray(props))


def test_speculative_ladder_advances_k_plus_1():
    """With a ladder, the speculative loop drafts the known forced
    continuation: a 9-token forced chain + free text completes in <= 4
    verify forwards (k=4) instead of one forward per token. The oracle
    model NEVER predicts ladder tokens raw — forcing comes only from
    apply_image_ladder at verify, so full acceptance proves the
    proposals came from ladder_propose."""
    from mllm_npu_tpu.models.generation.sampler import \
        speculative_decode_loop
    Sp, V, k, T = 8, 32, 4, 12
    ladder = ImageTokenLadder(ids=tuple(range(20, 30)))  # boi=20 eoi=29
    real = [3, 17, 20]                                   # ends with boi
    ctx = jnp.asarray([real + [0] * (Sp - len(real))], jnp.int32)

    def step_multi(toks, cache):
        logits = jax.nn.one_hot(jnp.full(toks.shape, 2), V) * 10.0
        h = jnp.zeros(toks.shape + (4,), jnp.float32)
        return logits, h, {**cache, "pos": cache["pos"] + toks.shape[1]}

    cfg = SamplingConfig(max_new_tokens=T, do_sample=False,
                         eos_token_id=-1)
    cache0 = {"pos": jnp.asarray([len(real)], jnp.int32)}
    first = jnp.asarray([21], jnp.int32)   # forced successor of boi
    fh = jnp.zeros((1, 4), jnp.float32)
    tokens, _, _, n_iters = speculative_decode_loop(
        step_multi, cache0, first, fh, cfg, ctx, ladder=ladder, k=k,
        ngram=2, prompt_len=jnp.asarray(len(real), jnp.int32))
    expect = [21, 22, 23, 24, 25, 26, 27, 28, 29, 2, 2, 2]
    np.testing.assert_array_equal(np.asarray(tokens[0]), expect)
    assert int(n_iters) <= 4, int(n_iters)


@pytest.mark.slow
def test_speculative_decode_eos_stop():
    """Speculation respects eos: pick the plain run's 4th generated
    token as the eos id — the speculative run must stop at the same
    point even if eos lands mid-accepted-window."""
    spec = TinySpec(batch=1, seq=32)
    model, lm_cfg, _ = build_tiny_mllm(spec)
    batch = synthetic_batch(spec, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    base = SamplingConfig(max_new_tokens=12, do_sample=False,
                          eos_token_id=-1)
    prompt = jnp.asarray([[7, 9, 11, 7, 9, 11, 7, 9]], jnp.int32)
    ref = np.asarray(MLLMGenerator(
        model, lm_cfg, params, sampling=base,
        cache_dtype=jnp.float32).generate(prompt)["generate_ids"][0])
    eos = int(ref[3])
    cfg = SamplingConfig(max_new_tokens=12, do_sample=False,
                         eos_token_id=eos)
    a = np.asarray(MLLMGenerator(
        model, lm_cfg, params, sampling=cfg,
        cache_dtype=jnp.float32).generate(prompt)["generate_ids"][0])
    b = np.asarray(MLLMGenerator(
        model, lm_cfg, params, sampling=cfg, cache_dtype=jnp.float32,
        speculative_k=4, speculative_ngram=2)
        .generate(prompt)["generate_ids"][0])
    np.testing.assert_array_equal(a, b)
