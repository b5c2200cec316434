"""Continuous-batching engine: greedy parity vs MLLMGenerator, slot
recycling, and mixed-length admission."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_npu_tpu.models.generation.generate import MLLMGenerator
from mllm_npu_tpu.models.generation.sampler import SamplingConfig
from mllm_npu_tpu.serve.batched_engine import ContinuousBatchingEngine
from mllm_npu_tpu.utils.testing import TinySpec, build_tiny_mllm, \
    synthetic_batch

SPEC = TinySpec(batch=1, seq=32)


def _stack():
    model, lm_cfg, _ = build_tiny_mllm(SPEC)
    batch = synthetic_batch(SPEC, cmp_images=1)
    params = model.init(jax.random.PRNGKey(0), **batch)
    return model, lm_cfg, params


def _reference_tokens(model, lm_cfg, params, prompt, T):
    gen = MLLMGenerator(
        model, lm_cfg, params,
        sampling=SamplingConfig(max_new_tokens=T, do_sample=False,
                                eos_token_id=-1),
        cache_dtype=jnp.float32)
    out = gen.generate(jnp.asarray([prompt], jnp.int32))
    return list(np.asarray(out["generate_ids"][0]))


@pytest.mark.slow
def test_batched_matches_single_request_greedy():
    model, lm_cfg, params = _stack()
    prompts = [[3, 17, 42, 9, 100, 7],
               [5, 1, 88, 200, 14, 3, 77, 21, 9],
               [250, 4, 4, 4]]
    T = 8
    expected = [_reference_tokens(model, lm_cfg, params, p, T)
                for p in prompts]

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=4, max_len=64, block_steps=3,
        prompt_bucket=8, max_prompt=16, eos_token_id=-1, cache_dtype=jnp.float32)
    reqs = [eng.submit(p, max_new_tokens=T) for p in prompts]
    eng.run_until_idle()
    for req, exp in zip(reqs, expected):
        assert req.done
        assert req.tokens == exp, (req.tokens, exp)


@pytest.mark.slow
def test_slot_recycling_more_requests_than_slots():
    model, lm_cfg, params = _stack()
    rs = np.random.RandomState(0)
    prompts = [list(rs.randint(3, 250, rs.randint(3, 12)))
               for _ in range(5)]
    T = 6
    expected = [_reference_tokens(model, lm_cfg, params, p, T)
                for p in prompts]

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=32, block_steps=4,
        prompt_bucket=16, eos_token_id=-1, cache_dtype=jnp.float32)
    reqs = [eng.submit(p, max_new_tokens=T) for p in prompts]
    eng.run_until_idle()
    for req, exp in zip(reqs, expected):
        assert req.done and req.tokens == exp


@pytest.mark.slow
def test_mesh_sharded_engine_parity():
    """Tensor-parallel serving: the engine over a (data=1, fsdp=1,
    tensor=2) mesh — params sharded on attention heads / MLP hidden,
    KV cache sharded on Hkv — produces the same greedy tokens as the
    single-device engine."""
    import pytest

    from mllm_npu_tpu.parallel import MeshConfig, build_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices (virtual CPU mesh or multi-chip)")
    model, lm_cfg, params = _stack()
    prompts = [[3, 17, 42, 9], [5, 1, 88, 200, 14, 3]]
    T = 6
    expected = [_reference_tokens(model, lm_cfg, params, p, T)
                for p in prompts]
    mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=2),
                      devices=jax.devices()[:2])
    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=3,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
        mesh=mesh)
    reqs = [eng.submit(p, max_new_tokens=T) for p in prompts]
    eng.run_until_idle()
    for req, exp in zip(reqs, expected):
        assert req.done and req.tokens == exp, (req.tokens, exp)


@pytest.mark.slow
def test_per_request_sampling():
    """enable_sampling: greedy and sampling requests share one decode
    batch — greedy rows keep exact parity with the reference decode,
    sampling rows are seed-deterministic, and near-zero temperature
    sampling collapses to greedy."""
    import pytest

    model, lm_cfg, params = _stack()
    pg = [3, 17, 42, 9]
    T = 8
    greedy_exp = _reference_tokens(model, lm_cfg, params, pg, T)

    def make():
        return ContinuousBatchingEngine(
            model, lm_cfg, params, num_slots=4, max_len=64,
            block_steps=3, prompt_bucket=8, eos_token_id=-1,
            cache_dtype=jnp.float32, enable_sampling=True)

    eng = make()
    r_greedy = eng.submit(pg, max_new_tokens=T)
    r_s1 = eng.submit([5, 1, 88], max_new_tokens=T, do_sample=True,
                      temperature=0.9, top_p=0.9, seed=7)
    r_cold = eng.submit([250, 4, 4], max_new_tokens=T, do_sample=True,
                        temperature=1e-4, top_p=1.0, seed=3)
    eng.run_until_idle()
    assert r_greedy.tokens == greedy_exp          # mixed batch: exact
    cold_exp = _reference_tokens(model, lm_cfg, params, [250, 4, 4], T)
    assert r_cold.tokens == cold_exp              # T→0 ⇒ greedy

    # same seed ⇒ same sample stream (fresh engine, same uid ordering)
    eng2 = make()
    eng2.submit(pg, max_new_tokens=T)
    r_s2 = eng2.submit([5, 1, 88], max_new_tokens=T, do_sample=True,
                       temperature=0.9, top_p=0.9, seed=7)
    eng2.submit([250, 4, 4], max_new_tokens=T, do_sample=True,
                temperature=1e-4, top_p=1.0, seed=3)
    eng2.run_until_idle()
    assert r_s1.tokens == r_s2.tokens

    # greedy engines reject sampling requests
    geng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=3,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32)
    with pytest.raises(ValueError):
        geng.submit([3, 4], max_new_tokens=4, do_sample=True)


def test_top_p_cutoff_filters():
    """Regression for the top-p cutoff bug (min over kept entries used
    -inf masking, making nucleus filtering a no-op): with a tiny top_p
    only the argmax token survives, so sampling at high temperature
    must still return it."""
    from mllm_npu_tpu.models.generation.sampler import (SamplingConfig,
                                                        _sample)
    logits = jnp.log(jnp.asarray(
        [[0.50, 0.30, 0.15, 0.05]], jnp.float32))
    cfg = SamplingConfig(do_sample=True, temperature=5.0, top_p=0.01)
    for i in range(8):
        tok = _sample(logits, jax.random.PRNGKey(i), cfg)
        assert int(tok[0]) == 0
    # top_p=0.5 at T=5 keeps exactly the top two tokens (flattened
    # probs ≈ .30/.27/.23/.19; cum−p crosses 0.5 at the third)
    cfg = SamplingConfig(do_sample=True, temperature=5.0, top_p=0.5)
    toks = {int(_sample(logits, jax.random.PRNGKey(i), cfg)[0])
            for i in range(64)}
    assert toks == {0, 1}, toks


@pytest.mark.slow
def test_capacity_validation():
    """submit() rejects requests that cannot fit a cache row (per-row
    write positions: a row holds prompt bucket + generated tokens)."""
    import pytest

    model, lm_cfg, params = _stack()
    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=32, block_steps=2,
        prompt_bucket=8, max_prompt=16, eos_token_id=-1,
        cache_dtype=jnp.float32)
    assert eng.capacity_for(5) == 22          # bucket 8 + block 2
    assert eng.capacity_for(9) == 14          # bucket 16 + block 2
    assert eng.capacity_for(17) == 0          # over max_prompt
    with pytest.raises(ValueError):           # prompt too long
        eng.submit(list(range(3, 20)), max_new_tokens=4)
    with pytest.raises(ValueError):           # decode budget too big
        eng.submit([3, 4, 5], max_new_tokens=30)
    # a fitting request still runs
    exp = _reference_tokens(model, lm_cfg, params, [3, 17, 42], 6)
    r = eng.submit([3, 17, 42], max_new_tokens=6)
    eng.run_until_idle()
    assert r.done and r.tokens == exp


@pytest.mark.slow
def test_staggered_submission():
    """Requests submitted while others are mid-decode join without
    disturbing running slots (the continuous part of the batching)."""
    model, lm_cfg, params = _stack()
    p1, p2 = [3, 17, 42, 9], [5, 1, 88, 200, 14, 3]
    T = 10
    e1 = _reference_tokens(model, lm_cfg, params, p1, T)
    e2 = _reference_tokens(model, lm_cfg, params, p2, T)

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=32, block_steps=2,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32)
    r1 = eng.submit(p1, max_new_tokens=T)
    eng.step()            # r1 decodes a couple of blocks alone
    eng.step()
    r2 = eng.submit(p2, max_new_tokens=T)
    eng.run_until_idle()
    assert r1.tokens == e1
    assert r2.tokens == e2


@pytest.mark.slow
def test_malformed_request_is_isolated():
    """A request whose prefill blows up (bad image shapes) fails alone
    with req.error set; the engine keeps serving other requests."""
    model, lm_cfg, params = _stack()
    good_prompt = [3, 17, 42, 9]
    T = 6
    exp = _reference_tokens(model, lm_cfg, params, good_prompt, T)

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=3,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32)
    bad = eng.submit([5, 1], max_new_tokens=T,
                     images=jnp.zeros((1, 7, 13, 2)),       # nonsense
                     embeds_cmp_mask=jnp.ones((1,), bool),
                     ids_cmp_mask=np.asarray([True, False]),
                     patch_positions=jnp.zeros((1, 2)))
    good = eng.submit(good_prompt, max_new_tokens=T)
    eng.run_until_idle()
    assert bad.done and bad.error is not None and bad.tokens == []
    assert good.done and good.error is None and good.tokens == exp


@pytest.mark.slow
def test_chunked_prefill_parity():
    """prefill_chunk: prompts feed through the multi-token decode
    branch one chunk per tick, interleaved with decode — greedy tokens
    identical to the monolithic-prefill engine, including a request
    admitted while another is mid-decode."""
    model, lm_cfg, params = _stack()
    p_long = list(np.random.RandomState(3).randint(3, 250, 19))  # 3 chunks of 8
    p_short = [3, 17, 42]
    T = 6
    exp_long = _reference_tokens(model, lm_cfg, params, p_long, T)
    exp_short = _reference_tokens(model, lm_cfg, params, p_short, T)

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=2,
        prompt_bucket=8, max_prompt=32, eos_token_id=-1,
        cache_dtype=jnp.float32, prefill_chunk=8)
    r_short = eng.submit(p_short, max_new_tokens=T)
    eng.step()                   # short admitted, starts decoding
    r_long = eng.submit(p_long, max_new_tokens=T)
    eng.run_until_idle()
    assert r_short.done and r_short.tokens == exp_short, \
        (r_short.tokens, exp_short)
    assert r_long.done and r_long.tokens == exp_long, \
        (r_long.tokens, exp_long)


@pytest.mark.slow
def test_chunked_prefill_subchunk_short_prompt_parity():
    """prefill_chunk < prompt_bucket: a short prompt's last real token
    lands in a NON-final chunk (the final chunk is pure padding), and
    the first token must come from that chunk's hidden state — not the
    final chunk's clamped pad position (advisor r1 high-severity
    repro: bucket=8, chunk=4, 3-token prompt returned garbage)."""
    model, lm_cfg, params = _stack()
    T = 6
    cases = [[3, 17, 42],                   # Sp=3 < bucket-C=4
             [5, 1, 88, 200],               # Sp=4 == bucket-C boundary
             [5, 1, 88, 200, 14],           # Sp=5, last tok in chunk 2
             list(np.random.RandomState(7).randint(3, 250, 11))]  # 2 buckets
    expected = [_reference_tokens(model, lm_cfg, params, p, T)
                for p in cases]
    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=4, max_len=64, block_steps=2,
        prompt_bucket=8, max_prompt=16, eos_token_id=-1,
        cache_dtype=jnp.float32, prefill_chunk=4)
    reqs = [eng.submit(p, max_new_tokens=T) for p in cases]
    eng.run_until_idle()
    for req, exp, p in zip(reqs, expected, cases):
        assert req.done and req.tokens == exp, (p, req.tokens, exp)


@pytest.mark.slow
def test_chunked_prefill_capped_bucket_parity():
    """max_prompt that is not a multiple of prompt_bucket: the engine
    rounds the cap down so every admission bucket tiles by the chunk
    size (advisor r1 medium: a capped non-multiple bucket let the
    chunk loop write past the bucket via clamped dynamic slices)."""
    model, lm_cfg, params = _stack()
    T = 6
    p = list(np.random.RandomState(11).randint(3, 250, 13))
    exp = _reference_tokens(model, lm_cfg, params, p, T)
    # max_prompt=20 -> rounded down to 16; bucket for Sp=13 is 16
    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=2,
        prompt_bucket=8, max_prompt=20, eos_token_id=-1,
        cache_dtype=jnp.float32, prefill_chunk=8)
    assert eng.max_prompt == 16
    r = eng.submit(p, max_new_tokens=T)
    eng.run_until_idle()
    assert r.done and r.tokens == exp, (r.tokens, exp)


@pytest.mark.slow
def test_engine_image_ladder_forcing():
    """With a ladder, the engine mirrors AutoImageTokenGenerationProcessor
    (reference mllm.py:18-43): a prompt ending in <img> force-decodes the
    full <img_00000>...</img> ladder, and ladder tokens are suppressed
    otherwise — token-for-token equal to MLLMGenerator's ladder path."""
    from mllm_npu_tpu.models.generation.sampler import ImageTokenLadder
    from mllm_npu_tpu.utils.testing import FakeTokenizer

    model, lm_cfg, params = _stack()
    tok = FakeTokenizer()
    n_img = 4
    ladder_ids = tuple([tok.special["<img>"]]
                       + [tok.special[f"<img_{i:05d}>"]
                          for i in range(n_img)]
                       + [tok.special["</img>"]])
    ladder = ImageTokenLadder(ids=ladder_ids)
    T = n_img + 2
    prompt = [3, 17, ladder_ids[0]]          # ends with <img>

    gen = MLLMGenerator(
        model, lm_cfg, params,
        sampling=SamplingConfig(max_new_tokens=T, do_sample=False,
                                eos_token_id=-1),
        ladder=ladder, cache_dtype=jnp.float32)
    exp = list(np.asarray(gen.generate(
        jnp.asarray([prompt], jnp.int32))["generate_ids"][0]))
    assert exp[:n_img + 1] == list(ladder_ids[1:]), exp  # forced ladder

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=2,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
        ladder=ladder)
    r = eng.submit(prompt, max_new_tokens=T)
    eng.run_until_idle()
    assert r.tokens == exp, (r.tokens, exp)

    # chunked prefill path honors the ladder on the first token too
    eng2 = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=2,
        prompt_bucket=8, max_prompt=16, eos_token_id=-1,
        cache_dtype=jnp.float32, ladder=ladder, prefill_chunk=8)
    long_prompt = [5, 9, 44, 7, 3, 17, 250, 8, 99, ladder_ids[0]]
    exp2 = list(np.asarray(gen.generate(
        jnp.asarray([long_prompt], jnp.int32))["generate_ids"][0]))
    r2 = eng2.submit(long_prompt, max_new_tokens=T)
    eng2.run_until_idle()
    assert r2.tokens == exp2, (r2.tokens, exp2)


@pytest.mark.slow
def test_chunked_admission_fuzz_parity():
    """Randomized (prompt_bucket, prefill_chunk, max_prompt, prompt
    lengths) configurations: chunked admission must match the reference
    generator token-for-token across the parameter space that held the
    round-1 chunk/bucket bugs (VERDICT r1 / ADVICE r1 items)."""
    model, lm_cfg, params = _stack()
    rs = np.random.RandomState(42)
    T = 5
    ref_cache = {}

    def expected(prompt):
        key = tuple(prompt)
        if key not in ref_cache:
            ref_cache[key] = _reference_tokens(model, lm_cfg, params,
                                               list(prompt), T)
        return ref_cache[key]

    for trial in range(6):
        bucket = int(rs.choice([4, 8, 16]))
        # chunk either divides or is a multiple of the bucket (the
        # constructor contract) — both directions exercised
        chunk = int(rs.choice([max(bucket // 2, 2), bucket, bucket * 2]))
        max_prompt = int(rs.choice([17, 24, 32]))  # incl. a non-multiple
        eng = ContinuousBatchingEngine(
            model, lm_cfg, params, num_slots=3, max_len=64,
            block_steps=int(rs.choice([2, 3])), prompt_bucket=bucket,
            max_prompt=max_prompt, eos_token_id=-1,
            cache_dtype=jnp.float32, prefill_chunk=chunk)
        prompts = [list(rs.randint(3, lm_cfg.vocab_size,
                                   int(rs.randint(2, eng.max_prompt + 1))))
                   for _ in range(4)]
        reqs = [eng.submit(p, max_new_tokens=T) for p in prompts]
        eng.run_until_idle()
        for p, r in zip(prompts, reqs):
            assert r.done and not r.error, (trial, r.error)
            assert r.tokens == expected(p), (
                trial, bucket, chunk, max_prompt, len(p), r.tokens,
                expected(p))


@pytest.mark.slow
def test_mesh_sharded_engine_parity_quantized():
    """Quantized (int8) TP serving: the engine over a tensor=2 mesh with
    an int8-layout LLM — shard_map-dispatched dequant matmuls (GSPMD
    cannot partition the Pallas kernels) — produces the same greedy
    tokens as the single-device int8 engine."""
    from mllm_npu_tpu.models.generation.generate import rebuild_llm
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.utils.weights import quantize_llama_params

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices (virtual CPU mesh or multi-chip)")
    model, lm_cfg, params = _stack()
    model, lm_cfg, params = rebuild_llm(
        model, lm_cfg, params,
        lambda p: quantize_llama_params(p, bits=8),
        quantization="int8")
    prompts = [[3, 17, 42, 9], [5, 1, 88, 200, 14, 3]]
    T = 6

    def tokens(mesh):
        eng = ContinuousBatchingEngine(
            model, lm_cfg, params, num_slots=2, max_len=64, block_steps=3,
            prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
            mesh=mesh)
        reqs = [eng.submit(p, max_new_tokens=T) for p in prompts]
        eng.run_until_idle()
        assert all(r.done for r in reqs)
        return [r.tokens for r in reqs]

    expected = tokens(None)
    mesh = build_mesh(MeshConfig(data=1, fsdp=1, tensor=2),
                      devices=jax.devices()[:2])
    got = tokens(mesh)
    assert got == expected, (got, expected)


# ---------------------------------------------------------------------------
# prompt-prefix KV cache
# ---------------------------------------------------------------------------

def test_prefix_cache_unit_longest_aligned_match():
    from mllm_npu_tpu.serve.prefix_cache import PrefixCache
    pc = PrefixCache(max_entries=4, granularity=4)
    k = jnp.zeros((2, 1, 8, 1, 4))
    v = jnp.ones((2, 1, 8, 1, 4))
    toks = np.arange(8, dtype=np.int32)
    pc.insert(toks, k, v)                 # stores the full 8 (aligned)
    assert len(pc) == 1

    # identical prompt: hit capped at <= Sp-1 -> 4 (aligned down)
    e = pc.lookup(toks)
    assert e is not None and len(e.tokens) == 4
    assert e.k.shape[2] == 4

    # longer prompt sharing all 8: full-entry hit
    longer = np.concatenate([toks, toks])
    e = pc.lookup(longer)
    assert e is not None and len(e.tokens) == 8

    # diverges at position 5: common=5 -> aligned 4
    div = toks.copy()
    div[5] = 99
    e = pc.lookup(np.concatenate([div, div]))
    assert e is not None and len(e.tokens) == 4

    # diverges at position 2: common=2 -> no aligned prefix
    div2 = toks.copy()
    div2[2] = 99
    assert pc.lookup(np.concatenate([div2, div2])) is None

    # align coarser than granularity
    e = pc.lookup(longer, align=8)
    assert e is not None and len(e.tokens) == 8
    assert pc.lookup(toks, align=8) is None   # usable=(8-1)//8*8=0


def test_prefix_cache_lru_eviction():
    from mllm_npu_tpu.serve.prefix_cache import PrefixCache
    pc = PrefixCache(max_entries=2, granularity=2)
    k = jnp.zeros((1, 1, 4, 1, 2))
    a = np.asarray([1, 2, 3, 4], np.int32)
    b = np.asarray([5, 6, 7, 8], np.int32)
    c = np.asarray([9, 10, 11, 12], np.int32)
    pc.insert(a, k, k)
    pc.insert(b, k, k)
    pc.lookup(np.concatenate([a, a]))     # refresh a
    pc.insert(c, k, k)                    # evicts b (LRU)
    assert pc.lookup(np.concatenate([b, b])) is None
    assert pc.lookup(np.concatenate([a, a])) is not None
    assert pc.lookup(np.concatenate([c, c])) is not None


@pytest.mark.slow
@pytest.mark.parametrize("prefill_chunk", [None, 8])
def test_prefix_cache_token_parity(prefill_chunk):
    """Greedy outputs are identical whether a prompt prefills cold or
    reuses a cached prefix — incl. the resubmit-the-same-prompt case."""
    model, lm_cfg, params = _stack()
    sys_prompt = [7, 3, 99, 12, 45, 6, 81, 2, 33, 9]   # > bucket of 8
    prompts = [sys_prompt + [100, 101, 5],
               sys_prompt + [200, 14, 77, 21],
               sys_prompt + [100, 101, 5]]             # exact resubmit
    T = 6
    expected = [_reference_tokens(model, lm_cfg, params, p, T)
                for p in prompts]

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=48, block_steps=3,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
        prefill_chunk=prefill_chunk, prefix_cache=4)
    reqs = []
    for p in prompts:                   # serialize so hits are real
        r = eng.submit(p, max_new_tokens=T)
        eng.run_until_idle()
        reqs.append(r)
    for req, exp in zip(reqs, expected):
        assert req.done and req.tokens == exp, (req.tokens, exp)
    st = eng.stats()["prefix_cache"]
    assert st["hits"] >= 2 and st["tokens_saved"] >= 16, st


@pytest.mark.slow
def test_speculative_engine_matches_plain_greedy():
    """speculative_k > 0: per-slot prompt-lookup verify emits the SAME
    greedy token stream as the plain block-decode engine (acceptance
    only changes how many model calls it takes, never the tokens)."""
    model, lm_cfg, params = _stack()
    # repetitive prompts (prompt-lookup accepts runs) + a random one
    prompts = [[7, 8, 9, 7, 8, 9, 7, 8],
               [5, 1, 88, 200, 14, 3, 77, 21, 9],
               [4, 4, 4, 4, 4, 4]]
    T = 10
    expected = [_reference_tokens(model, lm_cfg, params, p, T)
                for p in prompts]

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=4, max_len=64,
        prompt_bucket=8, max_prompt=16, eos_token_id=-1,
        cache_dtype=jnp.float32, speculative_k=4)
    reqs = [eng.submit(p, max_new_tokens=T) for p in prompts]
    eng.run_until_idle()
    for req, exp in zip(reqs, expected):
        assert req.done
        assert req.tokens == exp, (req.tokens, exp)


@pytest.mark.slow
def test_speculative_engine_acceptance_mechanics():
    """Deterministic oracle check of the per-slot accept logic: a
    model that always continues the 7->8->9 cycle. Row 0's history is
    the cycle (drafts fully accepted -> k+1 tokens/tick); row 1's
    history has no repeating n-gram (pad drafts rejected -> exactly 1
    token/tick); row 2 is inactive (emits nothing)."""
    model, lm_cfg, params = _stack()
    B, k, max_len = 4, 4, 64
    W = k + 1
    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=B, max_len=max_len,
        prompt_bucket=16, eos_token_id=-1, cache_dtype=jnp.float32,
        speculative_k=k)
    L, _, _, Hkv, D = eng.state["k"].shape
    V = lm_cfg.vocab_size

    # deterministic next-token table: 8->1->2->3->4->5
    table = np.zeros((V,), np.int32)
    for a, b_ in [(8, 1), (1, 2), (2, 3), (3, 4), (4, 5)]:
        table[a] = b_
    table_j = jnp.asarray(table)

    def oracle_lm(params_, toks, cache, positions, attn_mask, **kw):
        logits = jax.nn.one_hot(table_j[toks], V) * 10.0
        out_cache = {"k": cache["k"], "v": cache["v"],
                     "pos": cache["pos"],
                     "k_col": jnp.zeros((L, B, W, Hkv, D), jnp.float32),
                     "v_col": jnp.zeros((L, B, W, Hkv, D), jnp.float32)}
        return logits, None, out_cache

    eng._lm_apply = oracle_lm

    st = eng.state
    hist = np.asarray(st["hist"]).copy()
    # trailing gram [9,7,8] recurs at index 2..4 followed by [1,2,3,4]
    # — the proposer drafts exactly the oracle's continuation of cur=8
    rep = [5, 6, 9, 7, 8, 1, 2, 3, 4, 9, 7, 8]
    hist[0, :len(rep)] = rep
    rnd = [3, 17, 42, 100, 5, 60, 11, 2]     # no repeated n-gram
    hist[1, :len(rnd)] = rnd
    st = {**st,
          "hist": jnp.asarray(hist),
          "hist_len": jnp.asarray([len(rep), len(rnd), 0, 0], jnp.int32),
          "cur_tok": jnp.asarray([8, 2, 0, 0], jnp.int32),
          "active": jnp.asarray([True, True, False, False]),
          "write_pos": jnp.asarray([12, 8, 0, 0], jnp.int32),
          "rope_pos": jnp.asarray([12, 8, 0, 0], jnp.int32),
          "n_gen": jnp.asarray([1, 1, 0, 0], jnp.int32),
          "max_gen": jnp.asarray([32, 32, 0, 0], jnp.int32),
          "key_valid": st["key_valid"]}
    decode = eng._get_spec_decode()
    new_state, toks, mask = decode(eng.params, st)
    toks, mask = np.asarray(toks), np.asarray(mask)
    # row 0: drafts [1,2,3,4] all match the oracle chain -> k+1 emitted
    assert mask[0].sum() == W, (toks[0], mask[0])
    assert list(toks[0]) == [1, 2, 3, 4, 5]
    # row 1: pad drafts rejected -> exactly 1 emitted (the correction)
    assert mask[1].sum() == 1, (toks[1], mask[1])
    # row 2/3: inactive -> nothing
    assert mask[2].sum() == 0 and mask[3].sum() == 0
    ns = {kk: np.asarray(vv) for kk, vv in new_state.items()}
    assert list(ns["write_pos"]) == [12 + W, 9, 0, 0]
    assert list(ns["hist_len"]) == [12 + W, 9, 0, 0]
    assert list(ns["n_gen"]) == [1 + W, 2, 0, 0]
    # histories extended with the emitted tokens
    assert list(ns["hist"][0, 12:12 + W]) == [1, 2, 3, 4, 5]


@pytest.mark.slow
def test_speculative_engine_mixed_sampled_and_greedy_slots():
    """Sampled slots ride the same verify forward but emit exactly one
    sampled token per tick; greedy slots in the same batch still match
    the deterministic reference stream."""
    model, lm_cfg, params = _stack()
    greedy_prompt = [3, 17, 42, 9, 100, 7]
    T = 8
    exp = _reference_tokens(model, lm_cfg, params, greedy_prompt, T)
    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=4, max_len=64,
        prompt_bucket=8, max_prompt=16, eos_token_id=-1,
        cache_dtype=jnp.float32, speculative_k=4,
        enable_sampling=True)
    r_greedy = eng.submit(greedy_prompt, max_new_tokens=T)
    r_samp = eng.submit([5, 1, 88, 200], max_new_tokens=T,
                        do_sample=True, temperature=0.8, top_p=0.9,
                        seed=7)
    eng.run_until_idle()
    assert r_greedy.done and r_greedy.tokens == exp
    assert r_samp.done and len(r_samp.tokens) == T
    assert all(0 <= t < SPEC.vocab for t in r_samp.tokens)


@pytest.mark.slow
def test_engine_fp8_kv_cache():
    """fp8 (e4m3) KV storage — halves cache HBM footprint + read
    traffic (decisive for no-GQA models like Llama-2-13B): decode
    completes full-length, is deterministic run-to-run, the FIRST
    token exactly matches the f32-cache reference (it comes from
    prefill logits, which never touch the cache dtype), and a
    multi-token greedy stream tracks the bf16-cache stream over a
    moderate prefix (the tiny random model has near-tied logits, so
    full-stream identity is not expected — but an every-token-degrades
    bug, like doing the softmax math in fp8, collapses the shared
    prefix to ~1)."""
    model, lm_cfg, params = _stack()
    prompt = [3, 17, 42, 9, 100, 7]
    T = 24
    exp = _reference_tokens(model, lm_cfg, params, prompt, T)

    def run(dtype):
        eng = ContinuousBatchingEngine(
            model, lm_cfg, params, num_slots=2, max_len=64,
            block_steps=2, prompt_bucket=8, eos_token_id=-1,
            cache_dtype=dtype)
        assert eng.state["k"].dtype == dtype
        r = eng.submit(prompt, max_new_tokens=T)
        eng.run_until_idle()
        return r.tokens

    a = run(jnp.float8_e4m3fn)
    assert len(a) == T and all(0 <= t < SPEC.vocab for t in a)
    assert a[0] == exp[0], (a, exp)
    assert run(jnp.float8_e4m3fn) == a      # deterministic
    bf = run(jnp.bfloat16)
    shared = 0
    for x, y in zip(a, bf):
        if x != y:
            break
        shared += 1
    # measured 12 shared tokens on this stack; the old fp8-math path
    # would diverge almost immediately
    assert shared >= 4, (shared, a, bf)


@pytest.mark.slow
def test_fp8_kv_decode_attention_error_bound():
    """Numeric bound on the fp8 STORAGE path (ADVICE r4 #1): with an
    e4m3 cache, decode_attention must compute in bf16 — q and the
    softmax probabilities quantized to fp8 (the old behavior) measure
    10.5% RMS error vs the f32 oracle; storage-only quantization
    measures 3.7%. The 8% bound separates the two regimes."""
    from mllm_npu_tpu.ops.attention import decode_attention

    rs = np.random.RandomState(0)
    B, Hq, Hkv, D, Sk = 2, 8, 4, 64, 256
    q = jnp.asarray(rs.randn(B, 1, Hq, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, Sk, Hkv, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, Sk, Hkv, D), jnp.float32)
    mask = jnp.ones((B, 1, 1, Sk), bool)
    ref = decode_attention(q.astype(jnp.float32), k, v, mask)
    o = decode_attention(q, k.astype(jnp.float8_e4m3fn),
                         v.astype(jnp.float8_e4m3fn), mask)
    d = o.astype(jnp.float32) - ref.astype(jnp.float32)
    denom = float(jnp.sqrt(jnp.mean(ref.astype(jnp.float32) ** 2)))
    rms_rel = float(jnp.sqrt(jnp.mean(d ** 2))) / denom
    assert rms_rel < 0.08, rms_rel
    # and the bf16 cache stays an order of magnitude tighter
    ob = decode_attention(q, k.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16), mask)
    db = ob.astype(jnp.float32) - ref.astype(jnp.float32)
    assert float(jnp.sqrt(jnp.mean(db ** 2))) / denom < 0.01


@pytest.mark.slow
def test_speculative_engine_ladder_parity_and_sampled_forcing():
    """Ladder + speculative_k: (a) greedy token parity with the plain
    ladder engine; (b) a SAMPLED request whose prompt ends with <img>
    still emits the exact forced ladder (forced positions accept and
    are deterministic under any temperature)."""
    from mllm_npu_tpu.models.generation.sampler import ImageTokenLadder
    from mllm_npu_tpu.utils.testing import FakeTokenizer

    model, lm_cfg, params = _stack()
    tok = FakeTokenizer()
    n_img = 4
    ladder_ids = tuple([tok.special["<img>"]]
                       + [tok.special[f"<img_{i:05d}>"]
                          for i in range(n_img)]
                       + [tok.special["</img>"]])
    ladder = ImageTokenLadder(ids=ladder_ids)
    T = n_img + 3
    prompt = [3, 17, ladder_ids[0]]          # ends with <img>

    plain = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=2,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
        ladder=ladder)
    r0 = plain.submit(prompt, max_new_tokens=T)
    plain.run_until_idle()
    exp = r0.tokens
    assert exp[:n_img + 1] == list(ladder_ids[1:]), exp

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
        ladder=ladder, speculative_k=3, enable_sampling=True)
    r1 = eng.submit(prompt, max_new_tokens=T)
    r2 = eng.submit(prompt, max_new_tokens=T, do_sample=True,
                    temperature=0.9, top_p=0.95, seed=3)
    eng.run_until_idle()
    assert r1.done and r1.tokens == exp, (r1.tokens, exp)
    assert r2.done and r2.tokens[:n_img + 1] == list(ladder_ids[1:]), \
        r2.tokens


@pytest.mark.slow
def test_speculative_engine_ladder_mechanics():
    """Oracle check of ladder-aware drafting: with cur_tok inside the
    forced ladder, BOTH a greedy and a sampled row advance k+1 forced
    tokens in ONE verify tick (the oracle model never predicts ladder
    tokens raw, so full acceptance proves the drafts came from
    ladder_propose); at the ladder's END a sampled row's correction
    token is SAMPLED from the post-</img> logits (varies across rng),
    while a greedy row's stays argmax."""
    from mllm_npu_tpu.models.generation.sampler import ImageTokenLadder

    model, lm_cfg, params = _stack()
    B, k, max_len = 4, 4, 64
    W = k + 1
    lad = tuple(range(20, 31))               # boi=20, eoi=30
    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=B, max_len=max_len,
        prompt_bucket=16, eos_token_id=-1, cache_dtype=jnp.float32,
        speculative_k=k, enable_sampling=True,
        ladder=ImageTokenLadder(ids=lad))
    L, _, _, Hkv, D = eng.state["k"].shape
    V = lm_cfg.vocab_size

    # near-flat raw logits, never pointing at ladder tokens
    raw = (jnp.arange(V, dtype=jnp.float32) % 7) * 0.05
    raw = raw.at[20:31].set(-5.0)

    def oracle_lm(params_, toks, cache, positions, attn_mask, **kw):
        logits = jnp.broadcast_to(raw, toks.shape + (V,))
        out_cache = {"k": cache["k"], "v": cache["v"],
                     "pos": cache["pos"],
                     "k_col": jnp.zeros((L, B, W, Hkv, D), jnp.float32),
                     "v_col": jnp.zeros((L, B, W, Hkv, D), jnp.float32)}
        return logits, None, out_cache

    eng._lm_apply = oracle_lm
    decode = eng._get_spec_decode()

    def run_with_seed(seed):
        # decode donates its state arg — copy the template per call
        base = jax.tree.map(jnp.copy, eng.state)
        st = {**base,
              "cur_tok": jnp.asarray([20, 20, 28, 28], jnp.int32),
              "active": jnp.ones((B,), bool),
              "do_sample": jnp.asarray([False, True, True, False]),
              "temp": jnp.asarray([1.0, 1.0, 4.0, 1.0], jnp.float32),
              "top_p": jnp.ones((B,), jnp.float32),
              "rng": jax.random.split(jax.random.PRNGKey(seed), B),
              "write_pos": jnp.full((B,), 8, jnp.int32),
              "rope_pos": jnp.full((B,), 8, jnp.int32),
              "n_gen": jnp.ones((B,), jnp.int32),
              "max_gen": jnp.full((B,), 32, jnp.int32)}
        _, toks, mask = decode(eng.params, st)
        return np.asarray(toks), np.asarray(mask)

    toks, mask = run_with_seed(0)
    # rows 0 (greedy) and 1 (sampled) mid-ladder: k+1 forced tokens
    for r in (0, 1):
        assert mask[r].sum() == W, (r, toks[r], mask[r])
        assert list(toks[r]) == [21, 22, 23, 24, 25], toks[r]
    # rows 2/3 at ladder end (cur=28): forced 29,30 accepted, then the
    # correction — greedy row 3 emits argmax; sampled row 2 samples
    g_corr = int(np.argmax(np.asarray(raw)))
    assert mask[3].sum() == 3 and list(toks[3][:3]) == [29, 30, g_corr]
    assert mask[2].sum() == 3 and list(toks[2][:2]) == [29, 30]
    # the correction position is genuinely sampled: across seeds it
    # varies (near-flat logits at temperature 4), never a ladder token
    corr = {int(run_with_seed(s)[0][2, 2]) for s in range(6)}
    assert len(corr) >= 2, corr
    assert all(c < 20 or c > 30 for c in corr), corr


@pytest.mark.slow
@pytest.mark.parametrize("prefill_chunk", [None, 8])
def test_speculative_with_prefix_cache_parity(prefill_chunk):
    """Compose: a prompt admitted via a prefix-cache HIT into a
    speculative_k>0 engine emits the same greedy tokens as the cold
    plain engine — the two features share per-slot history/write-pos
    state (hist is seeded from the full prompt even when only the
    suffix prefills), so the composition needs its own parity proof."""
    model, lm_cfg, params = _stack()
    sys_prompt = [7, 3, 99, 12, 45, 6, 81, 2, 33, 9]   # > bucket of 8
    prompts = [sys_prompt + [100, 101, 5],
               sys_prompt + [200, 14, 77, 21],
               sys_prompt + [100, 101, 5]]             # exact resubmit
    T = 8
    expected = [_reference_tokens(model, lm_cfg, params, p, T)
                for p in prompts]

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=64, block_steps=3,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
        prefill_chunk=prefill_chunk, prefix_cache=4, speculative_k=4)
    reqs = []
    for p in prompts:                   # serialize so hits are real
        r = eng.submit(p, max_new_tokens=T)
        eng.run_until_idle()
        reqs.append(r)
    for req, exp in zip(reqs, expected):
        assert req.done and req.tokens == exp, (req.tokens, exp)
    st = eng.stats()["prefix_cache"]
    assert st["hits"] >= 2 and st["tokens_saved"] >= 16, st


@pytest.mark.slow
def test_speculative_full_ladder_burst_single_tick():
    """speculative_k = ladder_width: the ENTIRE forced image ladder
    emits in ONE verify tick — the serving configuration behind the
    seedx burst headline (k=63 collapses the 64 forced tokens into one
    forward there; this is the same mechanism at tiny scale). Asserts
    (a) token parity with the plain engine and (b) that one tick's
    emission spans the whole ladder."""
    from mllm_npu_tpu.models.generation.sampler import ImageTokenLadder
    from mllm_npu_tpu.utils.testing import FakeTokenizer

    model, lm_cfg, params = _stack()
    tok = FakeTokenizer()
    n_img = 8
    ladder_ids = tuple([tok.special["<img>"]]
                       + [tok.special[f"<img_{i:05d}>"]
                          for i in range(n_img)]
                       + [tok.special["</img>"]])
    ladder = ImageTokenLadder(ids=ladder_ids)
    # after prefill emits <img>, the remaining forced chain is
    # n_img + 1 tokens (img_0..img_{n-1}, </img>): k = n_img + 1 makes
    # the verify window span it exactly (k + 1 = chain + correction)
    k = n_img + 1
    T = n_img + 4

    plain = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=1, max_len=64, block_steps=2,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
        ladder=ladder)
    # force the prompt to end with <img> so the ladder starts at once
    prompt = [3, 17, 42, ladder_ids[0]]
    r0 = plain.submit(prompt, max_new_tokens=T)
    plain.run_until_idle()
    exp = r0.tokens
    assert exp[:n_img + 1] == list(ladder_ids[1:]), exp

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=1, max_len=64,
        prompt_bucket=8, eos_token_id=-1, cache_dtype=jnp.float32,
        ladder=ladder, speculative_k=k)
    r1 = eng.submit(prompt, max_new_tokens=T)
    # drive tick-by-tick, recording per-tick emission deltas (token
    # distribution lags dispatch by one tick under pipelining — count
    # deltas, not ticks)
    deltas, last = [], len(r1.tokens)
    while eng.step():
        now = len(r1.tokens)
        if now != last:
            deltas.append(now - last)
            last = now
    assert r1.done and r1.tokens == exp, (r1.tokens, exp)
    # delta[0] = 1 is the prefill's first token (already forced to
    # ladder_ids[1] at admission); the FIRST DECODE emission then
    # spans the whole remaining ladder (n_img forced) + the correction
    # token in one verify tick — the 64-wide burst at seedx scale
    assert len(deltas) >= 2 and deltas[0] == 1, (deltas, r1.tokens)
    assert deltas[1] >= n_img + 1, (deltas, r1.tokens)


@pytest.mark.slow
def test_fp8_kv_with_speculative_ladder():
    """Compose the 13B serving combo: fp8 KV cache (capacity) x
    speculative_k spanning the ladder (burst) — the forced image
    ladder must come out EXACTLY (forced positions are accepted by
    construction, independent of cache numerics), the stream completes
    and is deterministic."""
    from mllm_npu_tpu.models.generation.sampler import ImageTokenLadder
    from mllm_npu_tpu.utils.testing import FakeTokenizer

    model, lm_cfg, params = _stack()
    tok = FakeTokenizer()
    n_img = 4
    ladder_ids = tuple([tok.special["<img>"]]
                       + [tok.special[f"<img_{i:05d}>"]
                          for i in range(n_img)]
                       + [tok.special["</img>"]])
    ladder = ImageTokenLadder(ids=ladder_ids)
    prompt = [3, 17, 42, ladder_ids[0]]
    T = n_img + 3

    def run():
        eng = ContinuousBatchingEngine(
            model, lm_cfg, params, num_slots=2, max_len=64,
            prompt_bucket=8, eos_token_id=-1,
            cache_dtype=jnp.float8_e4m3fn,
            ladder=ladder, speculative_k=n_img + 1)
        r = eng.submit(prompt, max_new_tokens=T)
        eng.run_until_idle()
        return r.tokens

    a = run()
    assert len(a) == T
    assert a[:n_img + 1] == list(ladder_ids[1:]), a
    assert run() == a
