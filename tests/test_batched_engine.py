"""Continuous-batching engine: greedy parity vs MLLMGenerator, slot
recycling, and mixed-length admission."""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_compaction_then_fresh_admit():
    """Force the shared write column to the end of the cache so the
    jitted compaction (repack) fires mid-stream, then admit a request
    whose prompt fills a whole bucket — its prompt keys live in columns
    that a post-repack write column must stay clear of (g is floored at
    max_prompt)."""
    model, lm_cfg, params = _stack()
    T13 = _reference_tokens(model, lm_cfg, params, [3, 17], 3)
    T23 = _reference_tokens(model, lm_cfg, params, [42, 9], 3)
    p3 = [7]
    p4 = [5, 1, 88, 200, 14, 3, 77, 21]          # full 8-wide bucket
    e3 = _reference_tokens(model, lm_cfg, params, p3, 12)
    e4 = _reference_tokens(model, lm_cfg, params, p4, 3)

    eng = ContinuousBatchingEngine(
        model, lm_cfg, params, num_slots=2, max_len=16, block_steps=2,
        prompt_bucket=8, max_prompt=8, eos_token_id=-1,
        cache_dtype=jnp.float32)
    r1 = eng.submit([3, 17], max_new_tokens=3)
    r2 = eng.submit([42, 9], max_new_tokens=3)
    while not (r1.done and r2.done):
        eng.step()
    # r3 alone pushes g toward max_len with a small valid-key count
    r3 = eng.submit(p3, max_new_tokens=12)
    for _ in range(3):                            # 3rd step repacks
        eng.step()
    assert not r3.done
    r4 = eng.submit(p4, max_new_tokens=3)
    eng.run_until_idle()
    assert r1.tokens == T13 and r2.tokens == T23
    assert r3.tokens == e3, (r3.tokens, e3)
    assert r4.tokens == e4, (r4.tokens, e4)


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
