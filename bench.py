"""Driver benchmark: prints ONE JSON line.

Benchmarks the Pallas flash-attention kernel at the exact shape of the
reference's published op-level numbers (B=32, H=8, S=256, D=256, 100
iters / 20 warmup — reference: mllm_npu/acceleration/test.py:12-17,33-52)
and compares against the Ascend 910B `torch_npu.npu_fusion_attention`
time (0.0022245049 s, acceleration.md:10). vs_baseline > 1 means faster
than the reference hardware+kernel.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_NPU_FUSION_ATTENTION_S = 0.0022245049  # Ascend 910B, fp16
B, H, S, D = 32, 8, 256, 256
WARMUP, ITERS = 20, 100


def main():
    from mllm_npu_tpu.ops.flash_attention import flash_attention

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    # kernel layout is BSHD
    q = jax.random.normal(kq, (B, S, H, D), dtype)
    k = jax.random.normal(kk, (B, S, H, D), dtype)
    v = jax.random.normal(kv, (B, S, H, D), dtype)

    fn = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, causal=False, block_q=256, block_k=256,
        interpret=not on_tpu))

    out = fn(q, k, v)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = fn(q, k, v)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(q, k, v)
    jax.block_until_ready(out)
    avg = (time.perf_counter() - t0) / ITERS

    print(json.dumps({
        "metric": "flash_attention_fwd_avg_time_B32H8S256D256",
        "value": avg,
        "unit": "s",
        "vs_baseline": BASELINE_NPU_FUSION_ATTENTION_S / avg,
    }))


if __name__ == "__main__":
    main()
