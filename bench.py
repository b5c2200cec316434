"""Driver benchmark: prints ONE JSON line.

Benchmarks the Pallas flash-attention kernel at the exact shape of the
reference's published op-level numbers (B=32, H=8, S=256, D=256 —
reference: mllm_npu/acceleration/test.py:12-17,33-52) and compares
against the Ascend 910B `torch_npu.npu_fusion_attention` time
(0.0022245049 s, acceleration.md:10). vs_baseline > 1 = faster than the
reference hardware+kernel.

Timing method: the op iterates inside an on-device ``lax.fori_loop``
(data-dependent chaining) and per-op time is the slope between two loop
lengths. This removes host-dispatch/tunnel overhead that a host-side
loop would measure (which on the axon relay both under- and
over-estimates wildly).
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp

BASELINE_NPU_FUSION_ATTENTION_S = 0.0022245049  # Ascend 910B, fp16
B, H, S, D = 32, 8, 256, 256
# long loop >> short loop so the slope denominator dwarfs per-call
# jitter through the axon relay; 15 reps for a stable median
N_SHORT, N_LONG = 20, 220
N_REPS = 15


def main():
    from mllm_npu_tpu.ops.flash_attention import flash_attention

    # Backend-init probe with a timeout: a wedged remote-TPU tunnel
    # makes jax.devices() HANG (observed live), and a hung bench stalls
    # the whole driver. Fail fast and loud instead.
    import sys
    import threading
    state = {}

    def _probe():
        try:
            state["backend"] = jax.default_backend()
        except Exception as e:  # noqa: BLE001
            state["error"] = str(e)

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout=180.0)
    if "backend" not in state:
        print(json.dumps({
            "metric": "flash_attention_fwd_avg_time_B32H8S256D256",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": state.get(
                "error", "JAX backend init hung >180s — TPU tunnel down"),
        }))
        sys.exit(1)

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q0 = jax.random.normal(kq, (B, S, H, D), dtype)
    k = jax.random.normal(kk, (B, S, H, D), dtype)
    v = jax.random.normal(kv, (B, S, H, D), dtype)

    def attn(q):
        return flash_attention(q, k, v, causal=False,
                               block_q=256, block_k=256,
                               interpret=not on_tpu)

    def make(n):
        @jax.jit
        def run(q):
            out = jax.lax.fori_loop(0, n, lambda i, x: attn(x), q)
            return jnp.sum(out.astype(jnp.float32))
        return run

    def timed(n, reps=N_REPS):
        """Per-rep wall times of the n-iteration on-device loop."""
        fn = make(n)
        float(fn(q0))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(q0))  # scalar fetch forces materialization
            times.append(time.perf_counter() - t0)
        return times

    # Median-of-N slope (VERDICT r2 #5: a single-run value wobbled ±10%
    # round to round through the axon tunnel; the median reflects the
    # kernel, the best bounds it from below).
    ts_short, ts_long = timed(N_SHORT), timed(N_LONG)
    med = lambda xs: statistics.median(xs)  # noqa: E731
    denom = N_LONG - N_SHORT
    avg = max((med(ts_long) - med(ts_short)) / denom, 1e-9)
    best = max((min(ts_long) - min(ts_short)) / denom, 1e-9)

    print(json.dumps({
        "metric": "flash_attention_fwd_avg_time_B32H8S256D256",
        "value": avg,
        "unit": "s",
        "vs_baseline": BASELINE_NPU_FUSION_ATTENTION_S / avg,
        "best": best,
        "reps": len(ts_long),
    }))


if __name__ == "__main__":
    main()
