"""Test env: 8 virtual CPU devices so DP/FSDP/TP sharding tests run
without TPU hardware (the multi-device test capability the reference
lacks entirely — SURVEY.md §4)."""

import os

# force CPU: the ambient env points JAX at the axon TPU tunnel, but the
# suite must run hermetically on a virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
# keep build_logger from hijacking sys.stdout/stderr under pytest
os.environ["MLLM_LOG_REDIRECT"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (must come after env setup)

# The image's sitecustomize force-registers the axon TPU plugin and sets
# jax_platforms="axon,cpu"; override it *after* import, before backend init.
jax.config.update("jax_platforms", "cpu")

# This backend's default matmul precision is low (bf16-like); pin f32-exact
# matmuls so kernel-parity tests compare real numerics, not noise.
jax.config.update("jax_default_matmul_precision", "highest")
