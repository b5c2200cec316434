"""Multi-host (multi-process) smoke test: two jax.distributed CPU
processes form ONE 8-device global mesh and take a sharded train-ish
step — proving maybe_init_distributed + build_mesh compose across
processes (the reference's torchrun multi-proc topology,
reference scripts/mllm_llama3_8b_siglip_vit_pretrain.sh:36)."""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = r"""
import os, sys
port, pid = sys.argv[1], sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:" + port
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = pid

import jax
jax.config.update("jax_platforms", "cpu")
try:  # gloo cpu collectives (newer jax reads this; older defaults ok)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

from mllm_npu_tpu.parallel import MeshConfig, build_mesh
from mllm_npu_tpu.parallel.mesh import maybe_init_distributed

maybe_init_distributed()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mllm_npu_tpu.models.language_models.llama import (
    LlamaConfig, LlamaForCausalLM, causal_lm_loss)
from mllm_npu_tpu.parallel.sharding import infer_param_specs

mesh = build_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
cfg = LlamaConfig.tiny()
model = LlamaForCausalLM(cfg, dtype=jnp.float32)
ids_np = np.random.RandomState(0).randint(5, cfg.vocab_size, (8, 16))

params = model.init(jax.random.PRNGKey(1), jnp.asarray(ids_np[:1]))
specs = infer_param_specs(params, mesh)
params = jax.tree_util.tree_map(
    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
# every process holds the same global batch in numpy; each contributes
# the slices its local devices own (rows sharded over (data, fsdp))
ids = jax.make_array_from_callback(
    ids_np.shape, NamedSharding(mesh, P(("data", "fsdp"))),
    lambda idx: ids_np[idx])

def loss_fn(p, ids):
    logits, _, _ = model.apply(p, ids)
    return causal_lm_loss(logits, ids)

step = jax.jit(jax.value_and_grad(loss_fn))
loss, grads = step(params, ids)
gnorm = jax.jit(lambda g: jnp.sqrt(sum(
    jnp.sum(x * x) for x in jax.tree_util.tree_leaves(g))))(grads)
print("LOSS", float(loss), "GNORM", float(gnorm), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_missing_process_id_raises(monkeypatch):
    """JAX_NUM_PROCESSES without JAX_PROCESS_ID must be a clear config
    error naming the missing variable, not a raw KeyError."""
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.delenv("JAX_PROCESS_ID", raising=False)
    from mllm_npu_tpu.parallel.mesh import maybe_init_distributed
    with pytest.raises(RuntimeError, match="JAX_PROCESS_ID"):
        maybe_init_distributed()


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = str(_free_port())
    repo = Path(__file__).resolve().parents[1]
    import os
    env = {**os.environ,
           "PYTHONPATH": str(repo),
           # the subprocess sets its own JAX env before importing jax;
           # scrub the parent pytest session's TPU/CPU overrides
           "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), port, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=repo, env=env, text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    losses = [[ln for ln in o.splitlines() if ln.startswith("LOSS")][-1]
              for o in outs]
    # both processes computed the same global loss/grad-norm over the
    # one sharded computation
    assert losses[0] == losses[1], losses
