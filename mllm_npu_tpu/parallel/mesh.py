"""Device-mesh construction (data / fsdp / tensor axes).

This replaces the reference's entire distributed-runtime layer
(Accelerate + DeepSpeed ZeRO engine + torchrun NCCL/HCCL env tuning,
reference: train/train.py:209-218, scripts/*.sh:15-33): on TPU the
collectives are compiler-inserted by GSPMD from sharding annotations,
so the runtime reduces to building a ``jax.sharding.Mesh`` whose axes
map onto ICI, plus ``jax.distributed.initialize()`` for multi-host.

Axis semantics:
  data   — batch parallelism (the reference's DP)
  fsdp   — parameter/optimizer sharding (the reference's ZeRO-2/3)
  tensor — megatron-style tensor parallelism (absent in the reference;
           free under GSPMD via PartitionSpecs)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1     # -1: infer from device count
    fsdp: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        dims = [self.data, self.fsdp, self.tensor]
        known = 1
        for d in dims:
            if d != -1:
                known *= d
        if -1 in dims:
            assert n_devices % known == 0, (
                f"{n_devices} devices not divisible by fixed axes {known}")
            infer = n_devices // known
            dims = [infer if d == -1 else d for d in dims]
        total = dims[0] * dims[1] * dims[2]
        assert total == n_devices, (
            f"mesh {dims} != device count {n_devices}")
        return tuple(dims)


AXIS_NAMES = ("data", "fsdp", "tensor")


def build_mesh(config: MeshConfig = MeshConfig(),
               devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    dims = config.resolve(len(devices))
    arr = np.asarray(devices).reshape(dims)
    return Mesh(arr, AXIS_NAMES)


def maybe_init_distributed() -> None:
    """Multi-host init (no-op single-host): the TPU-native replacement
    for the reference's torchrun wiring (reference scripts/*.sh:36).
    Controlled by env — set JAX_COORDINATOR_ADDRESS on every host; on
    platforms without automatic cluster detection (e.g. multi-process
    CPU) also set JAX_NUM_PROCESSES and JAX_PROCESS_ID. CPU collectives
    use the gloo backend (tested by tests/test_multihost.py)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kw = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is None:
            raise RuntimeError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not — "
                "multi-process init needs both (a distinct "
                "JAX_PROCESS_ID in [0, JAX_NUM_PROCESSES) per process)")
        kw = dict(coordinator_address=addr,
                  num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                  process_id=int(pid))
    jax.distributed.initialize(**kw)
