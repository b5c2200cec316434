"""Experiment trackers: TensorBoard + an offline wandb-style run sink.

The reference records a wandb tracker config (forced offline via
``WANDB_MODE=offline``) next to TensorBoard (reference
train/train.py:36,284-294). Here the same surface is a multiplexer:

- TensorBoard via ``flax.metrics.tensorboard`` (as before);
- a wandb run when the package is importable (honouring ``WANDB_MODE``,
  defaulting to offline like the reference);
- otherwise an offline JSONL sink with the wandb on-disk shape
  (``wandb/config.json`` + append-only ``wandb/metrics.jsonl``), so
  runs on machines without wandb still record hyperparameters and the
  full metric history in a machine-readable form.

Process-0 gating is the caller's job (train.py gates on
``jax.process_index() == 0``).
"""

from __future__ import annotations

import json
import logging
import os
import time
from pathlib import Path
from typing import Any, Mapping, Optional

log = logging.getLogger(__name__)


def _jsonable(v: Any) -> Any:
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    return str(v)


class _JsonlRun:
    """Offline wandb-shaped sink: config.json + metrics.jsonl."""

    def __init__(self, run_dir: Path, config: Mapping[str, Any]):
        self.dir = run_dir
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / "config.json").write_text(json.dumps(
            {k: _jsonable(v) for k, v in config.items()},
            indent=2, sort_keys=True))
        self._fh = open(self.dir / "metrics.jsonl", "a", encoding="utf-8")

    def log(self, metrics: Mapping[str, float], step: int) -> None:
        rec = {"_step": step, "_timestamp": round(time.time(), 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()


class Trackers:
    """Fan-out scalar writer: TensorBoard + wandb (or the JSONL stand-in).

    Mirrors ``accelerator.init_trackers``/``accelerator.log`` semantics
    (reference train/train.py:284-294,393) with the project name and
    config recorded at init.
    """

    def __init__(self, output_dir: str, config: Mapping[str, Any],
                 project: str = "mllm_npu_tpu", tb: bool = True):
        out = Path(output_dir)
        self._tb = None
        self._wandb = None
        self._jsonl = None
        if tb:
            try:
                from flax.metrics import tensorboard
                self._tb = tensorboard.SummaryWriter(str(out / "tb"))
            except Exception as e:  # noqa: BLE001
                log.warning("tensorboard tracker unavailable: %s", e)
        mode = os.environ.get("WANDB_MODE", "offline")
        if mode != "disabled":
            try:
                import wandb  # optional; not in the base image
                self._wandb = wandb.init(
                    project=project, dir=str(out), mode=mode,
                    config={k: _jsonable(v) for k, v in config.items()})
            except Exception:  # noqa: BLE001
                self._jsonl = _JsonlRun(out / "wandb", config)

    def scalar(self, key: str, value: float, step: int) -> None:
        self.log({key: value}, step)

    def log(self, metrics: Mapping[str, float], step: int) -> None:
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)
        if self._jsonl is not None:
            self._jsonl.log(metrics, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.finish()
        if self._jsonl is not None:
            self._jsonl.close()


def build_trackers(output_dir: str, config: Mapping[str, Any]
                   ) -> Optional[Trackers]:
    """Trackers on process 0, None elsewhere."""
    import jax
    if jax.process_index() != 0:
        return None
    return Trackers(output_dir, config)
