"""Checkpoint save/resume (orbax), checkpoint-{step} layout.

Replaces accelerator.save_state/load_state + DeepSpeed sharded state +
load_zero3_checkpoint (reference train/train.py:295-299,385-389;
utils.py:151-215):

- async sharded save of params + optimizer state + step (orbax handles
  the gather/scatter the reference needed GatheredParameters for)
- data-iterator state saved alongside (improvement over the reference's
  reseed-only resume, train.py:318-323 — we keep the reseed too)
- preemption-aware: ``install_sigterm_checkpoint`` saves on SIGTERM
  (matters on TPU pools; reference has no elastic story at all)
"""

from __future__ import annotations

import json
import logging
import signal
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 async_save: bool = True):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            step_prefix="checkpoint",
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(str(self.directory),
                                          options=options)

    def save(self, step: int, state: Any,
             data_state: Optional[dict] = None) -> None:
        args = {"state": ocp.args.StandardSave(state)}
        if data_state is not None:
            args["data"] = ocp.args.JsonSave(data_state)
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def restore(self, state_template: Any, step: Optional[int] = None
                ) -> tuple[Any, Optional[dict], Optional[int]]:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state_template, None, None
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)))
        data_state = None
        try:
            restored_d = self._mgr.restore(
                step, args=ocp.args.Composite(data=ocp.args.JsonRestore()))
            data_state = restored_d.get("data")
        except Exception:  # noqa: BLE001 — data state is optional
            pass
        return restored["state"], data_state, step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def install_sigterm_checkpoint(save_fn) -> None:
    """Save a final checkpoint when the pool preempts us."""

    def handler(signum, frame):
        log.warning("SIGTERM received — writing preemption checkpoint")
        try:
            save_fn()
        finally:
            raise SystemExit(143)

    signal.signal(signal.SIGTERM, handler)
