"""Prefetching data loaders with real checkpointable position.

Replaces the reference's DataLoader2(Distributed→MultiProcessing reading
services) (reference data/dataloader.py:7-18): host-level sharding
happens in the task builders (streams.shard_for_host), worker-level
sharding in MultiProcessDataLoader via streams.set_worker_shard, and
both loaders add bounded prefetch so the CPU-heavy anyres pipeline
overlaps with TPU steps.

Resume: the reference does NOT checkpoint data position — it re-seeds on
resume (reference train/train.py:318-323). Here the pipeline itself is
checkpointable (streams.SampleStream: index-derived RNG, integer state),
the producer snapshots the pipe state at every batch boundary, and
``state_dict()`` returns the state of the last batch actually yielded to
the training loop — so restore reproduces the exact upcoming batch
sequence (covered by tests/test_data_resume.py). Epoch reseed
(``seed_for_epoch``, same formula as the reference) composes on top:
each epoch is a fresh deterministic stream.
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import pickle
import queue
import threading
from typing import Any, Callable, Iterator, Optional

log = logging.getLogger(__name__)


class DataLoader:
    """Single-process loader: one producer thread, bounded prefetch."""

    def __init__(self, pipe_factory: Callable[[int], Any],
                 prefetch: int = 4, seed: int = 888):
        """pipe_factory(seed) -> checkpointable iterable of batches."""
        self.pipe_factory = pipe_factory
        self.prefetch = prefetch
        self.seed = seed
        self._steps = 0
        self._epoch = 0
        self._pipe_state: Optional[dict] = None

    def seed_for_epoch(self, epoch: int, resume_steps: int = 0) -> int:
        # reference semantics: seed = resume_steps + epoch + 42
        # (train/train.py:318-323)
        return resume_steps + epoch + 42

    def next_epoch(self, resume_steps: int = 0) -> None:
        """Advance to the next epoch: bump the counter, reseed the
        stream (reference reseed semantics) and clear the position."""
        self._epoch += 1
        self.seed = self.seed_for_epoch(self._epoch, resume_steps)
        self._pipe_state = None

    def __iter__(self) -> Iterator:
        pipe = self.pipe_factory(self.seed)
        if self._pipe_state is not None and hasattr(pipe, "load_state_dict"):
            pipe.load_state_dict(self._pipe_state)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []
        has_state = hasattr(pipe, "state_dict")

        def producer():
            try:
                for batch in pipe:
                    q.put((batch, pipe.state_dict() if has_state else None))
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
            batch, state = item
            self._steps += 1
            if state is not None:
                self._pipe_state = state
            yield batch

    # ---- resume state ----------------------------------------------------

    def state_dict(self) -> dict:
        return {"steps": self._steps, "epoch": self._epoch,
                "seed": self.seed, "pipe": self._pipe_state}

    def load_state_dict(self, state: dict) -> None:
        if "workers" in state:
            log.warning(
                "checkpoint was written by MultiProcessDataLoader but is "
                "being restored into the threaded DataLoader — the saved "
                "per-worker positions cannot be applied; the stream "
                "restarts from the epoch beginning (resume with the same "
                "--dataloader_workers to keep the exact position)")
        self._steps = state.get("steps", 0)
        self._epoch = state.get("epoch", 0)
        self.seed = state.get("seed", self.seed)
        self._pipe_state = state.get("pipe")


def _worker_main(pipe_factory, seed, worker_id, num_workers, host_shard,
                 init_state, out_q, stop_evt):
    """Runs in a worker process (spawn/fork) or thread: build the pipe
    with this worker's file shard and stream (batch, state) pairs.
    NEVER touches JAX (the host
    shard is passed in from the parent)."""
    from mllm_npu_tpu.data import streams
    try:
        streams.set_host_shard(*host_shard)
        streams.set_worker_shard(worker_id, num_workers)
        pipe = pipe_factory(seed)
        if init_state is not None and hasattr(pipe, "load_state_dict"):
            pipe.load_state_dict(init_state)
        has_state = hasattr(pipe, "state_dict")
        for batch in pipe:
            state = pipe.state_dict() if has_state else None
            while not stop_evt.is_set():
                try:
                    out_q.put((batch, state), timeout=0.5)
                    break
                except queue.Full:
                    continue
            if stop_evt.is_set():
                return
        out_q.put(None)  # exhausted
    except Exception as e:  # noqa: BLE001
        try:
            out_q.put(e)
        except Exception:  # noqa: BLE001
            pass


class MultiProcessDataLoader:
    """N worker processes, each running the SAME pipeline factory over a
    disjoint file shard (files[host::hosts][worker::workers] — the
    torchdata Distributed→MultiProcessing reading-service split,
    reference data/dataloader.py:7-18 + train/train.py:120-142), parent
    interleaves batches round-robin.

    Deterministic + resumable FOR A FIXED WORKER COUNT: batch order is a
    pure function of (seed, num_workers); state = per-worker pipe states
    + the round-robin cursor, each captured at the batch actually
    yielded. Workers never touch JAX (the host shard is passed in).

    Default start method is ``spawn`` — forking a process that holds a
    live TPU runtime risks deadlock on copied mutexes. Spawn requires a
    picklable ``pipe_factory`` (the trainer's PipeFactory is; a test
    closure isn't — unpicklable factories fall back to THREAD workers
    with a warning: same shard split and batch order, GIL-shared CPU).
    Forking was the old fallback and is still available by explicit
    ``mp_context='fork'``, but is never chosen automatically — a fork
    inside a multi-threaded parent (JAX runtime, orbax writers) can
    deadlock a training job on copied mutexes rather than fail it.
    """

    def __init__(self, pipe_factory: Callable[[int], Any],
                 num_workers: int = 4, prefetch: int = 4, seed: int = 888,
                 mp_context: str = "spawn"):
        self.pipe_factory = pipe_factory
        self.num_workers = max(1, int(num_workers))
        self.prefetch = prefetch
        self.seed = seed
        self.mp_context = mp_context
        self._steps = 0
        self._epoch = 0
        self._rr = 0
        self._worker_states: list = [None] * self.num_workers
        self._procs: list = []
        self._queues: list = []
        self._stop = None

    seed_for_epoch = DataLoader.seed_for_epoch

    def next_epoch(self, resume_steps: int = 0) -> None:
        self.shutdown()
        self._epoch += 1
        self.seed = self.seed_for_epoch(self._epoch, resume_steps)
        self._rr = 0
        self._worker_states = [None] * self.num_workers

    def _start(self) -> None:
        import jax
        host_shard = (jax.process_index(), jax.process_count())
        try:
            self._start_ctx(self.mp_context, host_shard)
        except (TypeError, AttributeError, pickle.PicklingError) as e:
            if self.mp_context in ("fork", "thread"):
                raise
            log.warning("pipe_factory not picklable (%s) — falling back "
                        "to thread workers", e)
            self.shutdown()
            self._start_ctx("thread", host_shard)

    def _start_ctx(self, ctx_name: str, host_shard) -> None:
        if ctx_name == "thread":
            import threading
            self._stop = threading.Event()
            self._queues = [queue.Queue(maxsize=self.prefetch)
                            for _ in range(self.num_workers)]
            self._procs = []
            for w in range(self.num_workers):
                t = threading.Thread(
                    target=_worker_main,
                    args=(self.pipe_factory, self.seed, w,
                          self.num_workers, host_shard,
                          self._worker_states[w], self._queues[w],
                          self._stop),
                    daemon=True)
                t.start()
                self._procs.append(t)
            return
        ctx = mp.get_context(ctx_name)
        self._stop = ctx.Event()
        self._queues = [ctx.Queue(maxsize=self.prefetch)
                        for _ in range(self.num_workers)]
        self._procs = []
        for w in range(self.num_workers):
            p = ctx.Process(
                target=_worker_main,
                args=(self.pipe_factory, self.seed, w, self.num_workers,
                      host_shard, self._worker_states[w], self._queues[w],
                      self._stop),
                daemon=True)
            p.start()
            self._procs.append(p)

    def shutdown(self) -> None:
        if self._stop is not None:
            self._stop.set()
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive() and hasattr(p, "terminate"):
                p.terminate()
        for q_ in self._queues:
            if hasattr(q_, "close"):
                q_.close()
        self._procs, self._queues, self._stop = [], [], None

    def __iter__(self) -> Iterator:
        if not self._procs:
            self._start()
        done = [False] * self.num_workers
        while not all(done):
            w = self._rr % self.num_workers
            if done[w]:
                self._rr += 1
                continue
            # bounded waits + liveness checks: a worker that dies without
            # enqueueing (OOM-kill, segfault in native decode) must raise
            # here, not hang the training loop on a bare get() forever
            while True:
                try:
                    item = self._queues[w].get(timeout=5.0)
                    break
                except queue.Empty:
                    if not self._procs[w].is_alive():
                        try:  # drain a batch enqueued just before death
                            item = self._queues[w].get_nowait()
                            break
                        except queue.Empty:
                            pass
                        code = getattr(self._procs[w], "exitcode", None)
                        self.shutdown()
                        raise RuntimeError(
                            f"dataloader worker {w} died (exit code "
                            f"{code}) without yielding — see worker "
                            f"stderr for the crash")
            if item is None:
                done[w] = True
                self._rr += 1
                continue
            if isinstance(item, Exception):
                self.shutdown()
                raise item
            batch, state = item
            # advance the cursor BEFORE yield so a state_dict() taken by
            # the trainer right after this batch resumes at the next one
            self._rr += 1
            self._steps += 1
            if state is not None:
                self._worker_states[w] = state
            yield batch
        self.shutdown()

    # ---- resume state ----------------------------------------------------

    def state_dict(self) -> dict:
        return {"steps": self._steps, "epoch": self._epoch,
                "seed": self.seed, "rr": self._rr,
                "num_workers": self.num_workers,
                "workers": list(self._worker_states)}

    def load_state_dict(self, state: dict) -> None:
        if "workers" not in state:
            log.warning(
                "checkpoint was written by the threaded DataLoader but is "
                "being restored into MultiProcessDataLoader — the saved "
                "single-stream position cannot be split across workers; "
                "the stream restarts from the epoch beginning (resume "
                "with --dataloader_workers 0 to keep the exact position)")
        self._steps = state.get("steps", 0)
        self._epoch = state.get("epoch", 0)
        self.seed = state.get("seed", self.seed)
        self._rr = state.get("rr", 0)
        saved_w = state.get("num_workers", self.num_workers)
        if saved_w != self.num_workers:
            log.warning(
                "resuming with num_workers=%d but checkpoint used %d — "
                "batch order will differ from an uninterrupted run",
                self.num_workers, saved_w)
        workers = state.get("workers") or []
        self._worker_states = [
            workers[w] if w < len(workers) else None
            for w in range(self.num_workers)]


def make_dataloader(pipe_factory, num_workers: int = 0, prefetch: int = 4,
                    seed: int = 888):
    """num_workers=0 → threaded DataLoader; >0 → process pool."""
    if num_workers and num_workers > 0:
        return MultiProcessDataLoader(pipe_factory,
                                      num_workers=num_workers,
                                      prefetch=prefetch, seed=seed)
    return DataLoader(pipe_factory, prefetch=prefetch, seed=seed)
