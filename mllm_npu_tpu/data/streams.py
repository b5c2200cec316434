"""Stream primitives: the torchdata-free backbone of the data layer.

Replaces the reference's datapipes graph (FileLister→cycle→shuffle→
sharding_filter→open→load_from_tar_wo_exception→webdataset grouping,
reference data/tasks/image_caption.py:600-611) with plain composable
generators. Robustness semantics are preserved: corrupt tar shards and
bad JSON lines are warned-and-skipped, never fatal (reference
data/datapipes.py:52-56,74-79).

Host sharding: shard_for_host() splits the *shard list* across JAX
processes (the DistributedReadingService equivalent); worker fan-out is
thread-based in dataloader.py.
"""

from __future__ import annotations

import io
import itertools
import json
import logging
import os
import random
import re
import tarfile
from pathlib import Path
from typing import Any, Callable, Iterable, Iterator, Optional

log = logging.getLogger(__name__)


def brace_expand(pattern: str) -> list[str]:
    """Minimal {000..123} / {a,b} brace expansion (webdataset-style)."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if m:
        lo, hi = m.group(1), m.group(2)
        width = len(lo)
        return [
            x for i in range(int(lo), int(hi) + 1)
            for x in brace_expand(pattern[:m.start()]
                                  + str(i).zfill(width)
                                  + pattern[m.end():])
        ]
    m = re.search(r"\{([^{}]*,[^{}]*)\}", pattern)
    if m:
        return [
            x for part in m.group(1).split(",")
            for x in brace_expand(pattern[:m.start()] + part
                                  + pattern[m.end():])
        ]
    return [pattern]


def list_files(roots, mask: str = "*.tar") -> list[str]:
    if isinstance(roots, (str, Path)):
        roots = [roots]
    out: list[str] = []
    for root in roots:
        root = str(root)
        expanded = brace_expand(root)
        for r in expanded:
            p = Path(r)
            if p.is_file():
                out.append(str(p))
            elif p.is_dir():
                out.extend(sorted(str(x) for x in p.rglob(mask)))
            else:
                log.warning("data path missing: %s", r)
    return sorted(out)


def cycle(items: list, count: Optional[int] = None) -> Iterator:
    it = itertools.repeat(items) if count is None else [items] * count
    for epoch_items in it:
        yield from epoch_items


def shuffled(iterable: Iterable, buffer_size: int, rng: random.Random
             ) -> Iterator:
    buf = []
    for x in iterable:
        buf.append(x)
        if len(buf) >= buffer_size:
            i = rng.randrange(len(buf))
            buf[i], buf[-1] = buf[-1], buf[i]
            yield buf.pop()
    rng.shuffle(buf)
    yield from buf


def shard_for_host(items: list, index: Optional[int] = None,
                   count: Optional[int] = None) -> list:
    import jax
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    return items[index::count]


def iter_tar_members(path: str) -> Iterator[tuple[str, bytes]]:
    """Yield (inner_path, bytes); swallow corrupt-shard errors
    (reference TarArchiveLoaderWoException semantics). Uses the native
    C reader (native/mllm_native.cc) when built — it releases the GIL
    so shard reading overlaps with tokenize/decode work."""
    if os.environ.get("MLLM_TPU_NO_NATIVE") != "1":
        try:
            from mllm_npu_tpu.data import native
            if native.available():
                yield from native.iter_tar_members_native(path)
                return
        except Exception as e:  # noqa: BLE001 — fall back to tarfile
            log.warning("native tar reader failed (%s); using tarfile", e)
    try:
        with tarfile.open(path, mode="r") as tar:
            for info in tar:
                if not info.isfile():
                    continue
                f = tar.extractfile(info)
                if f is None:
                    log.warning("failed to extract %s from %s", info.name,
                                path)
                    continue
                yield f"{path}/{info.name}", f.read()
    except Exception as e:  # noqa: BLE001 — web-scale robustness
        log.warning("corrupt tar %s skipped: %s", path, e)


def iter_jsonl(path: str) -> Iterator[tuple[str, dict]]:
    """Yield (key, record); bad lines warned-and-skipped (reference
    JsonlParserIterDataPipe)."""
    try:
        with open(path, "rb") as f:
            for idx, line in enumerate(f):
                if not line.strip():
                    continue
                try:
                    yield f"{path}_line{idx}", json.loads(line)
                except Exception as e:  # noqa: BLE001
                    log.warning("bad json line %s:%d: %s", path, idx, e)
    except Exception as e:  # noqa: BLE001
        log.warning("unreadable jsonl %s skipped: %s", path, e)


def group_webdataset(members: Iterable[tuple[str, Any]]
                     ) -> Iterator[dict[str, Any]]:
    """Group consecutive tar members by sample key (basename without
    extension) — webdataset() semantics."""
    cur_key, cur = None, {}
    for path, value in members:
        base, dot, ext = path.rpartition(".")
        key = base if dot else path
        if cur_key is not None and key != cur_key:
            if cur:
                yield cur
            cur = {}
        cur_key = key
        cur["." + ext if dot else path] = value
    if cur:
        yield cur


class SampleMultiplexer:
    """Weighted random interleave of N infinite streams (reference uses
    torchdata SampleMultiplexer, data/datapipes.py:104). Exhausted
    streams drop out."""

    def __init__(self, pipes_to_weights: dict, seed: int = 0):
        self.pipes_to_weights = pipes_to_weights
        self.seed = seed

    def __iter__(self) -> Iterator:
        rng = random.Random(self.seed)
        iters = [(iter(p), w) for p, w in self.pipes_to_weights.items()]
        while iters:
            total = sum(w for _, w in iters)
            r = rng.uniform(0, total)
            acc = 0.0
            for i, (it, w) in enumerate(iters):
                acc += w
                if r <= acc:
                    try:
                        yield next(it)
                    except StopIteration:
                        iters.pop(i)
                    break
