"""Webdataset authoring: shard a list of samples into tar files with
a process pool (reference mllm_npu/data/process_wds.py:11-73
make_wds_shards)."""

from __future__ import annotations

import io
import json
import logging
import multiprocessing as mp
import tarfile
from pathlib import Path
from typing import Callable, Iterable, Sequence

log = logging.getLogger(__name__)


def write_samples_to_shard(samples: Sequence[dict], shard_path: str) -> int:
    """Each sample: {'__key__': str, '<ext>': bytes|str|dict}."""
    count = 0
    with tarfile.open(shard_path, "w") as tar:
        for sample in samples:
            key = sample["__key__"]
            for ext, value in sample.items():
                if ext == "__key__":
                    continue
                if isinstance(value, dict):
                    data = json.dumps(value).encode()
                elif isinstance(value, str):
                    data = value.encode()
                else:
                    data = value
                info = tarfile.TarInfo(f"{key}.{ext.lstrip('.')}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
            count += 1
    return count


def make_wds_shards(pattern: str, num_shards: int,
                    samples: Iterable[dict],
                    num_workers: int = 8) -> list[str]:
    """pattern like 'out/shard-%06d.tar'."""
    samples = list(samples)
    shards = [pattern % i for i in range(num_shards)]
    Path(shards[0]).parent.mkdir(parents=True, exist_ok=True)
    chunks = [samples[i::num_shards] for i in range(num_shards)]
    if num_workers > 1 and num_shards > 1:
        with mp.Pool(min(num_workers, num_shards)) as pool:
            counts = pool.starmap(write_samples_to_shard,
                                  zip(chunks, shards))
    else:
        counts = [write_samples_to_shard(c, s)
                  for c, s in zip(chunks, shards)]
    log.info("wrote %d samples into %d shards", sum(counts), num_shards)
    return shards
