"""Data-pipeline throughput: PIL vs the native C++ decode path, and
single-thread vs multiprocess loading (the reference runs 8 dataloader
worker processes, reference train/train.py:120-142 — this measures our
equivalent against a train step's consumption rate).

  python benchmarks/data_pipeline.py --samples 200 --workers 8
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tarfile
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_tar(path, n, size=(1200, 900)):
    rs = np.random.RandomState(0)
    with tarfile.open(path, "w") as tar:
        for i in range(n):
            arr = rs.randint(0, 255, size + (3,), np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            for ext, data in ((".txt", f"caption {i}".encode()),
                              (".jpg", buf.getvalue()),
                              (".json", json.dumps(
                                  {"similarity": .9}).encode())):
                info = tarfile.TarInfo(f"s{i:05d}{ext}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))


def run(tmp, native: bool, samples: int) -> float:
    os.environ["MLLM_TPU_NATIVE_DECODE"] = "1" if native else "0"
    from mllm_npu_tpu.data.tasks.image_caption import (
        build_caption_datapipes_with_pixels)
    from mllm_npu_tpu.utils.fake_tokenizer import FakeTokenizer
    from mllm_npu_tpu.data.processor import ImageProcessor

    pipe = build_caption_datapipes_with_pixels(
        str(tmp), tokenizer=FakeTokenizer(), max_length=600,
        batch_size=None, similarity_thr=0.2, min_resolution=100,
        image_transform=ImageProcessor(height=448, width=448),
        num_img_in_tokens=64, cycle_count=10, multi_resolution=True,
        resolution_grids=["1x1", "1x2", "2x1", "2x2", "1x3", "3x1"],
        base_resolution=448, shard_for_host=False)
    it = iter(pipe)
    next(it)
    t0 = time.perf_counter()
    n = 0
    for s in it:
        n += 1
        if n >= samples:
            break
    return n / (time.perf_counter() - t0)


class BatchedCaptionFactory:
    """Picklable factory for spawn workers: anyres caption batches at
    the reference train operating point (B8, S600, 64 img tokens)."""

    def __init__(self, root, batch_size=8):
        self.root = str(root)
        self.batch_size = batch_size

    def __call__(self, seed):
        from mllm_npu_tpu.data.processor import ImageProcessor
        from mllm_npu_tpu.data.tasks.image_caption import (
            build_caption_datapipes_with_pixels)
        from mllm_npu_tpu.utils.fake_tokenizer import FakeTokenizer
        return build_caption_datapipes_with_pixels(
            self.root, tokenizer=FakeTokenizer(), max_length=600,
            batch_size=self.batch_size, similarity_thr=0.2,
            min_resolution=100,
            image_transform=ImageProcessor(height=448, width=448),
            num_img_in_tokens=64, cycle_count=50, multi_resolution=True,
            resolution_grids=["1x1", "1x2", "2x1", "2x2", "1x3", "3x1"],
            base_resolution=448, shard_for_host=False, seed=seed)


def run_workers(tmp, workers: int, batches: int, batch_size: int) -> float:
    """Batches/sec through the MultiProcessDataLoader (spawn)."""
    from mllm_npu_tpu.data.dataloader import MultiProcessDataLoader
    loader = MultiProcessDataLoader(
        BatchedCaptionFactory(tmp, batch_size), num_workers=workers,
        prefetch=4)
    it = iter(loader)
    try:
        next(it)  # warm up: worker start + first decode
        t0 = time.perf_counter()
        n = 0
        for _ in it:
            n += 1
            if n >= batches:
                break
        dt = time.perf_counter() - t0
    finally:
        loader.shutdown()
    return n * batch_size / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--workers", type=int, default=0)
    p.add_argument("--batches", type=int, default=24)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()
    with tempfile.TemporaryDirectory() as tmp:
        # one tar per worker so every worker has a file shard
        for i in range(max(args.workers, 1)):
            make_tar(Path(tmp) / f"bench-{i:03d}.tar", 64)
        pil = run(tmp, native=False, samples=args.samples)
        from mllm_npu_tpu.data import native as native_mod
        if native_mod.available():
            nat = run(tmp, native=True, samples=args.samples)
        else:
            nat = None
        out = {
            "samples_per_sec_pil": round(pil, 2),
            "samples_per_sec_native": round(nat, 2) if nat else None,
            "speedup": round(nat / pil, 2) if nat else None,
        }
        if args.workers:
            sps = run_workers(tmp, args.workers, args.batches,
                              args.batch_size)
            out["samples_per_sec_workers"] = round(sps, 2)
            out["num_workers"] = args.workers
            # worker scaling is bounded by host cores: on a 1-core box
            # the pool only adds IPC cost; real TPU hosts have 100+
            out["host_cpu_count"] = os.cpu_count()
        print(json.dumps(out))


if __name__ == "__main__":
    main()
