"""Data-pipeline throughput: PIL vs the native C++ decode path.

  python benchmarks/data_pipeline.py --samples 200
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
    from mllm_npu_tpu.utils.testing import FakeTokenizer
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=100)
    args = p.parse_args()
    with tempfile.TemporaryDirectory() as tmp:
        make_tar(Path(tmp) / "bench.tar", 64)
        pil = run(tmp, native=False, samples=args.samples)
        from mllm_npu_tpu.data import native as native_mod
        if native_mod.available():
            nat = run(tmp, native=True, samples=args.samples)
        else:
            nat = None
        print(json.dumps({
            "samples_per_sec_pil": round(pil, 2),
            "samples_per_sec_native": round(nat, 2) if nat else None,
            "speedup": round(nat / pil, 2) if nat else None,
        }))


if __name__ == "__main__":
    main()
