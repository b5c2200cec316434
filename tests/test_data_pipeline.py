"""Data-layer tests: synthetic wds tars/jsonl → static batches with the
mask contract; anyres tiling; corrupt-shard resilience; mixture."""

import io
import json
import pickle
import tarfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from mllm_npu_tpu.data.processor import ImageProcessor
from mllm_npu_tpu.data.tasks.image_caption import (
    build_caption_datapipes_with_pixels, encode_caption_input_ids,
    encode_caption_input_ids_v2)
from mllm_npu_tpu.data.tasks.interleaved_image_text import (
    build_interleave_datapipes_with_pixels)
from mllm_npu_tpu.data.tasks.ocr import build_ocr_datapipes_caption
from mllm_npu_tpu.data.tasks.pure_text import build_text_datapipes
from mllm_npu_tpu.data.utils import process_anyres_image, select_best_resolution
from mllm_npu_tpu.data.streams import SampleMultiplexer, brace_expand
from mllm_npu_tpu.utils.testing import FakeTokenizer

TOK = FakeTokenizer()
PROC = ImageProcessor(height=56, width=56)


def _img_bytes(w=500, h=500, color=(255, 0, 0)):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="JPEG")
    return buf.getvalue()


def _make_caption_tar(path: Path, n=6):
    with tarfile.open(path, "w") as tar:
        for i in range(n):
            for ext, data in (
                    (".txt", f"a photo of thing {i}".encode()),
                    (".jpg", _img_bytes()),
                    (".json", json.dumps({"similarity": 0.9}).encode())):
                info = tarfile.TarInfo(f"sample{i:04d}{ext}")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))


def test_brace_expand():
    assert brace_expand("shard-{00..02}.tar") == [
        "shard-00.tar", "shard-01.tar", "shard-02.tar"]


def test_encode_caption_masks_contract():
    enc = encode_caption_input_ids("hello world", TOK, img_first_ratio=1.0,
                                   max_length=128, num_img_in_tokens=8)
    assert int(enc["ids_cmp_mask"].sum()) == 8
    assert bool(enc["embeds_cmp_mask"]) and not bool(enc["embeds_gen_mask"])
    # img-last (generation) branch
    enc = encode_caption_input_ids("hello world", TOK, img_first_ratio=0.0,
                                   max_length=128, num_img_out_tokens=8)
    assert int(enc["ids_gen_mask"].sum()) == 8
    assert bool(enc["embeds_gen_mask"]) and not bool(enc["embeds_cmp_mask"])


def test_encode_v2_patches():
    enc = encode_caption_input_ids_v2(
        "hello", "resp", TOK, "\n", img_first_ratio=1.0, max_length=256,
        num_img_in_tokens=8, patch_length=3)
    assert int(enc["ids_cmp_mask"].sum()) == 24
    assert enc["embeds_cmp_mask"].tolist() == [True] * 3


def test_anyres_tiling():
    img = Image.new("RGB", (1000, 480), (0, 255, 0))
    pinpoints = [[448, 448], [896, 448], [1344, 448], [448, 896]]
    patches, pos = process_anyres_image(img, PROC, pinpoints, 448)
    # 896x448 → 2 patches + thumbnail
    assert patches.shape[0] == pos.shape[0]
    assert patches.shape[0] >= 2
    assert pos[-1].tolist() == [0.5, 0.5]
    assert patches.shape[1:] == (56, 56, 3)


def test_caption_pipeline_end_to_end(tmp_path):
    _make_caption_tar(tmp_path / "shard-000.tar")
    pipe = build_caption_datapipes_with_pixels(
        str(tmp_path), tokenizer=TOK, max_length=96, batch_size=2,
        similarity_thr=0.2, min_resolution=100, image_transform=PROC,
        num_img_in_tokens=8, num_img_out_tokens=8, cycle_count=1,
        multi_resolution=True, resolution_grids=["1x1", "1x2", "2x1"],
        base_resolution=448, dataset_name="test", shard_for_host=False)
    batches = list(pipe)
    assert batches, "no batches produced"
    b = batches[0]
    assert b["input_ids"].shape == (2, 96)
    assert b["images"].ndim == 4 and b["images"].shape[-1] == 3
    n_cmp_imgs = int(b["embeds_cmp_mask"].sum())
    assert int(b["ids_cmp_mask"].sum()) == 8 * n_cmp_imgs
    assert b["patch_positions"].shape[0] == b["images"].shape[0]


def test_corrupt_tar_skipped(tmp_path):
    (tmp_path / "bad.tar").write_bytes(b"this is not a tar file")
    _make_caption_tar(tmp_path / "good.tar", n=4)
    pipe = build_caption_datapipes_with_pixels(
        str(tmp_path), tokenizer=TOK, max_length=96, batch_size=2,
        min_resolution=100, image_transform=PROC, num_img_in_tokens=8,
        similarity_thr=0.2, cycle_count=1, multi_resolution=True,
        resolution_grids=["1x1"], base_resolution=448,
        shard_for_host=False)
    assert len(list(pipe)) >= 1   # survives the corrupt shard


def test_pure_text_pipeline(tmp_path):
    with open(tmp_path / "text.jsonl", "w") as f:
        for i in range(8):
            f.write(json.dumps({"text": f"document number {i} body"}) + "\n")
        f.write("not json\n")   # bad line skipped
    pipe = build_text_datapipes(str(tmp_path), tokenizer=TOK, max_length=32,
                                batch_size=4, cycle_count=1,
                                shard_for_host=False)
    b = next(iter(pipe))
    assert b["input_ids"].shape == (4, 32)
    assert (b["labels"][b["attention_mask"] == 0] == -100).all()


def test_ocr_pipeline(tmp_path):
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    Image.new("RGB", (500, 500), (1, 2, 3)).save(imgdir / "a.jpg")
    with open(tmp_path / "data.jsonl", "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "image": "a.jpg",
                "data": ["what does it say", f"it says {i}"]}) + "\n")
    pipe = build_ocr_datapipes_caption(
        str(tmp_path), image_dir=str(imgdir), tokenizer=TOK,
        image_transform=PROC, max_length=128, batch_size=2,
        num_img_in_tokens=8, cycle_count=1, multi_resolution=True,
        resolution_grids=["1x1"], base_resolution=448,
        shard_for_host=False)
    b = next(iter(pipe))
    n_imgs = int(b["embeds_cmp_mask"].sum())
    assert int(b["ids_cmp_mask"].sum()) == 8 * n_imgs
    # answers supervised, prompts masked
    assert (b["labels"] != -100).any()


def test_interleaved_pipeline(tmp_path):
    import base64
    rec = {"images": [base64.b64encode(_img_bytes()).decode(), None],
           "texts": [None, "caption text here"]}
    with tarfile.open(tmp_path / "inter.tar", "w") as tar:
        data = pickle.dumps(rec)
        info = tarfile.TarInfo("000.pkl")
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))
    pipe = build_interleave_datapipes_with_pixels(
        str(tmp_path), tokenizer=TOK, image_transform=PROC, max_length=128,
        batch_size=1, num_img_in_tokens=8, img_first_ratio=1.0,
        cycle_count=2, shard_for_host=False)
    b = next(iter(pipe))
    assert int(b["embeds_cmp_mask"].sum()) == 1
    assert int(b["ids_cmp_mask"].sum()) == 8


def test_sample_multiplexer_weights():
    class Pipe:
        def __init__(self, items):
            self.items = items

        def __iter__(self):
            return iter(self.items)

    a = Pipe([{"src": "a"}] * 100)
    b = Pipe([{"src": "b"}] * 100)
    mux = SampleMultiplexer({a: 9.0, b: 1.0}, seed=0)
    out = [x["src"] for x in mux]
    assert len(out) == 200
    # first 50 should be heavily 'a'
    assert out[:50].count("a") > 30


def test_caption_pipeline_packing(tmp_path):
    _make_caption_tar(tmp_path / "shard-000.tar", n=8)
    pipe = build_caption_datapipes_with_pixels(
        str(tmp_path), tokenizer=TOK, max_length=192, batch_size=4,
        similarity_thr=0.2, min_resolution=100, image_transform=PROC,
        num_img_in_tokens=8, num_img_out_tokens=8, cycle_count=2,
        multi_resolution=True, resolution_grids=["1x1"],
        base_resolution=448, dataset_name="test", shard_for_host=False,
        packing=True)
    b = next(iter(pipe))
    assert b["input_ids"].shape == (2, 192)   # 4 samples → 2 packed rows
    am = b["attention_mask"]
    assert am.max() >= 2   # at least one row holds 2+ segments
    # per-image spans still line up with image slots
    n_imgs = int(b["embeds_cmp_mask"].sum())
    assert int(b["ids_cmp_mask"].sum()) == 8 * n_imgs


def test_wds_authoring_roundtrip(tmp_path):
    """make_wds_shards (reference process_wds.py make_wds_shards) writes
    tar shards that the framework's own tar reader streams back intact."""
    from mllm_npu_tpu.data.process_wds import make_wds_shards
    from mllm_npu_tpu.data.streams import (group_webdataset,
                                           iter_tar_members)

    samples = [{"__key__": f"{i:05d}",
                "txt": f"caption number {i}",
                "json": {"idx": i},
                "jpg": bytes([i % 251]) * 10}
               for i in range(23)]
    shards = make_wds_shards(str(tmp_path / "shard-%06d.tar"), 3,
                             samples, num_workers=1)
    assert len(shards) == 3
    import json as _json
    got = {}
    for shard in shards:
        for s in group_webdataset(iter_tar_members(shard)):
            got[_json.loads(s[".json"].decode())["idx"]] = s
    assert len(got) == 23
    for i in (0, 7, 22):
        s = got[i]
        assert s[".txt"].decode() == f"caption number {i}"
        assert s[".jpg"] == bytes([i % 251]) * 10
