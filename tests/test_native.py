"""Native data-loader core: parity with tarfile/PIL + corruption
tolerance + parallel batch decode."""

import io
import tarfile
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from mllm_npu_tpu.data import native
from mllm_npu_tpu.data.streams import iter_tar_members

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def _make_tar(path: Path, n=4):
    with tarfile.open(path, "w") as tar:
        for i in range(n):
            data = f"content number {i}".encode() * (i + 1)
            info = tarfile.TarInfo(f"dir/sample{i:03d}.txt")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def test_tar_reader_parity(tmp_path):
    p = tmp_path / "a.tar"
    _make_tar(p)
    ref = list(iter_tar_members(str(p)))
    got = list(native.iter_tar_members_native(str(p)))
    assert len(got) == len(ref) == 4
    for (rn, rd), (gn, gd) in zip(ref, got):
        assert rd == gd
        assert rn.split("/")[-1] == gn.split("/")[-1]


def test_tar_reader_corruption_graceful(tmp_path):
    p = tmp_path / "bad.tar"
    p.write_bytes(b"\x01" * 2048)
    assert list(native.iter_tar_members_native(str(p))) == []


def test_jpeg_decode_matches_pil():
    img = Image.new("RGB", (300, 200))
    px = img.load()
    for y in range(200):
        for x in range(300):
            px[x, y] = (x % 256, y % 256, (x + y) % 256)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    data = buf.getvalue()

    mean, std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    out = native.decode_image(data, 64, mean, std)
    assert out is not None and out.shape == (64, 64, 3)

    ref = Image.open(io.BytesIO(data)).resize((64, 64), Image.BILINEAR)
    ref = (np.asarray(ref, np.float32) / 255.0 - 0.5) / 0.5
    # different resamplers (+DCT prescale) — require loose agreement
    assert np.abs(out - ref).mean() < 0.12


def test_jpeg_decode_batch_parallel():
    datas = []
    for i in range(8):
        buf = io.BytesIO()
        Image.new("RGB", (200, 200), (i * 30 % 255, 10, 20)).save(
            buf, format="JPEG")
        datas.append(buf.getvalue())
    datas.append(b"not a jpeg")
    outs, ok = native.decode_batch(datas, 32, (0.5,) * 3, (0.5,) * 3,
                                   num_threads=4)
    assert outs.shape == (9, 32, 32, 3)
    assert ok[:8].all() and not ok[8]


def test_native_anyres_matches_pil_shapes():
    from mllm_npu_tpu.data.processor import ImageProcessor
    from mllm_npu_tpu.data.utils import (process_anyres_image,
                                         process_anyres_jpeg_native)
    img = Image.new("RGB", (900, 500), (40, 90, 160))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    grids = [[448, 448], [896, 448], [448, 896]]
    proc = ImageProcessor(height=448, width=448,
                          image_mean=(0.5,) * 3, image_std=(0.5,) * 3)
    ref_imgs, ref_pos = process_anyres_image(img, proc, grids, 448)
    out = process_anyres_jpeg_native(buf.getvalue(), (0.5,) * 3,
                                     (0.5,) * 3, grids, 448)
    assert out is not None
    nat_imgs, nat_pos = out
    assert nat_imgs.shape == ref_imgs.shape
    np.testing.assert_allclose(nat_pos, ref_pos, atol=1e-6)
    # same grid selection + flat-color image -> nearly identical pixels
    assert np.abs(nat_imgs - ref_imgs).mean() < 0.05
