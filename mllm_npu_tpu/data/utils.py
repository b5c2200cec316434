"""Any-resolution tiling + static-shape collates (numpy).

Port of the reference's anyres pipeline (data/utils.py:8-192): pick the
best grid from the resolution candidates using BOTH selectors (max
effective resolution :8-39 and closest aspect ratio :42-74) and keep the
smaller (:158-165); resize+pad; cut into base_resolution patches; append
the global thumbnail; emit normalized patch-center positions with the
thumbnail pinned at (0.5, 0.5).

TPU redesign — collate: the reference concatenates a variable number of
image patches per batch (anyres_data_collate_old, :238). Static shapes
are mandatory under jit, so :func:`collate_static` pads the image axis
to a fixed ``max_images`` capacity and extends embeds_*_masks with
False; sequences are padded to ``max_length`` (the reference's
dynamic_padding=False reality, constant.py:7).
"""

from __future__ import annotations

import ast
import math
from typing import Callable, Optional

import numpy as np
from PIL import Image

from mllm_npu_tpu.constant import IGNORE_INDEX


def select_best_resolution(original_size, possible_resolutions):
    """Max-effective-resolution selector (reference data/utils.py:8-39)."""
    ow, oh = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for w, h in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (w, h), eff, waste
    return best


def select_best_resolution_v2(original_size, possible_resolutions):
    """Aspect-ratio-closest selector (reference data/utils.py:42-74)."""
    ow, oh = original_size
    oar, oarea = oh / ow, ow * oh
    best, best_ar, best_area = None, float("inf"), float("inf")
    for w, h in possible_resolutions:
        ar, area = h / w, w * h
        ar_diff = max(ar, oar) / min(ar, oar)
        area_ratio = max(area, oarea) / min(area, oarea)
        if ar_diff < best_ar or (ar_diff == best_ar
                                 and area_ratio < best_area):
            best, best_ar, best_area = (w, h), ar_diff, area_ratio
    return best


def resize_and_pad_image(image: Image.Image, target_resolution,
                         keep_ratio: bool = False) -> Image.Image:
    """(reference data/utils.py:77-115; default path is plain resize)."""
    tw, th = target_resolution
    if not keep_ratio:
        return image.resize((tw, th))
    ow, oh = image.size
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    resized = image.resize((nw, nh))
    out = Image.new("RGB", (tw, th), (0, 0, 0))
    out.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
    return out


def divide_to_patches(image: Image.Image, patch_size: int):
    patches = []
    w, h = image.size
    for i in range(0, h, patch_size):
        for j in range(0, w, patch_size):
            patches.append(image.crop((j, i, j + patch_size,
                                       i + patch_size)))
    return patches


def grid_pinpoints_from_resolution_grids(resolution_grids,
                                         base_resolution: int):
    """'2x3' strings → pixel pinpoints (reference image_caption.py:560-567)."""
    out = []
    for scale in resolution_grids:
        s1, s2 = str(scale).split("x")
        out.append([int(s1) * base_resolution, int(s2) * base_resolution])
    return out


def process_anyres_image(image: Image.Image, image_transform: Callable,
                         grid_pinpoints, base_image_size: int):
    """→ (patches [P, H, W, 3] float32, patch_pos [P, 2]) with P =
    grid patches + 1 thumbnail (reference data/utils.py:140-192)."""
    if isinstance(grid_pinpoints, list):
        possible = grid_pinpoints
    else:
        possible = ast.literal_eval(grid_pinpoints)

    w1, h1 = select_best_resolution(image.size, possible)
    w2, h2 = select_best_resolution_v2(image.size, possible)
    w, h = (w2, h2) if w1 * h1 > w2 * h2 else (w1, h1)

    padded = resize_and_pad_image(image, (w, h))
    patches = divide_to_patches(padded, base_image_size)
    thumb = image.resize((base_image_size, base_image_size))
    arrays = [image_transform(p) for p in patches + [thumb]]

    gx, gy = w // base_image_size, h // base_image_size
    x_idx = (np.tile(np.arange(gx), (gy, 1)) + 0.5) / gx
    y_idx = (np.tile(np.arange(gy)[:, None], (1, gx)) + 0.5) / gy
    pos = np.stack([x_idx, y_idx], axis=-1).reshape(-1, 2)
    pos = np.concatenate([pos, np.asarray([[0.5, 0.5]])], axis=0)
    return np.stack(arrays).astype(np.float32), pos.astype(np.float32)


# ---------------------------------------------------------------------------
# Static-shape collates
# ---------------------------------------------------------------------------

_SEQ_KEYS = ("input_ids", "attention_mask", "labels", "ids_gen_mask",
             "ids_cmp_mask")
_IMG_AXIS_KEYS = ("images", "embeds_gen_mask", "embeds_cmp_mask",
                  "patch_position")


def _pad_seq(arr: np.ndarray, max_length: int, pad_value) -> np.ndarray:
    if arr.shape[0] >= max_length:
        return arr[:max_length]
    pad = np.full((max_length - arr.shape[0],) + arr.shape[1:], pad_value,
                  arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def collate_static(batch: list[dict], *, max_length: int, max_images: int,
                   image_size: int, pad_token_id: int = 0,
                   dataset_name: Optional[str] = None) -> dict:
    """Fixed-shape batch assembly. Samples arrive with per-sample arrays:
    seq keys [L...], images [P?, H, W, 3] (or [H,W,3], or None),
    embeds_*_mask [P?] (or scalar bool), patch_position [P?, 2].

    Output: seq keys [B, max_length]; images [max_images, H, W, 3];
    embeds masks [max_images]; patch_positions [max_images, 2].
    The reference's row-major contract is preserved: each sample's
    images append in batch order, matching its ids_* True spans.
    """
    B = len(batch)
    pad_map = {"input_ids": pad_token_id, "attention_mask": 0,
               "labels": IGNORE_INDEX, "ids_gen_mask": False,
               "ids_cmp_mask": False}

    out = {}
    for key in _SEQ_KEYS:
        rows = []
        for s in batch:
            arr = np.asarray(s[key])
            rows.append(_pad_seq(arr, max_length, pad_map[key]))
        out[key] = np.stack(rows)

    imgs, cmp_m, gen_m, ppos = [], [], [], []
    for s in batch:
        im = s.get("images")
        if im is None:
            continue
        im = np.asarray(im, np.float32)
        if im.ndim == 3:
            im = im[None]
        n = im.shape[0]
        imgs.append(im)
        cm = np.asarray(s.get("embeds_cmp_mask", False)).reshape(-1)
        gm = np.asarray(s.get("embeds_gen_mask", False)).reshape(-1)
        if cm.shape[0] != n:
            cm = np.repeat(cm[:1], n)
        if gm.shape[0] != n:
            gm = np.repeat(gm[:1], n)
        cmp_m.append(cm)
        gen_m.append(gm)
        pp = s.get("patch_position")
        ppos.append(np.asarray(pp, np.float32) if pp is not None
                    else np.full((n, 2), 0.5, np.float32))

    if imgs:
        images = np.concatenate(imgs, axis=0)
        cmp_mask = np.concatenate(cmp_m).astype(bool)
        gen_mask = np.concatenate(gen_m).astype(bool)
        patch_positions = np.concatenate(ppos, axis=0)
    else:
        images = np.zeros((0, image_size, image_size, 3), np.float32)
        cmp_mask = np.zeros((0,), bool)
        gen_mask = np.zeros((0,), bool)
        patch_positions = np.zeros((0, 2), np.float32)

    n = images.shape[0]
    if n > max_images:
        raise ValueError(
            f"batch has {n} image patches > capacity {max_images}; raise "
            "max_images or lower batch size")
    pad_n = max_images - n
    out["images"] = np.concatenate(
        [images, np.zeros((pad_n, image_size, image_size, 3), np.float32)],
        axis=0)
    out["embeds_cmp_mask"] = np.concatenate([cmp_mask,
                                             np.zeros((pad_n,), bool)])
    out["embeds_gen_mask"] = np.concatenate([gen_mask,
                                             np.zeros((pad_n,), bool)])
    out["patch_positions"] = np.concatenate(
        [patch_positions, np.full((pad_n, 2), 0.5, np.float32)], axis=0)
    out["dataset_name"] = dataset_name
    return out


def pack_samples(samples: list[dict], *, max_length: int,
                 max_rows: int, max_images: int, image_size: int,
                 dataset_name=None) -> dict:
    """Sample packing (TPU headroom the reference leaves on the table,
    SURVEY.md §5.7): concatenate unpadded samples into ``max_rows``
    packed rows. attention_mask carries per-sample segment ids
    (1, 2, ...; 0 = padding) which the models feed to the flash kernel
    as segment_ids and use to restart positions per sample.

    Samples must carry unpadded (or pad-stripped) arrays; each sample's
    images stay aligned with its ids_* spans because packing preserves
    row-major order.
    """
    rows = [[] for _ in range(max_rows)]
    lengths = [0] * max_rows
    for s in samples:
        real = int(np.asarray(s["attention_mask"]).sum())
        # first-fit
        for r in range(max_rows):
            if lengths[r] + real <= max_length:
                rows[r].append({k: (np.asarray(v)[:real]
                                    if k in _SEQ_KEYS else v)
                                for k, v in s.items()})
                lengths[r] += real
                break

    out_seq = {k: np.zeros((max_rows, max_length),
                           np.int32 if k in ("input_ids",
                                             "attention_mask",
                                             "labels") else bool)
               for k in _SEQ_KEYS}
    out_seq["labels"][:] = IGNORE_INDEX
    imgs, cmp_m, gen_m, ppos = [], [], [], []
    for r, row in enumerate(rows):
        off = 0
        for si, s in enumerate(row):
            L = int(np.asarray(s["attention_mask"]).sum())
            sl = slice(off, off + L)
            out_seq["input_ids"][r, sl] = s["input_ids"][:L]
            out_seq["attention_mask"][r, sl] = si + 1   # segment id
            labels = np.asarray(s["labels"][:L]).copy()
            labels[0] = IGNORE_INDEX   # no cross-sample first-token target
            out_seq["labels"][r, sl] = labels
            out_seq["ids_cmp_mask"][r, sl] = s["ids_cmp_mask"][:L]
            out_seq["ids_gen_mask"][r, sl] = s["ids_gen_mask"][:L]
            off += L
            im = s.get("images")
            if im is None:
                continue
            im = np.asarray(im, np.float32)
            if im.ndim == 3:
                im = im[None]
            n = im.shape[0]
            imgs.append(im)
            cm = np.asarray(s.get("embeds_cmp_mask", False)).reshape(-1)
            gm = np.asarray(s.get("embeds_gen_mask", False)).reshape(-1)
            if cm.shape[0] != n:
                cm = np.repeat(cm[:1], n)
            if gm.shape[0] != n:
                gm = np.repeat(gm[:1], n)
            cmp_m.append(cm)
            gen_m.append(gm)
            pp = s.get("patch_position", s.get("patch_positions"))
            ppos.append(np.asarray(pp, np.float32) if pp is not None
                        else np.full((n, 2), 0.5, np.float32))

    if imgs:
        images = np.concatenate(imgs, axis=0)
        cmp_mask = np.concatenate(cmp_m).astype(bool)
        gen_mask = np.concatenate(gen_m).astype(bool)
        patch_positions = np.concatenate(ppos, axis=0)
    else:
        images = np.zeros((0, image_size, image_size, 3), np.float32)
        cmp_mask = np.zeros((0,), bool)
        gen_mask = np.zeros((0,), bool)
        patch_positions = np.zeros((0, 2), np.float32)
    n = images.shape[0]
    if n > max_images:
        raise ValueError(f"{n} image patches > capacity {max_images}")
    pad_n = max_images - n
    return {
        **{k: v for k, v in out_seq.items()},
        "images": np.concatenate(
            [images, np.zeros((pad_n, image_size, image_size, 3),
                              np.float32)], axis=0),
        "embeds_cmp_mask": np.concatenate(
            [cmp_mask, np.zeros((pad_n,), bool)]),
        "embeds_gen_mask": np.concatenate(
            [gen_mask, np.zeros((pad_n,), bool)]),
        "patch_positions": np.concatenate(
            [patch_positions, np.full((pad_n, 2), 0.5, np.float32)],
            axis=0),
        "dataset_name": dataset_name,
    }


def process_anyres_jpeg_native(jpeg_bytes: bytes, mean, std,
                               grid_pinpoints, base_image_size: int):
    """Native-decode anyres path: libjpeg decode + resize + normalize in
    C++ (GIL-free), patches cut as numpy views. Semantics match
    :func:`process_anyres_image` up to resampling filter (C bilinear vs
    PIL bicubic). Returns None when the native lib is unavailable or the
    bytes don't decode. Opt-in via MLLM_TPU_NATIVE_DECODE=1."""
    from mllm_npu_tpu.data import native
    if not native.available():
        return None
    from PIL import Image as _Img
    import io as _io
    # header-only size probe (cheap; no full decode)
    try:
        with _Img.open(_io.BytesIO(jpeg_bytes)) as im:
            size = im.size
    except Exception:  # noqa: BLE001
        return None

    possible = grid_pinpoints if isinstance(grid_pinpoints, list) \
        else ast.literal_eval(grid_pinpoints)
    w1, h1 = select_best_resolution(size, possible)
    w2, h2 = select_best_resolution_v2(size, possible)
    w, h = (w2, h2) if w1 * h1 > w2 * h2 else (w1, h1)

    lib = native.load_library()
    import ctypes
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    full = np.empty((h, w, 3), np.float32)
    buf = (ctypes.c_uint8 * len(jpeg_bytes)).from_buffer_copy(jpeg_bytes)
    ok = lib.jpeg_decode_resize_normalize(
        buf, len(jpeg_bytes), h, w,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        full.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if not ok:
        return None
    thumb = np.empty((base_image_size, base_image_size, 3), np.float32)
    lib.jpeg_decode_resize_normalize(
        buf, len(jpeg_bytes), base_image_size, base_image_size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        thumb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

    gx, gy = w // base_image_size, h // base_image_size
    patches = [full[i * base_image_size:(i + 1) * base_image_size,
                    j * base_image_size:(j + 1) * base_image_size]
               for i in range(gy) for j in range(gx)]
    arrays = np.stack(patches + [thumb]).astype(np.float32)
    x_idx = (np.tile(np.arange(gx), (gy, 1)) + 0.5) / gx
    y_idx = (np.tile(np.arange(gy)[:, None], (1, gx)) + 0.5) / gy
    pos = np.stack([x_idx, y_idx], axis=-1).reshape(-1, 2)
    pos = np.concatenate([pos, np.asarray([[0.5, 0.5]])], axis=0)
    return arrays, pos.astype(np.float32)
