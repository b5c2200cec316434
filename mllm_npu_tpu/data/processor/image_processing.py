"""Image preprocessing from JSON processor configs.

One implementation covers both of the reference's vendored processors
(CLIP-style for Qwen-ViT and SigLIP — reference data/processor/
clip_image_processor.py + siglip_image_processor.py, configured by
configs/processor_configs/*.json): resize (PIL resample code), optional
rescale (1/255), normalize, NHWC float32 output (TPU conv layout —
the reference emits NCHW for torch).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import numpy as np
from PIL import Image


@dataclasses.dataclass
class ImageProcessor:
    height: int = 384
    width: int = 384
    do_resize: bool = True
    do_rescale: bool = True
    rescale_factor: float = 1.0 / 255.0
    do_normalize: bool = True
    image_mean: tuple = (0.5, 0.5, 0.5)
    image_std: tuple = (0.5, 0.5, 0.5)
    resample: int = 3      # PIL code: 2=bilinear, 3=bicubic

    @property
    def image_size(self) -> int:
        assert self.height == self.width
        return self.height

    def __call__(self, image: Image.Image) -> np.ndarray:
        if self.do_resize and image.size != (self.width, self.height):
            image = image.resize((self.width, self.height),
                                 resample=self.resample)
        arr = np.asarray(image.convert("RGB"), np.float32)
        if self.do_rescale:
            arr = arr * self.rescale_factor
        else:
            # reference Qwen config: do_rescale false but ToTensor-style
            # scaling already applied upstream; raw PIL arrays are 0-255,
            # so rescale anyway to match torchvision ToTensor semantics
            arr = arr / 255.0
        if self.do_normalize:
            mean = np.asarray(self.image_mean, np.float32)
            std = np.asarray(self.image_std, np.float32)
            arr = (arr - mean) / std
        return arr  # [H, W, 3] float32


def init_processor(processor_name: str = None, processor_json: str = None,
                   **kw) -> ImageProcessor:
    """Construct from a processor JSON (reference
    data/processor/__init__.py:6-14)."""
    cfg = {}
    if processor_json is not None:
        path = Path(processor_json)
        if not path.exists():
            # allow reference-style relative paths
            alt = Path(__file__).resolve().parents[2] / "configs" / \
                "processor_configs" / Path(processor_json).name
            if alt.exists():
                path = alt
        with open(path) as f:
            cfg = json.load(f)
    size = cfg.get("size", {})
    return ImageProcessor(
        height=size.get("height", 384),
        width=size.get("width", 384),
        do_resize=cfg.get("do_resize", True),
        do_rescale=cfg.get("do_rescale", True),
        rescale_factor=cfg.get("rescale_factor", 1.0 / 255.0),
        do_normalize=cfg.get("do_normalize", True),
        image_mean=tuple(cfg.get("image_mean", (0.5, 0.5, 0.5))),
        image_std=tuple(cfg.get("image_std", (0.5, 0.5, 0.5))),
        resample=cfg.get("resample", 3),
    )
