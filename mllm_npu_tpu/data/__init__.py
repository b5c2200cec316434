from mllm_npu_tpu.data.tasks.image_caption import (
    build_caption_datapipes_with_pixels)
from mllm_npu_tpu.data.tasks.interleaved_image_text import (
    build_interleave_datapipes_with_pixels)
from mllm_npu_tpu.data.tasks.ocr import build_ocr_datapipes_caption
from mllm_npu_tpu.data.tasks.pure_text import build_text_datapipes

__all__ = [
    "build_caption_datapipes_with_pixels",
    "build_interleave_datapipes_with_pixels",
    "build_ocr_datapipes_caption",
    "build_text_datapipes",
]
