"""Special-token constants shared by data, models, and serving.

Mirrors the reference data contract (reference: mllm_npu/constant.py:1-7):
image-span delimiters, per-image discrete token ladder, and any-resolution
patch delimiters. ``DYNAMIC_PADDING`` is kept for config parity; the TPU
build always produces static-shape batches (a jit requirement), matching
the reference's effective behavior (flag hardcoded False).
"""

BOI_TOKEN = "<img>"
EOI_TOKEN = "</img>"
BOP_TOKEN = "<patch>"
EOP_TOKEN = "</patch>"
IMG_TOKEN = "<img_{:05d}>"

IGNORE_INDEX = -100

# number of learnable image tokens emitted/consumed per image span
NUM_IMG_TOKENS = 64

DYNAMIC_PADDING = False
