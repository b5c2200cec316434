"""mllm_npu_tpu — a TPU-native multimodal LLM framework.

A from-scratch JAX/Flax/Pallas rebuild of the capability surface of
TencentARC/mllm-npu (training, inference, and image generation with
multimodal LLMs), designed TPU-first:

- compute: XLA via jit/pjit, Pallas kernels for flash attention and
  other hot ops (``mllm_npu_tpu.ops``)
- scale: GSPMD sharding over a ``jax.sharding.Mesh`` (data/fsdp/tensor
  axes) instead of DeepSpeed ZeRO (``mllm_npu_tpu.parallel``)
- models: Flax modules for the Llama family, SigLIP/Qwen-ViT encoders,
  projectors, and the two multimodal assemblies
  (``GeneralizedMultimodalModel``, ``SEED``)
- data: webdataset-tar/jsonl streaming with any-resolution tiling
  producing static-shape device batches (``mllm_npu_tpu.data``)
- serving/eval: HTTP controller/worker drop-in compatible with the
  reference (``mllm_npu_tpu.serve``, ``mllm_npu_tpu.evaluate``)

Reference capability map: /root/reference (mllm_npu/*), see SURVEY.md.
"""

__version__ = "0.1.0"
