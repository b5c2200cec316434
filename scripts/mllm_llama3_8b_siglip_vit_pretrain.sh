#!/bin/bash
# MLLM (Llama-3-8B + SigLIP) pretrain on a TPU slice.
# Reference operating point: lr 1e-4, bf16, cosine(min 0.05), warmup 500,
# 100k steps, save every 1000, grad-accum 2
# (reference scripts/mllm_llama3_8b_siglip_vit_pretrain.sh:36-57).
# torchrun/NCCL env is replaced by the GSPMD mesh flags; multi-host TPU
# slices init via JAX_COORDINATOR_ADDRESS.
set -e
cd "$(dirname "$0")/.."

PROJ_NAME=${PROJ_NAME:-mllm_pretrain}
OUTPUT_DIR=${OUTPUT_DIR:-output/${PROJ_NAME}}
mkdir -p "$OUTPUT_DIR"

python -m mllm_npu_tpu.train.train \
  --model mllm_npu_tpu/configs/models/mllm_llama3_8b_siglip_vit.yaml \
  --train_dataset mllm_npu_tpu/configs/dataset/pretrain_data.yaml \
  --output_dir "$OUTPUT_DIR" \
  --learning_rate 1e-4 \
  --lr_scheduler_type cosine \
  --warmup_steps 500 \
  --min_lr_ratio 0.05 \
  --max_steps 100000 \
  --save_steps 1000 \
  --gradient_accumulation_steps 2 \
  --mixed_precision bf16 \
  --mesh_data -1 --mesh_fsdp 4 --mesh_tensor 1 \
  --project_name "$PROJ_NAME" \
  2>&1 | tee -a "$OUTPUT_DIR/train.log"
