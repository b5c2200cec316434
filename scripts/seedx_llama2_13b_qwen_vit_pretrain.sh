#!/bin/bash
# SEED-X (Llama-2-13B + Qwen-ViT-G) comprehension+generation pretrain
# (reference scripts/seed-x_llama2_13b_qwen_vit_pretrain.sh).
set -e
cd "$(dirname "$0")/.."

PROJ_NAME=${PROJ_NAME:-seedx_pretrain}
OUTPUT_DIR=${OUTPUT_DIR:-output/${PROJ_NAME}}
mkdir -p "$OUTPUT_DIR"

python -m mllm_npu_tpu.train.train \
  --model mllm_npu_tpu/configs/models/seedx_llama2_13b_qwenvl_vitg.yaml \
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
  --mesh_data -1 --mesh_fsdp 4 --mesh_tensor 2 \
  --project_name "$PROJ_NAME" \
  2>&1 | tee -a "$OUTPUT_DIR/train.log"
