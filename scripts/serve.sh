#!/bin/bash
# Launch the serving trio: controller + worker + web UI
# (reference README.md:99-129 deployment flow).
set -e
cd "$(dirname "$0")/.."

MODEL_CONFIG=${MODEL_CONFIG:-mllm_npu_tpu/configs/models/seedx_llama2_13b_qwenvl_vitg.yaml}

python -m mllm_npu_tpu.serve.controller --port 10075 &
sleep 2
python -m mllm_npu_tpu.serve.worker \
  --model-config "$MODEL_CONFIG" \
  --controller-address http://localhost:10075 \
  --worker-address http://localhost:40000 --port 40000 &
sleep 2
python -m mllm_npu_tpu.serve.gradio_app \
  --worker-address http://localhost:40000 --port 7860
