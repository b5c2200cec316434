#!/bin/bash
# Launch the serving trio: controller + worker + web UI
# (reference README.md:99-129 deployment flow). The worker's full stack
# — model YAML, generation YAML, ports, concurrency, engine flags — is
# wired from ONE worker JSON (reference
# mllm_npu/configs/workers/seedx_workers.json parity); set WORKER_CONFIG
# to swap it, or override individual flags after --worker-config.
set -e
cd "$(dirname "$0")/.."

WORKER_CONFIG=${WORKER_CONFIG:-mllm_npu_tpu/configs/workers/seedx_worker.json}

python -m mllm_npu_tpu.serve.controller --port 10075 &
sleep 2
python -m mllm_npu_tpu.serve.worker --worker-config "$WORKER_CONFIG" &
sleep 2
python -m mllm_npu_tpu.serve.gradio_app \
  --worker-address http://localhost:40000 --port 7860
