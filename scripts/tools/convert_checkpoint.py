"""Convert reference-layout torch checkpoints into an orbax params dir.

The model YAML's per-component checkpoint paths (reference
pretrained/weight.md:8-95 layout: HF Llama dirs, SigLIP, qwen_vit_G.pt,
SEED-X pytorch_model.bin) are loaded and converted ONCE; serving and
eval then start with ``--params-checkpoint <out>`` — a direct sharded
orbax read instead of minutes of per-start torch.load + key mapping
(the reference reruns that on every worker start, worker.py:65-109).

    python scripts/tools/convert_checkpoint.py \
        --model-config mllm_npu_tpu/configs/models/seedx_llama2_13b_qwenvl_vitg.yaml \
        --out /ckpt/seedx-orbax
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--step", type=int, default=0)
    args = p.parse_args()

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    from mllm_npu_tpu.utils.convert import convert_model_checkpoint
    info = convert_model_checkpoint(args.model_config, args.out,
                                    step=args.step)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
