"""Single-image comprehension demo (reference demo/img2txt_inference.py).

  DEBUG_FLAG=True python demo/img2txt_inference.py \
      --config mllm_npu_tpu/configs/models/mllm_llama3_8b_siglip_vit.yaml \
      --image demo/example.jpg --question "What is unusual in the image?"

With DEBUG_FLAG the stack is tiny+random (CPU-runnable smoke test,
reference's fake-backend mode); with real checkpoints under pretrained/
it reproduces the reference demo.
"""

import argparse
import base64
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="mllm_npu_tpu/configs/models/"
                                "mllm_llama3_8b_siglip_vit.yaml")
    parser.add_argument("--image", type=str, required=True)
    parser.add_argument("--question", type=str,
                        default="Describe the image.")
    parser.add_argument("--max_new_tokens", type=int, default=120)
    parser.add_argument("--fake_tokenizer", action="store_true")
    parser.add_argument("--params_checkpoint", type=str, default=None,
                        help="orbax dir: a trainer --output_dir or a "
                             "converted params dir (the reference demo "
                             "loads pretrained_model_path)")
    args = parser.parse_args()

    import jax

    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()
    from mllm_npu_tpu.configs import instantiate, load_config
    from mllm_npu_tpu.models.factory import init_assembly_params
    from mllm_npu_tpu.serve.engine import InferenceEngine
    from mllm_npu_tpu.utils.testing import TinySpec, synthetic_batch

    cfg = load_config(args.config)
    llm = instantiate(cfg["mllm"]["language_model"])
    bundle = instantiate(cfg["mllm"]["mllm_model"], language_model=llm)
    if args.fake_tokenizer:
        from mllm_npu_tpu.utils.testing import FakeTokenizer
        tokenizer = FakeTokenizer()
    else:
        tokenizer = instantiate(cfg["mllm"]["tokenizer"])
    processor = instantiate(cfg["mllm"]["processor"])

    vis_cfg = bundle.module.vision_encoder.config
    nq = bundle.module.projector.num_queries
    spec = TinySpec(batch=1, seq=8 + 2 * (nq + 2),
                    image_size=vis_cfg.image_size, nq=nq,
                    vocab=llm.config.vocab_size, max_images=2)
    example = synthetic_batch(spec, cmp_images=1)
    if args.params_checkpoint:
        from mllm_npu_tpu.utils.convert import restore_any_params
        params = restore_any_params(bundle, example,
                                    args.params_checkpoint)
    else:
        params = init_assembly_params(bundle, example,
                                      jax.random.PRNGKey(0))

    engine = InferenceEngine(
        model=bundle.module, lm_config=llm.config, params=params,
        tokenizer=tokenizer, image_transform=processor,
        num_img_in_tokens=nq, num_img_out_tokens=nq,
        max_new_tokens=args.max_new_tokens)

    image_b64 = base64.b64encode(Path(args.image).read_bytes()).decode()
    answer = engine.comprehension(args.question, image_b64)
    print("Q:", args.question)
    print("A:", answer)


if __name__ == "__main__":
    main()
