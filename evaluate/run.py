"""Evaluation dispatcher (CLI parity with reference evaluate/run.py):

  python evaluate/run.py --config_path <model yaml> \
      --dataset_name mmlu --data_path ./evaluate/eval_data/mmlu/

Builds the model stack from the YAML (same slots as the reference,
run.py:20-37) and dispatches to one of the seven benchmarks.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_eval_model(config_path: str, max_new_tokens: int = 512,
                     params_checkpoint: str = None,
                     prefix_cache: int = 0):
    """``params_checkpoint``: orbax dir to evaluate — either a trainer
    ``--output_dir`` (TrainState save) or a converted params-only dir.
    This is the train→evaluate round trip the reference performs via
    ``pretrained_model_path`` (reference evaluate/run.py:20-37);
    without it, params come from the YAML's named torch checkpoints
    (or random DEBUG init).

    ``prefix_cache`` > 0 routes text benchmarks through the
    continuous-batching engine with an N-entry prompt-prefix KV cache:
    the few-shot preamble every item repeats prefills once
    (answer-identical to the single-request path — parity-tested)."""
    import jax

    from mllm_npu_tpu.configs import instantiate, load_config
    from mllm_npu_tpu.evaluate.evaluator import EvalModel
    from mllm_npu_tpu.models.factory import init_assembly_params
    from mllm_npu_tpu.serve.engine import InferenceEngine
    from mllm_npu_tpu.utils.testing import TinySpec, synthetic_batch

    import os

    cfg = load_config(config_path)
    llm = instantiate(cfg["mllm"]["language_model"])
    bundle = instantiate(cfg["mllm"]["mllm_model"], language_model=llm)
    try:
        tokenizer = instantiate(cfg["mllm"]["tokenizer"])
    except Exception:
        if os.environ.get("DEBUG_FLAG") != "True":
            raise
        from mllm_npu_tpu.utils.testing import FakeTokenizer
        tokenizer = FakeTokenizer()
    processor = instantiate(cfg["mllm"]["processor"])

    vis_cfg = bundle.module.vision_encoder.config
    nq = bundle.module.projector.num_queries
    spec = TinySpec(batch=1, seq=8 + 2 * (nq + 2),
                    image_size=vis_cfg.image_size, nq=nq,
                    vocab=llm.config.vocab_size, max_images=2)
    example = synthetic_batch(spec, cmp_images=1)
    if params_checkpoint:
        from mllm_npu_tpu.utils.convert import restore_any_params
        params = restore_any_params(bundle, example, params_checkpoint)
    else:
        params = init_assembly_params(bundle, example,
                                      jax.random.PRNGKey(0))
    if prefix_cache:
        from mllm_npu_tpu.serve.engine import BatchedInferenceEngine
        engine = BatchedInferenceEngine(
            num_slots=2, max_len=2560, max_prompt=2048,
            batch_prompt_bucket=512,
            prefix_cache=prefix_cache,
            model=bundle.module, lm_config=llm.config, params=params,
            tokenizer=tokenizer, image_transform=processor,
            num_img_in_tokens=nq, num_img_out_tokens=nq,
            max_new_tokens=max_new_tokens)
        return EvalModel(engine, model=bundle.module, params=params)
    engine = InferenceEngine(
        model=bundle.module, lm_config=llm.config, params=params,
        tokenizer=tokenizer, image_transform=processor,
        num_img_in_tokens=nq, num_img_out_tokens=nq,
        max_new_tokens=max_new_tokens)
    return EvalModel(engine, model=bundle.module, params=params)


def main():
    parser = argparse.ArgumentParser(description="evaluate mllm on tpu")
    parser.add_argument("--config_path", type=str,
                        default="mllm_npu_tpu/configs/models/"
                                "seedx_llama2_13b_qwenvl_vitg.yaml")
    parser.add_argument("--dataset_name", type=str, default="mmlu")
    parser.add_argument("--data_path", type=str,
                        default="./evaluate/eval_data/mmlu/")
    parser.add_argument("--max_items", type=int, default=None)
    parser.add_argument("--params_checkpoint", type=str, default=None,
                        help="orbax dir to evaluate: a trainer "
                             "--output_dir or a converted params dir")
    parser.add_argument("--prefix_cache", type=int, default=0,
                        help="N-entry prompt-prefix KV cache via the "
                             "batched engine: the repeated few-shot "
                             "preamble prefills once (answer-"
                             "identical; faster on long prompts)")
    args = parser.parse_args()

    from mllm_npu_tpu.evaluate import mm_benchmarks as mm
    from mllm_npu_tpu.evaluate import text_benchmarks as tb

    model = build_eval_model(args.config_path,
                             params_checkpoint=args.params_checkpoint,
                             prefix_cache=args.prefix_cache)
    if args.dataset_name == "mmlu":
        tb.mmlu_eval(model, args.data_path,
                     max_items_per_subject=args.max_items)
    elif args.dataset_name == "cmmlu":
        tb.cmmlu_eval(model, args.data_path,
                      max_items_per_subject=args.max_items)
    elif args.dataset_name == "bbh":
        tb.bbh_eval(model, args.data_path,
                    max_items_per_subject=args.max_items)
    elif args.dataset_name == "ceval":
        tb.ceval_eval(model, args.data_path,
                      max_items_per_subject=args.max_items)
    elif args.dataset_name == "seed_bench":
        mm.seed_bench2_eval(model, args.data_path, max_items=args.max_items)
    elif args.dataset_name == "mme":
        mm.mme_eval(model, args.data_path, max_items=args.max_items)
    elif args.dataset_name == "mm_vet":
        mm.mm_vet_eval(model, args.data_path, max_items=args.max_items)
    else:
        raise ValueError(f"unknown dataset {args.dataset_name}")


if __name__ == "__main__":
    main()
