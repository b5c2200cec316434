"""Training CLI (pretrain / SFT).

Drop-in workflow parity with the reference trainer
(reference train/train.py:46-126 dataclass args, :183-408 loop), with
the Accelerate/DeepSpeed machinery replaced by one pjit-compiled step
over a (data, fsdp, tensor) mesh:

  python -m mllm_npu_tpu.train.train \
      --model mllm_npu_tpu/configs/models/mllm_llama3_8b_siglip_vit.yaml \
      --train_dataset mllm_npu_tpu/configs/dataset/pretrain_data.yaml \
      --output_dir out --max_steps 100000 --save_steps 1000 \
      --learning_rate 1e-4 --lr_scheduler_type cosine --warmup_steps 500

Differences from the reference, by design:
- no per-step empty_cache() hack (reference train.py:379 — XLA manages
  memory), no NCCL/HCCL env tuning (GSPMD inserts collectives)
- losses come out globally reduced — no manual all_gather metric dance
  (reference train.py:39-43,145-154)
- data position is checkpointed alongside model state (the reference
  only reseeds, train.py:318-323)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("mllm_npu_tpu.train")


@dataclasses.dataclass
class TrainArgs:
    # config paths (reference ConfigPathArguments, train.py:47-57)
    model: str = ""
    train_dataset: str = ""
    tokenizer: str = ""
    # optimization (reference TrainingArguments, train.py:61-126)
    output_dir: str = "output"
    resume_from_checkpoint: str = ""
    resume_steps: int = 0
    # orbax params dir from scripts/tools/convert_checkpoint.py — init
    # params as a direct sharded read instead of per-start torch
    # conversion (init-time weights, not a training resume)
    params_checkpoint: str = ""
    learning_rate: float = 1e-4
    weight_decay: float = 0.05
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    mixed_precision: str = "bf16"
    dataloader_workers: int = 0   # >0: process pool (reference uses 8)
    num_train_epochs: int = 10
    max_steps: int = 100_000
    save_steps: int = 1000
    log_steps: int = 10
    lr_scheduler_type: str = "cosine"
    warmup_steps: int = 500
    min_lr_ratio: float = 0.05
    mu_dtype: str = "bfloat16"    # bf16 adam moments: +6pt MFU measured
    # QLoRA-style SFT: store the FROZEN LoRA base in int8/int4 (the
    # reference SFT recipe is LoRA on a frozen LLM, peft_models.py:15-99;
    # quantized storage is what makes the 8B base + adapters fit one
    # 16GB chip). Requires a LoRA model config ('' | 'int8' | 'int4').
    quantize_base: str = ""
    quant_group_size: int = 256
    # chunked (fused-linear) CE: LM loss computed from hidden states in
    # sequence chunks, never materializing [B, S, V] logits — the
    # dominant activation at 128k vocab. 0 = dense loss.
    ce_loss_chunk: int = 0
    # mesh (replaces deepspeed/fsdp plugin args, train.py:54-55)
    mesh_data: int = -1
    mesh_fsdp: int = 1
    mesh_tensor: int = 1
    mesh_dcn_data: int = 1   # multi-slice: data-parallel replicas on DCN
    mesh_seq: int = 1        # Ulysses sequence parallelism
    mesh_stage: int = 1      # GPipe pipeline stages (parallel/pipeline.py)
    pipeline_microbatches: int = 4   # microbatches per step when stage>1
    # observability
    project_name: str = "mllm_tpu"
    run_name: str = ""
    profile_steps: int = 0     # capture a jax.profiler trace at this step
    # testing hooks
    fake_tokenizer: bool = False


def parse_args(argv=None) -> TrainArgs:
    p = argparse.ArgumentParser()
    for f in dataclasses.fields(TrainArgs):
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(f"--{f.name}", action="store_true")
        else:
            p.add_argument(f"--{f.name}", type=type(f.default),
                           default=f.default)
    ns = p.parse_args(argv)
    return TrainArgs(**vars(ns))


def build_tokenizer(args: TrainArgs, cfg: dict):
    if args.fake_tokenizer:
        from mllm_npu_tpu.utils.testing import FakeTokenizer
        return FakeTokenizer()
    from mllm_npu_tpu.configs import instantiate
    node = cfg["mllm"]["tokenizer"]
    if args.tokenizer:
        node = dict(node)
        node["pretrained_model_name_or_path"] = args.tokenizer
    return instantiate(node)


def trainable_params_report(params) -> str:
    leaves = jax.tree_util.tree_leaves(params)
    total = sum(int(np.prod(x.shape)) for x in leaves)
    return f"total params: {total / 1e6:.2f}M"


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    from mllm_npu_tpu.utils.misc import honor_platform_env
    honor_platform_env()    # JAX_PLATFORMS=cpu must stick for local runs
    args = parse_args(argv)

    from mllm_npu_tpu.configs import instantiate, load_config
    from mllm_npu_tpu.data.dataloader import make_dataloader
    from mllm_npu_tpu.models.factory import init_assembly_params
    from mllm_npu_tpu.parallel import MeshConfig, build_mesh
    from mllm_npu_tpu.parallel.mesh import maybe_init_distributed
    from mllm_npu_tpu.train.checkpoint import (CheckpointManager,
                                               install_sigterm_checkpoint)
    from mllm_npu_tpu.train.train_state import (OptimizerConfig,
                                                compile_train_step,
                                                create_train_state,
                                                make_train_step,
                                                shard_train_state)

    maybe_init_distributed()
    mesh = build_mesh(MeshConfig(data=args.mesh_data, fsdp=args.mesh_fsdp,
                                 tensor=args.mesh_tensor,
                                 dcn_data=args.mesh_dcn_data,
                                 seq=args.mesh_seq,
                                 stage=args.mesh_stage))
    log.info("mesh: %s", dict(mesh.shape))

    # ---- model ------------------------------------------------------------
    model_cfg = load_config(args.model)
    tokenizer = build_tokenizer(args, model_cfg)
    llm_bundle = instantiate(model_cfg["mllm"]["language_model"])
    if args.quantize_base:
        # swap the LoRA base denses to int8/int4 storage and quantize the
        # converted float kernels in place; gradients still reach the
        # adapters through quant_matmul's custom VJP (ops/quant.py)
        import dataclasses as _dc

        from mllm_npu_tpu.models.factory import ModelBundle
        from mllm_npu_tpu.models.language_models.llama import \
            LlamaForCausalLM
        from mllm_npu_tpu.utils.weights import quantize_llama_params
        bits = {"int8": 8, "int4": 4}[args.quantize_base]
        lm_cfg = _dc.replace(llm_bundle.config,
                             quantization=args.quantize_base,
                             quant_group_size=args.quant_group_size)
        if llm_bundle.params is not None:
            fparams = llm_bundle.params
        else:
            # no converted checkpoint (DEBUG runs): random-init the FLOAT
            # base and quantize it — Int8/Int4Dense's own init is zeros
            # (a placeholder for loaded weights), and an all-zero base is
            # a degenerate model whose lm_head passes no gradient at all
            fparams = llm_bundle.module.init(
                jax.random.PRNGKey(7),
                jnp.zeros((1, 8), jnp.int32))["params"]
        qparams = quantize_llama_params(fparams, bits=bits,
                                        group_size=args.quant_group_size)
        llm_bundle = ModelBundle(
            module=LlamaForCausalLM(lm_cfg, dtype=llm_bundle.module.dtype),
            config=lm_cfg, params=qparams, extras=llm_bundle.extras)
    bundle = instantiate(model_cfg["mllm"]["mllm_model"],
                         language_model=llm_bundle)
    model = bundle.module
    if args.ce_loss_chunk:
        model = model.clone(ce_loss_chunk=args.ce_loss_chunk)

    # ---- data -------------------------------------------------------------
    processor = instantiate(model_cfg["mllm"]["processor"]) \
        if "processor" in model_cfg["mllm"] else None
    ds_cfg = load_config(args.train_dataset)

    pipe_factory = PipeFactory(ds_cfg, tokenizer, processor)

    # probe one batch for compile shapes from a throwaway pipe — the
    # real loader must start at batch 0 (or the restored position)
    first_batch = next(iter(pipe_factory(888)))
    loader = make_dataloader(pipe_factory, prefetch=4,
                             num_workers=args.dataloader_workers)
    example = {k: v for k, v in first_batch.items()
               if isinstance(v, np.ndarray)}
    example.setdefault("patch_positions", None)
    example = _normalize_batch(example)

    # ---- params / state ---------------------------------------------------
    if args.params_checkpoint:
        from mllm_npu_tpu.utils.convert import restore_params
        # mesh → leaves restore directly in their sharded layout (no
        # replicated staging copy; shard_train_state is then a no-op
        # placement for params)
        params = restore_params(bundle, example, args.params_checkpoint,
                                mesh=mesh)
    else:
        params = init_assembly_params(bundle, example,
                                      jax.random.PRNGKey(42))
    log.info(trainable_params_report(params))
    # trainable/frozen split, reference peft semantics
    # (peft_models.py:15-99): with a LoRA LM only the adapters,
    # modules_to_save layernorms and the resized embeddings train — the
    # whole base subtree (incl. quantized scales) is frozen. The vision
    # tower freezes per the model config (mllm.py stop_gradient is the
    # activation-side half; the optimizer mask keeps its opt state at 0).
    frozen = []
    if model_cfg["mllm"]["mllm_model"].get("freeze_vision_encoder", True):
        frozen.append("vision_encoder")
    if getattr(llm_bundle.config, "lora_rank", 0) > 0:
        from mllm_npu_tpu.models.language_models.llama import \
            lora_frozen_patterns
        frozen.extend(lora_frozen_patterns())
    opt_cfg = OptimizerConfig(
        lr=args.learning_rate, weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        scheduler=args.lr_scheduler_type, warmup_steps=args.warmup_steps,
        total_steps=args.max_steps, min_lr_ratio=args.min_lr_ratio,
        mu_dtype=args.mu_dtype, frozen_patterns=tuple(frozen))
    state = create_train_state(params, opt_cfg)
    del params
    from mllm_npu_tpu.train.scheduler import get_scheduler
    lr_schedule = get_scheduler(
        args.lr_scheduler_type, base_lr=args.learning_rate,
        warmup_steps=args.warmup_steps, total_steps=args.max_steps,
        min_lr_ratio=args.min_lr_ratio)

    if args.mesh_stage > 1:
        # GPipe pipeline over the `stage` axis: decoder stack under
        # shard_map + ppermute, everything else plain GSPMD (dropout
        # rngs are not threaded into the pipelined layers)
        from mllm_npu_tpu.parallel.pipeline import pipelined_mllm_loss

        def loss_fn(p, batch, rng):
            out = pipelined_mllm_loss(
                model, p, batch, mesh=mesh,
                n_micro=args.pipeline_microbatches)
            metrics = {k: v for k, v in out.items() if k != "total_loss"}
            return out["total_loss"], metrics
    else:
        def loss_fn(p, batch, rng):
            out = model.apply(p, **batch, rngs={"dropout": rng})
            metrics = {k: v for k, v in out.items() if k != "total_loss"}
            return out["total_loss"], metrics

    ga = args.gradient_accumulation_steps
    step_fn = make_train_step(loss_fn, grad_accum=ga)
    batch_for_compile = example if ga == 1 else jax.tree_util.tree_map(
        lambda x: np.stack([x] * ga), example)
    jitted, state_sharding, batch_shardings = compile_train_step(
        step_fn, state, batch_for_compile, mesh)
    state = shard_train_state(state, state_sharding)

    # ---- resume -----------------------------------------------------------
    ckpt_dir = args.resume_from_checkpoint or args.output_dir
    mgr = CheckpointManager(ckpt_dir)
    state, data_state, resumed_step = mgr.restore(state)
    start_step = int(resumed_step or args.resume_steps or 0)
    if data_state:
        loader.load_state_dict(data_state)
    data_iter = iter(loader)   # starts at batch 0 or the restored position
    if resumed_step:
        log.info("resumed from checkpoint-%d", resumed_step)

    # data position snapshot taken ONLY at optimizer-step boundaries: with
    # grad accumulation the loader may be 1..ga-1 yielded-but-unapplied
    # microbatches ahead, and saving loader.state_dict() at that moment
    # would skip them on resume (silent data loss per preemption)
    applied_data_state = loader.state_dict()

    def save(step):
        mgr.save(step, state, data_state=applied_data_state)

    install_sigterm_checkpoint(lambda: (save(int(state.step)), mgr.wait()))

    # ---- metrics ----------------------------------------------------------
    from mllm_npu_tpu.train.trackers import build_trackers
    writer = build_trackers(args.output_dir, vars(args))

    # ---- loop -------------------------------------------------------------
    micro = []
    t0 = time.time()
    step = start_step
    epoch_mark = loader.state_dict()["steps"]
    while step < args.max_steps:
        try:
            batch = next(data_iter)
        except StopIteration:
            # epoch boundary: reseed so the next pass visits a different
            # order (reference train.py:318-323 semantics), then restart
            consumed = loader.state_dict()["steps"]
            if consumed == epoch_mark:
                raise RuntimeError("data stream yielded no batches — "
                                   "check the dataset config paths")
            epoch_mark = consumed
            loader.next_epoch(resume_steps=start_step)
            data_iter = iter(loader)
            continue
        batch = _normalize_batch(
            {k: v for k, v in batch.items() if isinstance(v, np.ndarray)})
        if ga > 1:
            micro.append(batch)
            if len(micro) < ga:
                continue
            batch = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *micro)
            micro = []
        batch = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), batch, batch_shardings)

        if args.profile_steps and step == args.profile_steps:
            jax.profiler.start_trace(str(Path(args.output_dir) / "profile"))
        state, loss, metrics = jitted(state, batch)
        if args.profile_steps and step == args.profile_steps:
            jax.block_until_ready(loss)
            jax.profiler.stop_trace()

        # every microbatch yielded so far is now part of an applied step
        applied_data_state = loader.state_dict()
        step += 1
        if step % args.log_steps == 0:
            loss_v = float(loss)
            dt = (time.time() - t0) / args.log_steps
            t0 = time.time()
            tokens = int(np.prod(batch["input_ids"].shape))
            n_imgs = int(batch["images"].shape[-4]) \
                if "images" in batch else 0
            msg = {"step": step, "loss": round(loss_v, 4),
                   "lr": float(lr_schedule(step)),
                   "sec/step": round(dt, 3),
                   "tokens/s": round(tokens / max(dt, 1e-9)),
                   "images/s": round(n_imgs / max(dt, 1e-9), 2)}
            for k, v in metrics.items():
                msg[k] = round(float(v), 4)
            log.info(json.dumps(msg))
            if writer is not None:
                scalars = {"loss": loss_v, "lr": msg.get("lr", 0.0)} \
                    if "lr" in msg else {"loss": loss_v}
                scalars.update({k: float(v) for k, v in metrics.items()})
                writer.log(scalars, step)
        if step % args.save_steps == 0:
            save(step)

    save(step)
    mgr.wait()
    mgr.close()
    if writer is not None:
        writer.close()
    log.info("training done at step %d", step)


class PipeFactory:
    """Picklable pipeline factory so spawn-based dataloader workers can
    rebuild the mixture in a fresh process (no JAX, no fork hazards)."""

    def __init__(self, ds_cfg: dict, tokenizer, processor):
        self.ds_cfg = ds_cfg
        self.tokenizer = tokenizer
        self.processor = processor

    def __call__(self, seed):
        from mllm_npu_tpu.data.datapipes import build_multi_datapipes
        return build_multi_datapipes(
            self.ds_cfg["datapipes"], tokenizer=self.tokenizer,
            image_transform=self.processor,
            sample_weights=self.ds_cfg.get("sample_weights"), seed=seed)


def _normalize_batch(batch: dict) -> dict:
    """Map data-layer key names onto the model signature."""
    out = dict(batch)
    if "patch_position" in out:
        out["patch_positions"] = out.pop("patch_position")
    out.pop("images_patch_length", None)
    out.pop("image_size", None)
    out.pop("dataset_name", None)
    return out


if __name__ == "__main__":
    main()
