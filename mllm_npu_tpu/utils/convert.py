"""Offline checkpoint conversion: reference torch layout → orbax.

The reference workflow loads torch ``pytorch_model.bin``-style
checkpoints on EVERY worker/eval start (reference worker.py:65-109,
pretrained/weight.md:8-95) — at 8B-13B scale that is minutes of
host-side torch.load + key-mapping per process. Here the conversion
runs ONCE:

    python scripts/tools/convert_checkpoint.py \
        --model-config mllm_npu_tpu/configs/models/... --out ckpt/

and serving/eval restore the params as a sharded orbax read
(``--params-checkpoint`` on the worker / ``params_checkpoint`` in the
worker JSON), which orbax performs directly into device memory.
"""

from __future__ import annotations

import json
import time
from typing import Optional

__all__ = ["build_assembly_from_yaml", "convert_model_checkpoint",
           "restore_params", "restore_any_params"]


def build_assembly_from_yaml(model_config_path: str):
    """Model YAML → (bundle, tokenizer_cfg, processor_cfg, example batch).

    The same assembly path the serving worker uses
    (serve.worker.load_engine_from_config), factored so the offline
    converter and the fast-load path construct byte-identical trees.
    """
    from mllm_npu_tpu.configs import instantiate, load_config
    from mllm_npu_tpu.utils.testing import TinySpec, synthetic_batch

    cfg = load_config(model_config_path)
    llm = instantiate(cfg["mllm"]["language_model"])
    bundle = instantiate(cfg["mllm"]["mllm_model"], language_model=llm)
    vis_cfg = bundle.module.vision_encoder.config
    nq = bundle.module.projector.num_queries
    spec = TinySpec(batch=1, seq=8 + 2 * (nq + 2),
                    image_size=vis_cfg.image_size, nq=nq,
                    vocab=llm.config.vocab_size, max_images=2)
    example = synthetic_batch(spec, cmp_images=1)
    return bundle, llm, cfg, example


def convert_model_checkpoint(model_config_path: str, out_dir: str,
                             step: int = 0) -> dict:
    """Convert the checkpoints a model YAML points at into one orbax
    params checkpoint under ``out_dir`` (checkpoint-{step} layout)."""
    import jax

    from mllm_npu_tpu.models.factory import init_assembly_params
    from mllm_npu_tpu.train.checkpoint import CheckpointManager

    t0 = time.time()
    bundle, llm, _, example = build_assembly_from_yaml(model_config_path)
    params = init_assembly_params(bundle, example, jax.random.PRNGKey(0))
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    n_bytes = sum(int(x.size * x.dtype.itemsize)
                  for x in jax.tree_util.tree_leaves(params))
    mgr = CheckpointManager(out_dir, max_to_keep=1, async_save=False)
    mgr.save(step, params)
    mgr.wait()
    mgr.close()
    info = {"model_config": model_config_path, "step": step,
            "n_params": n_params, "bytes": n_bytes,
            "convert_seconds": round(time.time() - t0, 1)}
    with open(f"{out_dir}/convert_info.json", "w") as f:
        json.dump(info, f, indent=1)
    return info


def restore_params(bundle, example: dict, params_checkpoint: str,
                   step: Optional[int] = None, mesh=None):
    """Restore converted params for ``bundle`` from an orbax dir written
    by :func:`convert_model_checkpoint` (template from ``eval_shape`` —
    no torch load, no conversion, no random init compute).

    With ``mesh``, leaves restore DIRECTLY into their sharded layout
    (orbax reads each shard straight to its device) — no replicated
    staging copy, which matters for 13B-class params under tensor
    parallelism."""
    import jax

    from mllm_npu_tpu.train.checkpoint import CheckpointManager

    template = jax.eval_shape(
        lambda: bundle.module.init(jax.random.PRNGKey(0), **example))
    if mesh is not None:
        from jax.sharding import NamedSharding

        from mllm_npu_tpu.parallel.sharding import infer_param_specs
        specs = infer_param_specs(template, mesh)
        template = jax.tree_util.tree_map(
            lambda t, s: jax.ShapeDtypeStruct(
                t.shape, t.dtype, sharding=NamedSharding(mesh, s)),
            template, specs)
    mgr = CheckpointManager(params_checkpoint, async_save=False)
    params, _, got = mgr.restore(template, step=step)
    mgr.close()
    if got is None:
        raise FileNotFoundError(
            f"no orbax checkpoint under {params_checkpoint} — run "
            f"scripts/tools/convert_checkpoint.py first")
    return params


def restore_any_params(bundle, example: dict, ckpt_dir: str,
                       step: Optional[int] = None, mesh=None):
    """Restore ``bundle`` params from EITHER checkpoint flavor this
    repo produces — the train→evaluate round trip the reference's
    evaluate/run.py:20-37 performs via ``pretrained_model_path``:

    - a converted params-only orbax dir (:func:`convert_model_checkpoint`
      / ``scripts/tools/convert_checkpoint.py``) → delegates to
      :func:`restore_params` (sharded template restore);
    - a TRAINER output dir (full TrainState orbax save,
      train/train.py ``--output_dir``) → template-less restore, the
      ``params`` subtree is kept and the optimizer state discarded.

    Detection is structural: a trainer checkpoint's saved tree has
    ``opt_state``/``step`` siblings next to ``params``.
    """
    from pathlib import Path

    import jax
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(
        str(Path(ckpt_dir).resolve()),
        options=ocp.CheckpointManagerOptions(step_prefix="checkpoint"))
    try:
        got = step if step is not None else mgr.latest_step()
        if got is None:
            raise FileNotFoundError(
                f"no orbax checkpoint under {ckpt_dir}")
        restored = mgr.restore(
            got, args=ocp.args.Composite(state=ocp.args.StandardRestore()))
        state = restored["state"]
    finally:
        mgr.close()
    if isinstance(state, dict) and "opt_state" in state:
        params = state["params"]
    else:
        params = state
    # structural sanity against the model: apply would fail late and
    # opaquely on a wrong checkpoint — compare key trees now
    template = jax.eval_shape(
        lambda: bundle.module.init(jax.random.PRNGKey(0), **example))
    t_paths = {jax.tree_util.keystr(p) for p, _
               in jax.tree_util.tree_flatten_with_path(template)[0]}
    p_paths = {jax.tree_util.keystr(p) for p, _
               in jax.tree_util.tree_flatten_with_path(params)[0]}
    if t_paths != p_paths:
        missing = sorted(t_paths - p_paths)[:5]
        extra = sorted(p_paths - t_paths)[:5]
        raise ValueError(
            f"checkpoint under {ckpt_dir} does not match the model: "
            f"{len(t_paths - p_paths)} missing (e.g. {missing}), "
            f"{len(p_paths - t_paths)} unexpected (e.g. {extra})")
    if mesh is not None:
        from jax.sharding import NamedSharding

        from mllm_npu_tpu.parallel.sharding import infer_param_specs
        specs = infer_param_specs(template, mesh)
        params = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, specs)
    return params
