"""Sharded train state + jit'd train step.

Replaces the reference's Accelerate/DeepSpeed engine objects
(reference: train/train.py:209-218,274-275,326-379) with a functional
TrainState updated by a single pjit-compiled step:

- parameter + optimizer-state sharding comes from PartitionSpecs
  (ZeRO-3 parity: optimizer state is sharded *by construction* because
  optax states mirror param shapes/shardings)
- gradient accumulation is a ``lax.scan`` over a microbatch axis inside
  the step (reference: accelerator.accumulate, train.py:91-96,326)
- trainable/frozen split is an optax mask over param paths (the
  reference's requires_grad_ + DeepSpeed param partitioning)
- loss metrics come out already globally averaged (psum-free: the loss
  is computed on globally-sharded arrays, so no manual all_gather like
  reference train.py:39-43,145-154)
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mllm_npu_tpu.parallel.sharding import batch_sharding, infer_param_specs
from mllm_npu_tpu.train.scheduler import get_scheduler


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


@dataclasses.dataclass
class OptimizerConfig:
    lr: float = 1e-4
    weight_decay: float = 0.05
    betas: tuple = (0.9, 0.98)
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    scheduler: str = "cosine"
    warmup_steps: int = 500
    total_steps: int = 100_000
    min_lr_ratio: float = 0.05
    frozen_patterns: tuple = ("vision_encoder",)
    # bf16 first/second moments halve optimizer HBM — frees memory for
    # lighter remat policies (the ZeRO-style memory/compute trade)
    mu_dtype: str = "float32"  # float32 | bfloat16
    # adamw (reference parity, train.py:256-263) | adafactor (factored
    # second moment: O(rows+cols) instead of O(params) — the only way a
    # 2B-class AdamW-shaped trainable fits one 16GB v5e chip, where
    # params+mu+nu+grads in bf16 alone exceed HBM)
    optimizer: str = "adamw"


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def trainable_mask(params: Any, frozen_patterns) -> Any:
    pats = [re.compile(p) for p in frozen_patterns]

    def is_trainable(path, leaf):
        # integer leaves (int8/int4 quantized kernels) are frozen storage
        # by construction — never route them into the optimizer
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            return False
        s = _path_str(path)
        return not any(p.search(s) for p in pats)

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def build_optimizer(config: OptimizerConfig, params: Any):
    sched = get_scheduler(config.scheduler, base_lr=config.lr,
                          warmup_steps=config.warmup_steps,
                          total_steps=config.total_steps,
                          min_lr_ratio=config.min_lr_ratio)
    import jax.numpy as _jnp
    mu_dtype = {"float32": _jnp.float32,
                "bfloat16": _jnp.bfloat16}[config.mu_dtype]
    if config.optimizer == "adafactor":
        opt = optax.adafactor(
            sched, min_dim_size_to_factor=128,
            multiply_by_parameter_scale=False, clipping_threshold=None,
            momentum=config.betas[0], dtype_momentum=mu_dtype,
            weight_decay_rate=config.weight_decay)
    else:
        opt = optax.adamw(sched, b1=config.betas[0], b2=config.betas[1],
                          eps=config.eps, weight_decay=config.weight_decay,
                          mu_dtype=mu_dtype)
    inner = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        opt,
    )
    mask = trainable_mask(params, config.frozen_patterns)
    tx = optax.multi_transform(
        {"train": inner, "frozen": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda t: "train" if t else "frozen", mask))
    return tx, sched


def create_train_state(params: Any, config: OptimizerConfig) -> TrainState:
    tx, _ = build_optimizer(config, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)


def make_train_step(loss_fn: Callable[[Any, Any], tuple],
                    grad_accum: int = 1):
    """loss_fn(params, batch[, rng]) -> (total_loss, metrics dict).

    A per-step dropout rng (derived from the step counter) is passed
    when the loss_fn accepts three arguments. With grad_accum > 1 the
    batch's leading dims must be [grad_accum, micro_batch, ...]; grads
    are averaged across microbatches via lax.scan (constant memory).
    """
    import inspect
    wants_rng = len(inspect.signature(loss_fn).parameters) >= 3

    def step(state: TrainState, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)

        def single(params, b):
            if wants_rng:
                return loss_fn(params, b, rng)
            return loss_fn(params, b)

        def _vag(params, b):
            # allow_int: quantized-base (QLoRA-style) trees hold int8
            # storage leaves; their cotangents come back as float0 (the
            # quant matmul's custom VJP never computes dW) and are
            # normalized to integer zeros so the masked optimizer chain
            # and apply_updates stay dtype-preserving
            (loss, metrics), grads = jax.value_and_grad(
                single, has_aux=True, allow_int=True)(params, b)
            grads = jax.tree_util.tree_map(
                lambda g, p: jnp.zeros(p.shape, p.dtype)
                if g.dtype == jax.dtypes.float0 else g, grads, params)
            return (loss, metrics), grads

        if grad_accum == 1:
            (loss, metrics), grads = _vag(state.params, batch)
        else:
            def scan_body(carry, micro):
                grads_acc, loss_acc, metrics_acc = carry
                (loss, metrics), grads = _vag(state.params, micro)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                metrics_acc = jax.tree_util.tree_map(
                    jnp.add, metrics_acc, metrics)
                return (grads_acc, loss_acc + loss, metrics_acc), None

            g0 = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, x.dtype), state.params)
            first = jax.tree_util.tree_map(lambda x: x[0], batch)
            _, m0_shape = jax.eval_shape(single, state.params, first)
            m0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), m0_shape)
            (grads, loss, metrics), _ = jax.lax.scan(
                scan_body, (g0, jnp.zeros(()), m0), batch)
            scale = 1.0 / grad_accum
            grads = jax.tree_util.tree_map(
                lambda g: g * scale
                if jnp.issubdtype(g.dtype, jnp.floating) else g, grads)
            loss = loss * scale
            metrics = jax.tree_util.tree_map(lambda m: m * scale, metrics)

        new_state = state.apply_gradients(grads)
        gnorm = optax.global_norm(
            [g for g in jax.tree_util.tree_leaves(grads)
             if jnp.issubdtype(g.dtype, jnp.floating)])
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        return new_state, loss, metrics

    return step


def compile_train_step(step_fn, state: TrainState, batch_example: Any,
                       mesh: Mesh):
    """jit with explicit state/batch shardings over the mesh."""
    if mesh.shape.get("stage", 1) > 1:
        # pipeline parallelism: layer stacks live stage-sharded at rest
        # (matching the GPipe shard_map's in_specs — no resharding at
        # step entry)
        from mllm_npu_tpu.parallel.pipeline import pipeline_param_specs
        param_specs = pipeline_param_specs(state.params, mesh)
    else:
        param_specs = infer_param_specs(state.params, mesh)
    state_sharding = TrainState(
        step=NamedSharding(mesh, P()),
        params=jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), param_specs),
        opt_state=_opt_state_shardings(state, param_specs, mesh),
        tx=state.tx,
    )
    batch_shardings = batch_sharding(mesh, batch_example)

    def step_in_mesh(state, batch):
        # flash pallas kernels must run under Manual axes on multi-chip
        # meshes (GSPMD would otherwise replicate their operands); the
        # flash_mesh context makes ops.multi_head_attention shard_map
        # them over this mesh (active during tracing → baked into the
        # jaxpr)
        from mllm_npu_tpu import ops
        with ops.flash_mesh(mesh):
            return step_fn(state, batch)

    jitted = jax.jit(
        step_in_mesh,
        in_shardings=(state_sharding, batch_shardings),
        out_shardings=(state_sharding, NamedSharding(mesh, P()), None),
        donate_argnums=(0,),
    )
    return jitted, state_sharding, batch_shardings


def _opt_state_shardings(state: TrainState, param_specs, mesh: Mesh):
    """Optimizer state leaves mirror param shapes where they do; scalars
    replicate."""
    # shape-based matching: mu/nu have identical treedef as params inside
    # adam state; walk opt_state and reuse specs by structure when shapes
    # match a param leaf, else replicate.
    param_leaves = jax.tree_util.tree_leaves(state.params)
    spec_leaves = jax.tree_util.tree_leaves(param_specs)
    # match on shape only: adam moments may be stored in a lower dtype
    # (mu_dtype) but must shard exactly like their parameter
    shape_to_spec = {}
    for l, s in zip(param_leaves, spec_leaves):
        shape_to_spec.setdefault(l.shape, s)

    def spec_for(leaf):
        if hasattr(leaf, "shape"):
            s = shape_to_spec.get(leaf.shape)
            if s is not None:
                return NamedSharding(mesh, s)
            return NamedSharding(mesh, P())
        return None

    return jax.tree_util.tree_map(spec_for, state.opt_state)


def shard_train_state(state: TrainState, state_sharding) -> TrainState:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if s is not None else x,
        state, state_sharding)
