"""Pipeline parallelism: a GPipe schedule over a ``stage`` mesh axis.

The reference scales with DeepSpeed ZeRO only (no pipeline engine,
reference configs/deepspeed/zero3.json); this is TPU headroom for
13B+-class training where even fsdp+tensor runs out of HBM or ICI
bandwidth per chip. GSPMD cannot pipeline on its own — a pipeline is a
*schedule*, not a sharding — so the decoder stack runs inside
``shard_map`` with the layer stack sharded over the ``stage`` axis and
activations handed stage-to-stage with ``lax.ppermute``:

- layer params (the ``nn.scan`` stacked ``[L, ...]`` leaves) shard their
  leading axis over ``stage``: each device holds ``L / n_stages``
  contiguous layers;
- the batch is split into ``n_micro`` microbatches; every device runs
  ``n_micro + n_stages - 1`` steps of (apply my layers → ppermute the
  activation to the next stage). Stage 0 injects microbatch ``t`` at
  step ``t``; the last stage collects microbatch ``t - s`` at step
  ``t``. Bubble fraction = ``(P-1) / (n_micro + P - 1)`` — the classic
  GPipe bound; raise ``n_micro`` to amortize;
- the backward schedule comes from autodiff: the transpose of the
  forward ``lax.scan`` + ``ppermute`` is the reverse pipeline, with
  per-step rematerialization when ``checkpoint=True`` (activation
  memory then scales with the number of in-flight microbatches, not
  with ``T × depth``).

Embedding, final norm, LM head and the loss stay OUTSIDE the shard_map
(plain GSPMD): replicated over ``stage``, sharded over the batch axes —
their grads psum over ``stage`` automatically via the shard_map
transpose.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mllm_npu_tpu.parallel.sharding import infer_param_specs


def _batch_spec_entry(mesh: Mesh, batch_axes, dim: int):
    axes = tuple(a for a in batch_axes if mesh.shape.get(a, 1) > 1)
    if not axes:
        return None
    bsz = 1
    for a in axes:
        bsz *= mesh.shape[a]
    if dim % bsz != 0 or dim < bsz:
        return None
    return axes


def pipeline_layers(mesh: Mesh, layer_apply: Callable,
                    layer_params: Any, h: jax.Array, consts: Any, *,
                    n_micro: int, stage_axis: str = "stage",
                    batch_axes=("dcn_data", "data"),
                    checkpoint: bool = True) -> jax.Array:
    """Run a stacked layer sequence as a GPipe pipeline over ``mesh``.

    ``layer_apply(p_layer, x, consts_slice) -> x`` applies ONE layer;
    ``layer_params`` is the stacked ``[L, ...]`` pytree; ``h`` is the
    microbatched activation ``[n_micro, mb, S, H]``; ``consts`` is a
    pytree of per-microbatch aux inputs with leading ``[n_micro, mb]``
    dims (positions, segment ids). Returns the post-stack activations,
    same shape as ``h``.
    """
    n_stages = mesh.shape.get(stage_axis, 1)
    assert n_stages > 1, (
        "pipeline_layers requires a stage axis > 1; call the plain "
        "model forward instead")
    L = jax.tree_util.tree_leaves(layer_params)[0].shape[0]
    assert L % n_stages == 0, (
        f"{L} layers not divisible by {n_stages} pipeline stages")
    assert h.shape[0] == n_micro, (h.shape, n_micro)

    mb = h.shape[1]
    b_axes = _batch_spec_entry(mesh, batch_axes, mb)

    def io_spec(leaf):
        # [n_micro, mb, ...]: microbatch axis replicated, batch over the
        # data axes, trailing dims replicated
        return P(*([None, b_axes] + [None] * (leaf.ndim - 2)))

    p_specs = jax.tree_util.tree_map(lambda _: P(stage_axis),
                                     layer_params)
    h_spec = io_spec(h)
    c_specs = jax.tree_util.tree_map(io_spec, consts)

    apply_one = layer_apply
    if checkpoint:
        apply_one = jax.checkpoint(layer_apply)

    def local(lp, hm, cm):
        # every value here is this device's shard; axes are Manual
        from mllm_npu_tpu import ops as _ops
        s = jax.lax.axis_index(stage_axis)
        T = n_micro + n_stages - 1

        def stage_apply(x, c):
            def body(xx, p):
                return apply_one(p, xx, c), None
            y, _ = jax.lax.scan(body, x, lp)
            return y

        def step(carry, t):
            state, out_buf = carry
            mi = jnp.clip(t - s, 0, n_micro - 1)
            inject = jax.lax.dynamic_index_in_dim(hm, mi, 0,
                                                  keepdims=False)
            x = jnp.where(s == 0, inject, state)
            c = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, mi, 0, keepdims=False), cm)
            y = stage_apply(x, c)
            valid = jnp.logical_and(s == n_stages - 1,
                                    jnp.logical_and(t - s >= 0,
                                                    t - s < n_micro))
            cur = jax.lax.dynamic_index_in_dim(out_buf, mi, 0,
                                               keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(valid, y, cur), mi, 0)
            nxt = jax.lax.ppermute(
                y, stage_axis, [(i, i + 1) for i in range(n_stages - 1)])
            return (nxt, out_buf), None

        with _ops.flash_mesh(None):   # Manual axes: no nested shard_map
            (_, out_buf), _ = jax.lax.scan(
                step,
                (jnp.zeros(hm.shape[1:], hm.dtype), jnp.zeros_like(hm)),
                jnp.arange(T, dtype=jnp.int32))
        # only the last stage holds real outputs — replicate over the
        # stage axis (one activation-sized all-reduce at stack exit)
        return jax.lax.psum(
            jnp.where(s == n_stages - 1, out_buf,
                      jnp.zeros_like(out_buf)), stage_axis)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(p_specs, h_spec, c_specs),
                       out_specs=h_spec, check_vma=False)
    return fn(layer_params, h, consts)


def make_llama_layer_apply(cfg, dtype=jnp.bfloat16,
                           param_dtype=jnp.float32) -> Callable:
    """One-decoder-layer apply for :func:`pipeline_layers` (training
    forward: no KV cache). ``consts`` carries per-microbatch
    ``positions [mb, S]`` and optional ``segment_ids [mb, S]``."""
    from mllm_npu_tpu.models.language_models.llama import LlamaDecoderLayer
    from mllm_npu_tpu.ops import SegmentIds

    layer = LlamaDecoderLayer(cfg, dtype, param_dtype)

    def apply(p, x, consts):
        seg = consts.get("segment_ids")
        seg = None if seg is None else SegmentIds(q=seg, kv=seg)
        out, _ = layer.apply({"params": p}, x,
                             positions=consts["positions"],
                             segment_ids=seg)
        return out

    return apply


def pipelined_lm_logits(lm, params, input_ids, *, mesh: Mesh,
                        n_micro: int,
                        segment_ids: Optional[jax.Array] = None,
                        checkpoint: bool = True) -> jax.Array:
    """LlamaForCausalLM training forward with the decoder stack
    pipelined over the mesh's ``stage`` axis. Matches
    ``lm.apply(params, input_ids)`` logits (tested); embed / norm /
    head run under plain GSPMD outside the pipeline."""
    cfg = lm.config
    assert cfg.scan_layers, "pipeline needs the stacked layer layout"
    B, S = input_ids.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    h = lm.apply(params, input_ids,
                 method=lambda m, ids: m.model.embed(ids))
    h = h.astype(lm.dtype)
    if segment_ids is not None:
        from mllm_npu_tpu.models.language_models.llama import \
            packed_positions
        positions = packed_positions(segment_ids)
    else:
        positions = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32), (B, S))
    consts = {"positions": positions.reshape(n_micro, mb, S)}
    if segment_ids is not None:
        consts["segment_ids"] = segment_ids.reshape(n_micro, mb, S)

    out = pipeline_layers(
        mesh, make_llama_layer_apply(cfg, lm.dtype, lm.param_dtype),
        params["params"]["model"]["layers"],
        h.reshape(n_micro, mb, S, h.shape[-1]), consts,
        n_micro=n_micro, checkpoint=checkpoint)
    h = out.reshape(B, S, out.shape[-1])
    return lm.apply(params, h,
                    method=lambda m, hh: m._logits(m.model.norm(hh)))


def pipelined_mllm_loss(model, params, batch, *, mesh: Mesh,
                        n_micro: int, checkpoint: bool = True) -> dict:
    """Full MLLM training forward with the LLM decoder stack pipelined.

    Vision tower + projector + scatter (``embed_and_scatter``), final
    norm, LM head and the losses run under plain GSPMD (replicated over
    ``stage``); only the decoder stack — where the FLOPs are — runs the
    GPipe schedule. Matches ``model.apply(params, **batch)`` losses
    (tested). Dropout rngs are not threaded into the pipelined layers
    (pretraining configs don't use LLM dropout; LoRA dropout is a
    serving-time no-op).
    """
    lm = model.language_model
    cfg = lm.config
    assert cfg.scan_layers, "pipeline needs the stacked layer layout"
    input_ids = batch["input_ids"]
    B, S = input_ids.shape
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    input_embeds, image_embeds = model.apply(
        params, input_ids, batch.get("images"),
        batch.get("embeds_cmp_mask"), batch.get("ids_cmp_mask"),
        batch.get("patch_positions"), method=model.embed_and_scatter)
    h = input_embeds.astype(lm.dtype)

    am = batch.get("attention_mask")
    seg = None if am is None else am.astype(jnp.int32)
    if seg is not None:
        from mllm_npu_tpu.models.language_models.llama import \
            packed_positions
        positions = packed_positions(seg)
    else:
        positions = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32), (B, S))
    consts = {"positions": positions.reshape(n_micro, mb, S)}
    if seg is not None:
        consts["segment_ids"] = seg.reshape(n_micro, mb, S)

    out = pipeline_layers(
        mesh, make_llama_layer_apply(cfg, lm.dtype, lm.param_dtype),
        params["params"]["language_model"]["model"]["layers"],
        h.reshape(n_micro, mb, S, h.shape[-1]), consts,
        n_micro=n_micro, checkpoint=checkpoint)
    h = out.reshape(B, S, out.shape[-1])

    def tail(m, hh):
        hn = m.language_model.model.norm(hh)
        if getattr(m, "ce_loss_chunk", 0):
            # chunked CE computes the loss straight from hidden states
            # in compute_losses — don't materialize dense logits here
            return None, hn
        return m.language_model._logits(hn), hn

    logits, last_hidden = model.apply(params, h, method=tail)
    return model.apply(
        params, logits, last_hidden, image_embeds, batch["labels"],
        batch.get("embeds_gen_mask"), batch.get("ids_gen_mask"),
        method=model.compute_losses)


def pipeline_param_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpecs for a pipelined LM: the standard rules table, with
    the leading (layer-stack) axis of every ``layers`` leaf moved onto
    ``stage`` so each device stores only its stages' layers at rest —
    matching the shard_map in_specs (no resharding at step entry)."""
    specs = infer_param_specs(params, mesh)
    n_stages = mesh.shape.get("stage", 1)

    def fix(path, leaf, spec):
        parts = [getattr(k, "key", getattr(k, "idx", k)) for k in path]
        if "layers" not in [str(x) for x in parts]:
            return spec
        if leaf.ndim < 1 or leaf.shape[0] % n_stages != 0:
            return spec
        t = list(tuple(spec)) + [None] * (leaf.ndim - len(tuple(spec)))
        if t[0] is not None:
            return spec
        t[0] = "stage"
        return P(*t)

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf, spec: fix(path, leaf, spec), params, specs)


def build_pipeline_train_step(lm, mesh: Mesh, *, n_micro: int,
                              optimizer=None, learning_rate: float = 1e-3):
    """A jitted causal-LM train step with the decoder stack pipelined.

    Returns ``(step_fn, init_fn)``: ``init_fn(params) -> state`` places
    params/opt-state into the stage-sharded layout; ``step_fn(state,
    batch) -> (state, loss)``. ``batch`` = {"input_ids", "labels"}.
    """
    import optax

    from mllm_npu_tpu.models.language_models.llama import causal_lm_loss

    tx = optimizer if optimizer is not None else optax.sgd(learning_rate)

    def loss_fn(params, batch):
        logits = pipelined_lm_logits(
            lm, params, batch["input_ids"], mesh=mesh, n_micro=n_micro,
            segment_ids=batch.get("segment_ids"))
        return causal_lm_loss(logits, batch["labels"])

    def step(state, batch):
        params, opt_state = state
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def init_fn(params):
        specs = pipeline_param_specs(params, mesh)
        shardings = jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs)
        params = jax.device_put(params, shardings)
        opt_state = jax.jit(
            tx.init, out_shardings=_opt_shardings(tx, params, shardings)
        )(params)
        return params, opt_state

    def _opt_shardings(tx, params, shardings):
        shapes = jax.eval_shape(tx.init, params)
        flat_p = {l.shape: s for l, s in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(shardings))}
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(
            lambda l: flat_p.get(getattr(l, "shape", None), rep), shapes)

    return jax.jit(step, donate_argnums=(0,)), init_fn
