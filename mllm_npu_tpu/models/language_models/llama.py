"""Flax Llama-family causal LM (one implementation covers the reference's
vendored Llama-2 and Llama-3 forks).

Capability parity (reference: mllm_npu/models/language_models/llama3.py —
LlamaAttention:258/LlamaSdpaAttention:888/GQA repeat_kv:243, RoPE
scaling:126-155, RMSNorm:75, MLP:192, causal-mask/StaticCache:1379+1116,
CE loss:1552-1562; llama2.py me_attn:80), rebuilt TPU-first:

- layers stacked with ``nn.scan`` (one traced layer → fast XLA compiles)
  and optional ``nn.remat`` (the reference's gradient checkpointing,
  llama3.py:1323-1333)
- attention dispatches to the Pallas flash kernel on TPU
  (ops.multi_head_attention) instead of SDPA/npu_fusion_attention
- decode uses a preallocated static KV cache updated with
  ``lax.dynamic_update_slice`` (the reference's StaticCache path is the
  jit-compatible model; DynamicCache has no TPU analogue)
- params fp32, activations bf16 by default (matches reference bf16
  training, scripts/*.sh:40)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from mllm_npu_tpu import ops
from mllm_npu_tpu.constant import IGNORE_INDEX
from mllm_npu_tpu.ops.rope import apply_rope, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling_type: Optional[str] = None   # None | "linear" | "dynamic"
    rope_scaling_factor: float = 1.0
    tie_word_embeddings: bool = False
    attention_impl: str = "auto"              # auto | flash | eager
    # run pallas kernels in interpreter mode (CPU tests of the flash
    # path, incl. its shard_map dispatch on virtual meshes)
    attention_interpret: bool = False
    remat: bool = False
    # remat policy: 'nothing' = full recompute (min memory);
    # 'dots' = keep matmul outputs (faster bwd, more memory);
    # 'hoist_attn' = checkpoint projections+MLP but keep flash attention
    # outside the remat region so its custom-VJP residuals are saved
    # instead of recomputed (saves q/k/v + attn output per layer)
    remat_policy: str = "nothing"
    scan_layers: bool = True
    # LoRA (peft parity — reference: peft_models.py:15-99 + LoraConfig in
    # configs/models/*.yaml: r=32, alpha=32, dropout 0.05, targets = all
    # proj matrices). Dropout activates when the train step supplies a
    # 'dropout' rng.
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    lora_targets: tuple = ("q_proj", "k_proj", "v_proj", "o_proj",
                           "gate_proj", "up_proj", "down_proj")
    # int8 weight-only serving path (ops/quant.py): "none" | "int8".
    # Convert trained params with utils.weights.quantize_llama_params.
    quantization: str = "none"
    # int4 group-scale granularity along K (smaller = more accurate,
    # more scale traffic); must match quantize_llama_params(group_size=)
    quant_group_size: int = 256
    # serving-time projection fusion: one qkv_proj matmul instead of
    # q/k/v and one gate_up_proj instead of gate/up. Fewer, larger
    # matvecs = fewer kernel launches + better HBM streaming in the
    # decode loop. Convert trained params with
    # utils.weights.fuse_llama_projections (before quantization).
    fused_projections: bool = False
    # Tensor-parallel fused layout: the fused qkv/gate_up kernels are
    # interleaved into `fused_shards` groups, each holding whole
    # q/k/v (gate/up) head blocks, so a `tensor`-axis shard never
    # straddles the q/k/v boundary and the in-module split stays
    # shard-local (no GSPMD resharding in the TP decode path). Convert
    # params with fuse_llama_projections(shards=N); 1 = plain concat.
    fused_shards: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def llama3_8b(cls, **kw) -> "LlamaConfig":
        return cls(vocab_size=128256, hidden_size=4096,
                   intermediate_size=14336, num_hidden_layers=32,
                   num_attention_heads=32, num_key_value_heads=8,
                   max_position_embeddings=8192, rope_theta=500000.0, **kw)

    @classmethod
    def llama2_13b(cls, **kw) -> "LlamaConfig":
        return cls(vocab_size=32000, hidden_size=5120,
                   intermediate_size=13824, num_hidden_layers=40,
                   num_attention_heads=40, num_key_value_heads=40,
                   max_position_embeddings=4096, **kw)

    @classmethod
    def tiny(cls, vocab_size: int = 1024, **kw) -> "LlamaConfig":
        """CPU-runnable debug model (the reference's DEBUG_FLAG analogue,
        mllm_npu/models/language_models/peft_models.py:28-41)."""
        return cls(vocab_size=vocab_size, hidden_size=128,
                   intermediate_size=256, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2,
                   max_position_embeddings=2048, **kw)


class LoRADense(nn.Module):
    """Dense + low-rank adapter (peft.LoraConfig parity). Base kernel under
    'base/kernel'; adapters 'lora_a'/'lora_b' (B initialized to zero so the
    wrapped model starts identical to the base). Dropout on the adapter
    input (peft lora_dropout semantics) activates only when a 'dropout'
    rng is supplied (training); inference stays deterministic.

    ``quantization`` stores the FROZEN base in int8/int4 (QLoRA-style:
    the only way an 8B base + trainable adapters fits one 16GB chip);
    gradients flow through the quantized matmul's custom VJP
    (ops/quant.py quant_matmul) into the float adapters only."""
    features: int
    rank: int
    alpha: float
    dropout_rate: float = 0.0
    quantization: str = "none"     # none | int8 | int4
    quant_group_size: int = 256
    tp_mode: Any = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.quantization == "int8":
            from mllm_npu_tpu.ops.quant import Int8Dense
            base = Int8Dense(self.features, dtype=self.dtype,
                             tp_mode=self.tp_mode, name="base")
        elif self.quantization == "int4":
            from mllm_npu_tpu.ops.quant import Int4Dense
            base = Int4Dense(self.features,
                             group_size=self.quant_group_size,
                             dtype=self.dtype, tp_mode=self.tp_mode,
                             name="base")
        else:
            base = nn.Dense(self.features, use_bias=False,
                            dtype=self.dtype,
                            param_dtype=self.param_dtype, name="base")
        y = base(x)
        a = self.param("lora_a", nn.initializers.he_uniform(),
                       (x.shape[-1], self.rank), self.param_dtype)
        b = self.param("lora_b", nn.initializers.zeros,
                       (self.rank, self.features), self.param_dtype)
        scale = self.alpha / self.rank
        xd = x
        if self.dropout_rate > 0.0 and self.has_rng("dropout"):
            xd = nn.Dropout(rate=self.dropout_rate,
                            deterministic=False)(x)
        delta = (xd @ a.astype(xd.dtype)) @ b.astype(xd.dtype)
        return y + delta * scale


def _dense_factory(cfg: LlamaConfig, dtype, param_dtype,
                   setup_mode: bool = False):
    """Returns dense(features, name) honoring the LoRA/quant config.

    ``setup_mode``: construct without an explicit ``name=`` (flax forbids
    it inside ``setup``; the attribute the caller assigns to supplies the
    name instead). ``name`` is still used to pick LoRA targets/TP roles.
    """
    def dense(features, name):
        kw = {} if setup_mode else {"name": name}
        if cfg.lora_rank > 0 and name in cfg.lora_targets:
            tp_mode = "row" if name in ("o_proj", "down_proj") \
                else "column"
            return LoRADense(features, cfg.lora_rank, cfg.lora_alpha,
                             dropout_rate=cfg.lora_dropout,
                             quantization=cfg.quantization,
                             quant_group_size=cfg.quant_group_size,
                             tp_mode=tp_mode,
                             dtype=dtype, param_dtype=param_dtype, **kw)
        if cfg.quantization in ("int8", "int4"):
            # TP role per the GSPMD rules table (parallel/sharding.py):
            # N-sharded producers are column-parallel, the K-sharded
            # reducers (o_proj/down_proj) row-parallel — drives the
            # shard_map dispatch under a multi-chip tensor axis
            tp_mode = "row" if name in ("o_proj", "down_proj") \
                else "column"
            if cfg.quantization == "int8":
                from mllm_npu_tpu.ops.quant import Int8Dense
                return Int8Dense(features, dtype=dtype,
                                 tp_mode=tp_mode, **kw)
            from mllm_npu_tpu.ops.quant import Int4Dense
            return Int4Dense(features, group_size=cfg.quant_group_size,
                             dtype=dtype, tp_mode=tp_mode, **kw)
        return nn.Dense(features, use_bias=False, dtype=dtype,
                        param_dtype=param_dtype, **kw)
    return dense


def lora_frozen_patterns() -> tuple:
    """Optimizer freeze patterns for LoRA training: freeze every base/
    kernel; train lora_a/lora_b + layernorms (+ embeddings for the
    resize-embedding recipe) — matches the reference's modules_to_save
    (configs/models/*.yaml: input_layernorm, post_attention_layernorm,
    norm)."""
    # the whole base subtree: float 'kernel', and for quantized bases the
    # float 'scale'/'scale_g' next to the int 'kernel_q' (the int leaf is
    # already dtype-frozen; the scales must not drift under weight decay)
    return (r"/base/",)


def packed_positions(segment_ids: jax.Array) -> jax.Array:
    """Per-segment position ids for packed rows: positions restart at 0
    at every segment boundary. [B, S] int -> [B, S] int32. For unpacked
    rows (all-ones + trailing zeros) this reduces to arange over the
    real region."""
    B, S = segment_ids.shape
    idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), bool),
         segment_ids[:, 1:] != segment_ids[:, :-1]], axis=1)
    start_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, idx, 0), axis=1)
    return idx - start_idx


_EMBED_GRAD_VOCAB_CHUNK = 16384


@functools.lru_cache(maxsize=None)
def _embedding_lookup_for(V: int, tdtype: str):
    @jax.custom_vjp
    def lookup(table, ids):
        return jnp.take(table, ids, axis=0)

    def fwd(table, ids):
        return jnp.take(table, ids, axis=0), ids

    def bwd(ids, g):
        chunk = _EMBED_GRAD_VOCAB_CHUNK
        starts = [0] if V <= 2 * chunk else list(range(0, V, chunk))
        # bf16 cotangents: DEFAULT precision is already exact (the lhs
        # is 0/1, products reproduce g bit-for-bit, the MXU accumulates
        # f32). f32 cotangents (CPU tests, f32 dryruns) need HIGHEST or
        # the inputs get rounded to bf16 before the dot.
        prec = (jax.lax.Precision.HIGHEST if g.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        parts = []
        for v0 in starts:
            n = V if len(starts) == 1 else min(chunk, V - v0)
            iota = v0 + jax.lax.iota(jnp.int32, n)
            onehot = (ids[..., None] == iota).astype(g.dtype)
            parts.append(jnp.einsum(
                "...v,...d->vd", onehot, g, precision=prec,
                preferred_element_type=jnp.float32))
        dtable = parts[0] if len(parts) == 1 else \
            jnp.concatenate(parts, axis=0)
        zero_ids = np.zeros(ids.shape, jax.dtypes.float0)
        return dtable.astype(tdtype), zero_ids

    lookup.defvjp(fwd, bwd)
    return lookup


def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``table[ids]`` with a GSPMD-friendly backward.

    The default ``take`` VJP is a scatter-add into the [V, D] table; with
    the table sharded P(tensor, fsdp) and the [B, S, D] cotangent
    batch-sharded over (data, fsdp), GSPMD cannot move the fsdp axis from
    the batch dim to D efficiently and falls back to replicating the full
    activation cotangent ("[SPMD] Involuntary full rematerialization",
    MULTICHIP_r02). Here the backward is a one-hot einsum instead —
    contractions over batch-sharded operands partition natively into
    local partial [V, D] sums + a reduce over the batch axes — chunked
    over the vocab so the one-hot transient never exceeds
    [B, S, _EMBED_GRAD_VOCAB_CHUNK] (the same reasoning as maxtext's
    iota-embed: on TPU, matmul beats gather/scatter for embeddings).
    """
    return _embedding_lookup_for(table.shape[0],
                                 jnp.dtype(table.dtype).name)(table, ids)


def _write_decode_column(cache: jax.Array, col: jax.Array, pos) -> jax.Array:
    """Write one decoded column into the stacked cache, all layers at
    once: cache [L, B, max_len, Hkv, D], col [L, B, 1, Hkv, D], pos
    scalar or [B]. A vmapped per-row DUS compiles to a scatter and
    beats a scalar DUS on the stacked array ~14x on v5e (25us vs
    358us), so the scalar case is broadcast into the vector one."""
    B = cache.shape[1]
    if jnp.ndim(pos) == 0:
        pos = jnp.full((B,), pos, jnp.int32)

    def row(cb, nb, p):          # cb [L, max_len, Hkv, D]
        return jax.lax.dynamic_update_slice(cb, nb, (0, p, 0, 0))

    return jax.vmap(row, in_axes=(1, 1, 0), out_axes=1)(
        cache, col.astype(cache.dtype), pos)


def init_cache(config: LlamaConfig, batch_size: int, max_len: int,
               dtype=jnp.bfloat16) -> dict:
    """Preallocated KV cache (static shapes for jit'd decode)."""
    kv_shape = (config.num_hidden_layers, batch_size, max_len,
                config.num_key_value_heads, config.head_dim)
    return {
        "k": jnp.zeros(kv_shape, dtype),
        "v": jnp.zeros(kv_shape, dtype),
        "pos": jnp.zeros((), jnp.int32),  # filled length
    }


class LlamaMLP(nn.Module):
    config: LlamaConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dense = _dense_factory(cfg, self.dtype, self.param_dtype)
        if cfg.fused_projections:
            gu = dense(2 * cfg.intermediate_size, "gate_up_proj")(x)
            if cfg.fused_shards > 1:
                # interleaved layout: [ts, (gate_i | up_i)] groups —
                # split within each group so a tensor shard's slice is
                # self-contained (see LlamaConfig.fused_shards)
                ts, I = cfg.fused_shards, cfg.intermediate_size
                assert I % ts == 0, (I, ts)
                gu = gu.reshape(*gu.shape[:-1], ts, 2 * I // ts)
                gate, up = jnp.split(gu, 2, axis=-1)
                gate = gate.reshape(*x.shape[:-1], I)
                up = up.reshape(*x.shape[:-1], I)
            else:
                gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = dense(cfg.intermediate_size, "gate_proj")(x)
            up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(nn.silu(gate) * up)


class RMSNorm(nn.Module):
    eps: float = 1e-6
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones,
                       (x.shape[-1],), self.param_dtype)
        return ops.rms_norm(x, w.astype(x.dtype), self.eps)


class LlamaAttention(nn.Module):
    config: LlamaConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        dense = _dense_factory(cfg, self.dtype, self.param_dtype,
                               setup_mode=True)
        if cfg.fused_projections:
            self.qkv_proj = dense((H + 2 * Hkv) * D, "qkv_proj")
        else:
            self.q_proj = dense(H * D, "q_proj")
            self.k_proj = dense(Hkv * D, "k_proj")
            self.v_proj = dense(Hkv * D, "v_proj")
        self.o_proj = dense(cfg.hidden_size, "o_proj")

    def project_qkv(self, x, positions):
        """Input-norm'd hidden states → post-RoPE q/k/v. Split out so the
        hoist_attn remat policy can checkpoint the projections while the
        flash kernel itself stays outside the remat region (its
        custom-VJP residuals are then saved, not recomputed)."""
        cfg = self.config
        B, S, _ = x.shape
        H, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim)
        if cfg.fused_projections:
            qkv = self.qkv_proj(x)
            if cfg.fused_shards > 1:
                # interleaved layout: [ts, (q_i | k_i | v_i)] head
                # groups; shard-local split (LlamaConfig.fused_shards)
                ts = cfg.fused_shards
                assert H % ts == 0 and Hkv % ts == 0, (H, Hkv, ts)
                Hl, Hkvl = H // ts, Hkv // ts
                qkv = qkv.reshape(B, S, ts, (Hl + 2 * Hkvl) * D)
                q, k, v = jnp.split(
                    qkv, [Hl * D, (Hl + Hkvl) * D], axis=-1)
            else:
                q, k, v = jnp.split(
                    qkv, [H * D, (H + Hkv) * D], axis=-1)
            q = q.reshape(B, S, H, D)
            k = k.reshape(B, S, Hkv, D)
            v = v.reshape(B, S, Hkv, D)
        else:
            q = self.q_proj(x).reshape(B, S, H, D)
            k = self.k_proj(x).reshape(B, S, Hkv, D)
            v = self.v_proj(x).reshape(B, S, Hkv, D)

        cos, sin = rope_cos_sin(
            positions, D, theta=cfg.rope_theta,
            scaling_type=cfg.rope_scaling_type,
            scaling_factor=cfg.rope_scaling_factor,
            max_position_embeddings=cfg.max_position_embeddings)
        q, k = apply_rope(q, k, cos, sin)
        if cfg.remat and cfg.remat_policy == "dots_lite":
            # post-RoPE q/k/v are checkpointed (save_only_these_names in
            # _layers): the bwd replay then skips the qkv matmuls and
            # feeds the flash kernel's atomic fwd re-run directly
            q = checkpoint_name(q, "remat_qkv")
            k = checkpoint_name(k, "remat_qkv")
            v = checkpoint_name(v, "remat_qkv")
        return q, k, v

    def project_out(self, out):
        """[B, S, H, D] attention output → o_proj'd hidden states."""
        B, S = out.shape[:2]
        return self.o_proj(out.reshape(B, S, -1))

    def __call__(self, x, *, positions, layer_cache=None, cache_pos=None,
                 segment_ids=None, attn_mask=None, prefill=False,
                 block_kv=None, block_mask=None):
        cfg = self.config
        B, S, _ = x.shape
        q, k, v = self.project_qkv(x, positions)

        new_cache = None
        if layer_cache is not None and not prefill and \
                (S == 1 or jnp.ndim(cache_pos) == 1):
            # Single-token decode — or a multi-token VERIFY window with
            # per-row positions (batched speculative decode): the cache
            # is READ-ONLY here. The window tokens attend to the old
            # cache plus their own (k, v) appended as virtual columns
            # (causal within the window), and the layer returns just
            # its [B, S, Hkv, D] slice — the model writes all layers'
            # slices into the big cache in ONE scatter outside the
            # layer scan. (Writing inside the layer and threading the
            # cache out through scan ys restacks the whole [L,B,S,H,D]
            # cache every step: ~400us/100MB of pure copy on v5e,
            # formerly the dominant decode cost.)
            assert block_kv is None or S == 1, \
                "block buffers only combine with single-token steps"
            ck, cv = layer_cache  # [B, max_len, Hkv, D]
            kv_len = ck.shape[1]
            if jnp.ndim(cache_pos) == 1:
                # per-row filled lengths (continuous batching: slots
                # join at different offsets); strictly-old keys only
                kv_valid = (jax.lax.broadcasted_iota(
                    jnp.int32, (B, kv_len), 1) < cache_pos[:, None])
                am = kv_valid[:, None, None, :]      # [B,1,1,Skv]
            else:
                kv_valid = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, kv_len), 1) < cache_pos)
                am = kv_valid[:, None, None, :]      # [1,1,1,Skv]
            if attn_mask is not None:
                am = jnp.logical_and(am, attn_mask)
            bk, bv = block_kv if block_kv is not None else (None, None)
            out = ops.decode_attention(q, ck, cv, am, k_cur=k, v_cur=v,
                                       blk_k=bk, blk_v=bv,
                                       blk_mask=block_mask)
            new_cache = (k, v)                       # slice, not cache
        elif layer_cache is not None:
            ck, cv = layer_cache  # [B, max_len, Hkv, D]
            assert jnp.ndim(cache_pos) == 0, \
                "vector cache_pos requires single-token step"
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                              (0, cache_pos, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                              (0, cache_pos, 0, 0))
            new_cache = (ck, cv)
            if prefill:
                # cache starts empty at prefill: attention only spans the
                # prompt tokens, so the flash kernel applies directly and
                # the cache write is a pure side effect
                out = ops.multi_head_attention(
                    q, k, v, causal=True, segment_ids=segment_ids,
                    attn_mask=attn_mask, impl=cfg.attention_impl,
                    interpret=cfg.attention_interpret)
            else:
                # multi-token decode step: mask keys beyond the filled
                # region, causal offset within the step
                kv_len = ck.shape[1]
                kv_valid = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, kv_len), 1) < cache_pos + S)
                am = kv_valid[:, None, None, :]      # [1,1,1,Skv]
                if attn_mask is not None:
                    am = jnp.logical_and(am, attn_mask)
                k, v = ck.astype(k.dtype), cv.astype(v.dtype)
                out = ops.multi_head_attention(
                    q, k, v, causal=True, attn_mask=am,
                    q_offset=cache_pos, impl="eager")
        else:
            out = ops.multi_head_attention(
                q, k, v, causal=True, segment_ids=segment_ids,
                attn_mask=attn_mask, impl=cfg.attention_impl,
                interpret=cfg.attention_interpret)

        return self.project_out(out), new_cache


class LlamaDecoderLayer(nn.Module):
    config: LlamaConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.input_layernorm = RMSNorm(cfg.rms_norm_eps, self.param_dtype)
        self.self_attn = LlamaAttention(cfg, self.dtype, self.param_dtype)
        self.post_attention_layernorm = RMSNorm(cfg.rms_norm_eps,
                                                self.param_dtype)
        self.mlp = LlamaMLP(cfg, self.dtype, self.param_dtype)

    def __call__(self, x, *, positions, layer_cache=None, cache_pos=None,
                 segment_ids=None, attn_mask=None, prefill=False,
                 block_kv=None, block_mask=None):
        cfg = self.config
        if (cfg.remat and cfg.remat_policy == "hoist_attn"
                and layer_cache is None):
            return self._call_hoist_attn(x, positions, segment_ids,
                                         attn_mask), None
        attn_out, new_cache = self.self_attn(
            self.input_layernorm(x),
            positions=positions, layer_cache=layer_cache,
            cache_pos=cache_pos, segment_ids=segment_ids,
            attn_mask=attn_mask, prefill=prefill,
            block_kv=block_kv, block_mask=block_mask)
        if (cfg.remat and cfg.remat_policy == "dots_lite"
                and layer_cache is None):
            # o_proj output saved: the bwd replay of the MLP branch needs
            # x + attn_out but not the o matmul itself
            attn_out = checkpoint_name(attn_out, "remat_attn_o")
        x = x + attn_out
        mlp_out = self.mlp(self.post_attention_layernorm(x))
        return x + mlp_out, new_cache

    def _call_hoist_attn(self, x, positions, segment_ids, attn_mask):
        """remat_policy='hoist_attn': checkpoint the projections and the
        MLP, but keep the flash-attention call OUTSIDE the remat regions.
        Saving the kernel's output via checkpoint_name does not help —
        remat treats the custom_vjp atomically and re-runs its forward to
        rebuild (o, lse) for the backward. Hoisting the call out instead
        keeps the custom-VJP residuals alive (≈2% of step time recovered
        at the 2b train shape) at the cost of saving q/k/v + the
        attention output per layer (~3.5× the per-layer checkpoint)."""
        cfg = self.config

        def pre(mdl, h, pos):
            return mdl.self_attn.project_qkv(mdl.input_layernorm(h), pos)

        def post(mdl, h, out):
            h = h + mdl.self_attn.project_out(out)
            return h + mdl.mlp(mdl.post_attention_layernorm(h))

        policy = jax.checkpoint_policies.nothing_saveable
        q, k, v = nn.remat(pre, prevent_cse=False, policy=policy)(
            self, x, positions)
        out = ops.multi_head_attention(
            q, k, v, causal=True, segment_ids=segment_ids,
            attn_mask=attn_mask, impl=cfg.attention_impl,
            interpret=cfg.attention_interpret)
        return nn.remat(post, prevent_cse=False, policy=policy)(
            self, x, out)


class LlamaModel(nn.Module):
    """Decoder stack; returns final hidden states (post-norm)."""
    config: LlamaConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            param_dtype=self.param_dtype, name="embed_tokens")
        self.norm = RMSNorm(cfg.rms_norm_eps, self.param_dtype, name="norm")

    def embed(self, input_ids):
        # custom-VJP lookup (table cast first, matching nn.Embed's
        # promote-then-take numerics) — see embedding_lookup
        return embedding_lookup(
            self.embed_tokens.embedding.astype(self.dtype), input_ids)

    @nn.compact
    def _layers(self, h, positions, cache_k, cache_v, cache_pos,
                segment_ids, attn_mask, prefill=False,
                block_kv=None, block_mask=None):
        cfg = self.config
        layer_cls = LlamaDecoderLayer
        if cfg.remat and cfg.remat_policy != "hoist_attn":
            policy = {
                "nothing": jax.checkpoint_policies.nothing_saveable,
                "dots": jax.checkpoint_policies.checkpoint_dots,
                "dots_no_batch":
                    jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                # dots minus the wide [B,S,intermediate] gate/up tensors:
                # save only post-RoPE q/k/v + the o_proj output (~40MB vs
                # dots' ~188MB per 8B layer at B2 S1024). The bwd replay
                # recomputes gate/up (the only matmuls whose outputs feed
                # elementwise bwd) instead of the whole layer — the
                # middle ground that fits 8B QLoRA on one 16GB v5e where
                # `dots` OOMs by 2.4GB and `nothing` wastes a full fwd
                "dots_lite": jax.checkpoint_policies.save_only_these_names(
                    "remat_qkv", "remat_attn_o"),
            }[cfg.remat_policy]
            layer_cls = nn.remat(
                LlamaDecoderLayer, prevent_cse=False,
                static_argnums=(),
                policy=policy)
        # "hoist_attn" remats INSIDE the layer (projections and MLP
        # checkpointed, flash attention outside the remat region) — see
        # LlamaDecoderLayer._call_hoist_attn

        use_cache = cache_k is not None

        if cfg.scan_layers:
            if use_cache:
                def body(layer, h, kv):
                    bkv = (kv[2], kv[3]) if len(kv) == 4 else None
                    out, new_kv = layer(
                        h, positions=positions, layer_cache=kv[:2],
                        cache_pos=cache_pos, segment_ids=segment_ids,
                        attn_mask=attn_mask, prefill=prefill,
                        block_kv=bkv, block_mask=block_mask)
                    return out, new_kv
                xs = (cache_k, cache_v)
                if block_kv is not None:
                    xs = (cache_k, cache_v, block_kv[0], block_kv[1])
            else:
                def body(layer, h, _):
                    out, _kv = layer(
                        h, positions=positions, layer_cache=None,
                        cache_pos=cache_pos, segment_ids=segment_ids,
                        attn_mask=attn_mask)
                    # Ulysses SP: keep hidden states sequence-sharded
                    # between layers (no-op off an SP mesh); attention
                    # itself runs head-sharded via the flash shard_map
                    return ops.constrain_seq(out), None
                xs = None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.num_hidden_layers,
                in_axes=0, out_axes=0,
            )
            h, new_kv = scan(layer_cls(cfg, self.dtype, self.param_dtype,
                                       name="layers"), h, xs)
            return h, new_kv
        else:
            new_ks, new_vs = [], []
            for i in range(cfg.num_hidden_layers):
                lc = (cache_k[i], cache_v[i]) if use_cache else None
                bkv = None if block_kv is None else \
                    (block_kv[0][i], block_kv[1][i])
                h, new_kv = layer_cls(
                    cfg, self.dtype, self.param_dtype, name=f"layers_{i}")(
                        h, positions=positions, layer_cache=lc,
                        cache_pos=cache_pos, segment_ids=segment_ids,
                        attn_mask=attn_mask, prefill=prefill,
                        block_kv=bkv, block_mask=block_mask)
                if not use_cache:
                    # Ulysses SP between layers (mirrors the scan body)
                    h = ops.constrain_seq(h)
                if new_kv is not None:
                    new_ks.append(new_kv[0])
                    new_vs.append(new_kv[1])
            if use_cache:
                return h, (jnp.stack(new_ks), jnp.stack(new_vs))
            return h, None

    def __call__(self, input_ids=None, *, inputs_embeds=None, positions=None,
                 cache=None, segment_ids=None, attn_mask=None,
                 prefill=False, block_kv=None, block_mask=None):
        assert (input_ids is None) != (inputs_embeds is None)
        h = inputs_embeds if inputs_embeds is not None else \
            self.embed(input_ids)
        h = h.astype(self.dtype)
        B, S = h.shape[:2]
        cache_pos = None
        if cache is not None:
            cache_pos = cache["pos"]
            if positions is None:
                cp = cache_pos[:, None] if jnp.ndim(cache_pos) == 1 \
                    else cache_pos
                positions = (cp
                             + jax.lax.broadcasted_iota(jnp.int32, (B, S), 1))
        if positions is None:
            positions = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)

        cache_k = cache["k"] if cache is not None else None
        cache_v = cache["v"] if cache is not None else None
        if cache is None:
            # Ulysses SP (training forward): sequence-shard the stream
            # entering the stack (no-op off an SP mesh)
            h = ops.constrain_seq(h)
        h, new_kv = self._layers(h, positions, cache_k, cache_v, cache_pos,
                                 segment_ids, attn_mask, prefill=prefill,
                                 block_kv=block_kv, block_mask=block_mask)
        h = self.norm(h)
        new_cache = None
        if cache is not None:
            if block_kv is not None:
                # deferred write (block decode): the cache was read-only
                # for this step; hand the per-layer [L, B, 1, Hkv, D]
                # columns back for the caller's block buffer and write
                # nothing — the caller scatters the whole block at once
                new_cache = {"k": cache["k"], "v": cache["v"],
                             "pos": cache["pos"] + S,
                             "k_col": new_kv[0], "v_col": new_kv[1]}
            elif not prefill and S == 1:
                # append-mode decode: new_kv holds the per-layer
                # [L, B, 1, Hkv, D] slices; one scatter writes them all
                new_cache = {
                    "k": _write_decode_column(cache["k"], new_kv[0],
                                              cache_pos),
                    "v": _write_decode_column(cache["v"], new_kv[1],
                                              cache_pos),
                    "pos": cache["pos"] + S}
            elif not prefill and jnp.ndim(cache_pos) == 1:
                # multi-token verify window with per-row positions
                # (batched speculative decode): cache stayed read-only;
                # hand the [L, B, S, Hkv, D] window columns back — the
                # caller scatters only the ACCEPTED prefix per row
                new_cache = {"k": cache["k"], "v": cache["v"],
                             "pos": cache["pos"],
                             "k_col": new_kv[0], "v_col": new_kv[1]}
            else:
                new_cache = {"k": new_kv[0], "v": new_kv[1],
                             "pos": cache["pos"] + S}
        return h, new_cache


class LlamaForCausalLM(nn.Module):
    """Causal LM head over LlamaModel.

    ``__call__`` returns (logits, last_hidden_state, new_cache); the loss
    lives in :func:`causal_lm_loss` so the train step controls masking.
    """
    config: LlamaConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        cfg = self.config
        self.model = LlamaModel(cfg, self.dtype, self.param_dtype,
                                name="model")
        if not cfg.tie_word_embeddings:
            if cfg.quantization == "int8":
                from mllm_npu_tpu.ops.quant import Int8Dense
                self.lm_head = Int8Dense(cfg.vocab_size, dtype=self.dtype,
                                         name="lm_head", tp_mode="column")
            elif cfg.quantization == "int4":
                from mllm_npu_tpu.ops.quant import Int4Dense
                self.lm_head = Int4Dense(cfg.vocab_size,
                                         group_size=cfg.quant_group_size,
                                         dtype=self.dtype,
                                         name="lm_head", tp_mode="column")
            else:
                self.lm_head = nn.Dense(
                    cfg.vocab_size, use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="lm_head")

    def embed(self, input_ids):
        return self.model.embed(input_ids)

    def _logits(self, h):
        if self.config.tie_word_embeddings:
            emb = self.model.embed_tokens.embedding
            return h @ emb.T.astype(h.dtype)
        return self.lm_head(h)

    def __call__(self, input_ids=None, *, inputs_embeds=None, positions=None,
                 cache=None, segment_ids=None, attn_mask=None,
                 prefill=False, logits_slice: Optional[int] = None,
                 block_kv=None, block_mask=None, with_logits: bool = True):
        h, new_cache = self.model(
            input_ids, inputs_embeds=inputs_embeds, positions=positions,
            cache=cache, segment_ids=segment_ids, attn_mask=attn_mask,
            prefill=prefill, block_kv=block_kv, block_mask=block_mask)
        if not with_logits:
            # chunked-CE training path: the caller computes the loss from
            # ``h`` via loss_from_hidden without ever materializing the
            # full [B, S, V] logits. During init the head params must
            # still be created — a 1-position slice does that without
            # allocating [B, S, V] (Dense params depend only on D, V).
            if self.is_initializing():
                _ = self._logits(h[:, :1])
            return None, h, new_cache
        if logits_slice is not None:
            h_logits = h[:, -logits_slice:]
        else:
            h_logits = h
        logits = self._logits(h_logits)
        return logits, h, new_cache

    def loss_from_hidden(self, h, labels, *, chunk: int,
                         ignore_index: int = IGNORE_INDEX):
        """Causal LM loss from final hidden states without materializing
        the full [B, S, V] logits (see :func:`chunked_causal_lm_loss`).
        Falls back to the dense path for quantized heads (serving-only
        layouts; training never quantizes) and during init (so the head
        params get created)."""
        cfg = self.config
        if cfg.quantization is not None:
            return causal_lm_loss(self._logits(h), labels, ignore_index)
        if cfg.tie_word_embeddings:
            kernel = self.model.embed_tokens.embedding.T
        else:
            if self.is_initializing():
                # make sure the head params exist (cheap 1-position
                # touch — never the full [B, S, V] logits, which at
                # real train shapes would OOM the init forward)
                _ = self._logits(h[:, :1])
            kernel = self.lm_head.variables["params"]["kernel"]
        return chunked_causal_lm_loss(
            h, kernel, labels, chunk=chunk, compute_dtype=self.dtype,
            ignore_index=ignore_index)


class LlamaForSequenceClassification(nn.Module):
    """Sequence-classification head over LlamaModel (parity with the
    reference fork's surface, reference llama3.py:1691-1810): a
    bias-free ``score`` projection read at each row's LAST non-pad
    token. Static-shape pooling: the reference's
    ``argmax(ids == pad) - 1`` indexing becomes a take_along_axis
    gather, jit-friendly on TPU. Loss lives in
    :func:`sequence_classification_loss`."""
    config: LlamaConfig
    num_labels: int = 2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, *, pad_token_id: Optional[int] = None,
                 positions=None, attn_mask=None, segment_ids=None):
        h, _ = LlamaModel(self.config, self.dtype, self.param_dtype,
                          name="model")(
            input_ids, positions=positions, attn_mask=attn_mask,
            segment_ids=segment_ids)
        logits = nn.Dense(self.num_labels, use_bias=False,
                          dtype=self.dtype, param_dtype=self.param_dtype,
                          name="score")(h)           # [B, S, C]
        B, S = input_ids.shape
        if pad_token_id is None:
            seq_len = jnp.full((B,), S - 1, jnp.int32)
        else:
            is_pad = input_ids == pad_token_id
            # first pad position (S if none) - 1, modulo S (ref parity)
            first_pad = jnp.where(is_pad.any(axis=-1),
                                  jnp.argmax(is_pad, axis=-1), S)
            seq_len = (first_pad - 1) % S
        pooled = jnp.take_along_axis(
            logits, seq_len[:, None, None], axis=1)[:, 0]   # [B, C]
        return pooled.astype(jnp.float32)


def sequence_classification_loss(pooled: jax.Array,
                                 labels: jax.Array) -> jax.Array:
    """Reference problem_type dispatch (llama3.py:1770-1795): MSE for
    1 label (regression), CE for int labels (single-label), BCE
    otherwise (multi-label)."""
    if pooled.shape[-1] == 1:
        return jnp.mean((pooled.squeeze(-1) - labels.astype(
            jnp.float32)) ** 2)
    if jnp.issubdtype(labels.dtype, jnp.integer):
        logp = jax.nn.log_softmax(pooled, axis=-1)
        return -jnp.mean(jnp.take_along_axis(
            logp, labels[:, None], axis=-1))
    return jnp.mean(optax_sigmoid_bce(pooled, labels.astype(jnp.float32)))


def optax_sigmoid_bce(logits, labels):
    # stable BCE-with-logits (no optax dependency in this module)
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


class LlamaForQuestionAnswering(nn.Module):
    """Extractive-QA head (reference llama3.py:1813-1907): a Dense(2)
    over the sequence output split into start/end logits. Loss in
    :func:`question_answering_loss`."""
    config: LlamaConfig
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, *, positions=None, attn_mask=None,
                 segment_ids=None):
        h, _ = LlamaModel(self.config, self.dtype, self.param_dtype,
                          name="transformer")(
            input_ids, positions=positions, attn_mask=attn_mask,
            segment_ids=segment_ids)
        logits = nn.Dense(2, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name="qa_outputs")(h)       # [B, S, 2]
        start, end = jnp.split(logits.astype(jnp.float32), 2, axis=-1)
        return start.squeeze(-1), end.squeeze(-1)


def question_answering_loss(start_logits, end_logits, start_positions,
                            end_positions) -> jax.Array:
    """Mean of start/end CE; positions clamped to [0, S] with S acting
    as the reference's ignored_index (llama3.py:1884-1893)."""
    S = start_logits.shape[1]

    def ce(logits, pos):
        pos = jnp.clip(pos, 0, S)
        valid = pos < S
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, jnp.minimum(pos, S - 1)[:, None], axis=-1).squeeze(-1)
        nll = jnp.where(valid, nll, 0.0)
        return nll.sum() / jnp.maximum(valid.sum(), 1)

    return (ce(start_logits, start_positions)
            + ce(end_logits, end_positions)) / 2


def causal_lm_loss(logits: jax.Array, labels: jax.Array,
                   ignore_index: int = IGNORE_INDEX) -> jax.Array:
    """Shifted next-token CE in fp32, mean over non-ignored targets
    (reference semantics: llama3.py:1552-1562)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = targets != ignore_index
    safe_targets = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None],
                               axis=-1).squeeze(-1)
    nll = jnp.where(mask, nll, 0.0)
    denom = jnp.maximum(mask.sum(), 1)
    return nll.sum() / denom


def chunked_causal_lm_loss(h: jax.Array, kernel: jax.Array,
                           labels: jax.Array, *, chunk: int = 256,
                           compute_dtype=jnp.bfloat16,
                           ignore_index: int = IGNORE_INDEX) -> jax.Array:
    """Fused-linear CE: head matmul + softmax-CE per sequence chunk, the
    full [B, S, V] logits are NEVER materialized.

    At Llama-3's 128k vocab the dense loss path costs B*S*V * (2+4)
    bytes of activations (bf16 logits + fp32 log-softmax residuals) —
    multiple GB per step at train shapes, usually the single largest
    activation. Here a ``lax.scan`` walks S in chunks of ``chunk``
    positions; each step computes its [B, chunk, V] logits inside
    ``jax.checkpoint`` (so the backward pass recomputes them from the
    saved hidden chunk instead of storing them) and reduces to two
    scalars. Peak logits memory drops S/chunk-fold; the extra cost is
    one head-matmul recompute in bwd — the same trade ``remat`` makes
    for decoder layers. Chunking along S (not flattened B*S rows) keeps
    the batch axis intact so GSPMD data/fsdp sharding propagates without
    resharding collectives.

    Numerics match :func:`causal_lm_loss` exactly up to reduction order:
    the matmul runs in ``compute_dtype`` (the head's dtype), the
    log-sum-exp and gather in fp32.
    """
    B, S, D = h.shape
    hp = h[:, :-1]                                # predict positions
    tg = labels[:, 1:]
    R = S - 1
    C = min(chunk, R)
    pad = (-R) % C
    if pad:
        hp = jnp.pad(hp, ((0, 0), (0, pad), (0, 0)))
        tg = jnp.pad(tg, ((0, 0), (0, pad)), constant_values=ignore_index)
    n = (R + pad) // C
    kernel = kernel.astype(compute_dtype)

    def piece(i, hp, tg, w):
        hc = jax.lax.dynamic_slice_in_dim(hp, i * C, C, axis=1)
        tc = jax.lax.dynamic_slice_in_dim(tg, i * C, C, axis=1)
        logits = (hc.astype(compute_dtype) @ w).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        mask = tc != ignore_index
        safe = jnp.where(mask, tc, 0)
        picked = jnp.take_along_axis(
            logits, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(mask, lse - picked, 0.0)
        return nll.sum(), mask.sum()

    piece = jax.checkpoint(piece)

    def body(carry, i):
        s, c = piece(i, hp, tg, kernel)
        return (carry[0] + s, carry[1] + c), None

    (tot, cnt), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        jnp.arange(n))
    return tot / jnp.maximum(cnt, 1)
