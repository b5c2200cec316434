"""LR schedules (optax), mirroring the reference registry semantics
(reference: mllm_npu/train/scheduler.py — HF registry plus a custom
cosine with a ``min_lr_ratio`` floor, :20-33)."""

from __future__ import annotations

import math
from typing import Optional

import optax


def get_scheduler(name: str, *, base_lr: float, warmup_steps: int = 0,
                  total_steps: int = 0, min_lr_ratio: float = 0.0):
    name = name.lower()
    if name in ("constant",):
        return optax.constant_schedule(base_lr)
    if name in ("constant_with_warmup",):
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup_steps),
             optax.constant_schedule(base_lr)], [warmup_steps])
    if name in ("linear",):
        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup_steps),
             optax.linear_schedule(base_lr, 0.0,
                                   max(total_steps - warmup_steps, 1))],
            [warmup_steps])
    if name in ("cosine", "cosine_with_min_lr"):
        # reference semantics (scheduler.py:20-33): cosine decays to
        # min_lr_ratio * base_lr instead of 0
        decay_steps = max(total_steps - warmup_steps, 1)

        def cosine_floor(step):
            import jax.numpy as jnp
            frac = jnp.clip((step) / decay_steps, 0.0, 1.0)
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
            return base_lr * (min_lr_ratio + (1 - min_lr_ratio) * cos)

        return optax.join_schedules(
            [optax.linear_schedule(0.0, base_lr, warmup_steps), cosine_floor],
            [warmup_steps])
    raise ValueError(f"unknown scheduler: {name}")
