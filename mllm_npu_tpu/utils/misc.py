"""Misc utilities (reference mllm_npu/utils.py): checkpoint surgery +
moderation hook. ``load_zero3_checkpoint``'s job (materialize a flat
torch state dict into sharded params) is covered by
models.factory.init_assembly_params + utils.weights converters.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)


def honor_platform_env() -> None:
    """Make ``JAX_PLATFORMS=cpu`` (or any explicit platform list) stick.

    Hosted images may force-register a TPU plugin at interpreter start
    and set ``jax_platforms`` programmatically, which silently overrides
    the environment variable a CLI user sets. Call this right after
    ``import jax`` (before any backend init) in scripts that must run
    where the user pointed them — e.g. CPU smoke runs of the benchmark
    harnesses (tests do the same dance in tests/conftest.py)."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)


def reload_qwen_vit(pretrained_path: str, out_path: str) -> dict:
    """Extract the visual-encoder subtree from a full Qwen-VL checkpoint
    (reference utils.py:126-136 reload_qwen_vit)."""
    import torch
    ckpt = torch.load(pretrained_path, map_location="cpu",
                      weights_only=True)
    visual = {k[len("transformer.visual."):]: v for k, v in ckpt.items()
              if k.startswith("transformer.visual.")}
    if not visual:
        visual = {k[len("visual."):]: v for k, v in ckpt.items()
                  if k.startswith("visual.")}
    torch.save(visual, out_path)
    log.info("extracted %d visual tensors -> %s", len(visual), out_path)
    return visual


def remove_mismatched_weights(params_flat: dict, state_flat: dict) -> list:
    """Drop state entries whose shapes mismatch the params (reference
    utils.py:138-148); returns the dropped keys."""
    dropped = []
    for k in list(state_flat):
        if k in params_flat and tuple(params_flat[k].shape) != \
                tuple(state_flat[k].shape):
            dropped.append(k)
            del state_flat[k]
    return dropped


def violates_moderation(text: str, api_key: Optional[str] = None) -> bool:
    """OpenAI moderation hook (reference utils.py:97-123). Fails open
    when no key / no network (this image is zero-egress)."""
    api_key = api_key or os.environ.get("OPENAI_API_KEY")
    if not api_key:
        return False
    try:
        import requests
        r = requests.post(
            "https://api.openai.com/v1/moderations",
            headers={"Authorization": f"Bearer {api_key}"},
            json={"input": text}, timeout=5)
        return bool(r.json()["results"][0]["flagged"])
    except Exception:  # noqa: BLE001
        return False
