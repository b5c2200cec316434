"""Mixture multiplexer + dataloader assembly (reference
data/datapipes.py:82-108)."""

from __future__ import annotations

from typing import Optional

import jax

from mllm_npu_tpu.configs import instantiate
from mllm_npu_tpu.data.streams import SampleMultiplexer


class _IterablePipe:
    """Wrap a generator factory so the multiplexer can re-iterate."""

    def __init__(self, factory):
        self.factory = factory

    def __iter__(self):
        it = self.factory
        return iter(it() if callable(it) else it)


def build_multi_datapipes(datapipes, tokenizer=None, image_transform=None,
                          sample_weights=None, seed: Optional[int] = None):
    """Instantiate N task pipelines from config nodes and weighted-sample
    across them; seed = 888 + process index (reference
    datapipes.py:104-105 uses 888 + dist rank)."""
    if sample_weights is None:
        sample_weights = [1] * len(datapipes)
    assert len(sample_weights) == len(datapipes)

    pipes = [
        instantiate(node, tokenizer=tokenizer,
                    image_transform=image_transform)
        for node in datapipes
    ]
    if seed is None:
        seed = 888 + jax.process_index()
    weights = {_IterablePipe(p): w for p, w in zip(pipes, sample_weights)}
    return SampleMultiplexer(weights, seed=seed)
