"""Mixture multiplexer + dataloader assembly (reference
data/datapipes.py:82-108)."""

from __future__ import annotations

from typing import Optional

from mllm_npu_tpu.configs import instantiate
from mllm_npu_tpu.data.streams import SampleMultiplexer


def build_multi_datapipes(datapipes, tokenizer=None, image_transform=None,
                          sample_weights=None, seed: Optional[int] = None):
    """Instantiate N task pipelines from config nodes and weighted-sample
    across them; seed = 888 + process index (reference
    datapipes.py:104-105 uses 888 + dist rank). Task builders that don't
    take a seed kwarg keep their own; ones that do inherit the mixture
    seed so the whole tree is one deterministic function of it. The
    returned multiplexer is checkpointable (state_dict/load_state_dict)."""
    if sample_weights is None:
        sample_weights = [1] * len(datapipes)
    assert len(sample_weights) == len(datapipes)

    if seed is None:
        import jax
        seed = 888 + jax.process_index()
    pipes = []
    for i, node in enumerate(datapipes):
        kw = {} if "seed" in node else {"seed": seed + i}
        pipes.append(instantiate(node, tokenizer=tokenizer,
                                 image_transform=image_transform, **kw))
    weights = {p: w for p, w in zip(pipes, sample_weights)}
    return SampleMultiplexer(weights, seed=seed)
