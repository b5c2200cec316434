"""Checkpoint manager: save/restore round-trip incl. data state and
max_to_keep pruning."""

import jax
import jax.numpy as jnp
import numpy as np

from mllm_npu_tpu.train.checkpoint import CheckpointManager
from mllm_npu_tpu.train.train_state import (OptimizerConfig,
                                            create_train_state)


def _state():
    params = {"params": {"w": jnp.arange(8.0), "b": jnp.ones((4,))}}
    return create_train_state(params, OptimizerConfig(
        lr=1e-3, warmup_steps=0, total_steps=10, frozen_patterns=()))


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path), async_save=False)
    state = _state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    mgr.save(7, state, data_state={"steps": 7, "epoch": 0, "seed": 888})
    mgr.wait()

    template = _state()
    restored, data_state, step = mgr.restore(template)
    assert step == 7
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["params"]["w"]),
                                  np.arange(8.0))
    assert data_state["steps"] == 7
    mgr.close()


def test_restore_empty_dir_is_noop(tmp_path):
    mgr = CheckpointManager(str(tmp_path), async_save=False)
    template = _state()
    restored, data_state, step = mgr.restore(template)
    assert step is None and data_state is None
    assert int(restored.step) == 0
    mgr.close()


def test_max_to_keep_prunes(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2, async_save=False)
    state = _state()
    for s in (1, 2, 3):
        mgr.save(s, state.replace(step=jnp.asarray(s, jnp.int32)))
        mgr.wait()
    assert mgr.latest_step() == 3
    kept = sorted(p.name for p in tmp_path.iterdir()
                  if p.name.startswith("checkpoint"))
    assert len(kept) == 2
    mgr.close()
