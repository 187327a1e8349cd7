"""Orbax checkpointing: sharded async save/auto-resume for TrainState.

TPU-native replacement for the reference's HF-Trainer + DeepSpeed checkpointing
(`finetune_radio_7b.sh:71-72` save_steps 200 / keep 1; auto-resume glob
`train.py:1699-1702`; ZeRO-3 gather-on-save `zero3.json`): orbax writes each
shard from its owning host (no gather), restores with the original shardings,
and `latest_step` gives the auto-resume point.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def make_manager(directory: str, *, max_to_keep: int = 1, save_interval_steps: int = 200):
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        save_interval_steps=save_interval_steps,
        enable_async_checkpointing=True,
    )
    return ocp.CheckpointManager(directory, options=options)


def save_state(manager, step: int, state) -> bool:
    """Async-save the TrainState; returns True if a save was triggered."""
    import orbax.checkpoint as ocp

    return manager.save(step, args=ocp.args.StandardSave(state))


def latest_step(manager) -> Optional[int]:
    return manager.latest_step()


def restore_state(manager, step: int, abstract_state):
    """Restore into the shapes/shardings of `abstract_state` (build it with
    jax.eval_shape over your init + device_put shardings)."""
    import orbax.checkpoint as ocp

    return manager.restore(step, args=ocp.args.StandardRestore(abstract_state))


def wait_until_finished(manager) -> None:
    manager.wait_until_finished()
