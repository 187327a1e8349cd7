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


# ---------------------------------------------------------------------------
# Mid-epoch data-position sidecar (reference behavior: HF Trainer skips
# consumed batches on auto-resume, `train.py:1699-1702`): the epoch plan is
# deterministic given (seed, epoch), so persisting (epoch, batch_in_epoch)
# beside the orbax step lets a restart fast-forward instead of re-seeing data.
# ---------------------------------------------------------------------------

_DATA_STATE = "data_state.json"


def save_data_state(directory: str, step: int, epoch: int,
                    batch_in_epoch: int) -> None:
    import json

    path = os.path.join(os.path.abspath(directory), _DATA_STATE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"step": step, "epoch": epoch,
                   "batch_in_epoch": batch_in_epoch}, f)
    os.replace(tmp, path)


def load_data_state(directory: str, step: int) -> Optional[dict]:
    """Return the sidecar if it matches the restored `step` (a mismatch means
    the sidecar is stale relative to the orbax checkpoint — ignore it)."""
    import json

    path = os.path.join(os.path.abspath(directory), _DATA_STATE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        ds = json.load(f)
    if ds.get("step") != step:
        return None
    return ds
