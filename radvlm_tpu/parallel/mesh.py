"""Device mesh construction for the radvlm-tpu framework.

TPU-native replacement for the reference's process-level parallelism plumbing
(torchrun rendezvous `finetuning/scripts/finetune_radio_7b.sh:37-45`, DeepSpeed ZeRO-3
NCCL collectives, accelerate `PartialState`): one logical `jax.sharding.Mesh` with
named axes, over which pjit/GSPMD compiles all collectives onto ICI/DCN.

Axes:
  data   — data parallelism (batch split; ZeRO-style optimizer sharding rides fsdp)
  stage  — pipeline parallelism (GPipe layer stages, parallel/pp.py)
  fsdp   — parameter/optimizer sharding (ZeRO-3 equivalent, `scripts/zero3.json`)
  seq    — sequence/context parallelism (ring attention, parallel/ring.py)
  tensor — tensor parallelism (not in the reference — SURVEY.md §2.7 — but first-class
           here for 7B-and-up serving on small slices)
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "stage", "fsdp", "seq", "tensor", "expert")


def make_mesh(
    mesh_shape: Optional[Dict[str, int]] = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over `devices` (default: all).

    mesh_shape maps axis name -> size; unspecified axes get 1, and a single `-1`
    value absorbs the remaining devices (like torch distributed world sizing, but
    declarative). Default: everything on the fsdp axis (ZeRO-3-like, matching the
    reference's 128-rank ZeRO-3 layout).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = dict(mesh_shape or {"fsdp": -1})
    sizes = []
    wildcard = None
    for ax in AXES:
        v = shape.get(ax, 1)
        if v == -1:
            wildcard = ax
            sizes.append(None)
        else:
            sizes.append(v)
    fixed = math.prod(s for s in sizes if s is not None)
    if wildcard is not None:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes = [n // fixed if s is None else s for s in sizes]
    elif fixed != n:
        raise ValueError(f"mesh shape {shape} needs {fixed} devices, have {n}")
    arr = np.asarray(devices).reshape(tuple(sizes))
    return Mesh(arr, AXES)


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def batch_pspec() -> P:
    """Batch arrays are split across both data and fsdp axes (fsdp ranks see distinct
    microbatches, like ZeRO's one-replica-per-rank layout)."""
    return P(("data", "fsdp"))


def local_mesh_info(mesh: Mesh) -> Tuple[int, int]:
    """(total devices, batch-parallel ways) for sizing host batches."""
    total = mesh.devices.size
    dp = mesh.shape["data"] * mesh.shape["fsdp"]
    return total, dp
