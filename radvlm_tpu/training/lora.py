"""LoRA adapters for parameter-efficient finetuning.

Rebuild of the reference's peft integration (`finetuning/llava/train/
train.py:1515-1532` LoRA injection over attention/MLP linears,
`:1708-1717` adapter-split save): adapters are a separate pytree
{path -> {"a": [L, in, r], "b": [L, r, out]}} over the stacked layer kernels;
`merge_lora` computes W + (alpha/r)·A·B functionally, so the base model code is
untouched and the optimizer trains only the adapter pytree (the ZeRO-style
sharding applies to adapters too — A shards like the kernel's in-dim, B like its
out-dim).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from radvlm_tpu.parallel.sharding import path_str


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 128
    alpha: float = 256.0
    # Kernel paths to adapt (regex), default = the reference's target set:
    # LLM attention + MLP projections (`train.py:1519` find_all_linear_names).
    target_patterns: Tuple[str, ...] = (
        r"text/layers/attn/[qkvo]/kernel$",
        r"text/layers/mlp/(gate|up|down)/kernel$",
    )

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def _targets(params: Any, cfg: LoraConfig) -> List[Tuple[Tuple, Any]]:
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        p = path_str(path)
        if any(re.search(pat, p) for pat in cfg.target_patterns):
            out.append((path, leaf))
    return out


def init_lora(params: Any, cfg: LoraConfig, key: jax.Array) -> Dict[str, Any]:
    """{path_str: {"a", "b"}} — A gaussian-init, B zero-init (standard LoRA:
    the adapted model starts exactly at the base weights)."""
    adapters: Dict[str, Any] = {}
    targets = _targets(params, cfg)
    keys = jax.random.split(key, max(len(targets), 1))
    for (path, leaf), k in zip(targets, keys):
        *lead, d_in, d_out = leaf.shape
        a = jax.random.normal(k, (*lead, d_in, cfg.rank), jnp.float32) * 0.01
        b = jnp.zeros((*lead, cfg.rank, d_out), jnp.float32)
        adapters[path_str(path)] = {"a": a.astype(leaf.dtype), "b": b.astype(leaf.dtype)}
    return adapters


def merge_lora(params: Any, adapters: Dict[str, Any], cfg: LoraConfig) -> Any:
    """Base params + scaled A·B deltas (differentiable w.r.t. adapters)."""

    def visit(path, leaf):
        p = path_str(path)
        ad = adapters.get(p)
        if ad is None:
            return leaf
        delta = jnp.einsum("...ir,...ro->...io", ad["a"], ad["b"])
        return (leaf + cfg.scaling * delta).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(visit, params)


def merge_and_bake(params: Any, adapters: Dict[str, Any], cfg: LoraConfig) -> Any:
    """One-time merge for deployment (reference LoRA-merge load path,
    `model/builder.py:58-115`)."""
    return jax.tree.map(lambda x: x, merge_lora(params, adapters, cfg))
