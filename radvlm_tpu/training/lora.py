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


def _is_node(x: Any) -> bool:
    from radvlm_tpu.ops.int4_matmul import is_q4node
    from radvlm_tpu.ops.quant import is_qnode

    return is_qnode(x) or is_q4node(x)


def _targets(params: Any, cfg: LoraConfig) -> List[Tuple[Tuple, Any]]:
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        params, is_leaf=_is_node
    ):
        p = path_str(path)
        if any(re.search(pat, p) for pat in cfg.target_patterns):
            out.append((path, leaf))
    return out


def _leaf_shape_dtype(leaf: Any):
    """(shape, adapter dtype) for a dense kernel OR a quantized base node
    (QLoRA: the reference's 4/8-bit bitsandbytes base prep,
    `train.py:1466-1503`). Adapters over a quantized base train in f32."""
    from radvlm_tpu.ops.int4_matmul import is_q4node
    from radvlm_tpu.ops.quant import Q_KEY, is_qnode

    if is_q4node(leaf):
        raise NotImplementedError(
            "LoRA over an int4-packed base is not wired; quantize the "
            "frozen base to int8 (quantize_params(bits=8))"
        )
    if is_qnode(leaf):
        return leaf[Q_KEY].shape, jnp.float32
    return leaf.shape, leaf.dtype


def init_lora(params: Any, cfg: LoraConfig, key: jax.Array) -> Dict[str, Any]:
    """{path_str: {"a", "b"}} — A gaussian-init, B zero-init (standard LoRA:
    the adapted model starts exactly at the base weights). Works over a dense
    OR an int8-quantized base (QLoRA)."""
    adapters: Dict[str, Any] = {}
    targets = _targets(params, cfg)
    keys = jax.random.split(key, max(len(targets), 1))
    for (path, leaf), k in zip(targets, keys):
        shape, dtype = _leaf_shape_dtype(leaf)
        *lead, d_in, d_out = shape
        a = jax.random.normal(k, (*lead, d_in, cfg.rank), jnp.float32) * 0.01
        b = jnp.zeros((*lead, cfg.rank, d_out), jnp.float32)
        adapters[path_str(path)] = {"a": a.astype(dtype), "b": b.astype(dtype)}
    return adapters


def merge_lora(params: Any, adapters: Dict[str, Any], cfg: LoraConfig) -> Any:
    """Base params + scaled A·B deltas (differentiable w.r.t. adapters).

    Dense kernels merge in place. Quantized base nodes stay int8 and gain
    `__lora_a__`/`__lora_b__` (B pre-scaled by alpha/rank): `ops.quant.qmm`
    adds the low-rank term next to the quantized matmul, so the frozen base
    never dequantizes into residency — the QLoRA memory contract."""
    from radvlm_tpu.ops.quant import LORA_A, LORA_B, is_qnode

    def visit(path, leaf):
        p = path_str(path)
        ad = adapters.get(p)
        if ad is None:
            return leaf
        if is_qnode(leaf):
            return {
                **leaf,
                LORA_A: ad["a"],
                LORA_B: (cfg.scaling * ad["b"]).astype(ad["b"].dtype),
            }
        delta = jnp.einsum("...ir,...ro->...io", ad["a"], ad["b"])
        return (leaf + cfg.scaling * delta).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(visit, params, is_leaf=_is_node)


def merge_and_bake(params: Any, adapters: Dict[str, Any], cfg: LoraConfig) -> Any:
    """One-time merge for deployment (reference LoRA-merge load path,
    `model/builder.py:58-115`). A quantized base re-quantizes after the merge
    (dequant + delta -> fresh int8 scales), yielding a plain quantized tree."""
    from radvlm_tpu.ops.quant import (
        LORA_A, LORA_B, is_qnode, maybe_dequant, quantize_array,
    )

    merged = merge_lora(params, adapters, cfg)

    def bake(leaf):
        if isinstance(leaf, dict) and LORA_A in leaf:
            return quantize_array(maybe_dequant(leaf, jnp.float32))
        return leaf

    return jax.tree_util.tree_map(
        bake, merged, is_leaf=lambda x: _is_node(x) or
        (isinstance(x, dict) and LORA_A in x)
    )
