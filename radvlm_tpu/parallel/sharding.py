"""Parameter/optimizer sharding rules (GSPMD ZeRO-3 + tensor parallelism).

TPU-native replacement for DeepSpeed ZeRO-3/ZeRO++ (`finetuning/scripts/zero3.json`,
`zero3pp.json`): instead of a runtime engine that allgathers parameters layer by
layer, every parameter gets a `PartitionSpec` over the (data, fsdp, tensor) mesh and
XLA compiles the gather/reduce-scatter schedule. Optimizer state inherits the same
specs, which *is* ZeRO-3 (params + grads + optimizer states all sharded).

Rules are (regex over the pytree path, PartitionSpec); first match wins; default is
replicated. Megatron-style TP layout: QKV/up projections shard output dim on
"tensor", O/down projections shard input dim on "tensor", so each block needs one
all-reduce (XLA inserts it) and activations stay sharded by heads in between.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, spec). Layer-stacked params have a leading L axis (never sharded).
_RULES: List[Tuple[str, P]] = [
    # --- Qwen2 decoder ---
    (r"text/embed/embedding$", P("tensor", "fsdp")),
    (r"text/layers/attn/[qkv]/kernel$", P(None, "fsdp", "tensor")),
    (r"text/layers/attn/[qkv]/bias$", P(None, "tensor")),
    (r"text/layers/attn/o/kernel$", P(None, "tensor", "fsdp")),
    (r"text/layers/mlp/(gate|up)/kernel$", P(None, "fsdp", "tensor")),
    (r"text/layers/mlp/down/kernel$", P(None, "tensor", "fsdp")),
    # MoE (expert parallelism): expert tables shard over the `expert` axis —
    # XLA inserts the dispatch/combine all-to-alls from these annotations.
    (r"text/layers/mlp/moe/router/kernel$", P(None, "fsdp", None)),
    (r"text/layers/mlp/moe/experts/(gate|up)$", P(None, "expert", "fsdp", "tensor")),
    (r"text/layers/mlp/moe/experts/down$", P(None, "expert", "tensor", "fsdp")),
    (r"text/layers/mlp/moe/shared/(gate|up)/kernel$", P(None, "fsdp", "tensor")),
    (r"text/layers/mlp/moe/shared/down/kernel$", P(None, "tensor", "fsdp")),
    (r"text/layers/mlp/moe/shared_gate/kernel$", P(None, "fsdp", None)),
    (r"text/lm_head/kernel$", P("fsdp", "tensor")),
    # --- SigLIP tower ---
    (r"vision_tower/patch_embed/kernel$", P(None, "fsdp")),
    (r"vision_tower/pos_embed$", P(None, "fsdp")),
    (r"vision_tower/layers/attn/[qkv]/kernel$", P(None, "fsdp", "tensor")),
    (r"vision_tower/layers/attn/[qkv]/bias$", P(None, "tensor")),
    (r"vision_tower/layers/attn/o/kernel$", P(None, "tensor", "fsdp")),
    (r"vision_tower/layers/mlp/fc1/kernel$", P(None, "fsdp", "tensor")),
    (r"vision_tower/layers/mlp/fc1/bias$", P(None, "tensor")),
    (r"vision_tower/layers/mlp/fc2/kernel$", P(None, "tensor", "fsdp")),
    # --- projector ---
    (r"projector/fc\d+/kernel$", P(None, "fsdp")),
    # everything else (norms, small biases, image_newline): replicated
]

# Bare-LLM variant (params rooted at the Qwen2 tree, no "text/" prefix).
_LLM_RULES: List[Tuple[str, P]] = [
    (re.sub(r"^text/", "", pat), spec) for pat, spec in _RULES if pat.startswith("text/")
]


def path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for(path: str, rules: List[Tuple[str, P]]) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            return spec
    return P()


def param_pspecs(params: Any, *, llm_only: bool = False) -> Any:
    """PartitionSpec pytree matching `params` (RadVLM or bare Qwen2 layout)."""
    rules = _LLM_RULES if llm_only else _RULES
    return jax.tree_util.tree_map_with_path(
        lambda path, _: spec_for(path_str(path), rules), params
    )


def param_shardings(mesh: Mesh, params: Any, *, llm_only: bool = False) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        param_pspecs(params, llm_only=llm_only),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params: Any, *, llm_only: bool = False) -> Any:
    """Place a host/replicated param pytree onto the mesh with the rule shardings."""
    sh = param_shardings(mesh, params, llm_only=llm_only)
    return jax.device_put(params, sh)


# Per-token batch arrays whose second (sequence) dim shards over the seq axis
# when sequence parallelism is on.
_SEQ_KEYS = ("tokens", "img_src", "labels", "labels_next", "segment_ids",
             "positions")


def batch_shardings(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Batch arrays: leading (batch) dim over data+fsdp; [B, L] token arrays also
    shard the sequence dim over `seq` when that axis is >1 (ring attention)."""
    seq_on = dict(mesh.shape).get("seq", 1) > 1

    def spec_for_key(key):
        if seq_on and key in _SEQ_KEYS:
            return P(("data", "fsdp"), "seq")
        return P(("data", "fsdp"))

    return {
        k: jax.tree.map(
            lambda _: NamedSharding(mesh, spec_for_key(k)), v
        )
        for k, v in batch.items()
    }


def kv_cache_pspec() -> P:
    """KV cache [L, B, S, Hkv*D]: batch over data+fsdp, heads over tensor."""
    return P(None, ("data", "fsdp"), None, "tensor")
