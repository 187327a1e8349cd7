"""Tensor-parallel inference context (Megatron layout under shard_map).

The reference serves one model per GPU and evaluates data-parallel
(`model_worker.py`, `evaluate_instructions.py:231-266`); its only multi-GPU
model path is training-time ZeRO. Serving a 7B on a v5e-8 slice wants the
*model* split across chips, so the continuous engine's fill and decode-chunk
graphs run under `jax.shard_map` over a `tensor` mesh axis with the standard
Megatron partition:

- attn q/k/v and mlp gate/up kernels: column-parallel (output dim sharded =
  heads/ffn channels sharded);
- attn o and mlp down kernels: row-parallel (input dim sharded) — their
  matmul outputs are partial sums, reduced with ONE psum per site (this
  module's `maybe_psum`, called from `qwen2._finish_block`), so activations
  are replicated at block boundaries and sharded by heads inside;
- embeddings / lm_head / norms / vision tower / projector: replicated.
  Replicated lm_head + replicated hidden means every shard computes identical
  logits and (with a replicated rng) samples the identical token — the decode
  loop needs no collective beyond the two psums per layer;
- KV cache: sharded over kv heads (the minor [.., Hkv*D] dim of the stacked
  layout; int8-mode scales [.., Hkv, S] shard dim -2). Decode attention is
  embarrassingly parallel over heads, so the Pallas kernels run unchanged on
  local shapes inside shard_map.

Inside the shard_map body the model code sees LOCAL shapes, steered by a
`local_text_cfg` with num_heads/num_kv_heads/intermediate_size divided by the
tp degree — model code derives every shape from cfg + param shapes, so no
other change is needed.

`maybe_psum` reads a module context that `active(axis)` sets DURING TRACING
(the same pattern as `parallel.ring`): the psum is baked into the jaxpr, and
code traced outside any tp context is untouched.
"""

from __future__ import annotations

import contextlib
import dataclasses
import re
from typing import Any, List, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radvlm_tpu.config import Qwen2Config
from radvlm_tpu.parallel.sharding import path_str

# ContextVar, NOT a module global: the serving fleet (serve/fleet.py) traces
# TP fill/decode graphs on its own engine threads concurrently with non-TP
# work (other engines, the main thread) — a plain global set during one
# thread's trace leaked `psum` into traces on every other thread (found live:
# the EP dryrun crashed with "unbound axis name: tensor" after a TP fleet
# ran). Each thread's trace sees only the context IT entered.
_TP_AXIS: "contextvars.ContextVar[Optional[str]]" = None  # set below
import contextvars  # noqa: E402

_TP_AXIS = contextvars.ContextVar("radvlm_tp_axis", default=None)


def context() -> Optional[str]:
    return _TP_AXIS.get()


@contextlib.contextmanager
def active(axis_name: str):
    """Enable TP psums for model code traced inside this block."""
    token = _TP_AXIS.set(axis_name)
    try:
        yield
    finally:
        _TP_AXIS.reset(token)


def maybe_psum(x):
    """All-reduce row-parallel matmul partials when tracing under `active`."""
    axis = _TP_AXIS.get()
    if axis is None:
        return x
    return jax.lax.psum(x, axis)


def local_text_cfg(cfg: Qwen2Config, tp: int) -> Qwen2Config:
    """Per-shard decoder config: heads and ffn width divided by the tp degree."""
    if tp == 1:
        return cfg
    if cfg.num_heads % tp or cfg.num_kv_heads % tp or cfg.intermediate_size % tp:
        raise ValueError(
            f"tp={tp} must divide num_heads={cfg.num_heads}, "
            f"num_kv_heads={cfg.num_kv_heads}, "
            f"intermediate_size={cfg.intermediate_size}"
        )
    if cfg.num_experts:
        raise NotImplementedError(
            "tensor-parallel serving of MoE models is not wired (use the "
            "expert axis for MoE)"
        )
    if cfg.pos_embedding == "alibi":
        # ALiBi slopes are a function of the GLOBAL head index; the per-shard
        # cfg would make every shard compute slopes for heads 0..H/tp-1,
        # silently biasing attention wrong on all shards (MPT is the only
        # ALiBi family and RadVLM never serves it — reject rather than wire
        # per-shard slope offsets).
        raise NotImplementedError(
            "tensor-parallel serving of ALiBi (MPT) models is not wired: "
            "per-head slopes depend on global head indices"
        )
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp,
    )


# (leaf-path regex, spec) — first match wins; default replicated. Paths include
# quantized-node keys (`.../kernel/__q__`, `.../kernel/__scale__`).
_COL = r"text/layers/(attn/[qkv]|mlp/(gate|up))/kernel"
_ROW = r"text/layers/(attn/o|mlp/down)/kernel"


def _leaf_spec(p: str, axis: str) -> P:
    if re.search(_COL + r"(/__q__)?$", p):
        return P(None, None, axis)  # [L, D, F] output-dim sharded
    if re.search(_COL + r"/__scale__$", p):
        return P(None, None, axis)  # [L, 1, F] per-output-channel
    if re.search(r"text/layers/attn/[qkv]/bias$", p):
        return P(None, axis)  # [L, F]
    if re.search(_ROW + r"(/__q__)?$", p):
        return P(None, axis, None)  # [L, F, D] input-dim sharded
    # row-parallel __scale__ is per OUTPUT channel [L, 1, D]: replicated
    return P()


def tp_param_pspecs(params: Any, axis: str = "tensor") -> Any:
    """PartitionSpec pytree for inference TP. Requires the UNFUSED layout
    (fused qkv/gateup concatenate across the very dim being sharded with a
    per-shard-incompatible order) and int8-or-dense kernels."""
    attn = params["text"]["layers"]["attn"]
    if "qkv" in attn:
        raise ValueError(
            "tensor-parallel sharding requires unfused params (q/k/v "
            "separate); skip fuse_for_inference under TP"
        )
    mlp = params["text"]["layers"]["mlp"]
    if "moe" in mlp:
        raise NotImplementedError("TP over MoE layers is not wired")

    def visit(path, leaf):
        p = path_str(path)
        if "__q4__" in p:
            raise NotImplementedError(
                "int4-packed kernels are not TP-shardable (nibble packing "
                "spans the sharded dim); use int8 or bf16 under TP"
            )
        return _leaf_spec(p, axis)

    return jax.tree_util.tree_map_with_path(visit, params)


def shard_params_tp(mesh: Mesh, params: Any, axis: str = "tensor") -> Any:
    """Place params onto the mesh with the inference-TP layout."""
    specs = tp_param_pspecs(params, axis)
    sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, sh)


def cache_pspecs(n_components: int, axis: str = "tensor") -> Tuple[P, ...]:
    """Specs for the stacked KV cache tuple: k/v [L, B, S, Hkv*D] shard the
    head-folded minor dim; int8-mode scales [L, B, Hkv, S] shard dim -2."""
    kv = P(None, None, None, axis)
    if n_components == 2:
        return (kv, kv)
    return (kv, kv, P(None, None, axis, None), P(None, None, axis, None))
