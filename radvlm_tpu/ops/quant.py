"""Weight-only int8 quantization (TPU-native replacement for bitsandbytes).

The reference loads 4/8-bit weights via bitsandbytes CUDA kernels
(`finetuning/llava/train/train.py:1466-1484`, `model/builder.py:30-34`). Here
quantization is a pytree transformation: selected kernels become
{"__q__": int8, "__scale__": f32} nodes with per-output-channel symmetric
scales, and `maybe_dequant` rebuilds bf16 weights *inside* the per-layer scan
body — so HBM streams int8 (half the bytes of bf16, the decode bottleneck) and
only one layer's weights ever exist dequantized.

This halves 7B weight residency (15.2 GB -> 7.6 GB), fitting a single v5e chip
with the KV cache.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Q_KEY = "__q__"
SCALE_KEY = "__scale__"
# LoRA augmentation keys (QLoRA: adapters attached to a quantized frozen
# base, `training/lora.py:merge_lora`): the B factor arrives pre-scaled by
# alpha/rank, so qmm adds (x @ A) @ B on top of the quantized matmul.
LORA_A = "__lora_a__"
LORA_B = "__lora_b__"

# Training-mode flag (set while TRACING a train step): quantized-base matmuls
# take the dequant-then-matmul path instead of W8A8/Pallas kernels — the
# activation-quant `round` has zero gradient and the Pallas kernels have no
# VJP, either of which would silently kill backprop through the frozen base
# (the QLoRA forward must stay differentiable w.r.t. activations).
_TRAINING = False


def training_mode():
    """Context manager enabling differentiable quantized matmuls."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        global _TRAINING
        prev = _TRAINING
        _TRAINING = True
        try:
            yield
        finally:
            _TRAINING = prev

    return _cm()

# Kernels worth quantizing (the big matmuls + embedding); norms/bias stay bf16.
DEFAULT_PATTERNS = (
    r"text/layers/attn/[qkvo]/kernel$",
    r"text/layers/mlp/(gate|up|down)/kernel$",
    r"text/lm_head/kernel$",
    r"text/embed/embedding$",
    r"vision_tower/layers/attn/[qkvo]/kernel$",
    r"vision_tower/layers/mlp/fc[12]/kernel$",
)


def quantize_array(
    x: jnp.ndarray, *, reduce_axes: Tuple[int, ...] = (-2,)
) -> Dict[str, Any]:
    """Symmetric int8 with scale = max|x|/127 reduced over `reduce_axes` only
    (keepdims). Kernels [..., in, out] reduce over the contraction axis (-2,)
    -> per-(layer, out-channel) scales; embeddings [V, D] reduce over (-1,)
    -> per-row scales. Leading (stacked-layer) axes are always preserved so
    quantized pytrees still scan."""
    xf = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return {Q_KEY: q, SCALE_KEY: scale.astype(jnp.float32)}


def dequantize_array(node: Dict[str, Any], dtype=jnp.bfloat16) -> jnp.ndarray:
    return (node[Q_KEY].astype(jnp.float32) * node[SCALE_KEY]).astype(dtype)


def is_qnode(x: Any) -> bool:
    return isinstance(x, dict) and Q_KEY in x


def quantize_params(
    params: Any,
    *,
    patterns: Tuple[str, ...] = DEFAULT_PATTERNS,
    embed_pattern: str = r"embed/embedding$",
    bits: int = 8,
) -> Any:
    """Quantize matching kernels. Embeddings ([V, D]) use per-row scales
    (channel_axis=0); matmul kernels ([..., in, out]) per-output-column.

    bits=4 (the reference's bitsandbytes load_4bit analog, W4A16): layer
    matmul kernels become nibble-packed int4 nodes with group-128 scales
    (`ops/int4_matmul.py`); embeddings and the lm_head stay int8 (precision-
    critical, and their access pattern isn't the decode weight stream)."""
    from radvlm_tpu.parallel.sharding import path_str

    def visit(path, leaf):
        p = path_str(path)
        if not any(re.search(pat, p) for pat in patterns):
            return leaf
        is_embed = bool(re.search(embed_pattern, p))
        if bits == 4 and not is_embed and not p.endswith("lm_head/kernel"):
            d = leaf.shape[-2]
            from radvlm_tpu.ops.int4_matmul import GROUP, quantize_array_int4

            if d % GROUP == 0:
                return quantize_array_int4(leaf)
        axes = (-1,) if is_embed else (-2,)
        return quantize_array(leaf, reduce_axes=axes)

    return jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape")
    )


def maybe_dequant(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Rebuild dense weights for every quantized node in `tree` (call at the top
    of a per-layer block so only that layer materializes)."""
    from radvlm_tpu.ops.int4_matmul import dequantize_array_int4, is_q4node

    if isinstance(tree, dict) and LORA_A in tree:
        base = {k: v for k, v in tree.items() if k not in (LORA_A, LORA_B)}
        dense = maybe_dequant(base, jnp.float32)
        return (dense + tree[LORA_A] @ tree[LORA_B]).astype(dtype)
    if is_q4node(tree):
        return dequantize_array_int4(tree, dtype)
    if is_qnode(tree):
        return dequantize_array(tree, dtype)
    if isinstance(tree, dict):
        return {k: maybe_dequant(v, dtype) for k, v in tree.items()}
    return tree


def quantized_bytes(params: Any) -> int:
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total


def w8a8_enabled() -> bool:
    """W8A8 prefill: ON by default when weights are already int8 (the
    quantized serving configuration). RADVLM_W8A8=0 opts back into
    weight-only (activations stay bf16, dequant-once matmul)."""
    import os

    return os.environ.get("RADVLM_W8A8", "1") != "0"


def w8a8_impl_name() -> str:
    """Resolved W8A8 emitter name ("xla"/"pallas"/"fused") for telemetry —
    the same env + backend resolution `w8a8_matmul` applies, shared so
    `kernel_provenance` cannot drift from the dispatch. (Per-site shape
    alignment can still fall a pallas/fused site back to the XLA emitter;
    that is a per-matmul decision, not an engine-level one.)"""
    import os

    if jax.default_backend() != "tpu":
        return "xla"
    return os.environ.get("RADVLM_W8A8_IMPL", "xla")


def w8a8_matmul(x: jnp.ndarray, node: Dict[str, Any]) -> jnp.ndarray:
    """x @ dequant(node) computed as int8 x int8 on the MXU with dynamic
    per-token activation quantization.

    The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS peak; the
    s8xs8 dot measures 235 TF/s on the 7B gateup shape vs 149 for bf16 —
    device-side scan-loop microbench, full-output consumption). Per-token
    symmetric scales bound the activation quantization error the same way
    SmoothQuant-style W8A8 serving stacks do; weight scales are the node's
    per-output-channel scales.

    RADVLM_W8A8_IMPL picks the emitter: `xla` (default) is the s8xs8 dot
    emitter below; `pallas` the explicit-tiling kernel over pre-quantized
    activations (both pay the XLA quantize pre-pass); `fused` the Pallas
    kernel that quantizes x row-tiles in VMEM inside the matmul
    (`ops/w8a8_matmul.w8a8_matmul_fused`). `fused` was the TPU default in
    round 3 and caused a 37% e2e serving regression measured on v5e
    (1.24 vs 1.98 img/s/chip at the flagship 7B bench, 2026-08-19): its
    resident-row-tile layout caps bm at ~64 rows for the D=18944 down
    projection (VMEM budget), so the full int8 weight re-streams from HBM
    m/bm (~54) times per matmul site — the quantize round-trip it saves is
    ~2 orders of magnitude smaller than the weight traffic it adds. It
    stays available as an opt-in for narrow-D shapes only.

    Equivalent role to the reference's bitsandbytes int8 inference path
    (`model/builder.py:30-34`), but on the prefill hot loop."""
    import os

    q, ws = node[Q_KEY], node[SCALE_KEY]  # [D, F] int8, [1, F] f32
    impl = os.environ.get("RADVLM_W8A8_IMPL", "xla")
    tpu_aligned = (
        jax.default_backend() == "tpu"
        and q.shape[0] % 128 == 0
        and q.shape[1] % 128 == 0
    )
    if impl == "fused" and tpu_aligned:
        from radvlm_tpu.ops.w8a8_matmul import w8a8_matmul_fused

        return w8a8_matmul_fused(x, q, ws, out_dtype=x.dtype)
    from radvlm_tpu.ops.w8a8_matmul import quantize_rows

    # Shared with the Pallas kernels (incl. the bit-stable *1/127 scale —
    # see w8a8_matmul._INV127) so every impl quantizes identically.
    xq, xs = quantize_rows(x)
    if impl == "pallas" and tpu_aligned:
        from radvlm_tpu.ops.w8a8_matmul import w8a8_matmul_pallas

        return w8a8_matmul_pallas(xq, xs, q, ws, out_dtype=x.dtype)
    acc = jax.lax.dot_general(
        xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * ws.reshape(-1)).astype(x.dtype)


def qmm(x: jnp.ndarray, w: Any, *, w8a8: Optional[bool] = None) -> jnp.ndarray:
    """x @ w where w is a dense kernel OR a quantized node.

    Quantized nodes dispatch to the Pallas int8 matmul for small row counts
    (decode: weights stream as int8, dequant in VMEM); large row counts
    (prefill) use int8 x int8 on the MXU with dynamic per-token activation
    scales (`w8a8_matmul`, default) or a one-shot dequant + bf16 matmul
    (RADVLM_W8A8=0, or w8a8=False at precision-critical call sites)."""
    from radvlm_tpu.ops.int4_matmul import is_q4node, q4node_matmul

    if isinstance(w, dict) and LORA_A in w:
        # QLoRA node: quantized base + low-rank delta (B pre-scaled).
        base = {k: v for k, v in w.items() if k not in (LORA_A, LORA_B)}
        out = qmm(x, base, w8a8=w8a8)
        return out + ((x @ w[LORA_A]) @ w[LORA_B]).astype(out.dtype)
    if is_q4node(w):  # W4A16: dequant-once (decode uses the stacked kernel)
        if _TRAINING:
            return x @ maybe_dequant(w, x.dtype)
        return q4node_matmul(x, w)
    if is_qnode(w):
        if _TRAINING:
            return x @ maybe_dequant(w, x.dtype)
        from radvlm_tpu.ops.int8_matmul import _rows, qnode_matmul

        use_w8a8 = w8a8_enabled() if w8a8 is None else w8a8
        if use_w8a8 and w[Q_KEY].ndim == 2 and _rows(x) > 64:
            return w8a8_matmul(x, w)
        return qnode_matmul(x, w)
    return x @ w


def qmm_idx(x: jnp.ndarray, w: Any, layer_idx) -> jnp.ndarray:
    """x @ w[layer_idx] where w is a STACKED [L, ...] dense kernel or qnode.

    The decode layer scan closes over the full stacked weights and calls this
    with the per-step layer index: quantized nodes hit the Pallas stacked-int8
    kernel (scalar-prefetched index, no slice materialization); dense kernels
    fall back to dynamic_index + MXU matmul (what scan-over-xs would do)."""
    from radvlm_tpu.ops.int4_matmul import is_q4node, q4node_matmul_stacked

    if isinstance(w, dict) and LORA_A in w:
        base = {k: v for k, v in w.items() if k not in (LORA_A, LORA_B)}
        a = jax.lax.dynamic_index_in_dim(w[LORA_A], layer_idx, 0, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(w[LORA_B], layer_idx, 0, keepdims=False)
        out = qmm_idx(x, base, layer_idx)
        return out + ((x @ a) @ b).astype(out.dtype)
    if is_q4node(w):
        return q4node_matmul_stacked(x, w, layer_idx)
    if is_qnode(w):
        from radvlm_tpu.ops.int8_matmul import qnode_matmul_stacked

        return qnode_matmul_stacked(x, w, layer_idx)
    return x @ jax.lax.dynamic_index_in_dim(w, layer_idx, 0, keepdims=False)
