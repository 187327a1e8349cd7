"""RadVLM model: SigLIP tower + projector + Qwen2, fused the TPU way.

Rebuild of the reference fusion core (`finetuning/llava/model/llava_arch.py`):
`prepare_inputs_labels_for_multimodal` (`llava_arch.py:251-555`) does per-sample
Python-loop embedding splicing at -200 sentinels with dynamic shapes. Here the same
semantics are compiled to static-shape XLA:

1. every tile in the batch runs through the vision tower + projector in ONE batched
   call (MXU-friendly, no per-image loop)  — `encode_tiles`;
2. the per-image anyres merge (unpad/newline/token-cap, `llava_arch.py:350-406`) is a
   precomputed sparse gather (`models/anyres.py`) applied per-sample — `merge`;
3. the embedding splice at image positions (`llava_arch.py:449-531`) is a
   `jnp.where` over a host-precomputed index map (`img_src`), not a scatter loop.

All host-side preparation lives in `models/multimodal.py`; everything in this module
is jit-compatible.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from radvlm_tpu.config import IGNORE_INDEX, RadVLMConfig
from radvlm_tpu.models import projector as projector_lib
from radvlm_tpu.models import qwen2, towers
from radvlm_tpu.models.anyres import apply_merge

Params = Dict[str, Any]


def init_params(cfg: RadVLMConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    from radvlm_tpu.models import resampler as resampler_lib

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "vision_tower": towers.init_params(cfg.vision, k1, dtype),
        # The projector consumes the post-resampler width (the qformer
        # re-embeds into its bert hidden size; every other kind preserves
        # the tower width).
        "projector": projector_lib.init_params(
            cfg.projector,
            resampler_lib.output_dim(
                cfg.resampler, towers.feature_size(cfg.vision)
            ),
            cfg.text.hidden_size,
            k2, dtype
        ),
        "text": qwen2.init_params(cfg.text, k3, dtype),
        "image_newline": (
            jax.random.normal(k4, (cfg.text.hidden_size,), jnp.float32)
            / (cfg.text.hidden_size ** 0.5)
        ).astype(dtype),
    }
    res = resampler_lib.init_params(
        cfg.resampler, towers.feature_size(cfg.vision), k5, dtype
    )
    if res:
        params["resampler"] = res
    return params


def fuse_for_inference(params: Params, cfg: Optional[RadVLMConfig] = None) -> Params:
    """Fuse the text decoder's q/k/v and gate/up projections for generation
    (see `qwen2.fuse_projections`). Call once after loading weights; training,
    checkpoints, and HF export keep the unfused layout.

    With `cfg`, the SigLIP tower's q/k/v fuse too (26 layers x 3 DxD launches
    per image fill otherwise). The cfg gate exists because CLIP/EVA share the
    same param tree shape but their forwards read the unfused layout."""
    out = dict(params)
    out["text"] = qwen2.fuse_projections(params["text"])
    vt = params.get("vision_tower")
    if (
        vt is not None
        and cfg is not None
        and towers.kind(cfg.vision) == "siglip"
        and "q" in vt.get("layers", {}).get("attn", {})
    ):
        from radvlm_tpu.models import siglip as _siglip

        out["vision_tower"] = _siglip.fuse_projections(vt)
    return out


def encode_tiles(
    params: Params,
    cfg: RadVLMConfig,
    tiles: jnp.ndarray,
    *,
    remat: bool = False,
    attn_impl: str = "auto",
    resampler_rng=None,
) -> jnp.ndarray:
    """[N, ts, ts, 3] -> [N, 729, D_text]: vision tower + projector, one batch.

    Equivalent of `encode_images` (`llava_arch.py:192-196`). Accepts uint8 tiles
    (normalized on device — keeps host->HBM traffic 4x smaller) or pre-normalized
    float tiles.
    """
    from radvlm_tpu.ops.image_ops import normalize_tiles_device

    from radvlm_tpu.models import resampler as resampler_lib

    mean, std = towers.mean_std(cfg.vision)
    tiles = normalize_tiles_device(tiles, mean=mean, std=std)
    # Tower compute dtype follows the parameters: serving params are bf16
    # (int8 qnodes keep f32 scales), training/parity params are f32. Pixels
    # normalize in f32 for accuracy, then cast ONCE here — without this,
    # f32 pixels silently promote every tower activation (attention
    # included) to f32 for all 26 layers: half MXU rate, double VMEM
    # (measured as a 16.29M scoped-vmem OOM in the fill bench).
    if tiles.dtype == jnp.float32 and any(
        getattr(l, "dtype", None) == jnp.bfloat16
        for l in jax.tree_util.tree_leaves(params["vision_tower"])
    ):
        tiles = tiles.astype(jnp.bfloat16)
    feats = towers.forward(
        params["vision_tower"], cfg.vision, tiles, remat=remat, attn_impl=attn_impl
    )
    feats = resampler_lib.forward(
        params.get("resampler", {}), cfg.resampler, feats,
        rng=resampler_rng, training=resampler_rng is not None,
    )
    return projector_lib.forward(params["projector"], cfg.projector, feats)


def merge_image_features(
    params: Params,
    tile_feats: jnp.ndarray,
    merge_indices: jnp.ndarray,
    merge_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Per-sample anyres merge. tile_feats: [B, T, tpt, D]; merge_*: [B, N, 4].
    Returns [B, N, D] merged image-token embeddings."""
    newline = params["image_newline"]
    return jax.vmap(lambda f, i, w: apply_merge(f, newline, i, w))(
        tile_feats, merge_indices, merge_weights
    )


def splice_embeds(
    params: Params,
    tokens: jnp.ndarray,
    img_src: jnp.ndarray,
    merged: jnp.ndarray,
    cfg: Optional[RadVLMConfig] = None,
) -> jnp.ndarray:
    """Text embedding + image-token substitution.

    tokens: [B, L] (image positions hold 0); img_src: [B, L] (-1 for text, else row
    into `merged`); merged: [B, N, D]. Static-shape equivalent of the reference's
    per-sample splice at IMAGE_TOKEN_INDEX (`llava_arch.py:449-493`).
    """
    text_emb = qwen2.embed_tokens(
        params["text"], tokens, cfg.text if cfg is not None else None
    )
    if cfg is not None and cfg.text.embed_normalizer:
        # Gemma scales the WHOLE inputs_embeds (text + spliced projector
        # features) by sqrt(hidden_size) inside the decoder — HF GemmaModel
        # applies it after the multimodal merge, so image features must get
        # the same factor the text embeddings received in embed_tokens.
        merged = merged * jnp.asarray(
            cfg.text.hidden_size ** 0.5, text_emb.dtype
        )
    safe = jnp.clip(img_src, 0, merged.shape[1] - 1)
    img_emb = jnp.take_along_axis(merged, safe[..., None], axis=1)
    return jnp.where((img_src >= 0)[..., None], img_emb.astype(text_emb.dtype), text_emb)


def forward(
    params: Params,
    cfg: RadVLMConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    remat: bool = False,
    attn_impl: str = "auto",
    kv_cache=None,
    cache_index=None,
    cache_segment_ids=None,
    return_hidden: bool = False,
    collect_kv: bool = False,
    return_aux: bool = False,
    resampler_rng=None,
):
    """Full multimodal forward.

    batch keys: tiles [B,T,ts,ts,3], merge_indices/weights [B,N,4], tokens [B,L],
    img_src [B,L], positions [B,L], segment_ids [B,L].
    Returns (logits [B,L,V], kv_cache'); with return_aux (MoE training) also
    the router load-balancing loss.
    """
    b, t = batch["tiles"].shape[:2]
    flat_tiles = batch["tiles"].reshape((b * t,) + batch["tiles"].shape[2:])
    tile_feats = encode_tiles(
        params, cfg, flat_tiles, remat=remat, attn_impl=attn_impl,
        resampler_rng=resampler_rng,
    ).reshape(b, t, cfg.tokens_per_tile, -1)
    merged = merge_image_features(
        params, tile_feats, batch["merge_indices"], batch["merge_weights"]
    )
    embeds = splice_embeds(params, batch["tokens"], batch["img_src"], merged, cfg)
    return qwen2.forward(
        params["text"],
        cfg.text,
        input_embeds=embeds,
        positions=batch["positions"],
        segment_ids=batch["segment_ids"],
        kv_cache=kv_cache,
        cache_index=cache_index,
        cache_segment_ids=cache_segment_ids,
        attn_impl=attn_impl,
        remat=remat,
        return_hidden=return_hidden,
        collect_kv=collect_kv,
        return_aux=return_aux,
    )


def _chunked_ce(
    params: Params,
    cfg: RadVLMConfig,
    hidden: jnp.ndarray,  # [B, L, D] pre-unembed hidden states
    safe_labels: jnp.ndarray,  # [B, L] int, 0 where unsupervised
    mask: jnp.ndarray,  # [B, L] bool
    chunk: int = 1024,
) -> jnp.ndarray:
    """Summed token NLL with the unembed + log_softmax computed in sequence
    CHUNKS under jax.checkpoint, so the full [B, L, vocab] logits tensor
    never materializes.

    At the 7B/0.5B geometry (L=4096, V=152k) whole-sequence f32 logits are
    2.3 GB and XLA keeps fwd + remat + grad copies live simultaneously —
    measured 18.0 GB HBM (OOM on a 16 GB v5e) for the 0.5B SFT step, of
    which ~5.8 GB was logits temps. Chunked, the live set is one
    [B, chunk, V] block (~311 MB at chunk=1024), recomputed in the backward
    pass; the extra lm_head recompute is ~1 TFLOP against a ~50 TFLOP step.
    Numerics are identical (same f32 log_softmax per position)."""
    b, l, d = hidden.shape
    if l <= chunk:  # tiny configs (tests) and short buckets: one block
        logits = qwen2.unembed(params["text"], cfg.text, hidden)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * mask)
    pad = -l % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        safe_labels = jnp.pad(safe_labels, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    n = (l + pad) // chunk
    hidden = hidden.reshape(b, n, chunk, d).swapaxes(0, 1)
    safe_labels = safe_labels.reshape(b, n, chunk).swapaxes(0, 1)
    mask = mask.reshape(b, n, chunk).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_nll(h, lbl, m):
        logits = qwen2.unembed(params["text"], cfg.text, h)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, lbl[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * m)

    def body(carry, xs):
        h, lbl, m = xs
        return carry + chunk_nll(h, lbl, m), None

    total, _ = jax.lax.scan(
        body, jnp.float32(0.0), (hidden, safe_labels, mask)
    )
    return total


def loss_fn(
    params: Params,
    cfg: RadVLMConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    remat: bool = True,
    attn_impl: str = "auto",
    rng=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Next-token cross entropy with IGNORE_INDEX masking (train.py supervised
    masking contract; labels already shifted-compatible: labels[i] supervises
    logits[i-1] as in HF causal LM).

    Batches carrying "labels_next" instead of "labels" are PRE-SHIFTED on the
    host (labels_next[i] supervises logits[i]) — the zigzag sequence-parallel
    layout permutes positions, so the shift must happen before permutation
    (`parallel/ring.zigzag_shift_batch`); the loss is then positionwise.

    MoE configs add router_aux_coef x the load-balancing loss (HF
    `load_balancing_loss_func` role)."""
    moe_aux = bool(cfg.text.num_experts) and cfg.text.router_aux_coef > 0
    if moe_aux:
        hidden, _, aux = forward(
            params, cfg, batch, remat=remat, attn_impl=attn_impl,
            return_aux=True, return_hidden=True, resampler_rng=rng,
        )
    else:
        hidden, _ = forward(
            params, cfg, batch, remat=remat, attn_impl=attn_impl,
            return_hidden=True, resampler_rng=rng,
        )
    if "labels_next" in batch:
        shift_hidden = hidden
        shift_labels = batch["labels_next"]
        mask = shift_labels != IGNORE_INDEX  # segment gating pre-folded
    else:
        labels = batch["labels"]  # [B, L], IGNORE_INDEX where unsupervised
        shift_hidden = hidden[:, :-1]
        shift_labels = labels[:, 1:]
        mask = (shift_labels != IGNORE_INDEX) & (batch["segment_ids"][:, 1:] != 0)
    safe_labels = jnp.where(mask, shift_labels, 0)
    total = _chunked_ce(params, cfg, shift_hidden, safe_labels, mask)
    count = jnp.maximum(jnp.sum(mask), 1)
    loss = total / count
    metrics = {"loss": loss, "tokens": count}
    if moe_aux:
        loss = loss + cfg.text.router_aux_coef * aux
        metrics["moe_aux"] = aux
        metrics["loss"] = loss
    return loss, metrics
