"""Vision-token resamplers (reduce tokens-per-tile before the projector).

Rebuild of the reference's FULL resampler family (`finetuning/llava/model/
multimodal_resampler/builder.py:21-33`): identity (RadVLM flagship),
spatial_pool (the LLaVA family's deployed token reduction), perceiver
(Flamingo-style learned-latent cross-attention, `perceiver.py:30-127`),
masked_drop (training-time random token dropping, `masked_drop.py`), and
qformer (BLIP-2 query transformer, `qformer.py:1102-1160` — parity-tested
against the vendored torch module, tests/test_qformer_parity.py).

Sits between the vision tower and the projector (`llava_arch.py:192-196`
encode_images order: tower -> vision_resampler -> mm_projector). Non-spatial
kinds (perceiver) are incompatible with anyres merging — enforced at config
construction (`config.RadVLMConfig.__post_init__`).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from radvlm_tpu.config import ResamplerConfig

__all__ = ["ResamplerConfig", "init_params", "output_tokens", "forward"]

Params = Dict[str, Any]


def _dense(key, shape, scale=0.02):
    return jax.random.normal(key, shape, jnp.float32) * scale


def output_dim(cfg: ResamplerConfig, dim: int) -> int:
    """Feature width AFTER resampling (what the projector consumes): the
    qformer re-embeds into its bert-base hidden size (`qformer.py:1149-1151`
    hidden_size property = 768); every other kind preserves the tower width."""
    return cfg.qformer_hidden if cfg.kind == "qformer" else dim


def init_params(
    cfg: ResamplerConfig, dim: int, key: jax.Array, dtype=jnp.float32
) -> Params:
    """dim = vision tower feature width (perceiver operates at tower width,
    reference `perceiver.py:139`)."""
    if cfg.kind == "qformer":
        return _qformer_init(cfg, dim, key, dtype)
    if cfg.kind != "perceiver":
        return {}  # identity / spatial_pool / masked_drop are parameter-free
    L = cfg.depth
    inner = cfg.num_heads * cfg.head_dim
    keys = jax.random.split(key, 8)

    def stack(shape, k):
        return _dense(k, (L,) + shape).astype(dtype)

    return {
        "latents": jax.random.normal(keys[0], (cfg.num_latents, dim), jnp.float32).astype(dtype),
        "layers": {
            # PerceiverAttention: separate media/latent input norms, q from
            # latents, kv from concat(media, latents), all bias-free.
            "norm_media": {"scale": jnp.ones((L, dim), dtype), "bias": jnp.zeros((L, dim), dtype)},
            "norm_latents": {"scale": jnp.ones((L, dim), dtype), "bias": jnp.zeros((L, dim), dtype)},
            "to_q": stack((dim, inner), keys[1]),
            "to_kv": stack((dim, 2 * inner), keys[2]),
            "to_out": stack((inner, dim), keys[3]),
            # FF: LN -> Linear(dim, dim*ff_mult) -> GELU -> Linear back (bias-free)
            "ff_norm": {"scale": jnp.ones((L, dim), dtype), "bias": jnp.zeros((L, dim), dtype)},
            "ff1": stack((dim, cfg.ff_mult * dim), keys[4]),
            "ff2": stack((cfg.ff_mult * dim, dim), keys[5]),
        },
        "norm": {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)},
    }


def output_tokens(cfg: ResamplerConfig, tokens_per_tile: int) -> int:
    if cfg.kind in ("identity", "masked_drop"):
        # masked_drop keeps the full grid at inference (drop is train-time only)
        return tokens_per_tile
    if cfg.kind in ("perceiver", "qformer"):
        return cfg.num_latents
    side = int(math.isqrt(tokens_per_tile))
    return (side // cfg.stride) * (side // cfg.stride)


def _qformer_init(cfg: ResamplerConfig, dim: int, key, dtype) -> Params:
    """BLIP-2 query transformer (`qformer.py:1102-1133` build_Qformer):
    ln_vision over the tower features, learned query tokens, a bert-base
    stack whose text path is surgically removed (word/position embeddings and
    the text FFN are None'd) — self-attention over queries, cross-attention
    to the image features every `cfg.depth` layers, query FFN
    (intermediate_query/output_query), post-LN throughout."""
    h, inter, L = cfg.qformer_hidden, cfg.qformer_intermediate, cfg.qformer_layers
    # 6 lins/layer + 4 more per cross layer (every cfg.depth-th) + queries
    n_keys = 6 * L + 4 * (1 + (L - 1) // cfg.depth) + 1
    keys = iter(jax.random.split(key, n_keys))

    def lin(shape):
        return {"kernel": _dense(next(keys), shape).astype(dtype),
                "bias": jnp.zeros((shape[-1],), dtype)}

    def ln(width):
        return {"scale": jnp.ones((width,), dtype),
                "bias": jnp.zeros((width,), dtype)}

    layers = []
    for i in range(L):
        layer: Params = {
            "self": {"q": lin((h, h)), "k": lin((h, h)), "v": lin((h, h)),
                     "out": lin((h, h)), "ln": ln(h)},
            "ffn": {"up": lin((h, inter)), "down": lin((inter, h)),
                    "ln": ln(h)},
        }
        if i % cfg.depth == 0:  # cross_attention_freq (`qformer.py:343`)
            layer["cross"] = {"q": lin((h, h)), "k": lin((dim, h)),
                              "v": lin((dim, h)), "out": lin((h, h)),
                              "ln": ln(h)}
        layers.append(layer)
    return {
        "ln_vision": ln(dim),
        "query_tokens": _dense(next(keys), (cfg.num_latents, h)).astype(dtype),
        "emb_ln": ln(h),  # BertEmbeddings.LayerNorm on the query path
        "layers": layers,
    }


def _qformer_forward(params: Params, cfg: ResamplerConfig, feats: jnp.ndarray):
    """feats [N, T, D] -> [N, num_latents, qformer_hidden]. Masks are all-ones
    in the reference call (`qformer.py:1136-1145`), i.e. no-ops."""
    from radvlm_tpu.ops.attention import layer_norm

    eps = cfg.qformer_eps
    n = feats.shape[0]
    h, heads = cfg.qformer_hidden, cfg.qformer_heads
    hd = h // heads
    scale = hd ** -0.5

    def bert_attn(block, q_in, kv_in):
        q = (q_in @ block["q"]["kernel"] + block["q"]["bias"]).reshape(
            n, -1, heads, hd)
        k = (kv_in @ block["k"]["kernel"] + block["k"]["bias"]).reshape(
            n, -1, heads, hd)
        v = (kv_in @ block["v"]["kernel"] + block["v"]["bias"]).reshape(
            n, -1, heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            q_in.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(n, -1, h)
        # BertSelfOutput: dense -> residual add -> LayerNorm (post-LN)
        out = ctx @ block["out"]["kernel"] + block["out"]["bias"]
        return layer_norm(out + q_in, block["ln"]["scale"],
                          block["ln"]["bias"], eps)

    # ln_vision is a plain nn.LayerNorm (default eps 1e-5, `qformer.py:1133`),
    # unlike the bert-internal norms which use config.layer_norm_eps (1e-12).
    x = layer_norm(feats, params["ln_vision"]["scale"],
                   params["ln_vision"]["bias"], 1e-5)
    q = jnp.broadcast_to(
        params["query_tokens"][None], (n, cfg.num_latents, h)
    ).astype(feats.dtype)
    q = layer_norm(q, params["emb_ln"]["scale"], params["emb_ln"]["bias"], eps)
    for layer in params["layers"]:
        q = bert_attn(layer["self"], q, q)
        if "cross" in layer:
            q = bert_attn(layer["cross"], q, x)
        f = layer["ffn"]
        y = jax.nn.gelu(q @ f["up"]["kernel"] + f["up"]["bias"],
                        approximate=False)
        y = y @ f["down"]["kernel"] + f["down"]["bias"]
        q = layer_norm(y + q, f["ln"]["scale"], f["ln"]["bias"], eps)
    return q


def _perceiver_forward(params: Params, cfg: ResamplerConfig, feats: jnp.ndarray):
    from radvlm_tpu.ops.attention import layer_norm

    n, t, d = feats.shape
    h, hd = cfg.num_heads, cfg.head_dim
    scale = hd ** -0.5
    latents = jnp.broadcast_to(
        params["latents"][None], (n, cfg.num_latents, d)
    ).astype(feats.dtype)

    def body(latents, lp):
        x = layer_norm(feats, lp["norm_media"]["scale"], lp["norm_media"]["bias"], 1e-5)
        lat = layer_norm(latents, lp["norm_latents"]["scale"], lp["norm_latents"]["bias"], 1e-5)
        q = (lat @ lp["to_q"]).reshape(n, -1, h, hd)
        kv_in = jnp.concatenate([x, lat], axis=1)
        kv = kv_in @ lp["to_kv"]
        k, v = jnp.split(kv, 2, axis=-1)
        k = k.reshape(n, -1, h, hd)
        v = v.reshape(n, -1, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(n, -1, h * hd)
        latents = latents + out @ lp["to_out"]
        y = layer_norm(latents, lp["ff_norm"]["scale"], lp["ff_norm"]["bias"], 1e-5)
        y = jax.nn.gelu(y @ lp["ff1"], approximate=True) @ lp["ff2"]
        return latents + y, None

    latents, _ = jax.lax.scan(body, latents, params["layers"])
    return layer_norm(latents, params["norm"]["scale"], params["norm"]["bias"], 1e-5)


def forward(
    params: Params,
    cfg: ResamplerConfig,
    feats: jnp.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    training: bool = False,
) -> jnp.ndarray:
    """feats: [N, T, D] per-tile vision features (T a square grid for the
    spatial kinds). masked_drop needs `rng` when training."""
    if cfg.kind == "identity":
        return feats
    if cfg.kind == "perceiver":
        return _perceiver_forward(params, cfg, feats)
    if cfg.kind == "qformer":
        return _qformer_forward(params, cfg, feats)
    if cfg.kind == "masked_drop":
        if not training or rng is None:
            return feats
        # Static-shape adaptation of the reference's masked_drop (which
        # REMOVES a random token subset — incompatible with the precomputed
        # anyres merge plans): zero a random drop_ratio subset per tile
        # instead. Same regularization role, shapes unchanged.
        n, t, _ = feats.shape
        keep_mask = jax.random.uniform(rng, (n, t)) >= cfg.drop_ratio
        return feats * keep_mask[..., None].astype(feats.dtype)
    if cfg.kind != "spatial_pool":
        raise NotImplementedError(f"resampler {cfg.kind!r} not implemented")
    n, t, d = feats.shape
    side = int(math.isqrt(t))
    assert side * side == t, f"spatial_pool needs a square grid, got {t}"
    s = cfg.stride
    out = side // s
    # reshape the FULL grid, then crop rows/cols that don't fill a stride
    # (pre-slicing the flat tokens broke the reshape whenever side % s != 0,
    # e.g. the flagship 27x27 grid with stride 2 — code-review finding).
    x = feats.reshape(n, side, side, d)
    x = x[:, : out * s, : out * s].reshape(n, out, s, out, s, d)
    if cfg.mode == "average":
        return x.mean(axis=(2, 4)).reshape(n, out * out, d)
    return x.max(axis=(2, 4)).reshape(n, out * out, d)
