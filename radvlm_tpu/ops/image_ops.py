"""Image preprocessing: anyres tiling + SigLIP normalization.

Rebuild of the reference's PIL pipeline (`mm_utils.py:243-293` process_anyres_image,
`siglip_encoder.py:34-67` SigLipImageProcessor: bicubic resize to 384x384, rescale
1/255, mean/std 0.5) with two interchangeable paths:

- **host path** (`preprocess_anyres_host`): PIL bicubic, bit-faithful to the
  reference/HF processor. Used by the data loader for training parity and as the
  golden reference in tests.
- **device path** (`preprocess_anyres_device` + `resize_norm_tiles`): jittable
  resize/pad/tile in XLA for serving/eval throughput — the host only decodes JPEGs
  and picks the (static) target bucket; everything else runs on device. The bucket
  set is the pinpoint grid, so each bucket compiles once.

Tile layout contract (both paths): tiles[0] is the base 384x384 resize of the whole
image; tiles[1:] are the grid tiles of the aspect-preserving resize-and-pad, row
major. Matches `mm_utils.py:286-293`.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from radvlm_tpu.config import AnyResConfig
from radvlm_tpu.models.anyres import select_best_resolution

SIGLIP_MEAN = 0.5
SIGLIP_STD = 0.5


def _resize_pil(img_np: np.ndarray, size_wh: Tuple[int, int]) -> np.ndarray:
    """PIL bicubic resize (uint8 in, uint8 out). size = (width, height)."""
    from PIL import Image

    img = Image.fromarray(img_np)
    return np.asarray(img.resize(size_wh, Image.BICUBIC))


def normalize_pixels(x: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 normalized ((x/255 - mean) / std)."""
    return (x.astype(np.float32) / 255.0 - SIGLIP_MEAN) / SIGLIP_STD


def resize_and_pad_host(
    img_np: np.ndarray, target_wh: Tuple[int, int]
) -> np.ndarray:
    """Aspect-preserving resize then centre-pad with black to target (w, h).

    Contract of `mm_utils.py:152-188` (ceil on the filled dimension, floor-centred
    paste offsets).
    """
    oh, ow = img_np.shape[:2]
    tw, th = target_wh
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    resized = _resize_pil(img_np, (nw, nh))
    canvas = np.zeros((th, tw, 3), np.uint8)
    y0, x0 = (th - nh) // 2, (tw - nw) // 2
    canvas[y0 : y0 + nh, x0 : x0 + nw] = resized
    return canvas


def preprocess_anyres_host(
    img_np: np.ndarray, cfg: AnyResConfig, *, normalize: bool = False
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Full-fidelity host path. img_np: uint8 [H, W, 3].

    Returns (tiles [T, ts, ts, 3], image_size (w, h)). By default tiles stay
    uint8 — 4x less host->HBM transfer — and `normalize_tiles_device` (applied in
    the model entry) performs the exact (x/255 - 0.5)/0.5 on device; padding is
    black in both orders so the results are identical. normalize=True gives the
    f32 host-normalized tiles (golden-reference path for parity tests).
    """
    if img_np.ndim == 2:
        img_np = np.stack([img_np] * 3, axis=-1)
    oh, ow = img_np.shape[:2]
    ts = cfg.tile_size
    best_w, best_h = select_best_resolution((ow, oh), cfg.pinpoints)

    if os.environ.get("RADVLM_NATIVE_ANYRES") == "1":
        # Fused C++ path (radvlm_tpu/native): one pass, OpenMP, ±2/255 of PIL.
        from radvlm_tpu import native

        if native.available():
            plan = device_plan((ow, oh), cfg)
            tiles = native.anyres_tiles(
                img_np, ts, (best_w, best_h), (plan["new_w"], plan["new_h"])
            )
            if normalize:
                tiles = normalize_pixels(tiles)
            return tiles, (ow, oh)

    padded = resize_and_pad_host(img_np, (best_w, best_h))
    post = normalize_pixels if normalize else (lambda x: x)
    tiles = [post(_resize_pil(img_np, (ts, ts)))]  # base tile first
    for r in range(0, best_h, ts):
        for c in range(0, best_w, ts):
            tiles.append(post(padded[r : r + ts, c : c + ts]))
    return np.stack(tiles), (ow, oh)


def preprocess_single_host(
    img_np: np.ndarray, cfg: AnyResConfig, *, normalize: bool = False
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Base-resolution-only path (square resize, 1 tile)."""
    if img_np.ndim == 2:
        img_np = np.stack([img_np] * 3, axis=-1)
    oh, ow = img_np.shape[:2]
    ts = cfg.tile_size
    post = normalize_pixels if normalize else (lambda x: x)
    return post(_resize_pil(img_np, (ts, ts)))[None], (ow, oh)


def normalize_tiles_device(
    tiles: jnp.ndarray, dtype=jnp.float32, *, mean=SIGLIP_MEAN, std=SIGLIP_STD
) -> jnp.ndarray:
    """Device-side (x/255 - mean)/std for integer tiles; float tiles pass through
    (already normalized on host). mean/std may be scalars (SigLIP) or
    per-channel 3-tuples (CLIP)."""
    if jnp.issubdtype(tiles.dtype, jnp.integer):
        x = tiles.astype(dtype) / 255.0
        return (x - jnp.asarray(mean, dtype)) / jnp.asarray(std, dtype)
    return tiles


# ---------------------------------------------------------------------------
# Device path: jittable resize + pad + tile. One compiled function per
# (input_shape_bucket, target_resolution) pair; the pinpoint set is static.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bicubic(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bicubic resize on device ([H, W, 3] float32). jax.image.resize uses the same
    Keys cubic kernel family (a=-0.5) as PIL; antialiased on downscale."""
    return jax.image.resize(img, (out_h, out_w, 3), method="bicubic", antialias=True)


@partial(
    jax.jit,
    static_argnames=("tile_size", "best_w", "best_h", "new_w", "new_h", "max_tiles"),
)
def anyres_tiles_device(
    img: jnp.ndarray,
    tile_size: int,
    best_w: int,
    best_h: int,
    new_w: int,
    new_h: int,
    max_tiles: int,
) -> jnp.ndarray:
    """Device-side tile production for one image.

    img: [H, W, 3] float32 in [0, 255]. Static geometry (best resolution, resized
    size) is chosen on host via `device_plan`. Returns [max_tiles, ts, ts, 3]
    normalized tiles (base first, zero padding after the real tiles).
    """
    x = img / 255.0
    base = jax.image.resize(x, (tile_size, tile_size, 3), "bicubic", antialias=True)
    resized = jax.image.resize(x, (new_h, new_w, 3), "bicubic", antialias=True)
    canvas = jnp.zeros((best_h, best_w, 3), x.dtype)
    y0, x0 = (best_h - new_h) // 2, (best_w - new_w) // 2
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (y0, x0, 0))
    gh, gw = best_h // tile_size, best_w // tile_size
    grid = canvas.reshape(gh, tile_size, gw, tile_size, 3).transpose(0, 2, 1, 3, 4)
    tiles = jnp.concatenate([base[None], grid.reshape(gh * gw, tile_size, tile_size, 3)])
    tiles = (tiles - SIGLIP_MEAN) / SIGLIP_STD
    pad = max_tiles - tiles.shape[0]
    if pad > 0:
        tiles = jnp.concatenate([tiles, jnp.zeros((pad,) + tiles.shape[1:], tiles.dtype)])
    return tiles


def device_plan(image_size_wh: Tuple[int, int], cfg: AnyResConfig):
    """Host-side static geometry for `anyres_tiles_device`."""
    ow, oh = image_size_wh
    best_w, best_h = select_best_resolution((ow, oh), cfg.pinpoints)
    scale_w, scale_h = best_w / ow, best_h / oh
    if scale_w < scale_h:
        nw, nh = best_w, min(math.ceil(oh * scale_w), best_h)
    else:
        nh, nw = best_h, min(math.ceil(ow * scale_h), best_w)
    return dict(
        tile_size=cfg.tile_size, best_w=best_w, best_h=best_h, new_w=nw, new_h=nh
    )


def preprocess_anyres_device(
    img_np: np.ndarray, cfg: AnyResConfig, max_tiles: int | None = None
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Decode-on-host, everything-else-on-device preprocessing for one image."""
    if img_np.ndim == 2:
        img_np = np.stack([img_np] * 3, axis=-1)
    oh, ow = img_np.shape[:2]
    plan = device_plan((ow, oh), cfg)
    if max_tiles is None:
        max_tiles = 1 + (plan["best_w"] // cfg.tile_size) * (plan["best_h"] // cfg.tile_size)
    tiles = anyres_tiles_device(
        jnp.asarray(img_np, jnp.float32), max_tiles=max_tiles, **plan
    )
    return tiles, (ow, oh)
