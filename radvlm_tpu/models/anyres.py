"""AnyRes geometry + TPU-friendly feature merge.

Rebuilds the reference's anyres pipeline (`finetuning/llava/mm_utils.py:119-293` and
`llava_arch.py:350-406`: spatial merge, `unpad_image` at `llava_arch.py:127-159`, the
`anyres_max_N` bilinear token cap at `:381-392`, and image-newline insertion) in a
form XLA can compile with static shapes:

The per-image merge (unflatten tiles -> unpad -> optional bilinear downscale ->
newline column -> prepend base tile) is *data independent*: it only depends on the
original image size and the selected tile grid. So we precompute, on the host, a
sparse "merge plan" — for every output token, up to 4 (source-row, weight) pairs into
the flattened [T*729 + 1] matrix of projected tile features (+1 = the learned
image_newline row). On device the merge is then a single weighted-gather, identical
for every image shape: no dynamic shapes, no per-image Python, MXU/VPU friendly.

Bilinear weights follow torch `F.interpolate(mode="bilinear", align_corners=False)`
semantics so merged features match the reference numerically.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from radvlm_tpu.config import AnyResConfig


def select_best_resolution(
    original_size: Tuple[int, int], possible_resolutions: Sequence[Tuple[int, int]]
) -> Tuple[int, int]:
    """Pick the candidate (width, height) maximizing effective resolution, breaking
    ties by least wasted area (contract of `mm_utils.py:119-149`)."""
    ow, oh = original_size
    best = None
    best_eff = -1
    best_waste = float("inf")
    for w, h in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best_eff, best_waste, best = eff, waste, (w, h)
    return best


def grid_shape_for_image(
    image_size: Tuple[int, int], cfg: AnyResConfig
) -> Tuple[int, int]:
    """(grid_cols, grid_rows) of tiles for an image of (width, height)."""
    w, h = select_best_resolution(image_size, cfg.pinpoints)
    return w // cfg.tile_size, h // cfg.tile_size


def _unpad_shape(
    orig_w: int, orig_h: int, grid_w_cells: int, grid_h_cells: int
) -> Tuple[int, int, int, int]:
    """Feature-grid crop after unpadding (llava_arch.py:127-159).

    Returns (rows, cols, row_offset, col_offset) of the kept region within the
    [grid_h_cells, grid_w_cells] merged feature grid.
    """
    original_ar = orig_w / orig_h
    current_ar = grid_w_cells / grid_h_cells
    if original_ar > current_ar:
        # padding added top+bottom
        scale = grid_w_cells / orig_w
        new_h = int(orig_h * scale)
        pad = (grid_h_cells - new_h) // 2
        return grid_h_cells - 2 * pad, grid_w_cells, pad, 0
    else:
        scale = grid_h_cells / orig_h
        new_w = int(orig_w * scale)
        pad = (grid_w_cells - new_w) // 2
        return grid_h_cells, grid_w_cells - 2 * pad, 0, pad


@dataclasses.dataclass
class MergePlan:
    """Sparse per-image merge: out[i] = sum_k weights[i,k] * src[indices[i,k]].

    src is the [num_tiles*tpt + 1] feature matrix (+1 = image_newline row, always the
    LAST row). `length` is the number of valid output tokens; rows beyond it point at
    the newline row with weight 0 (safe to gather, contributes nothing downstream
    because callers mask by length).
    """

    indices: np.ndarray  # [max_tokens, 4] int32
    weights: np.ndarray  # [max_tokens, 4] float32
    length: int
    num_tiles: int  # includes the base tile
    grid: Tuple[int, int]  # (cols, rows) of grid tiles (base excluded)


def max_merged_tokens(cfg: AnyResConfig, tokens_per_side: int) -> int:
    """Static output budget for the merge gather.

    Base tile (tpt) + capped grid tokens. With anyres_max the grid contributes at
    most ~max*tpt tokens pre-cap; post-cap it's <= max*tpt plus newline rows. We
    budget the uncapped worst case when anyres_max would not trigger (times<=1.1):
    sqrt(1.1^2 * max * tpt) per side, plus a newline per row — bounded below by the
    no-cap small-grid case (e.g. 2x2 grid -> 54x54+54 newline). Use the true max over
    realizable geometries, computed once.
    """
    tpt = tokens_per_side ** 2
    best = 0
    lo, hi = cfg.grid_range
    for gw in range(lo, hi + 1):
        for gh in range(lo, hi + 1):
            rows = gh * tokens_per_side
            cols = gw * tokens_per_side
            times = math.sqrt(rows * cols / (cfg.anyres_max * tpt))
            if times > 1.1:
                rows, cols = int(rows // times), int(cols // times)
            best = max(best, rows * (cols + 1))
    return tpt + best


def compute_merge_plan(
    image_size: Tuple[int, int],
    cfg: AnyResConfig,
    tokens_per_side: int,
    max_tokens: int | None = None,
) -> MergePlan:
    """Host-side plan for one image. image_size = (width, height) of the original."""
    tpt = tokens_per_side ** 2
    gw, gh = grid_shape_for_image(image_size, cfg)
    num_tiles = 1 + gw * gh
    if max_tokens is None:
        max_tokens = max_merged_tokens(cfg, tokens_per_side)
    newline_row = num_tiles * tpt  # last row of src

    # Grid-cell coordinates -> flat src row (base tile is src rows [0, tpt)).
    def cell_index(r: int, c: int) -> int:
        tile_r, in_r = divmod(r, tokens_per_side)
        tile_c, in_c = divmod(c, tokens_per_side)
        tile = 1 + tile_r * gw + tile_c
        return tile * tpt + in_r * tokens_per_side + in_c

    rows_cells, cols_cells = gh * tokens_per_side, gw * tokens_per_side
    kept_rows, kept_cols, row_off, col_off = _unpad_shape(
        image_size[0], image_size[1], cols_cells, rows_cells
    )

    # anyres_max token cap via bilinear downscale (llava_arch.py:381-392).
    times = math.sqrt(kept_rows * kept_cols / (cfg.anyres_max * tpt))
    if times > 1.1:
        out_rows = int(kept_rows // times)
        out_cols = int(kept_cols // times)
        resized = True
    else:
        out_rows, out_cols = kept_rows, kept_cols
        resized = False

    indices = np.full((max_tokens, 4), newline_row, np.int32)
    weights = np.zeros((max_tokens, 4), np.float32)

    # 1) base tile tokens, identity.
    indices[:tpt, 0] = np.arange(tpt, dtype=np.int32)
    weights[:tpt, 0] = 1.0

    # 2) grid tokens, row-major over [out_rows, out_cols + newline column].
    out_i = tpt
    for r in range(out_rows):
        if resized:
            # torch bilinear align_corners=False: src = (dst + 0.5) * scale - 0.5
            src_r = (r + 0.5) * (kept_rows / out_rows) - 0.5
            r0 = int(math.floor(src_r))
            fr = src_r - r0
            r0c = min(max(r0, 0), kept_rows - 1)
            r1c = min(max(r0 + 1, 0), kept_rows - 1)
        for c in range(out_cols):
            if resized:
                src_c = (c + 0.5) * (kept_cols / out_cols) - 0.5
                c0 = int(math.floor(src_c))
                fc = src_c - c0
                c0c = min(max(c0, 0), kept_cols - 1)
                c1c = min(max(c0 + 1, 0), kept_cols - 1)
                pairs = [
                    (r0c, c0c, (1 - fr) * (1 - fc)),
                    (r0c, c1c, (1 - fr) * fc),
                    (r1c, c0c, fr * (1 - fc)),
                    (r1c, c1c, fr * fc),
                ]
                for k, (rr, cc, w) in enumerate(pairs):
                    indices[out_i, k] = cell_index(rr + row_off, cc + col_off)
                    weights[out_i, k] = w
            else:
                indices[out_i, 0] = cell_index(r + row_off, c + col_off)
                weights[out_i, 0] = 1.0
            out_i += 1
        # newline column at end of each row.
        indices[out_i, 0] = newline_row
        weights[out_i, 0] = 1.0
        out_i += 1

    return MergePlan(
        indices=indices,
        weights=weights,
        length=out_i,
        num_tiles=num_tiles,
        grid=(gw, gh),
    )


def single_tile_plan(
    tokens_per_side: int, max_tokens: int, newline: bool = True
) -> MergePlan:
    """Plan for a base-resolution-only image (single-image op in llava_arch.py:407-412):
    729 tokens + one trailing newline token."""
    return flat_tile_plan(tokens_per_side ** 2, max_tokens, newline)


def flat_tile_plan(
    tokens_per_tile: int, max_tokens: int, newline: bool = True
) -> MergePlan:
    """Identity plan over `tokens_per_tile` features (no spatial structure
    assumed — used for non-grid resampler outputs, e.g. perceiver latents)."""
    tpt = tokens_per_tile
    indices = np.full((max_tokens, 4), tpt, np.int32)
    weights = np.zeros((max_tokens, 4), np.float32)
    indices[:tpt, 0] = np.arange(tpt, dtype=np.int32)
    weights[:tpt, 0] = 1.0
    length = tpt
    if newline:
        indices[tpt, 0] = tpt  # newline row (src has 1 tile -> newline at row tpt)
        weights[tpt, 0] = 1.0
        length = tpt + 1
    return MergePlan(
        indices=indices, weights=weights, length=length, num_tiles=1, grid=(0, 0)
    )


def apply_merge(
    tile_features: jnp.ndarray,
    image_newline: jnp.ndarray,
    indices: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Device-side merge. tile_features: [T, tpt, D] (projected), image_newline: [D],
    indices/weights: [max_tokens, 4]. Returns [max_tokens, D].

    Implemented as gather + weighted sum — one fused XLA op chain, static shapes.
    """
    t, tpt, d = tile_features.shape
    src = jnp.concatenate(
        [tile_features.reshape(t * tpt, d), image_newline[None, :]], axis=0
    )
    gathered = jnp.take(src, indices, axis=0)  # [max_tokens, 4, D]
    return jnp.einsum("nk,nkd->nd", weights.astype(gathered.dtype), gathered)


def batch_plans(plans: List[MergePlan]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Stack per-image plans -> (indices [B,N,4], weights [B,N,4], lengths [B])."""
    indices = np.stack([p.indices for p in plans])
    weights = np.stack([p.weights for p in plans])
    lengths = np.array([p.length for p in plans], np.int32)
    return indices, weights, lengths
