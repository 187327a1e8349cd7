"""Host-side multimodal batch assembly (static-shape splice maps for the model).

This is the host half of the fusion redesign (see models/radvlm.py): it reproduces
the *semantics* of the reference's `tokenizer_image_token` sentinel splice
(`mm_utils.py:341-360`) and `prepare_inputs_labels_for_multimodal`'s per-sample
expansion/padding (`llava_arch.py:449-531`) as cheap numpy index computation, so the
device never sees a dynamic shape.

Pipeline per sample:
  raw text with <image> markers -> token ids with IMAGE_TOKEN_INDEX sentinels
  images -> anyres tiles + MergePlans (models/anyres.py)
  sentinel expansion -> tokens[L], img_src[L] (row into the sample's merged image
  token buffer, -1 for text), labels[L]
Batching pads tiles/plans/sequences to shared static bucket shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from radvlm_tpu.config import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    DEFAULT_IMAGE_TOKEN,
    AnyResConfig,
    RadVLMConfig,
)
from radvlm_tpu.models.anyres import MergePlan, compute_merge_plan, max_merged_tokens
from radvlm_tpu.ops.image_ops import preprocess_anyres_host, preprocess_single_host


def tokenize_with_images(tokenize_fn, text: str) -> List[int]:
    """Split `text` on <image> and splice IMAGE_TOKEN_INDEX sentinels between chunk
    token lists (contract of `mm_utils.py:341-360`, without BOS special-casing —
    Qwen2 has no BOS)."""
    chunks = text.split(DEFAULT_IMAGE_TOKEN)
    ids: List[int] = []
    for i, chunk in enumerate(chunks):
        if i > 0:
            ids.append(IMAGE_TOKEN_INDEX)
        if chunk:
            ids.extend(tokenize_fn(chunk))
    return ids


@dataclasses.dataclass
class MMSample:
    """One preprocessed multimodal sample (numpy, unpadded except plan rows)."""

    tokens: np.ndarray  # [L] int32, image positions -> 0
    img_src: np.ndarray  # [L] int32, -1 for text
    labels: np.ndarray  # [L] int32, IGNORE_INDEX over image spans / unsupervised
    tiles: np.ndarray  # [T, ts, ts, 3] float32
    merge_indices: np.ndarray  # [N, 4] int32 (sample-level, tile-offset adjusted)
    merge_weights: np.ndarray  # [N, 4] float32
    num_image_tokens: int
    tokens_per_tile: int = 729  # newline row sits at num_tiles * tokens_per_tile

    @property
    def length(self) -> int:
        return len(self.tokens)


def build_sample(
    token_ids: Sequence[int],
    images: Sequence[np.ndarray],
    cfg: RadVLMConfig,
    *,
    labels: Optional[Sequence[int]] = None,
    max_image_tokens: Optional[int] = None,
) -> MMSample:
    """Expand sentinels into image spans and build the sample-level merge plan.

    token_ids: ids with IMAGE_TOKEN_INDEX at image positions (count must equal
    len(images)). labels: optional per-token supervision ids aligned with token_ids
    (image sentinel label is ignored; its span becomes IGNORE_INDEX).
    """
    anyres = cfg.anyres
    # Per-tile feature grid side AFTER resampling (spatial_pool shrinks it;
    # perceiver has no grid and is confined to the non-anyres branch by
    # RadVLMConfig.__post_init__).
    tps = cfg.feature_grid_side
    tpt = cfg.tokens_per_tile
    use_anyres = cfg.image_aspect_ratio.startswith("anyres")

    tiles_list: List[np.ndarray] = []
    plans: List[MergePlan] = []
    for img in images:
        if use_anyres:
            tiles, size = preprocess_anyres_host(img, anyres)
            plan = compute_merge_plan(size, anyres, tps)
        else:
            tiles, size = preprocess_single_host(img, anyres)
            from radvlm_tpu.models.anyres import flat_tile_plan

            plan = flat_tile_plan(tpt, tpt + 1, newline=anyres.newline)
        tiles_list.append(tiles)
        plans.append(plan)

    # Sample-level merge plan: per-image plans shifted by tile offsets; one shared
    # newline row at the very end (row T_total * tpt).
    t_total = sum(t.shape[0] for t in tiles_list) if tiles_list else 0
    newline_row = t_total * tpt
    if max_image_tokens is None:
        per_img = max_merged_tokens(anyres, tps) if use_anyres else tpt + 1
        max_image_tokens = per_img * max(len(images), 1)
    merge_indices = np.full((max_image_tokens, 4), newline_row, np.int32)
    merge_weights = np.zeros((max_image_tokens, 4), np.float32)

    img_offsets: List[Tuple[int, int]] = []  # (merged row offset, length)
    tile_offset = 0
    row = 0
    for tiles, plan in zip(tiles_list, plans):
        n = plan.length
        idx = plan.indices[:n].copy()
        own_newline = plan.num_tiles * tpt
        is_newline = idx == own_newline
        idx = idx + tile_offset * tpt
        idx[is_newline] = newline_row
        merge_indices[row : row + n] = idx
        merge_weights[row : row + n] = plan.weights[:n]
        img_offsets.append((row, n))
        row += n
        tile_offset += tiles.shape[0]

    # Sentinel expansion.
    out_tokens: List[int] = []
    out_src: List[int] = []
    out_labels: List[int] = []
    img_i = 0
    for pos, tok in enumerate(token_ids):
        if tok == IMAGE_TOKEN_INDEX:
            off, n = img_offsets[img_i]
            img_i += 1
            out_tokens.extend([0] * n)
            out_src.extend(range(off, off + n))
            out_labels.extend([IGNORE_INDEX] * n)
        else:
            out_tokens.append(int(tok))
            out_src.append(-1)
            out_labels.append(
                int(labels[pos]) if labels is not None else IGNORE_INDEX
            )
    if img_i != len(images):
        raise ValueError(
            f"prompt has {img_i} image sentinels but {len(images)} images given"
        )

    tiles_arr = (
        np.concatenate(tiles_list, axis=0)
        if tiles_list
        else np.zeros((1, anyres.tile_size, anyres.tile_size, 3), np.uint8)
    )
    return MMSample(
        tokens=np.asarray(out_tokens, np.int32),
        img_src=np.asarray(out_src, np.int32),
        labels=np.asarray(out_labels, np.int32),
        tiles=tiles_arr,
        merge_indices=merge_indices,
        merge_weights=merge_weights,
        num_image_tokens=row,
        tokens_per_tile=tpt,
    )


def pack_samples(samples: Sequence[MMSample]) -> MMSample:
    """Concatenate samples into ONE packed sample (segment boundaries are
    restored by `collate(..., packed=True)` via the per-sample lengths).

    Packing turns the short-sample tail of the training mixture (classification
    prompts are ~100 tokens vs multi-kilotoken anyres rows) into full rows: the
    flash kernel's segment-id masking keeps attention within each original
    sample and the loss mask already respects segments. Token/image bookkeeping:
    img_src rows shift by the running merged-token offset, merge-plan rows shift
    by the running tile offset, and each sample keeps its own newline row
    (remapped at collate time is impossible for packed rows, so tiles are NOT
    re-padded per sample — the packed tile matrix is the concatenation).
    """
    if len(samples) == 1:
        s = samples[0]
        packed = MMSample(
            tokens=s.tokens, img_src=s.img_src, labels=s.labels, tiles=s.tiles,
            merge_indices=s.merge_indices, merge_weights=s.merge_weights,
            num_image_tokens=s.num_image_tokens, tokens_per_tile=s.tokens_per_tile,
        )
        packed.segment_lengths = [s.length]  # type: ignore[attr-defined]
        return packed
    tpt = samples[0].tokens_per_tile
    tokens, img_src, labels = [], [], []
    tiles, mi, mw = [], [], []
    newline_masks = []
    row_off = 0
    tile_off = 0
    seg_lengths = []
    for s in samples:
        assert s.tokens_per_tile == tpt
        tokens.append(s.tokens)
        src = s.img_src.copy()
        src[src >= 0] += row_off
        img_src.append(src)
        labels.append(s.labels)
        # Shift tile rows by the packed tile offset; each sample's references to
        # ITS newline row (own t*tpt) must later point at the single shared
        # newline row of the packed flat matrix (total_tiles*tpt) — detect them
        # BEFORE shifting so they can't collide with a later sample's tile rows.
        idx = s.merge_indices.copy()
        own_newline = s.tiles.shape[0] * tpt
        newline_masks.append(idx == own_newline)
        idx += tile_off * tpt
        mi.append(idx)
        mw.append(s.merge_weights)
        tiles.append(s.tiles)
        seg_lengths.append(s.length)
        row_off += s.merge_indices.shape[0]
        tile_off += s.tiles.shape[0]
    merge_indices = np.concatenate(mi, axis=0)
    merge_indices[np.concatenate(newline_masks, axis=0)] = tile_off * tpt
    packed = MMSample(
        tokens=np.concatenate(tokens),
        img_src=np.concatenate(img_src),
        labels=np.concatenate(labels),
        tiles=np.concatenate(tiles, axis=0),
        merge_indices=merge_indices,
        merge_weights=np.concatenate(mw, axis=0),
        num_image_tokens=row_off,
        tokens_per_tile=tpt,
    )
    packed.segment_lengths = seg_lengths  # type: ignore[attr-defined]
    return packed


def collate(
    samples: Sequence[MMSample],
    *,
    pad_len: Optional[int] = None,
    pad_tiles: Optional[int] = None,
    pad_to_multiple: int = 128,
    left_pad: bool = False,
) -> Dict[str, np.ndarray]:
    """Pad and stack samples into a static-shape batch.

    Right-pad for training (reference collator contract, `train.py:1248-1286`);
    left_pad=True aligns sequence ends for batched generation prefill.
    Sequence length is rounded up to `pad_to_multiple` (TPU lane alignment).
    """
    b = len(samples)
    L = max(s.length for s in samples)
    if pad_len is not None:
        L = max(L, pad_len)
    L = ((L + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    T = max(s.tiles.shape[0] for s in samples)
    if pad_tiles is not None:
        T = max(T, pad_tiles)
    N = max(s.merge_indices.shape[0] for s in samples)
    ts = samples[0].tiles.shape[1]

    tokens = np.zeros((b, L), np.int32)
    img_src = np.full((b, L), -1, np.int32)
    labels = np.full((b, L), IGNORE_INDEX, np.int32)
    segment_ids = np.zeros((b, L), np.int32)
    positions = np.zeros((b, L), np.int32)
    tiles = np.zeros((b, T, ts, ts, 3), samples[0].tiles.dtype)
    merge_indices = np.zeros((b, N, 4), np.int32)
    merge_weights = np.zeros((b, N, 4), np.float32)
    lengths = np.zeros((b,), np.int32)

    for i, s in enumerate(samples):
        n = s.length
        sl = slice(L - n, L) if left_pad else slice(0, n)
        tokens[i, sl] = s.tokens
        img_src[i, sl] = s.img_src
        labels[i, sl] = s.labels
        seg_lengths = getattr(s, "segment_lengths", None)
        if seg_lengths and len(seg_lengths) > 1:
            # Packed row (pack_samples): distinct segment ids + per-segment
            # position resets so attention and rope treat each original sample
            # independently.
            seg_row = np.concatenate([
                np.full(m, k + 1, np.int32) for k, m in enumerate(seg_lengths)
            ])
            pos_row = np.concatenate([np.arange(m) for m in seg_lengths])
            segment_ids[i, sl] = seg_row
            positions[i, sl] = pos_row
        else:
            segment_ids[i, sl] = 1
            positions[i, sl] = np.arange(n)
        tiles[i, : s.tiles.shape[0]] = s.tiles
        # Remap the sample's newline row (t_own * tpt, the last row of ITS flat tile
        # matrix) to the batch-padded position (T * tpt): apply_merge concatenates
        # the newline after T tiles, not after the sample's own tile count.
        nr = s.merge_indices.shape[0]
        own_newline = s.tiles.shape[0] * s.tokens_per_tile
        idx = s.merge_indices.copy()
        idx[idx == own_newline] = T * s.tokens_per_tile
        merge_indices[i, :nr] = idx
        merge_weights[i, :nr] = s.merge_weights
        lengths[i] = n

    return {
        "tokens": tokens,
        "img_src": img_src,
        "labels": labels,
        "segment_ids": segment_ids,
        "positions": positions,
        "tiles": tiles,
        "merge_indices": merge_indices,
        "merge_weights": merge_weights,
        "lengths": lengths,
    }
