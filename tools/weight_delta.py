"""Checkpoint delta tools: make/apply weight deltas and consolidate shards.

Rebuild of the reference's LLaVA release tooling
(`finetuning/llava/model/make_delta.py`, `apply_delta.py`,
`consolidate.py`): deltas let a finetune be published without
redistributing the licensed base weights — `delta = target - base`
elementwise, shipped as a normal checkpoint, reconstructed with
`target = base + delta`.

Operates on HF-layout safetensors directories (the format `models/hf_export`
writes and `models/hf_import` reads), numpy-only — no torch model
instantiation needed, so a 7B delta streams through at safetensors speed.
Reference edge cases kept:
- keys absent from the base (the multimodal projector,
  `apply_delta.py:25-27`) pass through the delta unchanged;
- shape mismatches are legal only for vocab-resized embedding/head rows
  (`apply_delta.py:31-33`): the base adds/subtracts into the leading
  `[rows, cols]` slice, the grown tail rides the delta verbatim.

Usage:
    python tools/weight_delta.py make --base B --target T --delta D
    python tools/weight_delta.py apply --base B --delta D --target T
    python tools/weight_delta.py consolidate --src S --dst D
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Dict

import numpy as np

# keys allowed to differ in shape (vocab growth), matching the reference's
# assert lists; ours are suffix-matched so both bare and HF-prefixed
# checkpoints work.
VOCAB_KEYS = ("embed_tokens.weight", "lm_head.weight")


def _load(path: str) -> Dict[str, np.ndarray]:
    from radvlm_tpu.models.hf_import import load_safetensors_dir

    return load_safetensors_dir(path)


def _save(state: Dict[str, np.ndarray], path: str, src_dir: str) -> None:
    """Write the state plus the source dir's JSON sidecars (config,
    tokenizer) — the reference saves model + tokenizer together."""
    from radvlm_tpu.models.hf_export import save_safetensors

    save_safetensors(state, path)
    for name in os.listdir(src_dir):
        if name.endswith(".json") and name != "model.safetensors.index.json":
            shutil.copy(os.path.join(src_dir, name), os.path.join(path, name))


def _combine(
    base: Dict[str, np.ndarray],
    other: Dict[str, np.ndarray],
    sign: int,
) -> Dict[str, np.ndarray]:
    """out[k] = other[k] + sign * base[k] with the reference's pass-through
    and vocab-slice rules; `other` is the delta (sign=+1, apply) or the
    finetuned target (sign=-1, make)."""
    out: Dict[str, np.ndarray] = {}
    for name, param in other.items():
        if name not in base:
            # projector/new modules ride along (`apply_delta.py:25-27`)
            out[name] = param
            continue
        bparam = base[name]
        if param.shape == bparam.shape:
            out[name] = (
                param.astype(np.float32) + sign * bparam.astype(np.float32)
            ).astype(param.dtype)
        else:
            if not name.endswith(VOCAB_KEYS):
                raise ValueError(
                    f"{name} dimension mismatch: {param.shape} vs "
                    f"{bparam.shape}"
                )
            merged = param.astype(np.float32).copy()
            r, c = bparam.shape
            merged[:r, :c] += sign * bparam.astype(np.float32)
            out[name] = merged.astype(param.dtype)
    return out


def make_delta(base_path: str, target_path: str, delta_path: str) -> None:
    base, target = _load(base_path), _load(target_path)
    _save(_combine(base, target, sign=-1), delta_path, target_path)


def apply_delta(base_path: str, delta_path: str, target_path: str) -> None:
    base, delta = _load(base_path), _load(delta_path)
    _save(_combine(base, delta, sign=+1), target_path, delta_path)


def consolidate(src_path: str, dst_path: str) -> None:
    """Flatten a sharded checkpoint (N *.safetensors + index) into one
    model.safetensors (`consolidate.py:14-21` minus the torch round-trip)."""
    _save(_load(src_path), dst_path, src_path)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    mk = sub.add_parser("make")
    mk.add_argument("--base", required=True)
    mk.add_argument("--target", required=True)
    mk.add_argument("--delta", required=True)
    ap = sub.add_parser("apply")
    ap.add_argument("--base", required=True)
    ap.add_argument("--delta", required=True)
    ap.add_argument("--target", required=True)
    co = sub.add_parser("consolidate")
    co.add_argument("--src", required=True)
    co.add_argument("--dst", required=True)
    args = p.parse_args()
    if args.cmd == "make":
        make_delta(args.base, args.target, args.delta)
    elif args.cmd == "apply":
        apply_delta(args.base, args.delta, args.target)
    else:
        consolidate(args.src, args.dst)
    print(json.dumps({"ok": True, "cmd": args.cmd}))


if __name__ == "__main__":
    main()
