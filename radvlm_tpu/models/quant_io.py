"""Pre-quantized native checkpoints: save/load int8/int4 param trees.

The reference quantizes at LOAD time with bitsandbytes
(`finetuning/llava/model/builder.py:30-34` load_8bit/load_4bit;
`train.py:1466-1503` QLoRA prep) — every worker start re-pays the full bf16
load plus quantization. Here the quantization is done once offline
(`quantize_cli.py`) and serving/eval start from the quantized artifact:

- `model.safetensors`: the flattened param pytree — int8 qnodes
  (`__q__`/`__scale__`, ops/quant.py), nibble-packed int4 nodes (`__q4__`,
  ops/int4_matmul.py), and unquantized bf16 leaves — saved verbatim.
  bfloat16 arrays are stored as uint16 views (safetensors.numpy rejects
  ml_dtypes) and restored bit-exactly from the dtype sidecar.
- `radvlm_quant.json`: format marker + the full RadVLMConfig (with the
  vision-config class name — the tower zoo has four config classes) + the
  dtype map.

Bit-exact round-trip; `is_quantized_dir` lets the CLIs auto-detect the
format next to HF checkpoint dirs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from radvlm_tpu.config import (
    AnyResConfig,
    ProjectorConfig,
    Qwen2Config,
    RadVLMConfig,
    ResamplerConfig,
    SigLIPConfig,
)

MARKER = "radvlm_quant.json"
FORMAT_VERSION = 1

_VISION_CLASSES: Dict[str, Any] = {"SigLIPConfig": SigLIPConfig}


def _vision_class(name: str):
    if name in _VISION_CLASSES:
        return _VISION_CLASSES[name]
    if name == "CLIPVisionConfig":
        from radvlm_tpu.models.clip import CLIPVisionConfig

        return CLIPVisionConfig
    if name == "EVAVisionConfig":
        from radvlm_tpu.models.eva import EVAVisionConfig

        return EVAVisionConfig
    if name == "ImageBindVisionConfig":
        from radvlm_tpu.models.imagebind import ImageBindVisionConfig

        return ImageBindVisionConfig
    raise ValueError(f"unknown vision config class {name!r}")


def config_to_dict(cfg: RadVLMConfig) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    d["__vision_class__"] = type(cfg.vision).__name__
    return d


def config_from_dict(d: Dict[str, Any]) -> RadVLMConfig:
    d = dict(d)
    vis_cls = _vision_class(d.pop("__vision_class__", "SigLIPConfig"))

    def build(cls, sub):
        # tolerate missing/extra keys across versions: keep known fields only
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in sub.items() if k in fields}
        for k in fields:  # JSON turns tuples into lists
            f = next(x for x in dataclasses.fields(cls) if x.name == k)
            if k in kw and isinstance(kw[k], list):
                kw[k] = tuple(kw[k])
        return cls(**kw)

    return RadVLMConfig(
        vision=build(vis_cls, d.pop("vision")),
        text=build(Qwen2Config, d.pop("text")),
        projector=build(ProjectorConfig, d.pop("projector")),
        anyres=build(AnyResConfig, d.pop("anyres")),
        resampler=build(ResamplerConfig, d.pop("resampler")),
        **{k: v for k, v in d.items()
           if k in {f.name for f in dataclasses.fields(RadVLMConfig)}},
    )


def _flatten_tree(tree: Any) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def visit(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                if "/" in k:
                    raise ValueError(f"param key {k!r} contains '/'")
                visit(v, f"{prefix}{k}/")
        else:
            out[prefix[:-1]] = np.asarray(node)

    visit(tree, "")
    return out


def _unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_quantized(params: Any, cfg: RadVLMConfig, path: str) -> None:
    """Write a pre-quantized checkpoint dir (model.safetensors + marker)."""
    import ml_dtypes
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    flat = _flatten_tree(params)
    dtypes: Dict[str, str] = {}
    clean: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if v.dtype == ml_dtypes.bfloat16:
            dtypes[k] = "bfloat16"
            v = v.view(np.uint16)
        clean[k] = np.ascontiguousarray(v)
    save_file(clean, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, MARKER), "w") as f:
        json.dump({
            "format_version": FORMAT_VERSION,
            "config": config_to_dict(cfg),
            "dtypes": dtypes,
        }, f, indent=1)


def is_quantized_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, MARKER))


def load_quantized(
    path: str, device: Optional[Any] = None
) -> Tuple[Dict[str, Any], RadVLMConfig]:
    """Load a pre-quantized checkpoint; returns (params on device, cfg)."""
    import jax
    import ml_dtypes
    from safetensors.numpy import load_file

    with open(os.path.join(path, MARKER)) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported quantized-checkpoint format {meta.get('format_version')}"
        )
    flat = load_file(os.path.join(path, "model.safetensors"))
    dtypes = meta.get("dtypes", {})
    restored: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if dtypes.get(k) == "bfloat16":
            v = v.view(ml_dtypes.bfloat16)
        restored[k] = v
    tree = _unflatten_tree(restored)
    put = (lambda x: jax.device_put(x, device)) if device is not None else (
        jax.numpy.asarray
    )
    params = jax.tree_util.tree_map(put, tree)
    return params, config_from_dict(meta["config"])
