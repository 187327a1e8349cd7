"""Optimizer construction: per-module LR groups + tunable-parts freezing.

Rebuild of the reference trainer's optimizer logic:
- per-module learning rates `mm_projector_lr` / `mm_vision_tower_lr`
  (`finetuning/llava/train/llava_trainer.py:356-433`),
- `mm_tunable_parts` freeze/unfreeze (`finetuning/llava/train/train.py:1613-1665`),
- cosine schedule with warmup ratio + AdamW(bf16-safe) as in
  `finetuning/scripts/finetune_radio_7b.sh:62-77` (lr 1e-5, vision 2e-6, warmup 0.03).

Implemented as one `optax.multi_transform` keyed by module group, so the whole
optimizer is a pure pytree transformation that pjit shards alongside the params
(ZeRO-3-equivalent optimizer-state sharding for free).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import optax

from radvlm_tpu.parallel.sharding import path_str


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters (defaults = `finetune_radio_7b.sh:62-87`)."""

    learning_rate: float = 1e-5
    vision_tower_lr: Optional[float] = 2e-6
    projector_lr: Optional[float] = None  # None -> base LR
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.03
    total_steps: int = 4000
    lr_schedule: str = "cosine"  # "cosine" | "linear" | "constant"
    # Comma-separated tunable parts, reference vocabulary (`train.py:1613-1665`):
    # mm_mlp_adapter, mm_vision_tower, mm_language_model, mm_vision_resampler.
    mm_tunable_parts: str = "mm_vision_tower,mm_mlp_adapter,mm_language_model"
    grad_accum_steps: int = 2
    micro_batch_size: int = 1


def _group_of(path: str) -> str:
    if path.startswith("vision_tower"):
        return "vision_tower"
    if path.startswith("projector") or path.startswith("image_newline"):
        return "projector"
    return "language_model"


def _tunable(group: str, parts: str) -> bool:
    parts = {p.strip() for p in parts.split(",") if p.strip()}
    return {
        "vision_tower": "mm_vision_tower" in parts,
        "projector": "mm_mlp_adapter" in parts,
        "language_model": "mm_language_model" in parts,
    }[group]


def param_labels(params: Any, cfg: TrainConfig) -> Any:
    """Label pytree: group name for trainable params, 'frozen' otherwise."""

    def label(path, _):
        g = _group_of(path_str(path))
        return g if _tunable(g, cfg.mm_tunable_parts) else "frozen"

    return jax.tree_util.tree_map_with_path(label, params)


def trainable_mask(params: Any, cfg: TrainConfig) -> Any:
    return jax.tree.map(lambda l: l != "frozen", param_labels(params, cfg))


def make_schedule(cfg: TrainConfig, peak_lr: float) -> optax.Schedule:
    warmup = max(int(cfg.warmup_ratio * cfg.total_steps), 0)
    if cfg.lr_schedule == "constant":
        return optax.warmup_constant_schedule(0.0, peak_lr, warmup) if warmup else (
            optax.constant_schedule(peak_lr)
        )
    if cfg.lr_schedule == "linear":
        # optax has no warmup_linear_schedule; compose warmup + linear decay.
        decay = max(cfg.total_steps - warmup, 1)
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, peak_lr, max(warmup, 1)),
                optax.linear_schedule(peak_lr, 0.0, decay),
            ],
            [warmup],
        )
    return optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, warmup, max(cfg.total_steps, warmup + 1), end_value=0.0
    )


def _adamw(cfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    return optax.adamw(
        make_schedule(cfg, lr),
        b1=cfg.adam_b1,
        b2=cfg.adam_b2,
        eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay,
    )


def make_optimizer(
    params: Any, cfg: TrainConfig
) -> Tuple[optax.GradientTransformation, Any]:
    """Build the optimizer and its label pytree.

    Frozen groups are zeroed BEFORE the global-norm clip (value_and_grad still
    produces full frozen grads; the reference clips only requires_grad params —
    `llava_trainer.py:356-433`), then clipping is global over trainable grads,
    then each group gets its own AdamW + schedule.
    """
    labels = param_labels(params, cfg)
    frozen_mask = jax.tree.map(lambda l: l == "frozen", labels)
    transforms = {
        "language_model": _adamw(cfg, cfg.learning_rate),
        "vision_tower": _adamw(cfg, cfg.vision_tower_lr or cfg.learning_rate),
        "projector": _adamw(cfg, cfg.projector_lr or cfg.learning_rate),
        "frozen": optax.set_to_zero(),
    }
    tx = optax.chain(
        optax.masked(optax.set_to_zero(), frozen_mask),
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(transforms, labels),
    )
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx, labels
