"""GRPO: group-relative policy optimization over serving-engine rollouts.

The reference has NO in-repo RL trainer: it exports GRPO/VeRL data for
EXTERNAL frameworks to train with (`radvlm/data/make_grpo_rec_jsonl.py:33-50`
writes REC prompts with JSON bbox answers for VLM-R1's GRPO recipe;
`create_verl_dataset_llava.py:13-39` marks cells `reward_model:
{"style": "rule", ...}` for VeRL). Here the loop closes natively on TPU:

- **Rollouts** run through the continuous serving engine
  (`generation/continuous.ContinuousBatcher`): all `group_size` samples of a
  whole prompt wave decode as one continuously-batched stream — the rollout
  engine IS the serving engine, so every inference optimization (int8 KV,
  chunked pipelined decode, bucketed prefill) accelerates RL data collection.
- **Rewards** are rule-based, matching the exporters' contract: bbox-IoU /
  accuracy@0.5 against the REC solution (parsed with the SAME regex the eval
  harness scores with, `eval/metrics/boxes.py`) plus a format term.
- **The update** is a jitted group-relative policy-gradient step over the
  sharded TrainState (same GSPMD mesh/optimizer stack as SFT/DPO): advantage
  = per-group standardized reward, token-mean PPO-clip surrogate with a k3
  KL penalty to the frozen reference policy (DeepSeekMath GRPO objective).

Weights flow policy -> engine between waves via `ContinuousBatcher`'s
params attribute (all engine graphs take params per call, so the swap needs
no recompilation).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from radvlm_tpu.config import IGNORE_INDEX, RadVLMConfig


@dataclasses.dataclass(frozen=True)
class GRPOConfig:
    group_size: int = 8  # completions sampled per prompt (G)
    clip_eps: float = 0.2  # PPO ratio clip
    kl_beta: float = 0.04  # weight of KL(policy || ref), k3 estimator
    temperature: float = 1.0  # rollout sampling temperature
    top_p: float = 1.0
    max_new_tokens: int = 64
    mu: int = 1  # inner optimization epochs per rollout wave
    adv_eps: float = 1e-4  # std floor in advantage standardization
    prompts_per_wave: int = 4  # prompts rolled out per wave (P); batch = P*G
    reward: str = "rec"  # registry key (see REWARD_FNS)
    iou_weight: float = 1.0  # continuous-IoU term
    acc_weight: float = 1.0  # IoU>=0.5 accuracy term (VLM-R1's reward)
    format_weight: float = 0.1  # "a parseable box is present" term
    # ciderdrl reward: path to a report corpus (one per line) for document
    # frequencies — vilmedic's REWARD_COMPLIANT CiderDRL contract
    # (`vilmedic/scores.py:16-28`, `NLG/ciderD_RL/ciderD_RL.py:26-29`)
    cider_corpus: str = ""


# ---------------------------------------------------------------------------
# Rewards (rule-based — the exporters' reward_model "style": "rule" contract)
# ---------------------------------------------------------------------------


def parse_solution_boxes(solution: str) -> List[List[float]]:
    """Ground-truth boxes from a GRPO-REC cell solution: a JSON object with a
    box list under "bbox"/"bbox_2d" (`make_grpo_rec_jsonl.py:41-42` and our
    `data/export.grpo_rec_cell`), or raw `[x, y, x, y]` text."""
    from radvlm_tpu.eval.metrics.boxes import extract_boxes

    try:
        obj = json.loads(solution)
    except (TypeError, ValueError):
        return extract_boxes(str(solution))
    if isinstance(obj, dict):
        boxes = obj.get("bbox") or obj.get("bbox_2d") or []
        if boxes and not isinstance(boxes[0], (list, tuple)):
            boxes = [boxes]  # single flat box
        return [[float(c) for c in b] for b in boxes]
    if isinstance(obj, list) and obj and isinstance(obj[0], (int, float)):
        return [[float(c) for c in obj]]
    return []


def rec_reward(
    text: str, gt_boxes: Sequence[Sequence[float]], gc: GRPOConfig
) -> float:
    """REC reward: best-IoU (continuous, dense signal) + accuracy@0.5 (the
    VLM-R1 GRPO reward) + a small format term for emitting a parseable box.
    Prediction parsing uses the eval harness regex so training optimizes the
    exact textual contract the metrics score (`compute_metrics_tasks.py:61-64`
    semantics via eval/metrics/boxes.py)."""
    from radvlm_tpu.eval.metrics.boxes import box_iou, extract_boxes

    preds = extract_boxes(text)
    if not preds:
        return 0.0
    r = gc.format_weight
    if gt_boxes:
        best = max(box_iou(p, g) for p in preds for g in gt_boxes)
        r += gc.iou_weight * best + gc.acc_weight * (1.0 if best >= 0.5 else 0.0)
    return r


def report_reward(text: str, solution: str, gc: GRPOConfig) -> float:
    """Report-generation reward: ROUGE-L F vs the ground-truth report (the
    exact scorer the eval harness reports, `eval/metrics/nlg.py rouge`) plus
    a BLEU-4 term — dense lexical signal for the flagship task the reference
    evaluates with these same metrics (`vilmedic/utils.py:36-66`)."""
    from radvlm_tpu.eval.metrics.nlg import bleu4, rouge

    if not text.strip() or not solution.strip():
        return 0.0
    rl, _ = rouge([solution], [text], kind="rougeL")
    bl, _ = bleu4([solution], [text])
    return 0.5 * rl + 0.5 * bl


def classification_reward(text: str, solution: str, gc: GRPOConfig) -> float:
    """Abnormality-classification reward: F1 between the pathology set named
    in the completion and in the solution, matched with the SAME substring
    rule the eval harness scores with
    (`eval/metrics/classification.predicted_labels_from_text`, mirroring
    `compute_metrics_tasks.py:171-231`)."""
    from radvlm_tpu.data.datasets import CHEXPERT_PATHOLOGIES
    from radvlm_tpu.eval.metrics.classification import (
        predicted_labels_from_text,
    )

    pred = set(predicted_labels_from_text(text, CHEXPERT_PATHOLOGIES))
    gt = set(predicted_labels_from_text(solution, CHEXPERT_PATHOLOGIES))
    if not gt:
        # "no finding"-style solution: reward silence, penalize hallucination
        return 1.0 if not pred else 0.0
    if not pred:
        return 0.0
    tp = len(pred & gt)
    prec, rec = tp / len(pred), tp / len(gt)
    return 2 * prec * rec / (prec + rec) if tp else 0.0


_CIDER_DF_CACHE: Dict[str, Tuple[dict, float]] = {}


def cider_rl_reward(text: str, solution: str, gc: GRPOConfig) -> float:
    """RL CIDEr-D reward (vilmedic REWARD_COMPLIANT CiderDRL,
    `vilmedic/scores.py:16-28`): per-completion CIDEr-D against the solution
    report, idf from the `gc.cider_corpus` file (one report per line) with
    the log-normalizer pinned to log(corpus size) — per-sample calls would
    otherwise zero the idf (see `eval/metrics/nlg.cider_d_rl`)."""
    import math

    from radvlm_tpu.eval.metrics.nlg import cider_d_rl, corpus_doc_freq

    if not gc.cider_corpus:
        raise ValueError("reward='ciderdrl' needs GRPOConfig.cider_corpus")
    if gc.cider_corpus not in _CIDER_DF_CACHE:
        with open(gc.cider_corpus) as f:
            corpus = [line.strip() for line in f if line.strip()]
        _CIDER_DF_CACHE[gc.cider_corpus] = (
            corpus_doc_freq(corpus), math.log(float(max(2, len(corpus))))
        )
    df, log_norm = _CIDER_DF_CACHE[gc.cider_corpus]
    if not text.strip() or not solution.strip():
        return 0.0
    return cider_d_rl([solution], [text], df, log_norm=log_norm)[0]


# Registry contract: fn(completion_text, cell, grpo_config) -> float.
REWARD_FNS: Dict[str, Callable[..., float]] = {
    "rec": lambda text, cell, gc: rec_reward(text, cell.gt_boxes, gc),
    "report": lambda text, cell, gc: report_reward(text, cell.solution, gc),
    "classification": lambda text, cell, gc: classification_reward(
        text, cell.solution, gc
    ),
    "ciderdrl": lambda text, cell, gc: cider_rl_reward(
        text, cell.solution, gc
    ),
}


def group_advantages(rewards: np.ndarray, group_size: int, eps: float) -> np.ndarray:
    """[P*G] rewards -> standardized advantages within each G-sized group
    (GRPO: A_i = (r_i - mean_G) / (std_G + eps))."""
    r = np.asarray(rewards, np.float32).reshape(-1, group_size)
    adv = (r - r.mean(axis=1, keepdims=True)) / (r.std(axis=1, keepdims=True) + eps)
    return adv.reshape(-1)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def token_logprobs(logits, labels, segment_ids):
    """Per-token log p(label_t | prefix) at supervised positions.

    Returns ([B, L-1] token logps, [B, L-1] float mask). Same shift/mask
    contract as dpo.sequence_logprob, kept per-token for the clipped
    surrogate."""
    import jax
    import jax.numpy as jnp

    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    mask = (shift_labels != IGNORE_INDEX) & (segment_ids[:, 1:] != 0)
    safe = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return tok, mask.astype(jnp.float32)


def grpo_loss(
    params: Any,
    ref_params: Any,
    cfg: RadVLMConfig,
    gc: GRPOConfig,
    batch: Dict[str, Any],
    advantages,  # [B] f32
    old_logp=None,  # [B, L-1] rollout-policy token logps; None => on-policy
    *,
    remat: bool = True,
    attn_impl: str = "auto",
):
    """Token-mean clipped surrogate with k3 KL to the frozen reference.

    On-policy (mu=1 / first inner epoch): old_logp=None uses
    stop_gradient(tok_logp) — ratio == 1 in the forward pass but the
    gradient is exactly advantage * grad(logp) (the standard PPO identity),
    so no second scoring forward is needed."""
    import jax
    import jax.numpy as jnp

    from radvlm_tpu.models import radvlm

    logits, _ = radvlm.forward(params, cfg, batch, remat=remat, attn_impl=attn_impl)
    tok_logp, mask = token_logprobs(logits, batch["labels"], batch["segment_ids"])
    ref_logits, _ = radvlm.forward(
        ref_params, cfg, batch, remat=remat, attn_impl=attn_impl
    )
    ref_logp, _ = jax.lax.stop_gradient(
        token_logprobs(ref_logits, batch["labels"], batch["segment_ids"])
    )

    old = jax.lax.stop_gradient(tok_logp) if old_logp is None else old_logp
    ratio = jnp.exp(tok_logp - old)
    adv = advantages[:, None]
    clipped = jnp.clip(ratio, 1.0 - gc.clip_eps, 1.0 + gc.clip_eps)
    pg = -jnp.minimum(ratio * adv, clipped * adv)
    # k3 KL estimator: unbiased, non-negative (DeepSeekMath eq. 4).
    d = ref_logp - tok_logp
    kl = jnp.exp(d) - d - 1.0
    per_tok = pg + gc.kl_beta * kl
    # GRPO normalizes per sequence length, then means over the group batch.
    denom = jnp.maximum(mask.sum(axis=-1), 1.0)
    seq_loss = (per_tok * mask).sum(axis=-1) / denom
    loss = jnp.mean(seq_loss)
    metrics = {
        "loss": loss,
        "kl": jnp.sum(kl * mask) / jnp.maximum(mask.sum(), 1.0),
        "clip_frac": jnp.sum((jnp.abs(ratio - 1.0) > gc.clip_eps) * mask)
        / jnp.maximum(mask.sum(), 1.0),
        "completion_tokens": mask.sum() / mask.shape[0],
    }
    return loss, metrics


def make_grpo_step(
    cfg: RadVLMConfig,
    gc: GRPOConfig,
    tx,
    *,
    remat: bool = True,
    attn_impl: str = "auto",
):
    """Jitted GRPO update over a sharded TrainState (same mesh/optimizer stack
    as SFT/DPO — `training/train_step.py`)."""
    import jax
    import optax

    from radvlm_tpu.training.train_step import TrainState

    def step_fn(state: TrainState, ref_params, batch, advantages, old_logp):
        def loss_fn(p):
            return grpo_loss(
                p, ref_params, cfg, gc, batch, advantages, old_logp,
                remat=remat, attn_impl=attn_impl,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,), static_argnames=())


def make_score_fn(cfg: RadVLMConfig, *, remat: bool = True, attn_impl: str = "auto"):
    """Jitted token-logprob scorer — old_logp for mu>1 inner epochs (computed
    once per wave under the rollout policy, before the first update)."""
    import jax

    from radvlm_tpu.models import radvlm

    def score(params, batch):
        logits, _ = radvlm.forward(
            params, cfg, batch, remat=remat, attn_impl=attn_impl
        )
        tok, _ = token_logprobs(logits, batch["labels"], batch["segment_ids"])
        return tok

    return jax.jit(score)


# ---------------------------------------------------------------------------
# Rollouts via the continuous serving engine
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class GRPOCell:
    """One prompt of the GRPO-REC jsonl (`data/export.grpo_rec_cell` /
    reference `make_grpo_rec_jsonl.py:45-50`)."""

    prompt_ids: List[int]  # tokenized user turn incl. IMAGE_TOKEN_INDEX
    images: List[np.ndarray]
    gt_boxes: List[List[float]]
    solution: str = ""  # raw solution text (report / label rewards)


def rollout_wave(
    batcher,
    cells: Sequence[GRPOCell],
    cfg: RadVLMConfig,
    gc: GRPOConfig,
    tokenizer_decode: Callable[[Sequence[int]], str],
) -> Tuple[List[Dict[str, Any]], np.ndarray]:
    """Sample group_size completions per cell through the continuous engine.

    Returns (rollouts, rewards): one rollout dict per (cell, g) in submission
    order — {"cell", "ids" (prompt token ids), "emitted", "text"}."""
    from radvlm_tpu.models import multimodal

    reqs = []
    for cell in cells:
        sample = multimodal.build_sample(cell.prompt_ids, cell.images, cfg)
        for _ in range(gc.group_size):
            reqs.append(
                (
                    cell,
                    batcher.submit(
                        sample,
                        max_new_tokens=gc.max_new_tokens,
                        temperature=gc.temperature,
                        top_p=gc.top_p,
                    ),
                )
            )
    for _ in batcher.run():
        pass
    rollouts, rewards = [], []
    reward_fn = REWARD_FNS[gc.reward]
    for cell, req in reqs:
        if req.error:
            raise RuntimeError(f"rollout failed: {req.error}")
        text = tokenizer_decode(req.emitted)
        rollouts.append(
            {"cell": cell, "ids": cell.prompt_ids, "emitted": list(req.emitted),
             "text": text}
        )
        rewards.append(reward_fn(text, cell, gc))
    return rollouts, np.asarray(rewards, np.float32)


def rollouts_to_batch(
    rollouts: Sequence[Dict[str, Any]],
    cfg: RadVLMConfig,
    *,
    pad_len: int,
    pad_tiles: int,
) -> Dict[str, np.ndarray]:
    """Collate rollouts into one supervised batch: tokens = prompt + emitted,
    labels = IGNORE over the prompt, emitted ids over the completion (the
    policy-gradient mask — token_logprobs supervises exactly the sampled
    tokens)."""
    from radvlm_tpu.models import multimodal

    samples = []
    for r in rollouts:
        ids = list(r["ids"]) + list(r["emitted"])
        labels = [IGNORE_INDEX] * len(r["ids"]) + list(r["emitted"])
        samples.append(
            multimodal.build_sample(
                ids, r["cell"].images, cfg, labels=labels
            )
        )
    return multimodal.collate(
        samples, pad_len=pad_len, pad_tiles=pad_tiles, pad_to_multiple=128
    )


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def load_grpo_cells(
    path: str,
    image_root: str,
    tokenize_fn: Callable[[str], List[int]],
    cfg: RadVLMConfig,
    template,
) -> List[GRPOCell]:
    """GRPO-REC jsonl -> GRPOCells: render the user turn with the serving
    chat template (the rollout prompt IS a chat prompt), tokenize with the
    <image> sentinel, load + parse the solution boxes."""
    import os

    from PIL import Image

    from radvlm_tpu.models import multimodal

    cells = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            question = obj.get("problem") or obj["conversations"][0]["value"]
            img_path = obj.get("image")
            if img_path and "<image>" not in question:
                question = "<image>" + question
            elif not img_path:
                question = question.replace("<image>", "")
            prompt = template.render(
                [("user", question)], add_generation_prompt=True
            )
            ids = multimodal.tokenize_with_images(tokenize_fn, prompt)
            sol = obj.get("solution")
            if sol is None:
                sol = obj["conversations"][1]["value"]
            images = []
            if img_path:
                full = os.path.join(image_root, img_path)
                images = [np.asarray(Image.open(full).convert("RGB"))]
            cells.append(
                GRPOCell(
                    prompt_ids=ids, images=images,
                    gt_boxes=parse_solution_boxes(sol),
                    solution=str(sol),
                )
            )
    return cells


def train_grpo(
    run,
    tokenize_fn: Callable[[str], List[int]],
    tokenizer_decode: Callable[[Sequence[int]], str],
    template,
    *,
    grpo_cfg: Optional[GRPOConfig] = None,
    init_params: Any = None,
    hf_checkpoint: Optional[str] = None,
    metrics_callback=None,
    num_slots: int = 8,
    rollout_max_len: int = 1024,
    prompt_buckets: Sequence[int] = (256,),
    pad_tiles: int = 2,
    eos_token_ids: Sequence[int] = (),
):
    """GRPO driver: mesh -> policy + frozen ref -> (rollout wave through the
    continuous engine -> rule rewards -> group advantages -> mu jitted
    updates) x steps -> orbax checkpoints.

    `run` is a `training.loop.RunConfig`; run.data_path points at a GRPO-REC
    jsonl (`data/create_exports.py --format grpo-rec`). The rollout engine
    holds its own (unsharded) params copy, refreshed from the TrainState
    between waves; a production multi-chip setup would instead point the
    fleet's TP engines at the state (engine graphs take params per call, so
    the swap never recompiles).
    """
    import logging
    import time

    import jax
    import jax.numpy as jnp

    from radvlm_tpu.generation.continuous import ContinuousBatcher
    from radvlm_tpu.generation.engine import GenerationConfig
    from radvlm_tpu.models import radvlm
    from radvlm_tpu.parallel import mesh as meshlib
    from radvlm_tpu.training import checkpoint as ckpt_lib
    from radvlm_tpu.training import train_step as ts
    from radvlm_tpu.training.optimizer import make_optimizer

    log = logging.getLogger(__name__)
    gc = grpo_cfg or GRPOConfig()
    if dict(run.mesh_shape or {}).get("seq", 1) > 1:
        raise ValueError("train_grpo does not wire ring attention (seq mesh)")
    mesh = meshlib.make_mesh(run.mesh_shape)

    if init_params is not None:
        params = init_params
    elif hf_checkpoint:
        from radvlm_tpu.models.hf_import import load_radvlm_checkpoint

        params = load_radvlm_checkpoint(hf_checkpoint, run.model, dtype=jnp.float32)
    else:
        params = radvlm.init_params(run.model, jax.random.key(run.seed))

    tx, _ = make_optimizer(params, run.train)
    state = ts.init_train_state(mesh, params, tx)
    ref_params = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(state.params)
    del params

    step_fn = make_grpo_step(
        run.model, gc, tx, remat=run.remat, attn_impl=run.attn_impl
    )
    score_fn = (
        make_score_fn(run.model, remat=run.remat, attn_impl=run.attn_impl)
        if gc.mu > 1 else None
    )

    manager = None
    if run.checkpoint_dir:
        manager = ckpt_lib.make_manager(
            run.checkpoint_dir, max_to_keep=run.max_to_keep,
            save_interval_steps=run.save_steps,
        )
        last = ckpt_lib.latest_step(manager)
        if run.resume and last is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                state,
            )
            state = ckpt_lib.restore_state(manager, last, abstract)
            log.info("grpo resumed from step %d", int(state.step))

    cells = load_grpo_cells(
        run.data_path, run.image_root, tokenize_fn, run.model, template
    )
    if not cells:
        raise ValueError(f"no GRPO cells in {run.data_path}")

    def rollout_params():
        # Host-gather the sharded policy for the single-device rollout engine.
        return jax.device_get(state.params)

    batcher = ContinuousBatcher(
        rollout_params(), run.model,
        GenerationConfig(
            max_new_tokens=gc.max_new_tokens,
            eos_token_ids=tuple(eos_token_ids),
        ),
        num_slots=num_slots, max_len=rollout_max_len,
        prompt_buckets=tuple(prompt_buckets), pad_tiles=pad_tiles,
        attn_impl=run.attn_impl, seed=run.seed,
    )

    # The training bucket must hold prompt + completion.
    train_pad_len = max(prompt_buckets) + gc.max_new_tokens

    step = int(state.step)
    rng = np.random.default_rng(run.seed)
    t_last = time.perf_counter()
    while run.max_steps is None or step < run.max_steps:
        wave = [cells[i] for i in rng.choice(
            len(cells), size=min(gc.prompts_per_wave, len(cells)), replace=False
        )]
        rollouts, rewards = rollout_wave(
            batcher, wave, run.model, gc, tokenizer_decode
        )
        adv = group_advantages(rewards, gc.group_size, gc.adv_eps)
        host_batch = rollouts_to_batch(
            rollouts, run.model, pad_len=train_pad_len, pad_tiles=pad_tiles
        )
        batch = ts.put_batch(mesh, host_batch)
        # Advantages shard with the batch's leading axis.
        from jax.sharding import NamedSharding, PartitionSpec as P

        adv_dev = jax.device_put(
            jnp.asarray(adv), NamedSharding(mesh, P(("data", "fsdp")))
        )
        old_logp = score_fn(state.params, batch) if score_fn else None
        for _ in range(max(1, gc.mu)):
            state, metrics = step_fn(state, ref_params, batch, adv_dev, old_logp)
            step += 1
            if run.max_steps is not None and step >= run.max_steps:
                break
        new_p = rollout_params()
        batcher.params = (
            jax.device_put(new_p, batcher.device)
            if batcher.device is not None else jax.device_put(new_p)
        )
        m = {k: float(v) for k, v in metrics.items()}
        m["reward_mean"] = float(rewards.mean())
        m["reward_std"] = float(rewards.std())
        m["sec_per_wave"] = time.perf_counter() - t_last
        t_last = time.perf_counter()
        log.info("grpo step %d: %s", step, m)
        if metrics_callback:
            metrics_callback(step, m)
        if manager:
            ckpt_lib.save_state(manager, step, state)

    if manager:
        ckpt_lib.save_state(manager, step, state)
        ckpt_lib.wait_until_finished(manager)
    return state
