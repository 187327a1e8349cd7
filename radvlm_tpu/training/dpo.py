"""DPO training: direct preference optimization over chosen/rejected pairs.

Rebuild of the reference's DPO path (`finetuning/llava/train/train_dpo.py`,
`LLaVADPOTrainer` — a TRL DPOTrainer subclass, `llava_trainer.py:466-527`):

    loss = -log sigmoid(beta * [(logp_c - ref_logp_c) - (logp_r - ref_logp_r)])

with per-sequence logp summed over supervised (assistant) tokens. The policy and
the frozen reference model share this framework's multimodal forward; batches
carry the chosen and rejected variants stacked along the batch axis (one vision
encode each — chosen/rejected share images but are separate rows, mirroring the
reference's concatenated_forward).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from radvlm_tpu.config import IGNORE_INDEX, RadVLMConfig
from radvlm_tpu.models import radvlm


@dataclasses.dataclass(frozen=True)
class DPOConfig:
    beta: float = 0.1
    label_smoothing: float = 0.0


def sequence_logprob(
    params: Any,
    cfg: RadVLMConfig,
    batch: Dict[str, jnp.ndarray],
    *,
    remat: bool = True,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Sum of log p(label_t | prefix) over supervised positions. [B]."""
    logits, _ = radvlm.forward(params, cfg, batch, remat=remat, attn_impl=attn_impl)
    labels = batch["labels"]
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    mask = (shift_labels != IGNORE_INDEX) & (batch["segment_ids"][:, 1:] != 0)
    safe = jnp.where(mask, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_logp * mask, axis=-1)


def dpo_loss(
    params: Any,
    ref_params: Any,
    cfg: RadVLMConfig,
    dpo: DPOConfig,
    chosen_batch: Dict[str, jnp.ndarray],
    rejected_batch: Dict[str, jnp.ndarray],
    *,
    remat: bool = True,
    attn_impl: str = "auto",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    pol_c = sequence_logprob(params, cfg, chosen_batch, remat=remat, attn_impl=attn_impl)
    pol_r = sequence_logprob(params, cfg, rejected_batch, remat=remat, attn_impl=attn_impl)
    ref_c = jax.lax.stop_gradient(
        sequence_logprob(ref_params, cfg, chosen_batch, remat=remat, attn_impl=attn_impl)
    )
    ref_r = jax.lax.stop_gradient(
        sequence_logprob(ref_params, cfg, rejected_batch, remat=remat, attn_impl=attn_impl)
    )
    logits = dpo.beta * ((pol_c - ref_c) - (pol_r - ref_r))
    ls = dpo.label_smoothing
    loss = -(
        (1 - ls) * jax.nn.log_sigmoid(logits) + ls * jax.nn.log_sigmoid(-logits)
    )
    loss = jnp.mean(loss)
    metrics = {
        "loss": loss,
        "reward_accuracy": jnp.mean((pol_c - ref_c) > (pol_r - ref_r)),
        "chosen_reward": jnp.mean(dpo.beta * (pol_c - ref_c)),
        "rejected_reward": jnp.mean(dpo.beta * (pol_r - ref_r)),
        "reward_margin": jnp.mean(dpo.beta * ((pol_c - ref_c) - (pol_r - ref_r))),
    }
    return loss, metrics


def make_dpo_step(
    cfg: RadVLMConfig,
    dpo: DPOConfig,
    tx,
    *,
    remat: bool = True,
    attn_impl: str = "auto",
):
    """Jitted DPO train step over a sharded TrainState + frozen ref params."""
    import optax

    from radvlm_tpu.training.train_step import TrainState

    def step_fn(state: TrainState, ref_params, chosen, rejected):
        def loss_fn(p):
            return dpo_loss(
                p, ref_params, cfg, dpo, chosen, rejected,
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

    return jax.jit(step_fn, donate_argnums=(0,))


def dpo_cell_to_batches(cell: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """Split a DPO llava cell ({"prompt", "chosen", "rejected", "image"}) into
    chosen/rejected conversation cells (`train_dpo.py` DPODataset contract)."""
    base = {"image": cell.get("image")}
    prompt_turn = {"from": "human", "value": cell["prompt"]}
    chosen = {**base, "conversations": [prompt_turn, {"from": "gpt", "value": cell["chosen"]}]}
    rejected = {**base, "conversations": [prompt_turn, {"from": "gpt", "value": cell["rejected"]}]}
    return chosen, rejected


# ---------------------------------------------------------------------------
# End-to-end pipeline: preference json -> paired batches -> sharded DPO steps
# -> orbax checkpoints (+ auto-resume). The analog of the reference's
# `train_dpo.py:1449+` driver (DPODataset `:908`, DPODataCollator `:1187`,
# LLaVADPOTrainer `llava_trainer.py:466-527`).
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DPOPairDataset:
    """Preference cells -> (chosen MMSample, rejected MMSample) pairs, reusing
    the SFT tokenization/expansion machinery for each side."""

    cells: Any
    image_root: str
    cfg: RadVLMConfig
    tokenize_fn: Any
    max_len: Any = None

    def __post_init__(self):
        from radvlm_tpu.data.loader import LlavaJsonDataset

        chosen_cells, rejected_cells = [], []
        for cell in self.cells:
            c, r = dpo_cell_to_batches(cell)
            chosen_cells.append(c)
            rejected_cells.append(r)
        mk = lambda cells: LlavaJsonDataset(
            cells=cells, image_root=self.image_root, cfg=self.cfg,
            tokenize_fn=self.tokenize_fn, max_len=self.max_len,
        )
        self._chosen = mk(chosen_cells)
        self._rejected = mk(rejected_cells)

    def __len__(self):
        return len(self.cells)

    def estimated_length(self, i: int) -> int:
        return max(self._chosen.estimated_length(i),
                   self._rejected.estimated_length(i))

    def __getitem__(self, i: int):
        return self._chosen[i], self._rejected[i]


def _build_pair_batch(dataset, idxs, bucket):
    """Collate one plan batch into (chosen, rejected) host batches with the
    SAME static bucket shape (so both run through one compiled step)."""
    import logging

    from radvlm_tpu.models import multimodal

    log = logging.getLogger(__name__)
    chosen, rejected = [], []
    for i in idxs:
        try:
            c, r = dataset[i]
        except Exception as e:  # corrupt sample: skip with log (SFT contract)
            log.warning("skipping dpo sample %d: %s", i, e)
            continue
        chosen.append(c)
        rejected.append(r)
    if not chosen:
        raise RuntimeError(f"entire dpo batch failed to load: {idxs}")
    if len(chosen) < len(idxs):
        # Shape-only filler: strip supervision so the duplicated pair carries
        # ZERO gradient (sequence_logprob sums an empty label mask; a verbatim
        # duplicate doubled that pair's weight — same contract as the SFT
        # loader's filler).
        import dataclasses as _dc

        import numpy as _np

        from radvlm_tpu.config import IGNORE_INDEX

        fc = _dc.replace(
            chosen[-1], labels=_np.full_like(chosen[-1].labels, IGNORE_INDEX)
        )
        fr = _dc.replace(
            rejected[-1], labels=_np.full_like(rejected[-1].labels, IGNORE_INDEX)
        )
        while len(chosen) < len(idxs):
            chosen.append(fc)
            rejected.append(fr)
    collate = lambda ss: multimodal.collate(
        ss, pad_len=bucket.max_len, pad_tiles=bucket.max_tiles,
        pad_to_multiple=128,
    )
    cb, rb = collate(chosen), collate(rejected)
    for b in (cb, rb):
        if b["tokens"].shape[1] > bucket.max_len:
            for key in ("tokens", "img_src", "labels", "segment_ids", "positions"):
                b[key] = b[key][:, : bucket.max_len]
    return cb, rb


def train_dpo(
    run,
    tokenize_fn,
    *,
    dpo_cfg: Optional[DPOConfig] = None,
    init_params: Any = None,
    hf_checkpoint: Optional[str] = None,
    metrics_callback=None,
):
    """DPO driver: mesh -> policy + frozen reference (the SFT init, standard
    DPO) -> paired bucketed batches -> jitted sharded step -> orbax + resume.

    `run` is a `training.loop.RunConfig` whose data_path points at a preference
    json: a list of {"prompt", "chosen", "rejected", "image"?} cells.
    """
    if dict(run.mesh_shape or {}).get("seq", 1) > 1:
        raise ValueError(
            "train_dpo does not wire ring attention for a seq>1 mesh (the SFT "
            "driver does); use a (data, fsdp, tensor) mesh for DPO"
        )
    import json
    import logging
    import time

    import jax
    import jax.numpy as jnp

    from radvlm_tpu.data.loader import bucketed_batches
    from radvlm_tpu.parallel import mesh as meshlib
    from radvlm_tpu.parallel import sharding as shardlib
    from radvlm_tpu.training import checkpoint as ckpt_lib
    from radvlm_tpu.training import train_step as ts
    from radvlm_tpu.training.optimizer import make_optimizer

    log = logging.getLogger(__name__)
    dpo_cfg = dpo_cfg or DPOConfig()
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
    # Frozen reference = the policy's starting point (reference DPO semantics).
    # Real copy: the step donates state.params, so ref must not alias them.
    ref_params = jax.jit(lambda t: jax.tree.map(jnp.copy, t))(state.params)
    del params
    step_fn = make_dpo_step(
        run.model, dpo_cfg, tx, remat=run.remat, attn_impl=run.attn_impl
    )

    manager = None
    start_epoch, skip_batches = 0, 0
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
            data_state = ckpt_lib.load_data_state(run.checkpoint_dir, last)
            if data_state:
                start_epoch = int(data_state["epoch"])
                skip_batches = int(data_state["batch_in_epoch"])
            log.info("dpo resumed from step %d", last)

    with open(run.data_path) as f:
        cells = json.load(f)
    dataset = DPOPairDataset(
        cells=cells, image_root=run.image_root, cfg=run.model,
        tokenize_fn=tokenize_fn, max_len=run.buckets[-1].max_len,
    )
    lengths = [dataset.estimated_length(i) for i in range(len(dataset))]

    step = int(state.step)
    t_last = time.perf_counter()
    epoch, batch_in_epoch = start_epoch, skip_batches
    for epoch in range(start_epoch, run.num_epochs):
        plan = bucketed_batches(
            lengths, run.micro_batch_size, buckets=run.buckets,
            seed=run.seed + epoch, process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        batch_in_epoch = skip_batches if epoch == start_epoch else 0
        for b, idxs in plan[batch_in_epoch:]:
            if run.max_steps is not None and step >= run.max_steps:
                break
            cb, rb = _build_pair_batch(dataset, idxs, run.buckets[b])
            chosen = ts.put_batch(mesh, cb)
            rejected = ts.put_batch(mesh, rb)
            state, metrics = step_fn(state, ref_params, chosen, rejected)
            step += 1
            batch_in_epoch += 1
            if step % run.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["sec_per_step"] = (time.perf_counter() - t_last) / run.log_every
                t_last = time.perf_counter()
                log.info("dpo step %d: %s", step, m)
                if metrics_callback:
                    metrics_callback(step, m)
            if manager and ckpt_lib.save_state(manager, step, state):
                ckpt_lib.save_data_state(
                    run.checkpoint_dir, step, epoch, batch_in_epoch
                )
        if run.max_steps is not None and step >= run.max_steps:
            break

    if manager:
        if ckpt_lib.save_state(manager, step, state):
            ckpt_lib.save_data_state(
                run.checkpoint_dir, step, epoch, batch_in_epoch
            )
        ckpt_lib.wait_until_finished(manager)
    return state
