"""SFT training driver: data -> sharded step -> checkpoints -> logs.

Rebuild of the reference's `train()` orchestration
(`finetuning/llava/train/train.py:1449-1725` + HF Trainer loop): builds the mesh,
loads/initializes params (HF import or random), freezes per mm_tunable_parts,
streams bucketed batches from the PrefetchLoader, runs the pjit train step, and
checkpoints with orbax (auto-resume from the latest step like the reference's
checkpoint-* glob).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from radvlm_tpu.config import RadVLMConfig
from radvlm_tpu.data.export import load_mixture
from radvlm_tpu.data.loader import Bucket, DEFAULT_BUCKETS, LlavaJsonDataset, PrefetchLoader
from radvlm_tpu.parallel import mesh as meshlib
from radvlm_tpu.training import checkpoint as ckpt_lib
from radvlm_tpu.training import train_step as ts
from radvlm_tpu.training.optimizer import TrainConfig

log = logging.getLogger(__name__)


@dataclasses.dataclass
class RunConfig:
    model: RadVLMConfig
    train: TrainConfig
    data_path: str  # llava json / brace glob / yaml mixture
    image_root: str
    mesh_shape: Optional[Dict[str, int]] = None
    micro_batch_size: int = 8  # per step (global across batch axes)
    max_steps: Optional[int] = None
    num_epochs: int = 1
    log_every: int = 10
    checkpoint_dir: Optional[str] = None
    save_steps: int = 200
    max_to_keep: int = 1
    resume: bool = True
    seed: int = 0
    buckets: tuple = DEFAULT_BUCKETS
    remat: bool = True
    attn_impl: str = "auto"
    loader_workers: int = 8
    # LoRA (adapter-only) finetuning; 0 = full finetune.
    lora_rank: int = 0
    lora_alpha: float = 256.0
    # QLoRA: int8-quantize the frozen base before attaching adapters (the
    # reference's 4/8-bit bitsandbytes prep inside train(),
    # `finetuning/llava/train/train.py:1466-1503`) — the base stays int8 in
    # HBM, adapters train in f32 (training/lora.py). Requires lora_rank > 0.
    quantize_base: bool = False
    # Ring-attention schedule when the mesh has seq > 1: "zigzag" (load-
    # balanced, default) or "contiguous".
    ring_schedule: str = "zigzag"
    # Pipeline parallelism: when the mesh has stage > 1 the SFT step runs the
    # GPipe schedule (parallel/pp.py) with this many microbatches per step.
    pp_microbatches: int = 4
    # Virtual stages per device (Megatron interleaved schedule): bubble / V.
    pp_interleave: int = 1
    # Positional-skipping augmentation for long-context rope generalization
    # (reference `llava_arch.py:546-552`, flags `train.py:107-108`): 0 = off;
    # >0 = per-sample random left/right position offsets in [0, range].
    pos_skip_range: int = 0


def train(
    run: RunConfig,
    tokenize_fn: Callable[[str], List[int]],
    *,
    init_params: Optional[Any] = None,
    hf_checkpoint: Optional[str] = None,
    metrics_callback: Optional[Callable[[int, Dict[str, float]], None]] = None,
):
    """Run SFT. Returns the final TrainState."""
    import jax
    import jax.numpy as jnp

    mesh = meshlib.make_mesh(run.mesh_shape)
    log.info("mesh: %s", dict(mesh.shape))

    attn_impl = run.attn_impl
    seq_ranks = dict(mesh.shape).get("seq", 1)
    if seq_ranks > 1:
        # Sequence parallelism: register the ring context and route the LLM's
        # training attention through ring attention over the seq axis.
        from radvlm_tpu.parallel.ring import enable_ring_attention

        local_impl = "flash" if jax.default_backend() == "tpu" else "xla"
        enable_ring_attention(mesh, axis_name="seq", impl=local_impl,
                              schedule=run.ring_schedule)
        attn_impl = "ring"
        log.info("ring attention enabled over seq=%d (%s schedule)",
                 seq_ranks, run.ring_schedule)

    # --- params ---
    if init_params is not None:
        params = init_params
    elif hf_checkpoint:
        from radvlm_tpu.models.hf_import import load_radvlm_checkpoint

        params = load_radvlm_checkpoint(hf_checkpoint, run.model, dtype=jnp.float32)
    else:
        from radvlm_tpu.models import radvlm

        params = radvlm.init_params(run.model, jax.random.key(run.seed))

    lora_base = None
    if run.quantize_base and not run.lora_rank:
        raise ValueError("--quantize-base is a QLoRA option: set lora_rank > 0")
    if run.lora_rank:
        from radvlm_tpu.training.lora import LoraConfig

        if run.quantize_base:
            from radvlm_tpu.ops import quant

            params = quant.quantize_params(params)
        lcfg = LoraConfig(rank=run.lora_rank, alpha=run.lora_alpha)
        if dict(mesh.shape).get("stage", 1) > 1:
            from radvlm_tpu.parallel import pp

            state, lora_base, step_fn = pp.setup_pp_lora_training(
                mesh, run.model, run.train, lcfg, params,
                seed=run.seed,
                pp_cfg=pp.PPStepConfig(
                    n_microbatches=run.pp_microbatches, remat=run.remat,
                    attn_impl=attn_impl, interleave=run.pp_interleave,
                ),
            )
        else:
            state, lora_base, step_fn = ts.setup_lora_training(
                mesh, run.model, run.train, lcfg, params,
                seed=run.seed, remat=run.remat, attn_impl=attn_impl,
            )
    elif dict(mesh.shape).get("stage", 1) > 1:
        from radvlm_tpu.parallel import pp

        state, step_fn, tx = pp.setup_pp_training(
            mesh, run.model, run.train, params,
            pp_cfg=pp.PPStepConfig(
                n_microbatches=run.pp_microbatches, remat=run.remat,
                attn_impl=attn_impl, interleave=run.pp_interleave,
            ),
        )
    else:
        state, step_fn, tx = ts.setup_training(
            mesh, run.model, run.train, params,
            remat=run.remat, attn_impl=attn_impl,
        )
    del params

    # --- resume ---
    manager = None
    start_epoch, skip_batches = 0, 0
    if run.checkpoint_dir:
        manager = ckpt_lib.make_manager(
            run.checkpoint_dir,
            max_to_keep=run.max_to_keep,
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
            log.info("resumed from step %d (epoch %d, skipping %d batches)",
                     last, start_epoch, skip_batches)

    # --- data ---
    cells = load_mixture(run.data_path)
    dataset = LlavaJsonDataset(
        cells=cells,
        image_root=run.image_root,
        cfg=run.model,
        tokenize_fn=tokenize_fn,
        max_len=run.buckets[-1].max_len,
    )
    loader = PrefetchLoader(
        dataset,
        run.micro_batch_size,
        buckets=run.buckets,
        seed=run.seed,
        num_workers=run.loader_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        pos_skip_range=run.pos_skip_range,
    )

    # --- loop ---
    step = int(state.step)
    t_last = time.perf_counter()
    tokens_seen = 0
    epoch, batch_in_epoch = start_epoch, skip_batches
    for epoch in range(start_epoch, run.num_epochs):
        batch_in_epoch = skip_batches if epoch == start_epoch else 0
        for host_batch in loader.epoch(epoch, skip=batch_in_epoch):
            if run.max_steps is not None and step >= run.max_steps:
                break
            if seq_ranks > 1 and run.ring_schedule == "zigzag":
                from radvlm_tpu.parallel.ring import zigzag_shift_batch

                host_batch = zigzag_shift_batch(host_batch, seq_ranks)
            batch = ts.put_batch(mesh, host_batch)
            if lora_base is not None:
                state, metrics = step_fn(state, lora_base, batch)
            else:
                state, metrics = step_fn(state, batch)
            step += 1
            batch_in_epoch += 1
            tokens_seen += int((host_batch["segment_ids"] != 0).sum())
            if step % run.log_every == 0:
                now = time.perf_counter()
                m = {k: float(v) for k, v in metrics.items()}
                m["tokens_per_sec"] = tokens_seen / max(now - t_last, 1e-9)
                tokens_seen = 0
                t_last = now
                log.info("step %d: %s", step, m)
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
