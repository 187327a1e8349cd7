"""SFT train step under pjit (ZeRO-3-equivalent sharded training).

Rebuild of the reference training loop core (`finetuning/llava/train/train.py:1697`,
HF Trainer + DeepSpeed ZeRO-3): here the step is one jitted function over a
(data, fsdp, tensor) mesh. Parameters and optimizer state are sharded by
`parallel.sharding` rules; XLA inserts the allgather/reduce-scatter schedule that
DeepSpeed performs imperatively. Gradient checkpointing maps to `jax.checkpoint`
inside the model (remat flag), gradient accumulation to `optax.MultiSteps`.

The "computation follows data" pattern: `init_train_state` device_puts params with
their NamedShardings, `tx.init` runs under jit so optimizer state inherits the param
shardings, and `train_step` needs no explicit in/out shardings at all.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radvlm_tpu.config import RadVLMConfig
from radvlm_tpu.models import radvlm
from radvlm_tpu.parallel import sharding as shardlib
from radvlm_tpu.training.optimizer import TrainConfig, make_optimizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def init_train_state(
    mesh: Mesh,
    params: Any,
    tx: optax.GradientTransformation,
) -> TrainState:
    """Shard params onto the mesh and init optimizer state under jit (so the opt
    state is born sharded — no host-side 2x-memory spike, the ZeRO-3 property)."""
    params = shardlib.shard_params(mesh, params)
    opt_state = jax.jit(tx.init)(params)
    # Leaves that inherited param shardings are fine; scalars (schedule counts,
    # MultiSteps counters) come out single-device — pin them replicated on the
    # mesh so the restored-from-checkpoint state composes with the step fn.
    rep = NamedSharding(mesh, P())

    def _on_mesh(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh.shape == mesh.shape:
            return x
        return jax.device_put(x, rep)

    opt_state = jax.tree.map(_on_mesh, opt_state)
    step = jax.device_put(jnp.zeros((), jnp.int32), rep)
    return TrainState(step=step, params=params, opt_state=opt_state)


def make_train_step(
    cfg: RadVLMConfig,
    tx: optax.GradientTransformation,
    *,
    remat: bool = True,
    attn_impl: str = "auto",
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step. Batch arrays must already be device_put with the
    batch shardings (leading dim over data+fsdp)."""

    # Stochastic train-time resampling (masked_drop) needs a per-step rng;
    # fold the step counter so the stream is deterministic and resumable.
    needs_rng = cfg.resampler.kind == "masked_drop"

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng = (
            jax.random.fold_in(jax.random.key(0), state.step)
            if needs_rng else None
        )

        def loss_fn(params):
            return radvlm.loss_fn(
                params, cfg, batch, remat=remat, attn_impl=attn_impl, rng=rng
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_lora_train_step(
    cfg: RadVLMConfig,
    lora_cfg,
    tx: optax.GradientTransformation,
    *,
    remat: bool = True,
    attn_impl: str = "auto",
):
    """Jitted LoRA step: state.params are the ADAPTERS; the frozen base rides as
    a separate (non-donated) argument (reference LoRA path `train.py:1515-1532`;
    adapter-only checkpoints fall out since the TrainState holds only adapters)."""
    from radvlm_tpu.training.lora import merge_lora

    def step_fn(state: TrainState, base_params, batch: Dict[str, jnp.ndarray]):
        def loss_fn(adapters):
            # training_mode: a QUANTIZED frozen base (QLoRA,
            # `train.py:1466-1503`) must matmul via differentiable dequant —
            # the W8A8 activation round and the Pallas int8 kernels have no
            # usable gradient and would silently zero backprop.
            from radvlm_tpu.ops import quant

            with quant.training_mode():
                merged = merge_lora(base_params, adapters, lora_cfg)
                return radvlm.loss_fn(
                    merged, cfg, batch, remat=remat, attn_impl=attn_impl
                )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        adapters = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=adapters, opt_state=opt_state),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def setup_lora_training(
    mesh: Mesh,
    model_cfg: RadVLMConfig,
    train_cfg,
    lora_cfg,
    base_params: Any,
    *,
    seed: int = 0,
    remat: bool = True,
    attn_impl: str = "auto",
):
    """LoRA setup: shard the frozen base with the usual rules, replicate the
    small adapters, AdamW over adapters only. Returns (state, base, step_fn)."""
    import optax as _optax

    from radvlm_tpu.training.lora import init_lora
    from radvlm_tpu.training.optimizer import make_schedule

    base = shardlib.shard_params(mesh, base_params)
    adapters = init_lora(base_params, lora_cfg, jax.random.key(seed))
    rep = NamedSharding(mesh, P())
    adapters = jax.device_put(adapters, rep)
    tx = _optax.chain(
        _optax.clip_by_global_norm(train_cfg.max_grad_norm),
        _optax.adamw(
            make_schedule(train_cfg, train_cfg.learning_rate),
            b1=train_cfg.adam_b1, b2=train_cfg.adam_b2, eps=train_cfg.adam_eps,
            weight_decay=train_cfg.weight_decay,
        ),
    )
    if train_cfg.grad_accum_steps > 1:
        tx = _optax.MultiSteps(tx, train_cfg.grad_accum_steps)
    opt_state = jax.device_put(tx.init(adapters), rep)
    state = TrainState(
        step=jax.device_put(jnp.zeros((), jnp.int32), rep),
        params=adapters,
        opt_state=opt_state,
    )
    step_fn = make_lora_train_step(
        model_cfg, lora_cfg, tx, remat=remat, attn_impl=attn_impl
    )
    return state, base, step_fn


def put_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Host numpy batch -> device arrays sharded over the batch axes."""
    return jax.device_put(batch, shardlib.batch_shardings(mesh, batch))


def setup_training(
    mesh: Mesh,
    model_cfg: RadVLMConfig,
    train_cfg: TrainConfig,
    params: Any,
    *,
    remat: bool = True,
    attn_impl: str = "auto",
):
    """One-call setup: optimizer, sharded state, jitted step.

    Returns (state, step_fn, tx).
    """
    tx, _ = make_optimizer(params, train_cfg)
    state = init_train_state(mesh, params, tx)
    step_fn = make_train_step(model_cfg, tx, remat=remat, attn_impl=attn_impl)
    return state, step_fn, tx
