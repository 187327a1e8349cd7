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
from typing import Any, Dict, Tuple

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


def dpo_cell_to_batches(cell: Dict[str, Any], dataset) -> Tuple[Dict, Dict]:
    """Split a DPO llava cell ({"prompt", "chosen", "rejected", "image"}) into
    chosen/rejected conversation cells (`train_dpo.py` DPODataset contract)."""
    base = {"image": cell.get("image")}
    prompt_turn = {"from": "human", "value": cell["prompt"]}
    chosen = {**base, "conversations": [prompt_turn, {"from": "gpt", "value": cell["chosen"]}]}
    rejected = {**base, "conversations": [prompt_turn, {"from": "gpt", "value": cell["rejected"]}]}
    return chosen, rejected
