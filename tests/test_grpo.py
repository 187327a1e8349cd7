"""GRPO: native group-relative policy optimization (the reference only
EXPORTS GRPO/VeRL data for external RL frameworks — `make_grpo_rec_jsonl.py`,
`create_verl_dataset_llava.py`; here the loop closes in-repo: continuous-
engine rollouts -> rule rewards -> jitted sharded update)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from radvlm_tpu.models import multimodal, radvlm
from radvlm_tpu.training import grpo
from radvlm_tpu.training.grpo import (
    GRPOConfig, group_advantages, grpo_loss, parse_solution_boxes,
    rec_reward, rollouts_to_batch, token_logprobs,
)


def test_parse_solution_boxes():
    assert parse_solution_boxes('{"bbox": [[0.1, 0.2, 0.5, 0.6]]}') == [
        [0.1, 0.2, 0.5, 0.6]
    ]
    # VLM-R1 key + single flat box (reference `make_grpo_rec_jsonl.py:41`)
    assert parse_solution_boxes(
        '{"bbox_2d": [0.1, 0.2, 0.5, 0.6], "label": "x"}'
    ) == [[0.1, 0.2, 0.5, 0.6]]
    assert parse_solution_boxes("[0.1, 0.2, 0.5, 0.6]") == [[0.1, 0.2, 0.5, 0.6]]
    # raw bracket text (the instruction-bank bbox contract)
    assert parse_solution_boxes("at [0.10, 0.20, 0.50, 0.60] maybe") == [
        [0.10, 0.20, 0.50, 0.60]
    ]
    assert parse_solution_boxes("no boxes here") == []


def test_rec_reward():
    gc = GRPOConfig(iou_weight=1.0, acc_weight=1.0, format_weight=0.1)
    gt = [[0.1, 0.1, 0.5, 0.5]]
    # exact match: format + iou(1.0) + acc
    assert rec_reward("box: [0.10, 0.10, 0.50, 0.50]", gt, gc) == pytest.approx(2.1)
    # no parseable box -> 0 (not even format credit)
    assert rec_reward("somewhere upper left", gt, gc) == 0.0
    # disjoint box -> format credit only
    assert rec_reward("[0.80, 0.80, 0.90, 0.90]", gt, gc) == pytest.approx(0.1)
    # IoU in (0, 0.5): format + iou, no acc term
    r = rec_reward("[0.10, 0.10, 0.30, 0.50]", gt, gc)
    assert 0.1 < r < 1.1


def test_report_reward():
    from radvlm_tpu.training.grpo import report_reward

    gc = GRPOConfig()
    sol = "There is a small left pleural effusion. No pneumothorax."
    # exact match scores highest; unrelated text scores near zero
    assert report_reward(sol, sol, gc) == pytest.approx(1.0, abs=1e-6)
    hi = report_reward("Small left pleural effusion present.", sol, gc)
    lo = report_reward("The weather is sunny today.", sol, gc)
    assert hi > lo >= 0.0
    assert report_reward("", sol, gc) == 0.0


def test_classification_reward():
    from radvlm_tpu.training.grpo import classification_reward

    gc = GRPOConfig()
    sol = "Findings: Pleural Effusion, Cardiomegaly."
    # exact label set -> F1 = 1
    assert classification_reward(
        "pleural effusion and cardiomegaly", sol, gc
    ) == pytest.approx(1.0)
    # one of two labels + no false positives -> F1 = 2/3
    assert classification_reward("cardiomegaly", sol, gc) == pytest.approx(2 / 3)
    # hallucinated extra label lowers precision
    assert classification_reward(
        "cardiomegaly, pneumonia", sol, gc
    ) < classification_reward("cardiomegaly", sol, gc) + 1e-9
    # clean "no finding" case
    assert classification_reward("no findings", "No Finding", gc) in (0.0, 1.0)
    assert classification_reward("", "nothing acute", gc) == 1.0


def test_reward_registry_dispatch():
    """Registry fns take (text, cell, gc) — the rollout loop's contract."""
    cell = grpo.GRPOCell(
        prompt_ids=[1], images=[], gt_boxes=[[0.1, 0.1, 0.5, 0.5]],
        solution="There is evidence of cardiomegaly on the chest radiograph.",
    )
    gc = GRPOConfig()
    assert grpo.REWARD_FNS["rec"](
        "[0.10, 0.10, 0.50, 0.50]", cell, gc
    ) == pytest.approx(2.1)
    assert grpo.REWARD_FNS["classification"]("cardiomegaly", cell, gc) == 1.0
    assert grpo.REWARD_FNS["report"](cell.solution, cell, gc) == pytest.approx(
        1.0, abs=1e-6
    )


def test_group_advantages():
    rewards = np.array([1.0, 0.0, 1.0, 0.0, 5.0, 5.0, 5.0, 5.0], np.float32)
    adv = group_advantages(rewards, 4, eps=1e-4)
    # each group standardized independently
    assert adv[:4].mean() == pytest.approx(0.0, abs=1e-6)
    assert adv[0] > 0 > adv[1]
    # constant-reward group -> zero advantage (std floor, no NaN)
    assert np.allclose(adv[4:], 0.0)


def _rollout_batch(cfg, rng, completions, prompt_len=6):
    """Hand-built rollouts with fixed completion token ids."""
    rollouts = []
    for comp in completions:
        ids = list(rng.integers(3, cfg.text.vocab_size, size=prompt_len))
        cell = grpo.GRPOCell(prompt_ids=ids, images=[], gt_boxes=[])
        rollouts.append(
            {"cell": cell, "ids": ids, "emitted": list(comp), "text": ""}
        )
    return rollouts_to_batch(rollouts, cfg, pad_len=64, pad_tiles=1)


def test_rollouts_to_batch_masks_prompt(rng):
    cfg = cfglib.tiny_test_config()
    batch = _rollout_batch(cfg, rng, [[7, 8, 9], [11, 12]])
    labels = batch["labels"]
    # prompt positions IGNORE, completion positions = sampled ids
    assert (labels[0] != IGNORE_INDEX).sum() == 3
    assert (labels[1] != IGNORE_INDEX).sum() == 2
    assert list(labels[0][labels[0] != IGNORE_INDEX]) == [7, 8, 9]


def test_grpo_loss_onpolicy_identities(rng):
    """pol == ref on-policy: KL is exactly 0, ratio is 1 (no clipping), and
    the loss equals -mean(advantage) (token-mean of -adv per sequence)."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    batch = _rollout_batch(cfg, rng, [[7, 8, 9], [11, 12]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    gc = GRPOConfig(clip_eps=0.2, kl_beta=0.5)
    adv = jnp.asarray([1.5, -0.5], jnp.float32)
    loss, m = grpo_loss(
        params, params, cfg, gc, batch, adv, remat=False, attn_impl="xla"
    )
    assert float(m["kl"]) == pytest.approx(0.0, abs=1e-6)
    assert float(m["clip_frac"]) == pytest.approx(0.0)
    assert float(loss) == pytest.approx(-(1.5 - 0.5) / 2, abs=1e-5)


def test_grpo_step_moves_logprob(rng):
    """One SGD step must raise the positive-advantage completion's logprob
    and lower the negative one's (policy-gradient direction check)."""
    from radvlm_tpu.training.dpo import sequence_logprob
    from radvlm_tpu.training.grpo import make_grpo_step
    from radvlm_tpu.parallel.mesh import make_mesh
    from radvlm_tpu.training import train_step as ts

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    mesh = make_mesh({"data": 2, "fsdp": 1}, devices=jax.devices()[:2])
    host = _rollout_batch(cfg, rng, [[7, 8, 9], [11, 12, 13]])
    tx = optax.sgd(0.5)
    state = ts.init_train_state(mesh, params, tx)
    ref = jax.tree.map(jnp.copy, state.params)
    batch = ts.put_batch(mesh, host)
    gc = GRPOConfig(kl_beta=0.0)
    step_fn = make_grpo_step(cfg, gc, tx, remat=False, attn_impl="xla")
    adv = jnp.asarray([1.0, -1.0], jnp.float32)

    jb = {k: jnp.asarray(v) for k, v in host.items()}
    before = np.asarray(sequence_logprob(ref, cfg, jb, remat=False, attn_impl="xla"))
    state, metrics = step_fn(state, ref, batch, adv, None)
    after_params = jax.device_get(state.params)
    after = np.asarray(
        sequence_logprob(after_params, cfg, jb, remat=False, attn_impl="xla")
    )
    assert after[0] > before[0]  # positive advantage: probability up
    assert after[1] < before[1]  # negative advantage: probability down
    assert np.isfinite(float(metrics["loss"]))


def test_grpo_loss_clipping(rng):
    """With a stale old_logp far from the policy, the ratio clips: loss uses
    the clipped surrogate and clip_frac > 0."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    batch = _rollout_batch(cfg, rng, [[7, 8, 9], [11, 12]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    gc = GRPOConfig(clip_eps=0.2, kl_beta=0.0)
    adv = jnp.asarray([1.0, 1.0], jnp.float32)
    # old_logp much higher than the true logp -> ratio << 1 -> clip at 0.8
    from radvlm_tpu.models import radvlm as rv

    logits, _ = rv.forward(params, cfg, batch, remat=False, attn_impl="xla")
    tok, mask = token_logprobs(logits, batch["labels"], batch["segment_ids"])
    old = tok + 5.0  # ratio = exp(-5)
    loss, m = grpo_loss(
        params, params, cfg, gc, batch, adv, old, remat=False, attn_impl="xla"
    )
    assert float(m["clip_frac"]) > 0.9
    # clipped surrogate with adv>0: min(r*a, 0.8*a) = r*a (tiny) -> ~0 loss
    assert float(loss) == pytest.approx(0.0, abs=1e-2)


@pytest.mark.slow
def test_train_grpo_e2e(tmp_path, rng):
    """Driver smoke on the 8-CPU mesh: jsonl cells -> engine rollouts ->
    rewards -> sharded updates; params move, metrics logged, engine weights
    resync between waves."""
    from PIL import Image

    from radvlm_tpu.data.chat import QWEN_CHATML
    from radvlm_tpu.training.loop import RunConfig
    from radvlm_tpu.training.optimizer import TrainConfig

    cfg = cfglib.tiny_test_config(vocab_size=300)

    # Reward with real variance on random text: count of byte 'a' (97).
    grpo.REWARD_FNS["count_a"] = lambda text, gt, gc: float(text.count("a"))

    cells = []
    for i in range(3):
        img = Image.fromarray(
            rng.integers(0, 255, size=(48, 40, 3), dtype=np.uint8)
        )
        p = tmp_path / f"img{i}.png"
        img.save(p)
        cells.append({
            "id": i,
            "image": p.name,
            "problem": "<image>find the left lung",
            "solution": '{"bbox": [[0.1, 0.2, 0.5, 0.6]]}',
        })
    data = tmp_path / "rec.jsonl"
    data.write_text("\n".join(json.dumps(c) for c in cells))

    class Tok:
        eos_token_ids = (1,)
        pad_token_id = 0

        def encode(self, text):
            return [2 + b for b in text.encode()][:24]

        def decode(self, ids):
            return bytes(
                min(255, max(0, i - 2)) for i in ids if i >= 2
            ).decode(errors="ignore")

    tok = Tok()
    run = RunConfig(
        model=cfg,
        train=TrainConfig(
            learning_rate=1e-3, warmup_ratio=0.0, grad_accum_steps=1,
            total_steps=4,
        ),
        data_path=str(data),
        image_root=str(tmp_path),
        mesh_shape={"data": 2, "fsdp": 4},
        max_steps=2,
        log_every=1,
        checkpoint_dir=None,
        remat=False,
        attn_impl="xla",
        seed=0,
    )
    logged = []
    state = grpo.train_grpo(
        run, tok.encode, tok.decode, QWEN_CHATML,
        grpo_cfg=GRPOConfig(
            group_size=4, prompts_per_wave=2, max_new_tokens=4,
            temperature=1.0, reward="count_a", mu=1,
        ),
        metrics_callback=lambda s, m: logged.append((s, m)),
        num_slots=4, rollout_max_len=256, prompt_buckets=(128,), pad_tiles=2,
    )
    assert int(state.step) == 2
    assert logged and "reward_mean" in logged[-1][1]
    assert np.isfinite(logged[-1][1]["loss"])


@pytest.mark.slow
def test_train_grpo_mu2_uses_old_logp(tmp_path, rng):
    """mu=2: two inner updates per wave run against the wave's old_logp
    (ratio deviates on the second epoch without error)."""
    from radvlm_tpu.data.chat import QWEN_CHATML
    from radvlm_tpu.training.loop import RunConfig
    from radvlm_tpu.training.optimizer import TrainConfig

    cfg = cfglib.tiny_test_config(vocab_size=300)
    grpo.REWARD_FNS["count_a"] = lambda text, gt, gc: float(text.count("a"))
    data = tmp_path / "rec.jsonl"
    data.write_text(json.dumps({
        "id": 0, "image": None,  # text-only prompt path
        "problem": "find the left lung",
        "solution": '{"bbox": [[0.1, 0.2, 0.5, 0.6]]}',
    }) + "\n")

    class Tok:
        def encode(self, text):
            return [2 + b for b in text.encode()][:24]

        def decode(self, ids):
            return bytes(
                min(255, max(0, i - 2)) for i in ids if i >= 2
            ).decode(errors="ignore")

    tok = Tok()
    run = RunConfig(
        model=cfg,
        train=TrainConfig(
            learning_rate=1e-3, warmup_ratio=0.0, grad_accum_steps=1,
            total_steps=4,
        ),
        data_path=str(data),
        image_root=str(tmp_path),
        mesh_shape={"data": 2, "fsdp": 4},
        max_steps=2,
        log_every=1,
        checkpoint_dir=None,
        remat=False,
        attn_impl="xla",
        seed=0,
    )
    state = grpo.train_grpo(
        run, tok.encode, tok.decode, QWEN_CHATML,
        grpo_cfg=GRPOConfig(
            group_size=8, prompts_per_wave=1, max_new_tokens=4,
            temperature=1.0, reward="count_a", mu=2,
        ),
        num_slots=4, rollout_max_len=256, prompt_buckets=(128,), pad_tiles=1,
    )
    assert int(state.step) == 2  # one wave, two inner epochs
