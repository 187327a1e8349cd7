"""QLoRA: LoRA adapters over an int8-quantized frozen base (the reference's
4/8-bit bitsandbytes base prep inside train(), `finetuning/llava/train/
train.py:1466-1503`). The frozen base stays int8 in HBM; `ops.quant.qmm` adds
the low-rank term next to the quantized matmul; training_mode routes the base
through differentiable dequant (the W8A8 round has zero gradient)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.models import multimodal, radvlm
from radvlm_tpu.ops import quant
from radvlm_tpu.training.lora import (
    LoraConfig, init_lora, merge_and_bake, merge_lora,
)


def _mk_batch(cfg, rng, n=2):
    samples = []
    for i in range(n):
        img = rng.integers(0, 255, size=(70, 60, 3), dtype=np.uint8)
        ids = list(rng.integers(2, cfg.text.vocab_size, size=12))
        ids = ids[:2] + [IMAGE_TOKEN_INDEX] + ids[2:]
        labels = [-100] * 8 + [int(t) for t in ids[8:]]
        samples.append(multimodal.build_sample(ids, [img], cfg, labels=labels))
    b = multimodal.collate(samples, pad_to_multiple=8)
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_qlora_zero_init_matches_quantized_base(rng):
    """B zero-init: the QLoRA model must equal the plain quantized model."""
    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    qparams = quant.quantize_params(params)
    lcfg = LoraConfig(rank=4, alpha=8.0)
    adapters = init_lora(qparams, lcfg, jax.random.key(1))
    assert len(adapters) == 7  # same target set as the dense base
    merged = merge_lora(qparams, adapters, lcfg)
    batch = _mk_batch(cfg, rng)
    with quant.training_mode():
        l0, _ = radvlm.loss_fn(qparams, cfg, batch, remat=False, attn_impl="xla")
        l1, _ = radvlm.loss_fn(merged, cfg, batch, remat=False, attn_impl="xla")
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)


def test_qlora_train_step_on_mesh(rng):
    """E2E on the 8-CPU mesh: quantized-base LoRA step runs sharded, loss
    decreases, gradients reach the adapters (nonzero update)."""
    from radvlm_tpu.parallel.mesh import make_mesh
    from radvlm_tpu.training import train_step as ts
    from radvlm_tpu.training.optimizer import TrainConfig

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    qparams = quant.quantize_params(params)
    mesh = make_mesh({"data": 2, "fsdp": 4})
    lcfg = LoraConfig(rank=4, alpha=8.0)
    tcfg = TrainConfig(total_steps=10, learning_rate=5e-2, warmup_ratio=0.0,
                       grad_accum_steps=1)
    state, base, step_fn = ts.setup_lora_training(
        mesh, cfg, tcfg, lcfg, qparams, remat=False, attn_impl="xla"
    )
    batch = ts.put_batch(mesh, _mk_batch(cfg, rng, n=8))
    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, base, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))
    # the frozen base is still int8
    assert base["text"]["layers"]["attn"]["q"]["kernel"][quant.Q_KEY].dtype == jnp.int8
    # adapters moved
    a = state.params["text/layers/attn/q/kernel"]["b"]
    assert float(jnp.abs(a).max()) > 0


def test_qlora_bake_and_hf_export(rng):
    """merge_and_bake folds adapters into fresh int8 scales; the dequantized
    result exports through the HF converter (same key layout as dense)."""
    from radvlm_tpu.models.hf_export import export_radvlm

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    qparams = quant.quantize_params(params)
    lcfg = LoraConfig(rank=4, alpha=8.0)
    adapters = init_lora(qparams, lcfg, jax.random.key(1))
    # make B nonzero so the bake actually changes the weights
    adapters = jax.tree.map(lambda x: x + 0.01, adapters)
    baked = merge_and_bake(qparams, adapters, lcfg)
    # baked tree is plain quantized (no lora keys anywhere)
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        baked, is_leaf=lambda x: isinstance(x, dict) and quant.Q_KEY in x
    ):
        if isinstance(leaf, dict):
            assert quant.LORA_A not in leaf
    # baked == quantize(dequant(base) + scaled delta) numerically
    merged = merge_lora(qparams, adapters, lcfg)
    q_kernel = baked["text"]["layers"]["attn"]["q"]["kernel"]
    dense_ref = quant.maybe_dequant(merged["text"]["layers"]["attn"]["q"]["kernel"], jnp.float32)
    dense_baked = quant.maybe_dequant(q_kernel, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(dense_baked), np.asarray(dense_ref), atol=2e-3, rtol=0.1
    )
    # HF export of the dequantized bake has the dense-export key set
    dense_tree = quant.maybe_dequant(baked)
    ref_keys = set(export_radvlm(radvlm.init_params(cfg, jax.random.key(0)), cfg))
    got_keys = set(export_radvlm(dense_tree, cfg))
    assert got_keys == ref_keys
