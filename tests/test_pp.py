"""Pipeline parallelism (parallel/pp.py) on the 8-device virtual CPU mesh.

Contract: the GPipe-scheduled loss and one optimizer step match the plain
single-jit `radvlm.loss_fn` / SFT step bit-for-near (the pipeline reorders the
same math over microbatches; fp accumulation order differs slightly)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.models import multimodal, radvlm
from radvlm_tpu.parallel import mesh as meshlib
from radvlm_tpu.parallel import pp
from radvlm_tpu.training import train_step as ts
from radvlm_tpu.training.optimizer import TrainConfig

pytestmark = pytest.mark.slow  # 8-dev mesh pipeline e2e: heaviest suite (~8 min)


def pp_config(n_layers=4):
    cfg = cfglib.tiny_test_config()
    return dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, num_layers=n_layers)
    )


def make_batch(cfg, rng, batch=8, text_len=24):
    samples = []
    for i in range(batch):
        img = rng.integers(0, 255, size=(70 + 5 * i, 60 + 3 * i, 3), dtype=np.uint8)
        ids = list(rng.integers(1, cfg.text.vocab_size, size=text_len))
        ids = ids[:3] + [IMAGE_TOKEN_INDEX] + ids[3:]
        labels = [-100] * 5 + list(
            rng.integers(1, cfg.text.vocab_size, size=len(ids) - 5)
        )
        samples.append(multimodal.build_sample(ids, [img], cfg, labels=labels))
    return multimodal.collate(samples, pad_to_multiple=8)


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def test_pp_loss_matches_single_device(rng):
    cfg = pp_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    batch = make_batch(cfg, rng)
    ref_loss, ref_metrics = radvlm.loss_fn(
        params, cfg, jax.device_put(batch), remat=False, attn_impl="xla"
    )

    mesh = meshlib.make_mesh({"data": 2, "stage": 4})
    grad_fn = pp.make_pp_grad_fn(
        mesh, cfg, params, n_microbatches=2, remat=False, attn_impl="xla"
    )
    sharded = pp.shard_params_pp(mesh, params)
    dev_batch = pp.put_batch_pp(mesh, batch)
    grads, metrics = jax.jit(grad_fn)(sharded, dev_batch)
    assert float(metrics["loss"]) == pytest.approx(float(ref_loss), rel=1e-5)
    assert float(metrics["tokens"]) == float(ref_metrics["tokens"])

    # Gradients match the plain-jit gradients of the same loss.
    ref_grads = jax.grad(
        lambda p: radvlm.loss_fn(
            p, cfg, jax.device_put(batch), remat=False, attn_impl="xla"
        )[0]
    )(params)
    flat_ref = jax.tree.leaves(ref_grads)
    flat_pp = jax.tree.leaves(jax.device_get(grads))
    assert len(flat_ref) == len(flat_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_pp_interleaved_matches_single_device(rng):
    """Interleaved schedule (V=2 virtual stages/device): loss + grads match
    the plain single-jit loss, and the folded [V, S, C] layer layout round-
    trips back to the canonical [L] stack."""
    cfg = pp_config()  # 4 layers; S=2, V=2 -> C=1
    params = radvlm.init_params(cfg, jax.random.key(0))
    batch = make_batch(cfg, rng)
    ref_loss, _ = radvlm.loss_fn(
        params, cfg, jax.device_put(batch), remat=False, attn_impl="xla"
    )
    ref_grads = jax.grad(
        lambda p: radvlm.loss_fn(
            p, cfg, jax.device_put(batch), remat=False, attn_impl="xla"
        )[0]
    )(params)

    mesh = meshlib.make_mesh({"data": 4, "stage": 2})
    sharded = pp.shard_params_pp(mesh, params, interleave=2)
    grad_fn = pp.make_pp_grad_fn(
        mesh, cfg, sharded, n_microbatches=2, remat=False, attn_impl="xla",
        interleave=2,
    )
    grads, metrics = jax.jit(grad_fn)(sharded, pp.put_batch_pp(mesh, batch))
    assert float(metrics["loss"]) == pytest.approx(float(ref_loss), rel=1e-5)

    # Grads come back folded [V, S, C, ...]; unfold restores the canonical
    # [L, ...] order for comparison (and checkpoints/HF export).
    grads = pp.unfold_layers_interleaved(jax.device_get(grads))
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_pp_fold_roundtrip_and_canonicalize():
    cfg = pp_config()
    params = radvlm.init_params(cfg, jax.random.key(3))
    folded = pp.fold_layers_interleaved(params, stages=2, interleave=2)
    lf = jax.tree.leaves(folded["text"]["layers"])[0]
    assert lf.shape[:2] == (2, 2)
    back = pp.unfold_layers_interleaved(folded)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # canonicalize: no-op on canonical, unfold on folded
    canon = pp.canonicalize_layer_stacks(folded, cfg.text.num_layers)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(canon["text"]["layers"])[0]),
        np.asarray(jax.tree.leaves(params["text"]["layers"])[0]),
    )
    assert pp.canonicalize_layer_stacks(params, cfg.text.num_layers) is params
    # fold places global stage g = v*S + s at [v, s]: layer index (v*S+s)*C
    l0 = jax.tree.leaves(params["text"]["layers"])[0]
    f0 = jax.tree.leaves(folded["text"]["layers"])[0]
    np.testing.assert_array_equal(np.asarray(f0[1, 0, 0]), np.asarray(l0[2]))


def test_pp_masked_drop_rng(rng):
    """The masked_drop resampler trains stochastically under PP: the per-step
    rng reaches the resampler on stage 0 (same rng -> same loss, different
    rng -> different loss), matching the plain SFT step's semantics."""
    cfg = pp_config()
    cfg = dataclasses.replace(
        cfg, resampler=cfglib.ResamplerConfig(kind="masked_drop", drop_ratio=0.5)
    )
    params = radvlm.init_params(cfg, jax.random.key(0))
    batch = make_batch(cfg, rng)
    mesh = meshlib.make_mesh({"data": 2, "stage": 4})
    sharded = pp.shard_params_pp(mesh, params)
    dev_batch = pp.put_batch_pp(mesh, batch)
    fn = jax.jit(pp.make_pp_grad_fn(
        mesh, cfg, sharded, n_microbatches=2, remat=False, attn_impl="xla"
    ))
    _, m_a = fn(sharded, dev_batch, jax.random.key(1))
    _, m_a2 = fn(sharded, dev_batch, jax.random.key(1))
    _, m_b = fn(sharded, dev_batch, jax.random.key(2))
    assert float(m_a["loss"]) == float(m_a2["loss"])
    assert float(m_a["loss"]) != float(m_b["loss"])


def test_pp_microbatch_count_invariant(rng):
    cfg = pp_config()
    params = radvlm.init_params(cfg, jax.random.key(1))
    batch = make_batch(cfg, rng, batch=16)
    mesh = meshlib.make_mesh({"data": 4, "stage": 2})
    sharded = pp.shard_params_pp(mesh, params)
    dev_batch = pp.put_batch_pp(mesh, batch)
    losses = []
    for m in (1, 2, 4):
        fn = pp.make_pp_grad_fn(
            mesh, cfg, params, n_microbatches=m, remat=True, attn_impl="xla"
        )
        _, metrics = jax.jit(fn)(sharded, dev_batch)
        losses.append(float(metrics["loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)
    assert losses[0] == pytest.approx(losses[2], rel=1e-5)


def test_pp_train_step_matches_plain_sft(rng):
    """One full optimizer step under PP == one plain SFT step (same tx)."""
    cfg = pp_config()
    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_ratio=0.0, grad_accum_steps=1, total_steps=8
    )
    params = radvlm.init_params(cfg, jax.random.key(2))
    batch = make_batch(cfg, rng)

    mesh_pp = meshlib.make_mesh({"data": 2, "stage": 4})
    state, step_fn, _ = pp.setup_pp_training(
        mesh_pp, cfg, tcfg, params,
        pp_cfg=pp.PPStepConfig(n_microbatches=2, remat=True, attn_impl="xla"),
    )
    state, metrics = step_fn(state, pp.put_batch_pp(mesh_pp, batch))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0

    # Re-init with the same key: the donated PP step deleted the aliased
    # original buffers (setup consumes params, same as ts.setup_training).
    params_ref = radvlm.init_params(cfg, jax.random.key(2))
    mesh_ref = meshlib.make_mesh({"data": 2, "fsdp": 4})
    rstate, rstep, _ = ts.setup_training(
        mesh_ref, cfg, tcfg, params_ref, remat=True, attn_impl="xla"
    )
    rstate, rmetrics = rstep(rstate, ts.put_batch(mesh_ref, batch))
    assert float(metrics["loss"]) == pytest.approx(
        float(rmetrics["loss"]), rel=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state.params)),
        jax.tree.leaves(jax.device_get(rstate.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)

    # second step still healthy (donated buffers, scan reuse)
    state, metrics2 = step_fn(state, pp.put_batch_pp(mesh_pp, make_batch(cfg, rng)))
    assert np.isfinite(float(metrics2["loss"]))


def test_pp_lora_matches_plain_lora(rng):
    """One PP LoRA step == one plain (fsdp-mesh) LoRA step: same adapter
    init (seed), same optimizer chain, loss + updated adapters match."""
    from radvlm_tpu.training.lora import LoraConfig

    cfg = pp_config()
    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_ratio=0.0, grad_accum_steps=1, total_steps=8
    )
    lcfg = LoraConfig(rank=4, alpha=8.0)
    batch = make_batch(cfg, rng)

    mesh_pp = meshlib.make_mesh({"data": 2, "stage": 4})
    base = radvlm.init_params(cfg, jax.random.key(5))
    state, pbase, step = pp.setup_pp_lora_training(
        mesh_pp, cfg, tcfg, lcfg, base, seed=1,
        pp_cfg=pp.PPStepConfig(n_microbatches=2, attn_impl="xla"),
    )
    state, metrics = step(state, pbase, pp.put_batch_pp(mesh_pp, batch))
    assert int(state.step) == 1
    assert float(metrics["grad_norm"]) > 0

    base2 = radvlm.init_params(cfg, jax.random.key(5))
    mesh_ref = meshlib.make_mesh({"data": 2, "fsdp": 4})
    rstate, rbase, rstep = ts.setup_lora_training(
        mesh_ref, cfg, tcfg, lcfg, base2, seed=1, attn_impl="xla"
    )
    rstate, rmetrics = rstep(rstate, rbase, ts.put_batch(mesh_ref, batch))
    assert float(metrics["loss"]) == pytest.approx(
        float(rmetrics["loss"]), rel=1e-5
    )
    # Adapters updated identically (PP grads are folded? no — V=1 keeps [L]).
    for a, b in zip(
        jax.tree.leaves(jax.device_get(state.params)),
        jax.tree.leaves(jax.device_get(rstate.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)


def test_pp_qlora_interleaved_step(rng):
    """QLoRA over the interleaved pipeline: int8 frozen base sharded over
    stages, adapters train (loss matches the plain QLoRA step)."""
    from radvlm_tpu.ops import quant
    from radvlm_tpu.training.lora import LoraConfig

    cfg = pp_config()
    tcfg = TrainConfig(
        learning_rate=1e-3, warmup_ratio=0.0, grad_accum_steps=1, total_steps=8
    )
    lcfg = LoraConfig(rank=4, alpha=8.0)
    batch = make_batch(cfg, rng)

    qbase = quant.quantize_params(radvlm.init_params(cfg, jax.random.key(6)))
    mesh_pp = meshlib.make_mesh({"data": 4, "stage": 2})
    state, pbase, step = pp.setup_pp_lora_training(
        mesh_pp, cfg, tcfg, lcfg, qbase, seed=1,
        pp_cfg=pp.PPStepConfig(n_microbatches=2, attn_impl="xla", interleave=2),
    )
    state, metrics = step(state, pbase, pp.put_batch_pp(mesh_pp, batch))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0

    qbase2 = quant.quantize_params(radvlm.init_params(cfg, jax.random.key(6)))
    mesh_ref = meshlib.make_mesh({"data": 2, "fsdp": 4})
    rstate, rbase, rstep = ts.setup_lora_training(
        mesh_ref, cfg, tcfg, lcfg, qbase2, seed=1, attn_impl="xla"
    )
    rstate, rmetrics = rstep(rstate, rbase, ts.put_batch(mesh_ref, batch))
    assert float(metrics["loss"]) == pytest.approx(
        float(rmetrics["loss"]), rel=1e-5
    )


@pytest.mark.slow
def test_pp_train_driver(tmp_path):
    """Full train() driver under a DP x PP mesh: llava-json on disk ->
    GPipe steps -> orbax checkpoint -> resume (loop.py stage>1 wiring)."""
    import json

    from PIL import Image

    from radvlm_tpu.data.loader import Bucket
    from radvlm_tpu.training.loop import RunConfig, train

    rng = np.random.default_rng(0)
    img_root = tmp_path / "images"
    img_root.mkdir()
    cells = []
    for i in range(8):
        name = f"img{i}.png"
        Image.fromarray(
            rng.integers(0, 255, size=(60 + i, 56, 3), dtype=np.uint8)
        ).save(img_root / name)
        cells.append({
            "id": f"c{i}",
            "image": name,
            "conversations": [
                {"from": "human", "value": f"<image>\nDescribe scan {i}."},
                {"from": "gpt", "value": f"Finding number {i} is present."},
            ],
        })
    data_path = tmp_path / "train.json"
    data_path.write_text(json.dumps(cells))

    cfg = pp_config()  # 4 layers -> 4 stages
    cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, vocab_size=300)
    )
    run = RunConfig(
        model=cfg,
        train=TrainConfig(total_steps=6, grad_accum_steps=1, warmup_ratio=0.0),
        data_path=str(data_path),
        image_root=str(img_root),
        mesh_shape={"data": 2, "stage": 4},
        pp_microbatches=2,
        micro_batch_size=4,
        max_steps=2,
        num_epochs=2,
        log_every=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        save_steps=1,
        buckets=(Bucket(512, 6),),
        attn_impl="xla",
        loader_workers=2,
    )
    seen = {}
    state = train(
        run, lambda s: [2 + (b % 200) for b in s.encode()][:64],
        metrics_callback=lambda s, m: seen.setdefault(s, m),
    )
    assert int(state.step) == 2
    assert all(np.isfinite(m["loss"]) for m in seen.values())

    # Resume continues from the orbax step under the same PP shardings.
    run2 = RunConfig(**{**run.__dict__, "max_steps": 3})
    state2 = train(run2, lambda s: [2 + (b % 200) for b in s.encode()][:64])
    assert int(state2.step) == 3


def test_pp_mesh_validation():
    cfg = pp_config(n_layers=3)
    mesh = meshlib.make_mesh({"data": 2, "stage": 4})
    with pytest.raises(ValueError, match="not divisible"):
        pp.make_pp_grad_fn(mesh, cfg, {}, n_microbatches=1)
    cfg4 = pp_config()
    with pytest.raises(ValueError, match="stage"):
        pp.make_pp_grad_fn(
            meshlib.make_mesh({"data": 8}), cfg4, {}, n_microbatches=1
        )
    with pytest.raises(ValueError, match="tensor"):
        pp.make_pp_grad_fn(
            meshlib.make_mesh({"stage": 2, "tensor": 4}), cfg4, {},
            n_microbatches=1,
        )
    # interleaved: layers must divide by S*V, microbatches by S
    mesh2 = meshlib.make_mesh({"data": 4, "stage": 2})
    with pytest.raises(ValueError, match="interleave"):
        pp.make_pp_grad_fn(mesh2, cfg4, {}, n_microbatches=2, interleave=4)
    with pytest.raises(ValueError, match="microbatches divisible"):
        pp.make_pp_grad_fn(mesh2, cfg4, {}, n_microbatches=3, interleave=2)
