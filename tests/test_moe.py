"""Qwen2-MoE: logit parity vs HF, capacity dispatch, expert-parallel training.

The reference carries the LlavaQwenMoe family + ZeRO leaf-module opt-outs
(`train.py:1376-1378`) but never trains MoE; here the sparse block, the
GShard-style capacity dispatch, the load-balancing aux loss, and the `expert`
mesh axis are first-class and tested.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.config import Qwen2Config
from radvlm_tpu.models import hf_import, qwen2

torch = pytest.importorskip("torch")

TINY = Qwen2Config(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,  # unused when num_experts > 0
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=8,
    rope_theta=10000.0,
    tie_word_embeddings=False,
    max_position_embeddings=512,
    num_experts=4,
    num_experts_per_tok=2,
    moe_intermediate_size=48,
    shared_expert_intermediate_size=56,
    norm_topk_prob=True,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    torch.manual_seed(0)
    cfg = Qwen2MoeConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=False,
        max_position_embeddings=TINY.max_position_embeddings,
        num_experts=TINY.num_experts,
        num_experts_per_tok=TINY.num_experts_per_tok,
        moe_intermediate_size=TINY.moe_intermediate_size,
        shared_expert_intermediate_size=TINY.shared_expert_intermediate_size,
        norm_topk_prob=TINY.norm_topk_prob,
        decoder_sparse_step=1,
        mlp_only_layers=[],
        attn_implementation="eager",
    )
    model = Qwen2MoeForCausalLM(cfg)
    model.eval()
    return model


def _forward(params, ids, **kw):
    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    pos = jnp.tile(jnp.arange(ids.shape[1])[None], (ids.shape[0], 1))
    seg = jnp.ones(ids.shape, jnp.int32)
    return qwen2.forward(
        params, kw.pop("cfg", TINY), input_embeds=embeds, positions=pos,
        segment_ids=seg, attn_impl="xla", **kw,
    )


def test_moe_logits_match_hf(hf_model):
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    assert "moe" in params["layers"]["mlp"]

    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 48))
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids)).logits.numpy()
    got, _ = _forward(params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=3e-3)


def test_capacity_dispatch_matches_exact_when_uncapped(hf_model):
    """With capacity >= every expert's worst-case load, the GShard dispatch
    equals the exact dense combine."""
    import dataclasses

    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY.vocab_size, size=(1, 32))

    exact, _ = _forward(params, ids)
    # capacity = T*k/E * factor; factor = E makes C = T*k >= any expert load
    capped_cfg = dataclasses.replace(
        TINY, moe_capacity_factor=float(TINY.num_experts)
    )
    capped, _ = _forward(params, ids, cfg=capped_cfg)
    np.testing.assert_allclose(
        np.asarray(exact), np.asarray(capped), atol=2e-4, rtol=2e-3
    )


def test_aux_loss_and_grads():
    """return_aux yields a finite aux loss and gradients flow through the
    router (capacity path, the training configuration)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, moe_capacity_factor=1.5)
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 16)))

    def loss(p):
        logits, _, aux = _forward(p, ids, cfg=cfg, return_aux=True)
        return jnp.mean(logits.astype(jnp.float32) ** 2) + 0.01 * aux, aux

    (val, aux), grads = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(val)) and np.isfinite(float(aux))
    # perfect balance bound: aux >= 1 (E * sum f_e P_e with sum f = k)
    g = grads["layers"]["mlp"]["moe"]["router"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0  # router receives gradient
    ge = grads["layers"]["mlp"]["moe"]["experts"]["gate"]
    assert float(jnp.abs(ge).sum()) > 0


@pytest.mark.slow
def test_expert_parallel_train_step(rng):
    """Full VLM train step on a mesh with a real expert axis: params shard
    over `expert`, loss finite (the EP row of SURVEY §2.7)."""
    import dataclasses

    import optax

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.models import multimodal, radvlm
    from radvlm_tpu.parallel import sharding as shardlib
    from radvlm_tpu.parallel.mesh import make_mesh
    from radvlm_tpu.training.train_step import init_train_state, make_train_step

    base = cfglib.tiny_test_config()
    moe_text = dataclasses.replace(
        base.text, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, shared_expert_intermediate_size=32,
        moe_capacity_factor=1.5, norm_topk_prob=True,
    )
    cfg = cfglib.RadVLMConfig(
        vision=base.vision, text=moe_text, anyres=base.anyres
    )
    mesh = make_mesh({"expert": 4, "fsdp": 2})
    params = radvlm.init_params(cfg, jax.random.key(0))

    # expert tables shard over the expert axis
    specs = shardlib.param_pspecs(params)
    assert specs["text"]["layers"]["mlp"]["moe"]["experts"]["gate"][1] == "expert"

    tx = optax.adam(1e-3)
    with mesh:
        state = init_train_state(mesh, params, tx)
        step = make_train_step(cfg, tx, remat=False, attn_impl="xla")

        img = rng.integers(0, 255, size=(64, 56, 3), dtype=np.uint8)
        ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=12))
        sample = multimodal.build_sample(ids, [img], cfg, labels=None)
        batch = multimodal.collate(
            [sample, sample], pad_to_multiple=128
        )
        batch["labels"] = batch["tokens"]
        batch = {
            k: jax.device_put(
                jnp.asarray(v), shardlib.batch_shardings(mesh, {k: v})[k]
            )
            for k, v in batch.items()
        }
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert "moe_aux" in metrics and np.isfinite(float(metrics["moe_aux"]))


def test_moe_export_roundtrip(hf_model):
    """export_qwen2 of a MoE tree re-imports bit-exactly (HF Qwen2MoE names)."""
    from radvlm_tpu.models import hf_export

    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    exported = hf_export.export_qwen2(params, prefix="model.")
    back = hf_import.import_qwen2(
        hf_import.normalize_keys(exported), TINY, dtype=jnp.float32
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, back,
    )


def test_moe_fuse_projections(hf_model):
    """fuse_projections on a MoE tree fuses attention only and keeps the
    sparse block (code-review finding: KeyError 'gate' on the default eval
    fuse path); fused forward matches unfused."""
    state = hf_import.normalize_keys(hf_model.state_dict())
    params = hf_import.import_qwen2(state, TINY, dtype=jnp.float32)
    fused = qwen2.fuse_projections(params)
    assert "qkv" in fused["layers"]["attn"]
    assert "moe" in fused["layers"]["mlp"]

    rng = np.random.default_rng(3)
    ids = rng.integers(0, TINY.vocab_size, size=(1, 24))
    a, _ = _forward(params, ids)
    b, _ = _forward(fused, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_config_from_hf_dir_moe(tmp_path):
    """config_from_hf_dir maps qwen2_moe text_config fields (code-review
    finding: every MoE checkpoint crashed in the dense import branch)."""
    import json

    cfg_dict = {
        "model_type": "llava_onevision",
        "text_config": {
            "model_type": "qwen2_moe",
            "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "head_dim": 8, "rope_theta": 10000.0,
            "num_experts": 4, "num_experts_per_tok": 2,
            "moe_intermediate_size": 48,
            "shared_expert_intermediate_size": 56,
            "norm_topk_prob": True,
        },
        "vision_config": {},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg_dict))
    cfg = hf_import.config_from_hf_dir(str(tmp_path))
    assert cfg.text.num_experts == 4
    assert cfg.text.num_experts_per_tok == 2
    assert cfg.text.moe_intermediate_size == 48
    assert cfg.text.shared_expert_intermediate_size == 56
    assert cfg.text.norm_topk_prob is True
