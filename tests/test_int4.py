"""int4 weight-only quantization: pack/unpack, group scales, stacked kernel
parity (interpret mode), and the quantized tiny model end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.ops.int4_matmul import (
    GROUP,
    dequantize_array_int4,
    int4_matmul_stacked,
    pack_int4,
    quantize_array_int4,
    unpack_int4,
)


def test_pack_unpack_roundtrip(rng):
    vals = jnp.asarray(rng.integers(-8, 8, size=(6, 4)), jnp.int8)
    packed = pack_int4(vals)
    assert packed.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(vals))


def test_quantize_int4_error_bound(rng):
    x = jnp.asarray(rng.normal(size=(2 * GROUP, 64), scale=0.3), jnp.float32)
    node = quantize_array_int4(x)
    assert node["__q4__"].shape == (GROUP, 64)
    assert node["__scale__"].shape == (2, 64)
    back = np.asarray(dequantize_array_int4(node, jnp.float32))
    # per-group int4: max error ~ group_amax / 14
    grouped = np.abs(np.asarray(x)).reshape(2, GROUP, 64)
    bound = np.repeat(grouped.max(axis=1, keepdims=True), GROUP, 1).reshape(
        2 * GROUP, 64
    ) / 14 + 1e-6
    assert (np.abs(back - np.asarray(x)) <= bound).all()


def test_int4_stacked_kernel_matches_dequant(rng):
    L, D, F = 3, 256, 256
    w = jnp.asarray(rng.normal(size=(L, D, F), scale=0.05), jnp.float32)
    node = quantize_array_int4(w)
    x = jnp.asarray(rng.normal(size=(8, D)), jnp.float32)
    for lidx in (0, 2):
        want = np.asarray(x @ dequantize_array_int4(
            {"__q4__": node["__q4__"][lidx], "__scale__": node["__scale__"][lidx]},
            jnp.float32,
        ))
        got = np.asarray(int4_matmul_stacked(
            x, node["__q4__"], node["__scale__"], lidx, interpret=True
        ))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_int4_model_generation_runs(rng):
    """bits=4 quantize_params + fuse + generate on the tiny model (decode path
    hits q4node_matmul_stacked's fallback on CPU)."""
    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.generation.engine import GenerationConfig, make_generate_fn
    from radvlm_tpu.models import multimodal, radvlm
    from radvlm_tpu.ops.int4_matmul import is_q4node
    from radvlm_tpu.ops.quant import is_qnode, quantize_params

    cfg = cfglib.tiny_test_config()
    params = radvlm.init_params(cfg, jax.random.key(0))
    q = quantize_params(params, bits=4)
    # tiny config: hidden 48 not divisible by 128 -> kernels fall back to int8;
    # widen one fake check instead: quantize a 128-deep array directly
    deep = quantize_params(
        {"text": {"layers": {"mlp": {"gate": {"kernel": jnp.zeros((2, 128, 128))}}}}},
        bits=4,
    )
    assert is_q4node(deep["text"]["layers"]["mlp"]["gate"]["kernel"])
    # embeddings stay int8 even at bits=4
    assert is_qnode(q["text"]["embed"]["embedding"])

    q = radvlm.fuse_for_inference(q)
    gen_fn = make_generate_fn(
        cfg, GenerationConfig(max_new_tokens=4, eos_token_ids=()), attn_impl="xla"
    )
    img = rng.integers(0, 255, size=(64, 56, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX] + list(rng.integers(2, 400, size=8))
    sample = multimodal.build_sample(ids, [img], cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in multimodal.collate(
            [sample], pad_to_multiple=128, left_pad=True
        ).items()
    }
    out = gen_fn(q, batch, jax.random.key(1))
    assert int(out["num_tokens"][0]) == 4


def test_int4_fuse_concat(rng):
    """fuse_projections concatenates q4 nodes along the output axis."""
    from radvlm_tpu.models import qwen2
    from radvlm_tpu.ops.int4_matmul import is_q4node
    from radvlm_tpu.ops.quant import quantize_params

    cfg_dim = 128
    L = 2
    params = {
        "embed": {"embedding": jnp.zeros((64, cfg_dim))},
        "layers": {
            "ln1": jnp.ones((L, cfg_dim)),
            "ln2": jnp.ones((L, cfg_dim)),
            "attn": {
                "q": {"kernel": jnp.ones((L, cfg_dim, cfg_dim)) * 0.01,
                      "bias": jnp.zeros((L, cfg_dim))},
                "k": {"kernel": jnp.ones((L, cfg_dim, cfg_dim)) * 0.01,
                      "bias": jnp.zeros((L, cfg_dim))},
                "v": {"kernel": jnp.ones((L, cfg_dim, cfg_dim)) * 0.01,
                      "bias": jnp.zeros((L, cfg_dim))},
                "o": {"kernel": jnp.ones((L, cfg_dim, cfg_dim)) * 0.01},
            },
            "mlp": {
                "gate": {"kernel": jnp.ones((L, cfg_dim, cfg_dim)) * 0.01},
                "up": {"kernel": jnp.ones((L, cfg_dim, cfg_dim)) * 0.01},
                "down": {"kernel": jnp.ones((L, cfg_dim, cfg_dim)) * 0.01},
            },
        },
        "norm": jnp.ones((cfg_dim,)),
    }
    q = quantize_params(
        params, bits=4,
        patterns=(r"layers/attn/[qkvo]/kernel$", r"layers/mlp/(gate|up|down)/kernel$"),
    )
    fused = qwen2.fuse_projections(q)
    qkv = fused["layers"]["attn"]["qkv"]["kernel"]
    assert is_q4node(qkv)
    assert qkv["__q4__"].shape == (L, cfg_dim // 2, 3 * cfg_dim)
    assert qkv["__scale__"].shape == (L, 1, 3 * cfg_dim)
