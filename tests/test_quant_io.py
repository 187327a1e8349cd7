"""Pre-quantized native checkpoints (models/quant_io.py): bit-exact
round-trip of int8/int4 param trees + config, CLI end-to-end from an HF dir,
and auto-detection in the serving/eval load path. (The reference quantizes at
every load, `builder.py:30-34`; this is the pay-once artifact.)"""

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.models import radvlm
from radvlm_tpu.models.quant_io import (
    config_from_dict,
    config_to_dict,
    is_quantized_dir,
    load_quantized,
    save_quantized,
)
from radvlm_tpu.ops.quant import quantize_params


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}{k}/")
    else:
        yield prefix[:-1], tree


@pytest.mark.parametrize("bits", [8, 4])
def test_roundtrip_bit_exact(tmp_path, bits):
    cfg = cfglib.tiny_test_config(vocab_size=256)
    params = quantize_params(
        radvlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16),
        bits=bits,
    )
    save_quantized(params, cfg, str(tmp_path))
    assert is_quantized_dir(str(tmp_path))
    loaded, cfg2 = load_quantized(str(tmp_path))
    assert cfg2 == cfg
    orig = dict(_tree_paths(params))
    got = dict(_tree_paths(loaded))
    assert set(orig) == set(got)
    for k, v in orig.items():
        w = got[k]
        assert np.asarray(v).dtype == np.asarray(w).dtype, k
        assert np.array_equal(np.asarray(v), np.asarray(w)), k
    # int8 qnodes / int4 packed nodes survived as integer payloads
    kinds = {np.asarray(v).dtype.kind for v in orig.values()}
    assert "i" in kinds


def test_config_dict_roundtrip_with_tower_variant():
    from radvlm_tpu.models.clip import CLIPVisionConfig

    cfg = cfglib.tiny_test_config()
    assert config_from_dict(config_to_dict(cfg)) == cfg
    clip_cfg = dataclasses.replace(
        cfg,
        vision=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
            image_size=56, patch_size=14,
        ),
        anyres=dataclasses.replace(cfg.anyres, tile_size=56),
    )
    back = config_from_dict(config_to_dict(clip_cfg))
    assert type(back.vision).__name__ == "CLIPVisionConfig"
    assert back == clip_cfg


@pytest.mark.slow
def test_quantize_cli_end_to_end(tmp_path):
    """HF dir -> quantize_cli -> load_quantized -> forward runs; detection
    drives the worker/eval load path."""
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.models import multimodal
    from radvlm_tpu.models.hf_export import save_radvlm_hf
    from radvlm_tpu.models.quantize_cli import main as quantize_main

    cfg = cfglib.tiny_test_config(vocab_size=100)
    params = radvlm.init_params(cfg, jax.random.key(0))
    hf_dir = tmp_path / "hf"
    save_radvlm_hf(params, cfg, str(hf_dir))
    # a fake tokenizer file must be copied alongside
    (hf_dir / "tokenizer_config.json").write_text(json.dumps({"t": 1}))
    out = tmp_path / "q8"
    quantize_main(["--hf-checkpoint", str(hf_dir), "--out", str(out)])
    assert is_quantized_dir(str(out))
    assert (out / "tokenizer_config.json").exists()
    qparams, qcfg = load_quantized(str(out))
    assert qcfg.text.vocab_size == 100
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(80, 64, 3), dtype=np.uint8)
    ids = [5, IMAGE_TOKEN_INDEX, 7, 8]
    sample = multimodal.build_sample(ids, [img], qcfg)
    batch = multimodal.collate([sample], pad_to_multiple=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    logits, _ = radvlm.forward(qparams, qcfg, batch)
    assert np.all(np.isfinite(np.asarray(logits)))
