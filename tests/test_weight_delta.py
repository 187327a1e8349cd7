"""Weight-delta tools (tools/weight_delta.py): make/apply round-trip,
projector pass-through, vocab-growth slices, shard consolidation."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.weight_delta import apply_delta, consolidate, make_delta  # noqa: E402


def _save_dir(tmp_path, name, state, sidecar=None):
    from safetensors.numpy import save_file

    d = tmp_path / name
    d.mkdir()
    save_file(state, str(d / "model.safetensors"))
    if sidecar:
        (d / "config.json").write_text(json.dumps(sidecar))
    return str(d)


def _load_dir(path):
    from radvlm_tpu.models.hf_import import load_safetensors_dir

    return load_safetensors_dir(path)


def _rand_int_f32(rng, shape):
    # integer-valued floats: fp add/sub round-trips bit-exactly
    return rng.integers(-8, 8, size=shape).astype(np.float32)


def test_make_apply_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    base = {
        "language_model.model.embed_tokens.weight": _rand_int_f32(rng, (16, 8)),
        "language_model.model.layers.0.mlp.w.weight": _rand_int_f32(rng, (8, 8)),
        "lm_head.weight": _rand_int_f32(rng, (16, 8)),
    }
    target = {
        # vocab grown 16 -> 20 (reference converter's resize)
        "language_model.model.embed_tokens.weight": _rand_int_f32(rng, (20, 8)),
        "language_model.model.layers.0.mlp.w.weight": _rand_int_f32(rng, (8, 8)),
        "lm_head.weight": _rand_int_f32(rng, (20, 8)),
        # projector exists only in the finetune (`apply_delta.py:25-27`)
        "multi_modal_projector.linear_1.weight": _rand_int_f32(rng, (8, 8)),
    }
    base_d = _save_dir(tmp_path, "base", base, sidecar={"model_type": "x"})
    target_d = _save_dir(tmp_path, "target", target,
                         sidecar={"model_type": "y"})

    delta_d = str(tmp_path / "delta")
    make_delta(base_d, target_d, delta_d)
    delta = _load_dir(delta_d)
    # matching-shape keys are plain differences
    np.testing.assert_array_equal(
        delta["language_model.model.layers.0.mlp.w.weight"],
        target["language_model.model.layers.0.mlp.w.weight"]
        - base["language_model.model.layers.0.mlp.w.weight"],
    )
    # vocab rows: leading slice differenced, grown tail verbatim
    np.testing.assert_array_equal(
        delta["lm_head.weight"][16:], target["lm_head.weight"][16:]
    )
    # projector passes through untouched
    np.testing.assert_array_equal(
        delta["multi_modal_projector.linear_1.weight"],
        target["multi_modal_projector.linear_1.weight"],
    )
    # sidecar JSON (config/tokenizer) travels with the delta
    assert json.loads(
        (tmp_path / "delta" / "config.json").read_text()
    )["model_type"] == "y"

    recon_d = str(tmp_path / "recon")
    apply_delta(base_d, delta_d, recon_d)
    recon = _load_dir(recon_d)
    assert set(recon) == set(target)
    for k in target:
        np.testing.assert_array_equal(recon[k], target[k], err_msg=k)


def test_non_vocab_shape_mismatch_raises(tmp_path):
    base_d = _save_dir(tmp_path, "base", {"a.weight": np.zeros((4, 4), np.float32)})
    target_d = _save_dir(tmp_path, "target", {"a.weight": np.zeros((5, 4), np.float32)})
    with pytest.raises(ValueError, match="dimension mismatch"):
        make_delta(base_d, target_d, str(tmp_path / "delta"))


def test_consolidate_merges_shards(tmp_path):
    from safetensors.numpy import save_file

    d = tmp_path / "sharded"
    d.mkdir()
    save_file({"a": np.ones((2, 2), np.float32)},
              str(d / "model-00001-of-00002.safetensors"))
    save_file({"b": np.full((3,), 2.0, np.float32)},
              str(d / "model-00002-of-00002.safetensors"))
    (d / "model.safetensors.index.json").write_text("{}")
    dst = str(tmp_path / "flat")
    consolidate(str(d), dst)
    out = _load_dir(dst)
    assert set(out) == {"a", "b"}
    assert os.path.exists(os.path.join(dst, "model.safetensors"))
    # the shard index is NOT copied into the consolidated dir
    assert not os.path.exists(
        os.path.join(dst, "model.safetensors.index.json")
    )
