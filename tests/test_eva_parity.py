"""EVA tower parity vs the reference's VENDORED torch `EVAVisionTransformer`
(`dev_eva_clip/eva_clip/eva_vit_model.py`), loaded directly from
/root/reference with stubbed timm/torchvision shims (neither package is in
the image; only trivial helpers are used on the inference path).

Contract (`dev_eva_clip/eva_vit.py:105-118`): the wrapper calls
`forward_features(x, return_all_features=True)` — all blocks, NO final norm —
and `feature_select` drops the cls token.
"""

import importlib
import importlib.util
import itertools
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.models import hf_import, towers
from radvlm_tpu.models.eva import EVAVisionConfig

torch = pytest.importorskip("torch")

_EVA_DIR = (
    "/root/reference/finetuning/llava/model/multimodal_encoder/"
    "dev_eva_clip/eva_clip"
)


def _install_shims():
    """timm + torchvision stand-ins for the vendored code's imports; only
    drop_path (identity at eval), to_2tuple and trunc_normal_ are exercised."""
    if "timm" in sys.modules:
        return
    import torch.nn as nn

    def drop_path(x, drop_prob=0.0, training=False):
        assert not training and not drop_prob
        return x

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    # All fakes carry a ModuleSpec: transformers probes availability with
    # importlib.util.find_spec, which RAISES on spec-less modules — a bare
    # ModuleType here poisons any later first import of transformers.
    # Pre-existing fakes (test_baselines_e2e installs a torchvision one with
    # transforms/io submodules) are augmented rather than clobbered.
    def fake(name):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.util.spec_from_loader(name, loader=None)
        sys.modules[name] = m
        return m

    timm = fake("timm")
    timm.models = fake("timm.models")
    layers = fake("timm.models.layers")
    timm.models.layers = layers
    layers.drop_path = drop_path
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_

    tv = fake("torchvision")
    tv.ops = fake("torchvision.ops")
    tv.ops.misc = fake("torchvision.ops.misc")
    tv.ops.misc.FrozenBatchNorm2d = nn.BatchNorm2d  # unused on our path


@pytest.fixture(scope="module")
def eva_vit_model():
    _install_shims()
    pkg = types.ModuleType("refeva")
    pkg.__path__ = [_EVA_DIR]
    sys.modules["refeva"] = pkg
    return importlib.import_module("refeva.eva_vit_model")


def _variants():
    # (subln+swiglu+rope qkv_bias, prenorm LN) = EVA-02; (fused qkv, plain
    # MLP, no rope, layerscale, postnorm) covers the EVA-01/8B structure
    # (RMS is checked separately below).
    return [
        dict(qkv_bias=True, subln=True, swiglu=True, rope=True,
             postnorm=False, ls=None),
        dict(qkv_bias=False, subln=False, swiglu=False, rope=False,
             postnorm=True, ls=0.05),
    ]


@pytest.mark.parametrize("v", _variants())
def test_eva_matches_vendored_torch(eva_vit_model, v):
    torch.manual_seed(0)
    d, depth, heads, img, patch = 32, 2, 2, 28, 14
    mlp_ratio = 2.0
    model = eva_vit_model.EVAVisionTransformer(
        img_size=img, patch_size=patch, embed_dim=d, depth=depth,
        num_heads=heads, mlp_ratio=mlp_ratio, qkv_bias=v["qkv_bias"],
        norm_layer=lambda dim: torch.nn.LayerNorm(dim, eps=1e-6),
        init_values=v["ls"], rope=v["rope"], pt_hw_seq_len=img // patch,
        intp_freq=False, naiveswiglu=v["swiglu"], subln=v["subln"],
        postnorm=v["postnorm"], xattn=False, num_classes=8,
    )
    model.eval()
    # randomize norm/bias params so parity is not vacuous at defaults
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name or "ln" in name or name.endswith(
                ("bias", "q_bias", "v_bias", "gamma_1", "gamma_2")
            ):
                p.add_(torch.randn_like(p) * 0.05)

    cfg = EVAVisionConfig(
        hidden_size=d, head_dim=d // heads, num_layers=depth,
        intermediate_size=int(d * mlp_ratio), image_size=img,
        patch_size=patch, qkv_bias=v["qkv_bias"], subln=v["subln"],
        swiglu=v["swiglu"], rope=v["rope"], rope_pt_seq_len=img // patch,
        rope_intp_freq=False, postnorm=v["postnorm"], norm="layernorm",
        ls_init_value=v["ls"],
    )
    state = {k: p.detach().numpy() for k, p in model.state_dict().items()}
    params = hf_import.import_eva(state, cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    pixels = rng.uniform(-1, 1, size=(2, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.forward_features(
            torch.tensor(pixels).permute(0, 3, 1, 2),
            return_all_features=True,
        )[:, 1:].numpy()
    got = np.asarray(towers.forward(params, cfg, jnp.asarray(pixels)))
    assert got.shape == want.shape == (2, cfg.tokens_per_tile, d)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_eva_rms_matches_t5_style(eva_vit_model):
    """EVA-CLIP-8B uses a T5-style weight-only RMSnorm (`model.py:38-58`);
    the vendored model.py itself imports half the package, so replicate the
    norm in torch here and check the full-tower parity with norm='rms'."""

    class T5RMSNorm(torch.nn.Module):
        def __init__(self, hidden_size, eps=1e-6):
            super().__init__()
            self.weight = torch.nn.Parameter(torch.ones(hidden_size))
            self.eps = eps

        def forward(self, x):
            var = x.to(torch.float32).pow(2).mean(-1, keepdim=True)
            return self.weight * (
                x.to(torch.float32) * torch.rsqrt(var + self.eps)
            ).to(x.dtype)

    torch.manual_seed(1)
    d, depth, heads, img, patch = 32, 2, 2, 28, 14
    model = eva_vit_model.EVAVisionTransformer(
        img_size=img, patch_size=patch, embed_dim=d, depth=depth,
        num_heads=heads, mlp_ratio=2.0, qkv_bias=False,
        norm_layer=lambda dim: T5RMSNorm(dim, eps=1e-6),
        rope=False, naiveswiglu=False, subln=False, xattn=False,
        num_classes=8,
    )
    model.eval()
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name:
                p.add_(torch.randn_like(p) * 0.05)

    cfg = EVAVisionConfig(
        hidden_size=d, head_dim=d // heads, num_layers=depth,
        intermediate_size=int(d * 2.0), image_size=img, patch_size=patch,
        qkv_bias=False, subln=False, swiglu=False, rope=False,
        norm="rms", ls_init_value=None,
    )
    state = {k: p.detach().numpy() for k, p in model.state_dict().items()}
    params = hf_import.import_eva(state, cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    pixels = rng.uniform(-1, 1, size=(1, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.forward_features(
            torch.tensor(pixels).permute(0, 3, 1, 2),
            return_all_features=True,
        )[:, 1:].numpy()
    got = np.asarray(towers.forward(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_eva_tower_name_dispatch():
    c = towers.config_from_tower_name("EVA02-CLIP-L-14-336")
    assert towers.kind(c) == "eva"
    assert (c.hidden_size, c.num_layers, c.image_size) == (1024, 24, 336)
    assert c.subln and c.swiglu and c.rope and c.norm == "layernorm"
    c = towers.config_from_tower_name("EVA-CLIP-8B-plus")
    assert (c.hidden_size, c.image_size, c.norm) == (4096, 448, "rms")
    assert not c.qkv_bias and not c.rope
    c = towers.config_from_tower_name("internal-eva02-clip-l-14")
    assert c.image_size == 224
    with pytest.raises(ValueError, match="unknown EVA"):
        towers.config_from_tower_name("eva02-mystery")
    # a mere "eva" substring must NOT shadow the path/hf branches
    # (code-review finding: /evals/... checkpoint paths were misrouted)
    c = towers.config_from_tower_name("/mnt/evals/ShareGPT4V-vit-l-336")
    assert towers.kind(c) == "clip"
    with pytest.raises(ValueError, match="Unknown vision tower"):
        towers.config_from_tower_name("eva-mystery")
