"""Tower dispatch + OpenCLIP/ImageBind import correctness.

- `config_from_tower_name` mirrors the reference's `build_vision_tower`
  string dispatch (`multimodal_encoder/builder.py:13-36`).
- `import_open_clip` is validated by constructing an open_clip-layout state
  dict carrying the SAME tensors as an HF CLIPVisionModel (fused in_proj =
  cat(q, k, v)) and asserting the imported trees are identical — combined
  with test_clip_parity.py's HF parity this transitively proves open_clip
  forward parity.
- The ImageBind Conv3d stem collapse is checked against an explicit
  2-repeated-frame 3D convolution.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radvlm_tpu.models import hf_import, towers
from radvlm_tpu.models.clip import CLIPVisionConfig
from radvlm_tpu.models.imagebind import (
    ImageBindVisionConfig,
    collapse_video_stem,
)

torch = pytest.importorskip("torch")

TINY = CLIPVisionConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=2,
    num_heads=2,
    image_size=42,
    patch_size=14,
)


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPVisionConfig as HFConfig, CLIPVisionModel

    torch.manual_seed(0)
    cfg = HFConfig(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers + 1,
        num_attention_heads=TINY.num_heads,
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        attn_implementation="eager",
    )
    model = CLIPVisionModel(cfg)
    model.eval()
    return model


def _open_clip_state_from_hf(hf_model):
    """Rearrange an HF CLIPVisionModel state dict into the open_clip `visual.*`
    layout (torch MultiheadAttention fused in_proj; raw cls/pos tensors)."""
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    pre = "vision_model."
    out = {
        "visual.conv1.weight": sd[pre + "embeddings.patch_embedding.weight"],
        "visual.class_embedding": sd[pre + "embeddings.class_embedding"],
        "visual.positional_embedding": sd[
            pre + "embeddings.position_embedding.weight"
        ],
        "visual.ln_pre.weight": sd[pre + "pre_layrnorm.weight"],
        "visual.ln_pre.bias": sd[pre + "pre_layrnorm.bias"],
    }
    i = 0
    while f"{pre}encoder.layers.{i}.layer_norm1.weight" in sd:
        src = f"{pre}encoder.layers.{i}."
        dst = f"visual.transformer.resblocks.{i}."
        out[dst + "ln_1.weight"] = sd[src + "layer_norm1.weight"]
        out[dst + "ln_1.bias"] = sd[src + "layer_norm1.bias"]
        out[dst + "ln_2.weight"] = sd[src + "layer_norm2.weight"]
        out[dst + "ln_2.bias"] = sd[src + "layer_norm2.bias"]
        out[dst + "attn.in_proj_weight"] = np.concatenate(
            [sd[src + f"self_attn.{n}_proj.weight"] for n in ("q", "k", "v")]
        )
        out[dst + "attn.in_proj_bias"] = np.concatenate(
            [sd[src + f"self_attn.{n}_proj.bias"] for n in ("q", "k", "v")]
        )
        out[dst + "attn.out_proj.weight"] = sd[src + "self_attn.out_proj.weight"]
        out[dst + "attn.out_proj.bias"] = sd[src + "self_attn.out_proj.bias"]
        out[dst + "mlp.c_fc.weight"] = sd[src + "mlp.fc1.weight"]
        out[dst + "mlp.c_fc.bias"] = sd[src + "mlp.fc1.bias"]
        out[dst + "mlp.c_proj.weight"] = sd[src + "mlp.fc2.weight"]
        out[dst + "mlp.c_proj.bias"] = sd[src + "mlp.fc2.bias"]
        i += 1
    return out


def test_open_clip_import_matches_clip_import(hf_clip):
    hf_state = hf_import.normalize_keys(hf_clip.state_dict())
    oc_state = _open_clip_state_from_hf(hf_clip)
    p_hf = hf_import.import_clip(hf_state, TINY, dtype=jnp.float32)
    p_oc = hf_import.import_open_clip(oc_state, TINY, dtype=jnp.float32)
    flat_hf = jax.tree_util.tree_leaves_with_path(p_hf)
    flat_oc = jax.tree_util.tree_leaves_with_path(p_oc)
    assert len(flat_hf) == len(flat_oc)
    for (path_h, leaf_h), (path_o, leaf_o) in zip(flat_hf, flat_oc):
        assert path_h == path_o
        np.testing.assert_array_equal(
            np.asarray(leaf_h), np.asarray(leaf_o), err_msg=str(path_h)
        )


def test_imagebind_stem_collapse():
    """Conv3d(kernel=(2,p,p), stride=same, no bias) over an image repeated to
    2 frames == the collapsed 2D patchify matmul."""
    rng = np.random.default_rng(0)
    d, p, s = 8, 4, 12
    kernel3d = rng.normal(size=(d, 3, 2, p, p)).astype(np.float32)
    img = rng.normal(size=(s, s, 3)).astype(np.float32)

    # explicit 3D conv over [C, T=2, H, W] with stride (2, p, p)
    vid = np.stack([img, img], axis=0).transpose(3, 0, 1, 2)  # [C, 2, H, W]
    g = s // p
    want = np.zeros((g, g, d), np.float32)
    for i in range(g):
        for j in range(g):
            patch = vid[:, :, i * p:(i + 1) * p, j * p:(j + 1) * p]
            want[i, j] = np.einsum("ctpq,dctpq->d", patch, kernel3d)

    from radvlm_tpu.models.siglip import patchify

    flat = patchify(jnp.asarray(img)[None], p)  # [1, g*g, p*p*3]
    got = np.asarray(flat[0] @ collapse_video_stem(kernel3d))
    np.testing.assert_allclose(got.reshape(g, g, d), want, rtol=1e-5, atol=1e-5)


def test_imagebind_forward_contract():
    cfg = ImageBindVisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        image_size=28, patch_size=14, embed_dim=16,
    )
    params = towers.init_params(cfg, jax.random.key(0), jnp.float32)
    pixels = jax.random.normal(jax.random.key(1), (3, 28, 28, 3), jnp.float32)
    out = towers.forward(params, cfg, pixels)
    # one pooled joint-space token per image, L2-normalized
    # (`imagebind.py:49-56` wrapper contract)
    assert out.shape == (3, 1, 16)
    assert cfg.tokens_per_tile == 1 and cfg.feature_size == 16
    norms = np.linalg.norm(np.asarray(out)[:, 0, :], axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_imagebind_import_trunk_matches_clip_layout(hf_clip):
    """Construct an imagebind-layout state dict carrying an HF CLIP model's
    encoder tensors; the imported `layers` subtree must equal import_clip's
    (the trunk block import — fused qkv split, transposes — is shared math)."""
    sd = {k: v.detach().numpy() for k, v in hf_clip.state_dict().items()}
    pre = "vision_model."
    d = TINY.hidden_size
    p = TINY.patch_size
    rng = np.random.default_rng(1)
    state = {
        "modality_preprocessors.vision.cls_token":
            sd[pre + "embeddings.class_embedding"].reshape(1, 1, d),
        "modality_preprocessors.vision.rgbt_stem.proj.1.weight":
            rng.normal(size=(d, 3, 2, p, p)).astype(np.float32),
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed":
            sd[pre + "embeddings.position_embedding.weight"][None],
        "modality_trunks.vision.pre_transformer_layer.0.weight":
            sd[pre + "pre_layrnorm.weight"],
        "modality_trunks.vision.pre_transformer_layer.0.bias":
            sd[pre + "pre_layrnorm.bias"],
        "modality_heads.vision.0.weight": np.ones((d,), np.float32),
        "modality_heads.vision.0.bias": np.zeros((d,), np.float32),
        "modality_heads.vision.2.weight":
            rng.normal(size=(16, d)).astype(np.float32),
    }
    for i in range(TINY.num_layers):
        src = f"{pre}encoder.layers.{i}."
        dst = f"modality_trunks.vision.blocks.{i}."
        state[dst + "norm_1.weight"] = sd[src + "layer_norm1.weight"]
        state[dst + "norm_1.bias"] = sd[src + "layer_norm1.bias"]
        state[dst + "norm_2.weight"] = sd[src + "layer_norm2.weight"]
        state[dst + "norm_2.bias"] = sd[src + "layer_norm2.bias"]
        state[dst + "attn.in_proj_weight"] = np.concatenate(
            [sd[src + f"self_attn.{n}_proj.weight"] for n in ("q", "k", "v")]
        )
        state[dst + "attn.in_proj_bias"] = np.concatenate(
            [sd[src + f"self_attn.{n}_proj.bias"] for n in ("q", "k", "v")]
        )
        state[dst + "attn.out_proj.weight"] = sd[src + "self_attn.out_proj.weight"]
        state[dst + "attn.out_proj.bias"] = sd[src + "self_attn.out_proj.bias"]
        state[dst + "mlp.fc1.weight"] = sd[src + "mlp.fc1.weight"]
        state[dst + "mlp.fc1.bias"] = sd[src + "mlp.fc1.bias"]
        state[dst + "mlp.fc2.weight"] = sd[src + "mlp.fc2.weight"]
        state[dst + "mlp.fc2.bias"] = sd[src + "mlp.fc2.bias"]

    ib_cfg = ImageBindVisionConfig(
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_layers=TINY.num_layers,
        num_heads=TINY.num_heads,
        image_size=28, patch_size=p, embed_dim=16,
    )
    p_ib = hf_import.import_imagebind(state, ib_cfg, dtype=jnp.float32)
    p_clip = hf_import.import_clip(
        hf_import.normalize_keys(hf_clip.state_dict()), TINY, dtype=jnp.float32
    )
    for (path_i, leaf_i), (path_c, leaf_c) in zip(
        jax.tree_util.tree_leaves_with_path(p_ib["layers"]),
        jax.tree_util.tree_leaves_with_path(p_clip["layers"]),
    ):
        assert path_i == path_c
        np.testing.assert_array_equal(
            np.asarray(leaf_i), np.asarray(leaf_c), err_msg=str(path_i)
        )
    # stem collapsed + head imported with the Linear transpose
    assert p_ib["patch_embed"]["kernel"].shape == (p * p * 3, d)
    assert p_ib["head"]["proj"]["kernel"].shape == (d, 16)


def test_with_tower_override():
    from radvlm_tpu import config as cfglib

    base = cfglib.tiny_test_config()
    # spatial tower: anyres preserved, tile size follows the tower input
    c = towers.with_tower(base, "openai/clip-vit-large-patch14-336")
    assert towers.kind(c.vision) == "clip"
    assert c.anyres.tile_size == c.vision.image_size == 336
    assert c.image_aspect_ratio == base.image_aspect_ratio
    # pooled-token tower: no spatial grid -> anyres forced off
    c = towers.with_tower(base, "imagebind_huge")
    assert c.image_aspect_ratio == "pad"
    assert c.anyres.tile_size == 224
    # CLI wiring parses
    from radvlm_tpu.training.cli import parse_args

    args = parse_args([
        "--data-path", "x.json", "--vision-tower",
        "open_clip_hub:ViT-H-14-378-quickgelu",
        "--mm-vision-select-layer", "-2",
    ])
    assert args.vision_tower.endswith("quickgelu")


def test_config_from_tower_name_dispatch(tmp_path):
    # flagship
    assert towers.kind(towers.config_from_tower_name(
        "google/siglip-so400m-patch14-384")) == "siglip"
    # CLIP family (+ S2): select_layer honored (24 pretrained layers)
    c = towers.config_from_tower_name("openai/clip-vit-large-patch14-336")
    assert towers.kind(c) == "clip" and c.s2_scales == ()
    assert c.num_layers == 23
    c = towers.config_from_tower_name(
        "openai/clip-vit-large-patch14-336", select_layer=-3)
    assert c.num_layers == 22
    with pytest.raises(ValueError, match="negative"):
        towers.config_from_tower_name(
            "openai/clip-vit-large-patch14-336", select_layer=1)
    c = towers.config_from_tower_name(
        "openai/clip-vit-large-patch14-336", s2=True, s2_scales=(336, 672))
    assert c.s2_scales == (336, 672)
    # open_clip hub: select_layer=-2 drops one of the 32 pretrained layers
    c = towers.config_from_tower_name("open_clip_hub:ViT-H-14-378-quickgelu")
    assert (c.hidden_size, c.num_layers, c.image_size) == (1280, 31, 378)
    with pytest.raises(ValueError, match="unknown open_clip"):
        towers.config_from_tower_name("open_clip_hub:ViT-nope")
    # imagebind
    c = towers.config_from_tower_name("imagebind_huge")
    assert towers.kind(c) == "imagebind" and c.feature_size == 1024
    # hf: generic dir
    d = tmp_path / "hfvision"
    d.mkdir()
    (d / "config.json").write_text(json.dumps({
        "model_type": "clip_vision_model", "hidden_size": 64,
        "num_hidden_layers": 5, "num_attention_heads": 4,
        "intermediate_size": 128, "image_size": 56, "patch_size": 14,
    }))
    c = towers.config_from_tower_name(f"hf:{d}")
    assert towers.kind(c) == "clip"
    assert (c.hidden_size, c.num_layers) == (64, 4)
    (d / "config.json").write_text(json.dumps({"model_type": "beit"}))
    with pytest.raises(ValueError, match="unsupported"):
        towers.config_from_tower_name(f"hf:{d}")
    with pytest.raises(ValueError, match="Unknown vision tower"):
        towers.config_from_tower_name("mystery-tower")


def test_eva_tower_in_full_vlm_forward():
    """An EVA tower plugs into the full multimodal model: feature grid has an
    integer side (anyres merge), projector consumes hidden_size."""
    import dataclasses

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.models import multimodal, radvlm
    from radvlm_tpu.models.eva import EVAVisionConfig

    vis = EVAVisionConfig(
        hidden_size=32, head_dim=16, num_layers=2, intermediate_size=64,
        image_size=28, patch_size=14, rope_pt_seq_len=2, rope_intp_freq=False,
    )
    base = cfglib.tiny_test_config()
    cfg = dataclasses.replace(
        base, vision=vis,
        anyres=dataclasses.replace(base.anyres, tile_size=28),
    )
    params = radvlm.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(40, 30, 3), dtype=np.uint8)
    sample = multimodal.build_sample([2, IMAGE_TOKEN_INDEX, 3], [img], cfg)
    batch = {k: jnp.asarray(v)
             for k, v in multimodal.collate([sample], pad_to_multiple=128).items()}
    logits, _ = radvlm.forward(params, cfg, batch)
    assert logits.shape[0] == 1 and logits.shape[-1] == cfg.text.vocab_size
    assert np.isfinite(np.asarray(logits)).all()
