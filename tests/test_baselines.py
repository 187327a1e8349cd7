"""Baseline-zoo tests: box conversions, prompt builders, BioViL transform,
LLaVA-Med rebuild (state-dict remap + splice + tiny end-to-end generate)."""

import numpy as np
import pytest

from radvlm_tpu.eval.baselines import (
    biovil_chest_xray_transform,
    chexagent_boxes_to_text,
    load_baseline,
    maira2_boxes_to_text,
    mistral_instruct_prompt,
    remap_to_uint8,
    splice_image_sentinel,
    vicuna_v1_prompt,
    RaDialogBaseline,
    VICUNA_SYSTEM,
)


def test_chexagent_box_decode():
    text = ("The finding is at <|box|> (12,30),(55,90) <|/box|> and "
            "<|box|> (5,5),(20,25) <|/box|>.")
    assert chexagent_boxes_to_text(text) == (
        "[0.12, 0.30, 0.55, 0.90], [0.05, 0.05, 0.20, 0.25]"
    )
    assert chexagent_boxes_to_text("no boxes") == ""


def test_maira2_box_adjust():
    # Fake processor adjustment: crop-space [0,1] -> original aspect corrected.
    def adjust(coord, *, width, height):
        # e.g. the processor letterboxed landscape: scale x only
        return [coord[0] * 0.8 + 0.1, coord[1], coord[2] * 0.8 + 0.1, coord[3]]

    out = maira2_boxes_to_text(
        [[0.0, 0.25, 0.5, 0.75], None], adjust, width=1000, height=800
    )
    assert out == "[0.1, 0.25, 0.5, 0.75]"
    assert maira2_boxes_to_text(None, adjust, width=1, height=1) == ""
    assert maira2_boxes_to_text([], adjust, width=1, height=1) == ""


def test_registry_gating():
    with pytest.raises(ValueError, match="unknown baseline"):
        load_baseline("nonesuch")


# ---------------------------------------------------------------------------
# RaDialog pure parts
# ---------------------------------------------------------------------------


def test_vicuna_prompt_single_turn():
    p = vicuna_v1_prompt("Describe the image.")
    assert p == (
        VICUNA_SYSTEM + " USER: <image>. Describe the image. ASSISTANT:"
    )


def test_vicuna_prompt_multi_turn():
    p = vicuna_v1_prompt("And now?", chat_history=[("Hi", "Hello.")])
    # First turn carries <image> only when history is empty (reference
    # rebuilds conv from history verbatim, models_loading_inference.py:219-228).
    assert p == (
        VICUNA_SYSTEM + " USER: Hi ASSISTANT: Hello.</s>USER: And now? ASSISTANT:"
    )


def test_mistral_prompt():
    assert mistral_instruct_prompt("Q1") == "[INST] <image>\nQ1 [/INST]"
    assert mistral_instruct_prompt("Q2", [("Q1", "A1")]) == (
        "[INST] <image>\nQ1 [/INST]A1</s>[INST] Q2 [/INST]"
    )


def test_splice_image_sentinel():
    tok = lambda s: [ord(c) for c in s]
    ids = splice_image_sentinel("ab<image>cd", tok)
    assert ids == [ord("a"), ord("b"), -200, ord("c"), ord("d")]
    assert splice_image_sentinel("no image", tok) == [ord(c) for c in "no image"]


def test_remap_to_uint8():
    a = np.array([[10.0, 20.0], [30.0, 50.0]])
    out = remap_to_uint8(a)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255
    # percentile clip bounds extremes
    b = np.concatenate([np.full(98, 50.0), [0.0, 1000.0]])
    clipped = remap_to_uint8(b, percentiles=(1, 99))
    assert clipped.max() == 255
    assert remap_to_uint8(np.zeros((2, 2))).max() == 0  # constant image safe


def test_biovil_transform_shape():
    img = np.random.default_rng(0).integers(
        0, 255, size=(600, 480, 3), dtype=np.uint8
    )
    out = biovil_chest_xray_transform(img)
    assert out.shape == (1, 3, 448, 448)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # all three channels identical (grayscale expand)
    np.testing.assert_array_equal(out[0, 0], out[0, 1])


def test_radialog_trim():
    assert RaDialogBaseline.trim_output(" The report.</s> ") == "The report."


# ---------------------------------------------------------------------------
# LLaVA-Med rebuild
# ---------------------------------------------------------------------------


def test_llavamed_state_dict_remap():
    from radvlm_tpu.eval.llavamed import remap_state_dict

    sd = {
        "model.embed_tokens.weight": 1,
        "model.layers.0.self_attn.q_proj.weight": 2,
        "lm_head.weight": 3,
        "model.vision_tower.vision_tower.vision_model.embeddings.patch_embedding.weight": 4,
        "model.mm_projector.0.weight": 5,
        "model.mm_projector.2.bias": 6,
    }
    lang, vis, proj = remap_state_dict(sd)
    assert set(lang) == {"model.embed_tokens.weight",
                         "model.layers.0.self_attn.q_proj.weight",
                         "lm_head.weight"}
    assert set(vis) == {"vision_model.embeddings.patch_embedding.weight"}
    assert set(proj) == {"0.weight", "2.bias"}


def test_llavamed_splice_and_generate_tiny():
    """End-to-end tiny LLaVA-Med: CLIP tower + projector + Mistral assembled
    from components; sentinel splice expands to patch count; generate runs."""
    torch = pytest.importorskip("torch")
    from transformers import (
        CLIPVisionConfig,
        CLIPVisionModel,
        MistralConfig,
        MistralForCausalLM,
    )

    from radvlm_tpu.eval.llavamed import (
        LlavaMedModel,
        select_patch_features,
        splice_image_embeds,
    )

    torch.manual_seed(0)
    d_lm, d_vis = 32, 24
    lm = MistralForCausalLM(MistralConfig(
        vocab_size=128, hidden_size=d_lm, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    ))
    tower = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=d_vis, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14, projection_dim=16,
    ))
    projector = torch.nn.Sequential(
        torch.nn.Linear(d_vis, d_lm), torch.nn.GELU(),
        torch.nn.Linear(d_lm, d_lm),
    )
    model = LlavaMedModel.from_components(lm, tower, projector).eval()

    pixels = torch.randn(1, 3, 28, 28)
    feats = model.encode_image(pixels)
    assert feats.shape == (1, 4, d_lm)  # (28/14)^2 patches, CLS dropped

    ids = torch.tensor([[1, 5, -200, 9]])
    embeds, mask = splice_image_embeds(
        ids, lm.get_input_embeddings(), feats
    )
    assert embeds.shape == (1, 3 + 4, d_lm)
    assert mask.shape == (1, 7)

    out = model.generate(ids, pixels, max_new_tokens=3)
    assert out.shape[1] == 3  # inputs_embeds path returns only new tokens

    # feature select drops CLS from the chosen layer
    hs = [torch.zeros(1, 5, 4), torch.ones(1, 5, 4)]
    sel = select_patch_features(hs, -1)
    assert sel.shape == (1, 4, 4)
