"""Baseline-zoo pure-function tests (box-format conversions, registry gating)."""

import pytest

from radvlm_tpu.eval.baselines import (
    chexagent_boxes_to_text,
    load_baseline,
    maira2_boxes_to_text,
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
        load_baseline("radialog")
