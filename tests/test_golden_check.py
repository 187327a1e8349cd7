"""tools/golden_check.py exercised end to end with a TINY random checkpoint.

The real `lmms-lab/llava-onevision-qwen2-*-si` weights are not obtainable in
this environment (no network egress, no HF cache) — documented blocker in
PARITY.md. This test saves a tiny random LlavaOnevisionForConditionalGeneration
+ processor to disk and runs the golden-check script's `run_checks` against
it, so the script's load path, pixel-value check, logits check, and greedy
generation check are all verified runnable; the only untested input is the
real weight values.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

TILE = 56
IMAGE_TOKEN_ID = 258


def _build_tokenizer():
    """Byte-level BPE tokenizer built offline (256 byte tokens + specials)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    byte_alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(byte_alphabet))}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()

    from transformers import PreTrainedTokenizerFast

    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        eos_token="<|eos|>",
        pad_token="<|pad|>",
    )
    fast.add_special_tokens({"additional_special_tokens": ["<image>"]})
    return fast


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from transformers import (
        LlavaOnevisionConfig,
        LlavaOnevisionForConditionalGeneration,
        LlavaOnevisionImageProcessor,
    )


    path = tmp_path_factory.mktemp("ckpt")
    tokenizer = _build_tokenizer()
    assert tokenizer.convert_tokens_to_ids("<image>") == IMAGE_TOKEN_ID

    torch.manual_seed(0)
    pinpoints = [[i * TILE, j * TILE] for i in range(1, 7) for j in range(1, 7)]
    cfg = LlavaOnevisionConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=TILE, patch_size=14,
            vision_use_head=False,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=len(tokenizer), hidden_size=48,
            intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=12, rope_theta=10000.0,
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            max_position_embeddings=4096,
            eos_token_id=tokenizer.eos_token_id,
        ),
        image_grid_pinpoints=pinpoints,
        image_token_index=IMAGE_TOKEN_ID,
        vision_feature_select_strategy="full",
        vision_feature_layer=-1,
        vision_aspect_ratio="anyres_max_9",
        use_image_newline_parameter=True,
    )
    model = LlavaOnevisionForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(path)

    image_processor = LlavaOnevisionImageProcessor(
        size={"height": TILE, "width": TILE},
        crop_size={"height": TILE, "width": TILE},
        image_grid_pinpoints=pinpoints,
    )
    image_processor.save_pretrained(path)
    tokenizer.save_pretrained(path)
    return str(path)


def test_golden_check_runs_on_tiny_checkpoint(tiny_checkpoint, rng):
    sys.path.insert(0, "tools")
    from golden_check import run_checks

    image = rng.integers(0, 255, size=(120, 100, 3), dtype=np.uint8)
    results = run_checks(
        tiny_checkpoint, image, "<image>\nProvide a radiology report.",
        max_new_tokens=6,
    )
    assert results["logits"], results
    assert results["generation"], results
