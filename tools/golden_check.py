"""Golden-parity check against a REAL llava-onevision checkpoint.

The reference's golden-check discipline is
`convert_llava_onevision_weights_to_hf.py:204-250`: load the converted
checkpoint, (1) verify pixel values from the processor, (2) run a forward and
compare logits against recorded values, (3) generate and compare the text
against a recorded expected string. This script applies the same discipline to
the radvlm_tpu import path, with the HF implementation as the oracle:

    python tools/golden_check.py --checkpoint /ckpts/llava-onevision-qwen2-0.5b-si \
        [--image path/to/cxr.jpg] [--prompt "Describe the image."]

Checks:
  1. pixel values: our anyres tiler vs the HF LlavaOnevisionImageProcessor;
  2. logits: our forward vs HF forward at the last prompt position;
  3. greedy generation: token-for-token match.

Uses AutoTokenizer + LlavaOnevisionImageProcessor directly (NOT AutoProcessor:
the combined LlavaOnevisionProcessor pulls in a video processor that requires
torchvision, absent in this image) and composes input_ids the way the
processor would — image sentinel expanded to one image-token id per merged
feature.

BLOCKER (round 2): this environment has no network egress and no cached HF
weights, so the script has not run against real weights yet. It IS exercised
end-to-end in CI with a tiny random LlavaOnevision checkpoint written to disk
(tests/test_golden_check.py), so the only untested input is the weight values
themselves.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, flush=True)


def run_checks(checkpoint: str, image: np.ndarray, prompt: str,
               max_new_tokens: int = 64, rel_logits: float = 2e-2) -> dict:
    """Returns {check_name: bool}. Raises on load failures."""
    import json

    import jax
    import jax.numpy as jnp
    import torch
    from transformers import (
        AutoTokenizer,
        LlavaOnevisionForConditionalGeneration,
        LlavaOnevisionImageProcessor,
    )

    from radvlm_tpu.generation.engine import GenerationConfig, make_generate_fn
    from radvlm_tpu.models import multimodal, radvlm
    from radvlm_tpu.models.hf_import import (
        config_from_hf_dir,
        load_radvlm_checkpoint,
    )
    from radvlm_tpu.ops.image_ops import normalize_pixels

    results = {}

    tokenizer = AutoTokenizer.from_pretrained(checkpoint)
    image_processor = LlavaOnevisionImageProcessor.from_pretrained(checkpoint)
    hf = LlavaOnevisionForConditionalGeneration.from_pretrained(
        checkpoint, torch_dtype=torch.float32
    )
    hf.eval()
    with open(os.path.join(checkpoint, "config.json")) as f:
        image_token_index = json.load(f)["image_token_index"]

    cfg = config_from_hf_dir(checkpoint)
    params = load_radvlm_checkpoint(checkpoint, cfg, dtype=jnp.float32)

    # Our sample: tokenize around the <image> sentinel, anyres-tile the image.
    ids = multimodal.tokenize_with_images(
        lambda s: tokenizer.encode(s, add_special_tokens=False), prompt
    )
    ours = multimodal.build_sample(ids, [image], cfg)

    # --- 1. pixel values ---------------------------------------------------
    from PIL import Image

    pil = Image.fromarray(image)
    hf_px = image_processor(images=pil, return_tensors="np")["pixel_values"]
    hf_px = hf_px[0] if hf_px.ndim == 5 else hf_px  # [T, 3, ts, ts]
    our_px = normalize_pixels(np.asarray(ours.tiles)).transpose(0, 3, 1, 2)
    t = min(hf_px.shape[0], our_px.shape[0])
    px_err = float(np.abs(hf_px[:t] - our_px[:t]).max())
    results["pixel_values"] = bool(px_err < 1e-4)
    log(f"[1] pixel values: {t} tiles, max err {px_err:.2e}: "
        f"{results['pixel_values']}")

    # --- 2. logits -----------------------------------------------------------
    # HF input_ids: the prompt with the sentinel expanded to one image-token id
    # per merged feature (what LlavaOnevisionProcessor does).
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX

    hf_ids = []
    for tok in ids:
        if tok == IMAGE_TOKEN_INDEX:
            hf_ids.extend([image_token_index] * ours.num_image_tokens)
        else:
            hf_ids.append(tok)
    image_sizes = torch.tensor([[image.shape[0], image.shape[1]]])  # (h, w)
    pixel_values = torch.tensor(
        normalize_pixels(np.asarray(ours.tiles))
    ).permute(0, 3, 1, 2)[None]
    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=pixel_values,
            image_sizes=image_sizes,
        )
    hf_logits = hf_out.logits[0, -1].numpy()

    batch = {k: jnp.asarray(v) for k, v in multimodal.collate(
        [ours], pad_to_multiple=8
    ).items()}
    our_logits_all, _ = radvlm.forward(params, cfg, batch, attn_impl="xla")
    n = int(batch["lengths"][0])
    our_logits = np.asarray(our_logits_all)[0, n - 1]
    denom = max(np.abs(hf_logits).max(), 1e-6)
    max_err = float(np.abs(hf_logits - our_logits).max() / denom)
    results["logits"] = bool(max_err < rel_logits)
    log(f"[2] last-position logits rel err: {max_err:.2e} (< {rel_logits}): "
        f"{results['logits']}")

    # --- 3. greedy generation ------------------------------------------------
    with torch.no_grad():
        hf_gen = hf.generate(
            input_ids=torch.tensor([hf_ids]),
            pixel_values=pixel_values,
            image_sizes=image_sizes,
            max_new_tokens=max_new_tokens,
            do_sample=False,
        )
    hf_new = hf_gen[0, len(hf_ids):].tolist()

    eos = tokenizer.eos_token_id
    gen_fn = make_generate_fn(
        cfg,
        GenerationConfig(max_new_tokens=max_new_tokens,
                         eos_token_ids=(eos,) if eos is not None else ()),
        attn_impl="xla",
    )
    left = {k: jnp.asarray(v) for k, v in multimodal.collate(
        [ours], pad_to_multiple=128, left_pad=True
    ).items()}
    out = gen_fn(params, left, jax.random.key(0))
    our_new = np.asarray(out["tokens"])[0, : int(out["num_tokens"][0])].tolist()
    hf_trim = [t for t in hf_new if t != eos][: len(our_new)]
    gen_ok = our_new[: len(hf_trim)] == hf_trim
    results["generation"] = bool(gen_ok)
    log(f"[3] greedy generation match: {gen_ok}")
    log(f"    hf:   {tokenizer.decode(hf_new)[:200]!r}")
    log(f"    ours: {tokenizer.decode(our_new)[:200]!r}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="local HF dir (e.g. lmms-lab/llava-onevision-qwen2-0.5b-si)")
    ap.add_argument("--image", default=None, help="image path (default: synthetic)")
    ap.add_argument("--prompt", default="<image>\nProvide a radiology report "
                    "for this chest X-ray.")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    args = ap.parse_args()

    if args.image:
        from PIL import Image

        image = np.asarray(Image.open(args.image).convert("RGB"))
    else:
        image = np.random.default_rng(0).integers(
            0, 255, size=(512, 460, 3), dtype=np.uint8
        )

    results = run_checks(args.checkpoint, image, args.prompt,
                         max_new_tokens=args.max_new_tokens)
    ok = all(results.values())
    log(f"GOLDEN CHECK {'PASSED' if ok else 'FAILED'}: {results}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
