"""Offline weight quantization: HF checkpoint -> pre-quantized native dir.

    python -m radvlm_tpu.models.quantize_cli \\
        --hf-checkpoint /ckpts/radvlm-7b-hf --out /ckpts/radvlm-7b-int8

The reference quantizes at every load with bitsandbytes
(`builder.py:30-34`); this pays the bf16 load + quantize ONCE and serving /
eval workers start from the artifact (`--checkpoint` auto-detects the format
via `radvlm_quant.json`). Tokenizer files are copied alongside so the dir is
self-contained.
"""

from __future__ import annotations

import argparse
import logging
import os
import shutil

TOKENIZER_FILES = (
    "tokenizer.json", "tokenizer_config.json", "vocab.json", "merges.txt",
    "special_tokens_map.json", "added_tokens.json", "tokenizer.model",
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hf-checkpoint", required=True, help="HF safetensors dir")
    p.add_argument("--out", required=True, help="output quantized dir")
    p.add_argument("--bits", type=int, default=8, choices=[8, 4],
                   help="8: int8 weight-only (W8A8-capable); 4: nibble-packed "
                        "int4 layer kernels with group-128 scales (W4A16)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax.numpy as jnp

    from radvlm_tpu.models.hf_import import (
        config_from_hf_dir,
        load_radvlm_checkpoint,
    )
    from radvlm_tpu.models.quant_io import save_quantized
    from radvlm_tpu.ops.quant import quantize_params, quantized_bytes

    cfg = config_from_hf_dir(args.hf_checkpoint)
    params = load_radvlm_checkpoint(args.hf_checkpoint, cfg, dtype=jnp.bfloat16)
    params = quantize_params(params, bits=args.bits)
    save_quantized(params, cfg, args.out)
    for name in TOKENIZER_FILES:
        src = os.path.join(args.hf_checkpoint, name)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(args.out, name))
    print(f"wrote {args.out}: int{args.bits}, "
          f"{quantized_bytes(params) / 1e9:.2f} GB quantized payload")


if __name__ == "__main__":
    main()
