"""Conversation-eval CLI (reference `radvlm/evaluation/evaluate_conversations.py`).

    python -m radvlm_tpu.eval.conversations_cli \
        --checkpoint /ckpts/radvlm-7b-hf --data-dir $DATA_DIR \
        --grounded --judge azure --output results/conv_eval.json
"""

from __future__ import annotations

import argparse
import logging
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--data-dir", default=os.environ.get("DATA_DIR"))
    p.add_argument("--grounded", action="store_true",
                   help="grounded conversations (bbox-aware, MS-CXR subset)")
    p.add_argument("--judge", default="azure", choices=["azure"])
    p.add_argument("--judge-model", default="gpt-4o")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--output", default="results/conversations_eval.json")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax.numpy as jnp

    from radvlm_tpu.data import datasets as ds
    from radvlm_tpu.data.llm_clients import AzureOpenAIClient
    from radvlm_tpu.eval.conversations import evaluate_conversations
    from radvlm_tpu.eval.harness import HFTokenizer, VLMRunner
    from radvlm_tpu.models.hf_import import config_from_hf_dir, load_radvlm_checkpoint

    cfg = config_from_hf_dir(args.checkpoint)
    params = load_radvlm_checkpoint(args.checkpoint, cfg, dtype=jnp.bfloat16)
    tok = HFTokenizer(args.tokenizer or args.checkpoint)
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=tok,
        max_new_tokens=args.max_new_tokens, batch_size=1,
    )
    del params  # runner holds the fused copy; avoid double weight residency

    kind = "grounded" if args.grounded else "standard"
    dataset = ds.MIMICCXRDataset(
        os.path.join(args.data_dir, "MIMIC-CXR-JPG"),
        split="test", only_frontal=True, flag_lab=False,
        conversation_dir=os.path.join(
            args.data_dir, "MIMIC-CXR-JPG", "conversations", "test", kind
        ),
        sentences_bbox_dir=(
            os.path.join(args.data_dir, "MS-CXR", "sentences_BBox_mscxr")
            if args.grounded else None
        ),
    )
    judge = AzureOpenAIClient(model=args.judge_model)
    metrics = evaluate_conversations(
        runner, dataset, judge,
        max_samples=args.max_samples, output_path=args.output,
    )
    print(f"mean judge score: {metrics['mean_score']:.2f}/10 "
          f"over {int(metrics['n'])} conversations")


if __name__ == "__main__":
    main()
