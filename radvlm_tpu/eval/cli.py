"""Evaluation CLI (the reference's `accelerate launch radvlm.evaluation.
evaluate_instructions --task X --model_name Y`).

    python -m radvlm_tpu.eval.cli --task report_generation \
        --checkpoint /ckpts/radvlm-7b-hf --data-dir $DATA_DIR --output-dir results/

Multi-host eval shards samples by process index and allgathers (run the same
command on every host of the slice with --multihost).
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--task", required=True, choices=[
        "report_generation", "abnormality_classification",
        "abnormality_grounding", "abnormality_detection",
        "anatomical_grounding", "phrase_grounding",
    ])
    p.add_argument("--checkpoint", required=True, help="HF safetensors dir")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--model-name", default="radvlm")
    p.add_argument("--data-dir", default=os.environ.get("DATA_DIR"))
    p.add_argument("--output-dir", default="results")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--no-clinical", action="store_true",
                   help="skip RadGraph/CheXbert/BERTScore sidecar metrics")
    p.add_argument("--engine", default="continuous",
                   choices=["continuous", "static"],
                   help="continuous: slot-refilled batching (default); "
                        "static: fixed padded batches")
    p.add_argument("--multihost", action="store_true")
    p.add_argument("--fleet", type=int, default=None,
                   help="data-parallel engine fleet: N continuous engines, "
                        "one per chip (or per --fleet-tp submesh) — the "
                        "single-host analog of the reference's per-GPU eval "
                        "processes")
    p.add_argument("--fleet-tp", type=int, default=1,
                   help="chips per fleet engine (TP submesh size)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from radvlm_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    if args.multihost:
        import jax

        jax.distributed.initialize()

    import jax.numpy as jnp

    from radvlm_tpu.eval.harness import (
        HFTokenizer,
        VLMRunner,
        build_task_dataset,
        run_task,
    )
    from radvlm_tpu.models.hf_import import config_from_hf_dir, load_radvlm_checkpoint

    from radvlm_tpu.models.quant_io import is_quantized_dir, load_quantized

    if is_quantized_dir(args.checkpoint):
        params, cfg = load_quantized(args.checkpoint)
    else:
        cfg = config_from_hf_dir(args.checkpoint)
        params = load_radvlm_checkpoint(
            args.checkpoint, cfg, dtype=jnp.bfloat16
        )
    tok = HFTokenizer(args.tokenizer or args.checkpoint)
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=tok,
        max_new_tokens=args.max_new_tokens, batch_size=args.batch_size,
        fleet=args.fleet, fleet_tp=args.fleet_tp,
    )
    # The runner holds fused copies of the q/k/v/gate/up kernels; dropping the
    # unfused tree here frees its device buffers (~8.5 GB at 7B bf16 —
    # keeping both resident OOMs next to the KV cache on a 16 GB chip).
    del params
    dataset = build_task_dataset(args.task, args.data_dir)
    _, metrics = run_task(
        runner, dataset, args.task,
        max_samples=args.max_samples,
        output_dir=args.output_dir,
        model_name=args.model_name,
        with_clinical=not args.no_clinical,
        engine=args.engine,
        progress=lambda done, total: print(f"{done}/{total}", flush=True),
    )
    for k, v in metrics.items():
        print(f"{k}: {round(float(v) * 100, 1)}")


if __name__ == "__main__":
    main()
