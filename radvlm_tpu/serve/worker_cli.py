"""Model-worker launcher.

Rebuild of the reference's worker entry points (`finetuning/llava/serve/
model_worker.py:260-296` argparse + `sglang_worker.py` launch): loads an HF
checkpoint, builds a `VLMRunner`, and serves the worker HTTP protocol.

The DEFAULT engine is the continuous-batching worker (`serve/batch_worker.py`,
the SGLang-worker analog): all concurrent requests share one slot-refilled
decode batch, so the TPU decodes a full batch every step instead of
serializing requests behind a semaphore. `--engine static` falls back to the
per-request streaming worker (`serve/worker.py`) which streams tokens as they
decode (useful for interactive chat latency).

    python -m radvlm_tpu.serve.worker_cli --checkpoint /ckpts/radvlm-7b-hf \
        --controller-address http://localhost:21001 --port 21002
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="HF safetensors dir")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--model-names", default="radvlm",
                   help="comma-separated model names to register")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=21002)
    p.add_argument("--controller-address", default=None)
    p.add_argument("--worker-address", default="",
                   help="address advertised to the controller "
                        "(default http://localhost:<port>)")
    p.add_argument("--engine", default="continuous",
                   choices=["continuous", "static"],
                   help="continuous: slot-refilled batching worker (default); "
                        "static: per-request streaming worker")
    p.add_argument("--num-slots", type=int, default=8,
                   help="concurrent decode slots (continuous engine)")
    p.add_argument("--max-len", type=int, default=8192,
                   help="per-slot KV cache length (continuous engine)")
    p.add_argument("--prompt-bucket", type=int, default=4096)
    p.add_argument("--limit-concurrency", type=int, default=2,
                   help="max concurrent requests (static engine)")
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--int8", action="store_true",
                   help="quantize weights to int8 at load (ops/quant.py)")
    p.add_argument("--fleet", type=int, default=None,
                   help="data-parallel engine fleet: N continuous engines, "
                        "one per chip (or per --fleet-tp submesh) behind one "
                        "worker — the reference's one-model-per-GPU workers")
    p.add_argument("--fleet-tp", type=int, default=1,
                   help="chips per fleet engine (TP submesh size)")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    # Warm restarts load compiled executables from disk (a 7B worker's bucket
    # fills + decode graphs otherwise cost minutes of XLA compile at startup).
    from radvlm_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from radvlm_tpu.eval.harness import HFTokenizer, VLMRunner
    from radvlm_tpu.models.hf_import import (
        config_from_hf_dir,
        load_radvlm_checkpoint,
    )

    from radvlm_tpu.models.quant_io import is_quantized_dir, load_quantized

    if is_quantized_dir(args.checkpoint):
        # pre-quantized native checkpoint (models/quantize_cli.py): skip the
        # bf16 load + quantize that otherwise dominates worker cold start
        params, cfg = load_quantized(args.checkpoint)
    else:
        cfg = config_from_hf_dir(args.checkpoint)
        params = load_radvlm_checkpoint(
            args.checkpoint, cfg, dtype=jnp.bfloat16
        )
        if args.int8:
            from radvlm_tpu.ops.quant import quantize_params

            params = quantize_params(params)
    tok = HFTokenizer(args.tokenizer or args.checkpoint)
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=tok,
        max_new_tokens=args.max_new_tokens,
        fleet=args.fleet, fleet_tp=args.fleet_tp,
    )
    # The runner fused its own copy of the projections; free the unfused tree
    # (double residency of q/k/v/gate/up kernels OOMs a 16 GB chip at 7B).
    del params
    model_names = [n.strip() for n in args.model_names.split(",") if n.strip()]

    if args.engine == "continuous":
        from radvlm_tpu.serve.batch_worker import BatchWorker

        worker = BatchWorker(
            runner,
            model_names=model_names,
            num_slots=args.num_slots,
            max_len=args.max_len,
            prompt_bucket=args.prompt_bucket,
            controller_address=args.controller_address,
            worker_address=args.worker_address,
            fleet=args.fleet,
            fleet_tp=args.fleet_tp,
        )
    else:
        from radvlm_tpu.serve.worker import ModelWorker

        worker = ModelWorker(
            runner,
            model_names=model_names,
            worker_address=args.worker_address,
            controller_address=args.controller_address,
            limit_concurrency=args.limit_concurrency,
        )
    worker.serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
