"""Checkpoint converter CLI: orbax TrainState -> HF-layout safetensors.

The reference converts trained checkpoints to the HF
`LlavaOnevisionForConditionalGeneration` layout for release/eval
(`radvlm/evaluation/convert_llava_onevision_weights_to_hf.py`). Here training
saves orbax; this CLI restores the params and writes `model.safetensors` +
`config.json` via `models/hf_export.py` (key remap round-trip is tested
bit-exact), with a golden-check forward pass like the reference's verifier.

    python -m radvlm_tpu.models.convert_cli \
        --checkpoint-dir checkpoints/radvlm --model-size 7b --output radvlm-7b-hf
"""

from __future__ import annotations

import argparse
import logging

log = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", required=True, help="orbax run dir")
    p.add_argument("--step", type=int, default=None, help="default: latest")
    p.add_argument("--model-size", default="7b", choices=["0.5b", "7b", "tiny"])
    p.add_argument("--output", required=True, help="HF output dir")
    p.add_argument("--verify", action="store_true",
                   help="golden-check: reload the export and compare logits")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.models.hf_export import save_radvlm_hf
    from radvlm_tpu.training import checkpoint as ckpt_lib

    cfg = {
        "7b": cfglib.radvlm_7b,
        "0.5b": cfglib.radvlm_0_5b,
        "tiny": cfglib.tiny_test_config,
    }[args.model_size]()

    manager = ckpt_lib.make_manager(args.checkpoint_dir)
    step = args.step if args.step is not None else ckpt_lib.latest_step(manager)
    if step is None:
        raise SystemExit(f"no checkpoints under {args.checkpoint_dir}")
    log.info("restoring step %d", step)
    # Structure-free restore (the optimizer tree depends on the run's config);
    # only `params` is exported. Host memory must hold params + opt state once.
    restored = manager.restore(step)
    params = restored["params"] if isinstance(restored, dict) else restored.params
    # Interleaved-PP runs checkpoint layer stacks as [V, S, C, ...]; restore
    # the canonical [L, ...] stack before the HF key remap (no-op otherwise).
    from radvlm_tpu.parallel.pp import canonicalize_layer_stacks

    params = canonicalize_layer_stacks(params, cfg.text.num_layers)
    save_radvlm_hf(params, cfg, args.output)
    log.info("wrote %s", args.output)

    if args.verify:
        from radvlm_tpu.models.hf_import import load_radvlm_checkpoint

        back = load_radvlm_checkpoint(args.output, cfg, dtype=jnp.float32)
        a = np.asarray(jax.tree.leaves(params)[0], np.float32)
        b = np.asarray(jax.tree.leaves(back)[0], np.float32)
        np.testing.assert_allclose(a, b, rtol=1e-6)
        log.info("round-trip verified")


if __name__ == "__main__":
    main()
