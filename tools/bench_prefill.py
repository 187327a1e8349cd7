"""Prefill microbenchmark: where does the prompt-processing time go at 7B?

Times, separately: vision tower (48 tiles), text-decoder prefill (collect_kv
over the padded prompt), and the full engine prefill, at bench shapes
(batch 8, padded length 4096).

    python tools/bench_prefill.py [--batch 8] [--pad-len 4096] [--tiles 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pad-len", type=int, default=4096)
    ap.add_argument("--tiles", type=int, default=6)
    ap.add_argument("--size", default="7b-int8")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from bench import _random_quantized_params

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.generation.engine import prefill
    from radvlm_tpu.models import multimodal, radvlm

    cfg = cfglib.radvlm_7b() if args.size.startswith("7b") else cfglib.radvlm_0_5b()
    if args.size.endswith("-int8"):
        params = _random_quantized_params(cfg)
    else:
        params = radvlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params = radvlm.fuse_for_inference(params, cfg)

    rng = np.random.default_rng(0)
    samples = []
    for _ in range(args.batch):
        h = int(rng.integers(480, 560))
        w = int(rng.integers(400, 520))
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        ids = [IMAGE_TOKEN_INDEX] + list(rng.integers(100, 50000, size=40))
        samples.append(multimodal.build_sample(ids, [img], cfg))
    hb = multimodal.collate(samples, pad_len=args.pad_len, pad_tiles=args.tiles,
                            pad_to_multiple=512, left_pad=True)
    batch = {k: jnp.asarray(v) for k, v in hb.items()}
    print("tokens:", batch["tokens"].shape, " tiles:", batch["tiles"].shape,
          " real len:", int(np.asarray(hb["lengths"]).max()), flush=True)

    max_len = args.pad_len + 128

    def timeit(name, fn, *a):
        t0 = time.perf_counter()
        r = fn(*a)
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.steps):
            r = fn(*a)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{name}: {dt*1e3:.0f} ms  (compile {compile_s:.0f}s)", flush=True)
        return dt

    # 1. vision tower + projector only
    b, t = batch["tiles"].shape[:2]
    flat = batch["tiles"].reshape((b * t,) + batch["tiles"].shape[2:])
    vis = jax.jit(lambda p, x: radvlm.encode_tiles(p, cfg, x))
    timeit("vision(48 tiles)", vis, params, flat)

    # 2. text prefill only (embeds precomputed)
    from radvlm_tpu.models import qwen2

    # collate() pads tokens up to pad_to_multiple past pad_len when the
    # spliced multimodal length overflows the requested bucket — size the
    # text-only embeds off the ACTUAL collated length, not args.pad_len.
    seq_len = batch["tokens"].shape[1]
    embeds = jnp.zeros((b, seq_len, cfg.text.hidden_size), jnp.bfloat16)

    def text_prefill(p, e):
        hidden, (ks, vs) = qwen2.forward(
            p["text"], cfg.text, input_embeds=e,
            positions=batch["positions"], segment_ids=batch["segment_ids"],
            return_hidden=True, collect_kv=True,
        )
        return hidden[:, -1], ks
    timeit("text prefill", jax.jit(text_prefill), params, embeds)

    # 3. full engine prefill (vision + splice + text + cache init + unembed)
    pf = jax.jit(lambda p, bb: prefill(p, cfg, bb, max_len))
    timeit("engine prefill", pf, params, batch)


if __name__ == "__main__":
    main()
