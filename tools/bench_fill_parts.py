"""Batch-1 fill decomposition: where the ENGINE's per-image prefill time goes.

`tools/bench_prefill.py` amortizes over batch 8; the serving engine fills one
slot at a time (fill_batch=1 measured better end-to-end), and the synced
batch-1 fill measures ~2x the batch-8 per-image rate. This bench times, at
ENGINE shapes (batch 1, one bucket):

  * vision tower + projector on the slot's `pad_tiles` tiles
  * text-decoder prefill (embeds precomputed) at the bucket length
  * prefill attention share (text prefill minus a no-attention variant is not
    separable post-jit; instead reported as FLOP shares)
  * the full engine `_fill_fn` dispatch, synced

    python tools/bench_fill_parts.py [--bucket 3456] [--tiles 6] [--reps 5]
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
    ap.add_argument("--bucket", type=int, default=3456)
    ap.add_argument("--tiles", type=int, default=6)
    ap.add_argument("--size", default="7b-int8")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from bench import _random_quantized_params

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.models import multimodal, qwen2, radvlm

    cfg = cfglib.radvlm_7b() if args.size.startswith("7b") else cfglib.radvlm_0_5b()
    if args.size.endswith("-int8"):
        params = _random_quantized_params(cfg)
    else:
        params = radvlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    params = radvlm.fuse_for_inference(params, cfg)

    rng = np.random.default_rng(0)
    h, w = 520, 460
    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    ids = [IMAGE_TOKEN_INDEX] + list(rng.integers(100, 50000, size=40))
    sample = multimodal.build_sample(ids, [img], cfg)
    hb = multimodal.collate(
        [sample], pad_len=args.bucket, pad_tiles=args.tiles,
        pad_to_multiple=128, left_pad=True,
    )
    batch = {k: jnp.asarray(v) for k, v in hb.items()}
    seq_len = batch["tokens"].shape[1]
    print(f"tokens {batch['tokens'].shape} tiles {batch['tiles'].shape}",
          flush=True)

    def timeit(name, fn, *a, **kw):
        t0 = time.perf_counter()
        r = fn(*a, **kw)
        jax.block_until_ready(r)
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"{name}: {dt*1e3:.0f} ms  (compile {compile_s:.0f}s, "
              f"reps {[round(1e3*t) for t in ts]})", flush=True)
        return dt

    # 1. vision tower + projector (batch-1 fill: pad_tiles tiles)
    b, t = batch["tiles"].shape[:2]
    flat = batch["tiles"].reshape((b * t,) + batch["tiles"].shape[2:])
    vis = jax.jit(lambda p, x: radvlm.encode_tiles(p, cfg, x))
    timeit(f"vision({t} tiles)", vis, params, flat)

    # 2. text prefill only (embeds precomputed), batch 1 at bucket length
    embeds = jnp.zeros((1, seq_len, cfg.text.hidden_size), jnp.bfloat16)

    def text_prefill(p, e):
        hidden, (ks, vs) = qwen2.forward(
            p["text"], cfg.text, input_embeds=e,
            positions=batch["positions"], segment_ids=batch["segment_ids"],
            return_hidden=True, collect_kv=True,
        )
        return hidden[:, -1], ks
    tp = timeit("text prefill b1", jax.jit(text_prefill), params, embeds)

    # FLOP shares for context
    p_text = 2 * 7e9 * seq_len
    attn = 4 * seq_len * seq_len * cfg.text.hidden_size * cfg.text.num_layers
    print(f"  text matmul TF {p_text/1e12:.1f} + attn TF {attn/1e12:.1f} "
          f"-> {(p_text+attn)/tp/1e12:.0f} TF/s effective", flush=True)

    # 3. the full engine fill, synced (includes sample+splice+dispatch)
    from radvlm_tpu.generation.continuous import ContinuousBatcher
    from radvlm_tpu.generation.engine import GenerationConfig

    gen = GenerationConfig(max_new_tokens=128, eos_token_ids=())
    eng = ContinuousBatcher(
        params, cfg, gen, num_slots=32, max_len=4096 + 128,
        prompt_buckets=(args.bucket,), pad_tiles=args.tiles,
        steps_per_sync=32, pipeline_depth=4,
        kv_quant=os.environ.get("RADVLM_KV_INT8", "1") == "1",
    )

    def one_fill():
        req = eng.submit(sample, 1)
        req = eng.queue.get_nowait()
        eng._fill_slot(0, req)
        return eng.cur_tok
    timeit("engine fill (b1, synced)", one_fill)


if __name__ == "__main__":
    main()
