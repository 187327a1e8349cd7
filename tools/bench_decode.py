"""Decode-step microbenchmark: isolates the per-token decode cost at 7B.

Builds a text-only Qwen2 stack with born-int8 random weights (no vision tower,
no prefill) and times ONE jitted decode step (embed -> 28 cached layers ->
unembed -> argmax) at a given batch and cache length.

    python tools/bench_decode.py [--size 7b] [--batch 8] [--cache-len 4224]
        [--no-fuse] [--no-kernel] [--dense]

Prints ms/step and the implied weight-streaming bandwidth.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def born_int8(shape, key):
    q = jax.jit(
        lambda k: jax.random.bits(k, shape, jnp.uint8).astype(jnp.int8)
    )(key)
    scale_shape = list(shape)
    scale_shape[-2 if len(shape) >= 2 else -1] = 1
    return {"__q__": q, "__scale__": jnp.full(scale_shape, 0.02 / 127.0, jnp.float32)}


def build_text_params(cfg, quant=True, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(jax.random.key(0), 32))
    d, hd = cfg.hidden_size, cfg.head_dim
    h, hkv = cfg.num_heads, cfg.num_kv_heads
    L, I, V = cfg.num_layers, cfg.intermediate_size, cfg.vocab_size

    def w(shape):
        if quant:
            return born_int8(shape, next(keys))
        return jax.jit(lambda k: jax.random.normal(k, shape, dtype) * 0.02)(next(keys))

    params = {
        "embed": {"embedding": jax.jit(
            lambda k: jax.random.normal(k, (V, d), dtype) * 0.02)(next(keys))},
        "layers": {
            "ln1": jnp.ones((L, d), dtype),
            "ln2": jnp.ones((L, d), dtype),
            "attn": {
                "q": {"kernel": w((L, d, h * hd)), "bias": jnp.zeros((L, h * hd), dtype)},
                "k": {"kernel": w((L, d, hkv * hd)), "bias": jnp.zeros((L, hkv * hd), dtype)},
                "v": {"kernel": w((L, d, hkv * hd)), "bias": jnp.zeros((L, hkv * hd), dtype)},
                "o": {"kernel": w((L, h * hd, d))},
            },
            "mlp": {
                "gate": {"kernel": w((L, d, I))},
                "up": {"kernel": w((L, d, I))},
                "down": {"kernel": w((L, I, d))},
            },
        },
        "norm": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": w((d, V))}
    return params


def weight_bytes(params):
    return sum(int(x.size) * x.dtype.itemsize for x in jax.tree.leaves(params))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cache-len", type=int, default=4224)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-fuse", action="store_true")
    ap.add_argument("--no-kernel", action="store_true",
                    help="disable the Pallas int8 matmul (RADVLM_INT8_MM=0)")
    ap.add_argument("--dense", action="store_true", help="bf16 weights")
    args = ap.parse_args()

    if args.no_kernel:
        import os

        os.environ["RADVLM_INT8_MM"] = "0"

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.models import qwen2

    cfg = (cfglib.radvlm_7b() if args.size == "7b" else cfglib.radvlm_0_5b()).text
    params = build_text_params(cfg, quant=not args.dense)
    if not args.no_fuse:
        params = qwen2.fuse_projections(params)
    wb = weight_bytes(params)
    print(f"weights: {wb/1e9:.2f} GB  fused={not args.no_fuse} "
          f"dense={args.dense} kernel={'off' if args.no_kernel else 'on'}",
          flush=True)

    b, smax = args.batch, args.cache_len
    cache = qwen2.init_kv_cache(cfg, b, smax)
    cache_seg = jnp.ones((b, smax), jnp.int32)
    tok = jnp.zeros((b,), jnp.int32)
    positions = jnp.full((b,), smax - 130, jnp.int32)
    write_idx = smax - 129

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(params, cache, tok):
        embeds = qwen2.embed_tokens(params, tok[:, None])
        logits, cache = qwen2.forward(
            params, cfg,
            input_embeds=embeds,
            positions=positions[:, None],
            segment_ids=jnp.ones((b, 1), jnp.int32),
            kv_cache=cache,
            cache_index=write_idx,
            cache_segment_ids=cache_seg,
        )
        return cache, jnp.argmax(logits[:, 0], -1).astype(jnp.int32)

    t0 = time.perf_counter()
    cache, tok = step(params, cache, tok)
    tok.block_until_ready()
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        cache, tok = step(params, cache, tok)
    tok.block_until_ready()
    dt = (time.perf_counter() - t0) / args.steps
    cache_bytes = 2 * cache[0].size * cache[0].dtype.itemsize
    print(
        f"decode: {dt*1e3:.2f} ms/step  {args.batch/dt:.0f} tok/s  "
        f"weight-bw {wb/dt/1e9:.0f} GB/s  (+cache {cache_bytes/1e9:.2f} GB)",
        flush=True,
    )


if __name__ == "__main__":
    main()
