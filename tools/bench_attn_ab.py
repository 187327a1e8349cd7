"""A/B our Pallas flash forward vs stock JAX TPU kernels at prefill shapes.

Shapes: the 7B engine bucket (B=1, H=28, Hkv=4, S in {3456, 3584, 4096},
D=128, causal). Device-side scan-loop timing (one dispatch per measurement).

    python tools/bench_attn_ab.py [--seq 3456] [--iters 50]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_time(name, fn, args, iters, flops):
    def run(a):
        def body(c, _):
            xs, cb = jax.lax.optimization_barrier((a, c))
            # Perturb the first operand with the (runtime-zero) carry so the
            # op is provably loop-variant — barriers alone did not stop XLA
            # from hoisting the no-segment attention out of the loop.
            first = xs[0] + (cb * 1e-38).astype(xs[0].dtype)
            out = fn(first, *xs[1:])
            out = jax.lax.optimization_barrier(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return cb + leaf.ravel()[0].astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    jit_run = jax.jit(run)
    try:
        jax.block_until_ready(jit_run(args))
    except Exception as e:
        print(f"{name:30s} FAILED: {type(e).__name__} {str(e)[:120]}")
        return None
    t0 = time.perf_counter()
    jax.block_until_ready(jit_run(args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt * 1e6:8.0f} us  {flops / dt / 1e12:6.0f} TF/s",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=3456)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    s, h, hkv, d = args.seq, 28, 4, 128
    key = jax.random.key(0)
    q = jax.random.normal(key, (1, s, h, d), jnp.bfloat16)
    k = jax.random.normal(key, (1, s, hkv, d), jnp.bfloat16)
    flops = 2 * 2 * s * s * h * d // 2  # causal
    it = args.iters

    from radvlm_tpu.ops.attention import mha

    scan_time("ours (mha auto, no seg)",
              lambda qq, kk: mha(qq, kk, kk, causal=True), (q, k), it, flops)
    seg = jnp.ones((1, s), jnp.int32)
    scan_time("ours (mha auto, seg ids)",
              lambda qq, kk: mha(qq, kk, kk, causal=True,
                                 q_segment_ids=seg, kv_segment_ids=seg),
              (q, k), it, flops)

    # stock flash_attention wants [b, h, s, d] and equal head counts
    from jax.experimental.pallas.ops.tpu import flash_attention as ff

    qt = q.transpose(0, 2, 1, 3)
    kt = jnp.repeat(k.transpose(0, 2, 1, 3), h // hkv, axis=1)
    if s % 512 == 0:
        scan_time(
            "stock flash (kv repeated)",
            lambda qq, kk: ff.flash_attention(
                qq, kk, kk, causal=True, sm_scale=d ** -0.5),
            (qt, kt), it, flops)

    # splash MQA-style: q [h, s, d], kv [hkv, s, d] grouped
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    mask = sm.MultiHeadMask([sm.CausalMask((s, s)) for _ in range(h)])
    kernel = sk.make_splash_mha(
        mask, head_shards=1, q_seq_shards=1)
    ktg = k.transpose(0, 2, 1, 3)

    def splash(qq, kk):
        qs = qq.transpose(0, 2, 1, 3) * (d ** -0.5)
        kkr = jnp.repeat(kk, h // hkv, axis=1)
        return jax.vmap(kernel)(qs, kkr, kkr)

    scan_time("splash mha (kv repeated)", splash, (q, ktg), it, flops)

    kernel_mqa = sk.make_splash_mqa(
        sm.MultiHeadMask([sm.CausalMask((s, s)) for _ in range(h)]),
        head_shards=1, q_seq_shards=1)

    def splash_mqa(qq, kk):
        # splash MQA: q [h, s, d] grouped as [hkv, g, s, d] -> kv [hkv, s, d]
        qs = (qq.transpose(0, 2, 1, 3) * (d ** -0.5))
        return jax.vmap(kernel_mqa)(qs, kk, kk)

    scan_time("splash mqa (grouped kv)", splash_mqa, (q, ktg), it, flops)


if __name__ == "__main__":
    main()
