"""Per-op decomposition of the text-prefill residue (VERDICT r4 item 3).

The W8A8 matmuls individually run near the int8 MXU rate but end-to-end
batch-1 text prefill measured 236 TF/s (r4). The difference is the
non-matmul residue: RMSNorm, per-site activation quantization, rope, flash
attention, residual adds, gate*up. This tool times each piece at engine
shapes (batch 1, one bucket) with a DEVICE-SIDE scan loop — one dispatch
per measurement, `lax.optimization_barrier` between iterations so XLA can
neither hoist/CSE the op out of the loop nor DCE any of its output — then
times one full decoder layer against the sum of its parts. (A per-call
`timeit` over the network-attached chip is launch-latency-dominated: the
same ops measured 5-30x slower that way.)

    python tools/bench_prefill_residue.py [--seq 3456] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(name, fn, args, iters, *, flops=0, bytes_moved=0):
    """Mean per-iteration wall time of fn(*args) inside ONE jitted scan
    dispatch (the per-dispatch tunnel overhead amortizes to ~overhead/iters;
    the `calibrate` row below reports it). One compile per op."""

    def run(a):
        def body(c, _):
            xs, cb = jax.lax.optimization_barrier((a, c))
            # Perturb the first float operand with the (runtime-zero) carry
            # so the op is provably loop-variant — barriers alone did not
            # stop XLA from hoisting some ops out of the loop.
            first = xs[0]
            if isinstance(first, jax.Array) and jnp.issubdtype(
                    first.dtype, jnp.floating):
                first = first + (cb * 1e-38).astype(first.dtype)
            out = fn(first, *xs[1:])
            out = jax.lax.optimization_barrier(out)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return cb + leaf.ravel()[0].astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    jit_run = jax.jit(run)
    jax.block_until_ready(jit_run(args))
    t0 = time.perf_counter()
    jax.block_until_ready(jit_run(args))
    t1 = time.perf_counter()
    dt = (t1 - t0) / iters
    extra = ""
    if flops:
        extra += f"  {flops / dt / 1e12:6.0f} TF/s"
    if bytes_moved:
        extra += f"  {bytes_moved / dt / 1e9:6.0f} GB/s"
    print(f"{name:34s} {dt * 1e6:8.0f} us{extra}", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=3456)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.ops.attention import apply_rope, mha, rms_norm
    from radvlm_tpu.ops.w8a8_matmul import quantize_rows

    cfg = cfglib.radvlm_7b().text
    d, f = cfg.hidden_size, cfg.intermediate_size
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    s = args.seq
    key = jax.random.key(0)
    it = args.iters

    x = jax.random.normal(key, (1, s, d), jnp.bfloat16)
    big = jax.random.normal(key, (1, s, f), jnp.bfloat16)
    w = jnp.ones((d,), jnp.bfloat16)
    pos = jnp.arange(s)[None, :]

    scan_time("calibrate (1-elt add)", lambda a, b: a + b,
              (jnp.float32(1.0), jnp.float32(2.0)), it)

    total = 0.0
    total += 2 * scan_time("rms_norm [s,d]", lambda a: rms_norm(a, w, 1e-6),
                           (x,), it, bytes_moved=2 * x.nbytes)
    total += 3 * scan_time("quantize_rows [s,d]", quantize_rows, (x,), it,
                           bytes_moved=2 * x.nbytes + x.nbytes // 2)
    total += scan_time("quantize_rows [s,f]", quantize_rows, (big,), it,
                       bytes_moved=2 * big.nbytes + big.nbytes // 2)

    def qdot(shape_in, shape_w, name):
        xq = jnp.ones((1, s, shape_in), jnp.int8)
        wq = jnp.ones((shape_in, shape_w), jnp.int8)
        xs_ = jnp.ones((1, s, 1), jnp.float32)
        ws = jnp.ones((1, shape_w), jnp.float32)

        def dot(a, b, sa, sb):
            acc = jax.lax.dot_general(
                a, b, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sa * sb.reshape(-1)).astype(
                jnp.bfloat16)

        return scan_time(f"s8xs8 {name} [{shape_in}x{shape_w}]", dot,
                         (xq, wq, xs_, ws), it,
                         flops=2 * s * shape_in * shape_w)

    total += qdot(d, (h + 2 * hkv) * hd, "qkv")
    total += qdot(d, d, "o")
    total += qdot(d, 2 * f, "gateup")
    total += qdot(f, d, "down")

    q = jax.random.normal(key, (1, s, h, hd), jnp.bfloat16)
    k = jax.random.normal(key, (1, s, hkv, hd), jnp.bfloat16)
    total += 2 * scan_time(
        "rope q+k", lambda a: apply_rope(a, pos, cfg.rope_theta), (q,), it,
        bytes_moved=2 * q.nbytes)
    total += scan_time(
        "flash attn causal", lambda qq, kk: mha(qq, kk, kk, causal=True),
        (q, k), it, flops=2 * 2 * s * s * h * hd // 2)
    total += scan_time(
        "silu(g)*u", lambda g, u: jax.nn.silu(g) * u, (big, big), it,
        bytes_moved=3 * big.nbytes)
    total += 2 * scan_time("residual add [s,d]", lambda a, b: a + b, (x, x),
                           it, bytes_moved=3 * x.nbytes)

    print(f"{'sum of parts (1 layer)':34s} {total * 1e6:8.0f} us")

    # full forward at the same shape, via the model path
    from bench import _random_quantized_params
    from radvlm_tpu.models import qwen2, radvlm

    full = cfglib.radvlm_7b()
    params = _random_quantized_params(full)
    params = radvlm.fuse_for_inference(params, full)
    embeds = jnp.zeros((1, s, d), jnp.bfloat16)
    seg = jnp.ones((1, s), jnp.int32)

    def text_prefill(p, e):
        hidden, (ks, vs) = qwen2.forward(
            p["text"], full.text, input_embeds=e,
            positions=pos, segment_ids=seg,
            return_hidden=True, collect_kv=True)
        return hidden[:, -1], ks

    matmul_flops = 2 * s * (d * (h + 2 * hkv) * hd + d * d + d * 2 * f
                            + f * d) * cfg.num_layers
    attn_flops = 2 * 2 * s * s * h * hd // 2 * cfg.num_layers
    dt = scan_time("FULL text prefill", text_prefill, (params, embeds),
                   max(4, it // 8), flops=matmul_flops + attn_flops)
    print(f"per-layer {dt / cfg.num_layers * 1e6:.0f} us  vs parts "
          f"{total * 1e6:.0f} us")


if __name__ == "__main__":
    main()
