"""Engine-step microbench: isolate FILL vs DECODE-CHUNK device cost.

Builds the exact bench engine (7B int8 weights + int8 KV, 32 slots, 32-step
chunks — `bench.py` defaults) and times, with explicit device syncs:

  * one prefill per prompt bucket (`_fill_group` on a single slot)
  * one K-step decode chunk with ALL slots active at realistic cache depth

The loaded-throughput arithmetic (BENCH host_phase_s readback >> fill+dispatch)
cannot split device time between fills and chunks; this does.

    python tools/bench_chunks.py [--slots 32] [--steps-per-sync 32] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b-int8")
    ap.add_argument("--slots", type=int, default=32)
    ap.add_argument("--steps-per-sync", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    os.environ.setdefault("RADVLM_BENCH_SIZE", args.size)
    import bench  # repo root: the bench's param/engine builders ARE the config
    import jax

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.generation.continuous import ContinuousBatcher
    from radvlm_tpu.generation.engine import GenerationConfig
    from radvlm_tpu.models import multimodal, radvlm

    size = args.size
    if size == "7b-int8":
        cfg = cfglib.radvlm_7b()
        params = bench._random_quantized_params(cfg)
    elif size == "0.5b":
        import jax.numpy as jnp

        cfg = cfglib.radvlm_0_5b()
        params = radvlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    else:
        raise SystemExit(f"unknown size {size}")
    params = radvlm.fuse_for_inference(params, cfg)

    gen = GenerationConfig(max_new_tokens=128, eos_token_ids=())
    buckets = (3072, 3456, 3840, 4096)
    b = ContinuousBatcher(
        params, cfg, gen, num_slots=args.slots, max_len=buckets[-1] + 128,
        prompt_buckets=buckets, pad_tiles=6,
        steps_per_sync=args.steps_per_sync, pipeline_depth=4,
        kv_quant=os.environ.get("RADVLM_KV_INT8", "1") == "1",
    )
    t0 = time.perf_counter()
    b.warmup()
    print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)

    def make_sample():
        h, w = int(rng.integers(480, 560)), int(rng.integers(400, 520))
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        ids = [IMAGE_TOKEN_INDEX] + list(rng.integers(100, 50000, size=40))
        return multimodal.build_sample(ids, [img], cfg)

    # --- fills: one slot, each bucket, synced ---------------------------
    for _ in range(2):  # warm data path
        req = b.submit(make_sample(), 1)
        req = b.queue.get_nowait()
        b._fill_slot(0, req)
        jax.block_until_ready(b.cur_tok)
    fills = []
    for _ in range(args.reps):
        req = b.submit(make_sample(), 1)
        req = b.queue.get_nowait()
        t0 = time.perf_counter()
        b._fill_slot(0, req)
        jax.block_until_ready(b.cur_tok)
        fills.append(time.perf_counter() - t0)
    print(f"fill (1 slot, synced): {1e3*np.median(fills):.1f} ms  "
          f"all reps {[round(1e3*f) for f in fills]}", flush=True)

    # --- decode chunk: all slots active at realistic depth --------------
    for i in range(args.slots):
        req = b.submit(make_sample(), 10_000)
        req = b.queue.get_nowait()
        b._fill_slot(i, req)
    jax.block_until_ready(b.cur_tok)
    import collections

    inflight = collections.deque()
    b._dispatch_chunk(inflight)  # compile path already warm; settle state
    jax.block_until_ready(inflight[-1][0])
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        b._dispatch_chunk(inflight)
        jax.block_until_ready(inflight[-1][0])
        times.append(time.perf_counter() - t0)
    tc = float(np.median(times))
    k = args.steps_per_sync
    print(
        f"decode chunk ({args.slots} slots x {k} steps, synced): "
        f"{1e3*tc:.1f} ms  = {1e3*tc/k:.2f} ms/step  "
        f"{args.slots*k/tc:.0f} tok/s  all reps {[round(1e3*t) for t in times]}",
        flush=True,
    )


if __name__ == "__main__":
    main()
