"""Benchmark: CXR report-generation throughput (images/sec/chip) + p50 latency.

Measures the BASELINE.json headline metric on whatever accelerator is attached:
anyres-tiled CXR images -> SigLIP encode -> projector -> Qwen2 prefill -> 128-token
greedy decode (the reference's report-generation inference path,
`radvlm/evaluation/evaluate_instructions.py:119-192`), end to end including host
preprocessing.

Model width: RADVLM_BENCH_SIZE=7b-int8 (default: the flagship 7B with int8
weights + int8 KV cache fits one 16 GB v5e chip) or 0.5b for quick smoke
runs. Weights are random-init — throughput is weight-value-independent.

The reference publishes no throughput numbers (BASELINE.md), and no A100
measurement of the reference exists in this environment: vs_baseline is
reported as null until a measured comparison figure exists (the raw value and
configuration are in the extras for when one does).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("RADVLM_BENCH_BATCH", "8"))
BATCHES = int(os.environ.get("RADVLM_BENCH_BATCHES", "4"))
NEW_TOKENS = int(os.environ.get("RADVLM_BENCH_NEW_TOKENS", "128"))

# Set when the TPU tunnel is down and the run degrades to a tiny-model CPU
# sanity pass: the headline value is then NOT a hardware measurement and must
# not be compared across rounds — the flag makes that machine-readable.
_FALLBACK_EXTRA: dict = {}


def _random_quantized_params(cfg, bits: int = 8):
    """Random params with quantizable kernels born int8/int4, generated ON
    DEVICE (host-side numpy generation + H2D transfer of ~8 GB measured
    minutes over the tunnel; device-side jax.random.bits is seconds).

    bits=4: layer matmul kernels become nibble-packed int4 nodes with
    group-128 scales (W4A16, `ops/int4_matmul.py`); embeddings/lm_head stay
    int8 (mirrors quant.quantize_params(bits=4))."""
    import re

    import jax
    import jax.numpy as jnp

    from radvlm_tpu.models import radvlm
    from radvlm_tpu.ops import quant
    from radvlm_tpu.ops.int4_matmul import GROUP, Q4_KEY
    from radvlm_tpu.parallel.sharding import path_str

    abstract = jax.eval_shape(
        lambda: radvlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    )
    keys = iter(jax.random.split(jax.random.key(0), 512))

    def rand_i8(k, shape):
        return jax.jit(
            lambda kk, s=tuple(shape): jax.random.bits(kk, s, jnp.uint8).astype(
                jnp.int8
            )
        )(k)

    def build(path, leaf):
        p = path_str(path)
        k = next(keys)
        if any(re.search(pat, p) for pat in quant.DEFAULT_PATTERNS):
            is_embed = bool(re.search(r"embed/embedding$", p))
            d = leaf.shape[-2]
            if (
                bits == 4
                and not is_embed
                and not p.endswith("lm_head/kernel")
                and d % GROUP == 0
            ):
                packed_shape = list(leaf.shape)
                packed_shape[-2] = d // 2
                scale_shape = list(leaf.shape)
                scale_shape[-2] = d // GROUP
                return {
                    Q4_KEY: rand_i8(k, packed_shape),
                    quant.SCALE_KEY: jnp.full(scale_shape, 0.02 / 7.0, jnp.float32),
                }
            axes = (-1,) if is_embed else (-2,)
            scale_shape = list(leaf.shape)
            for a in axes:
                scale_shape[a] = 1
            return {
                quant.Q_KEY: rand_i8(k, leaf.shape),
                quant.SCALE_KEY: jnp.full(scale_shape, 0.02 / 127.0, jnp.float32),
            }
        return jax.jit(
            lambda kk, shape=leaf.shape: jax.random.normal(
                kk, shape, jnp.bfloat16
            ) * 0.02
        )(k)

    return jax.tree_util.tree_map_with_path(build, abstract)


def run_continuous(cfg, params, gen, size):
    """Continuous-batching bench: RADVLM_BENCH_SLOTS always-full decode slots,
    requests stream through (prefill on refill). Timed window covers host
    preprocessing + all prefills + all decodes for RADVLM_BENCH_REQS images."""
    import jax

    # 32 slots: r04 on-chip sweep — 24: 1.99, 32: 2.07, 40: 2.08 img/s/chip
    # (saturated; decode is ~13% of per-image cost, fills dominate). 32 keeps
    # HBM headroom that 40 does not.
    slots = int(os.environ.get("RADVLM_BENCH_SLOTS", "32"))
    # On RESOURCE_EXHAUSTED (HBM fragmentation can make the default slot count
    # borderline next to 7.5 GB of weights) retry once at fewer slots so the
    # driver always records a number. The retry runs OUTSIDE the except block:
    # `e.__traceback__` pins the failed frame's ContinuousBatcher (multi-GB KV
    # cache) in HBM, so freeing it first is what lets the retry fit.
    # (Fused-W8A8 compile failures are handled INSIDE the engine:
    # ContinuousBatcher.warmup() falls back to the XLA emitter and re-warms,
    # so every fused compile in this flow is already covered there.)
    oom = False
    try:
        _run_continuous(cfg, params, gen, size, slots)
    except jax.errors.JaxRuntimeError as e:
        if "RESOURCE_EXHAUSTED" not in str(e) or slots <= 12:
            raise
        oom = True
        del e
    if oom:
        import gc

        gc.collect()
        _run_continuous(cfg, params, gen, size, max(12, slots // 2))


def _run_continuous(cfg, params, gen, size, slots):
    import jax

    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.generation.continuous import ContinuousBatcher
    from radvlm_tpu.models import multimodal

    n_reqs = int(os.environ.get("RADVLM_BENCH_REQS", str(max(BATCH * BATCHES, 4 * slots))))
    # Prompt buckets: anyres CXR prompts measure 2983-3739 tokens (mean 3398);
    # bucketed prefill pads each request to the smallest fitting bucket
    # instead of a blanket 4096 (~15% prefill FLOPs saved). All bucket graphs
    # compile during warmup(). Env-overridable so integration tests can run
    # the REAL engine flow at tiny geometry (tests/test_bench_fallback.py).
    buckets = tuple(
        int(x) for x in os.environ.get(
            "RADVLM_BENCH_BUCKETS", "3072,3456,3840,4096"
        ).split(",")
    )
    pad_len = buckets[-1]
    max_len = pad_len + NEW_TOKENS
    rng = np.random.default_rng(0)

    # RADVLM_BENCH_IMG_PX overrides the CXR-sized synthetic images (the CPU
    # fallback uses tiny squares so anyres yields base + 1 tile).
    img_px = int(os.environ.get("RADVLM_BENCH_IMG_PX", "0"))

    def make_sample():
        h = img_px or int(rng.integers(480, 560))
        w = img_px or int(rng.integers(400, 520))
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        hi = min(50000, cfg.text.vocab_size - 1)  # tiny widths have small vocabs
        ids = [IMAGE_TOKEN_INDEX] + list(rng.integers(100, hi, size=40))
        return multimodal.build_sample(ids, [img], cfg)

    # 32-step chunks: with eager slot refill the stranded-slot penalty of
    # long chunks is gone and fewer dispatches win — r04 clean sweep on v5e:
    # 16: 2.164, 32: 2.193, 64: 2.194 img/s/chip (saturated; 32 keeps the
    # post-eos garbage window half of 64's for real eos-terminating traffic).
    steps_per_sync = int(os.environ.get("RADVLM_BENCH_STEPS_PER_SYNC", "32"))
    pipeline_depth = int(os.environ.get("RADVLM_BENCH_PIPELINE_DEPTH", "4"))

    # ONE batcher for warmup + timed run (a second instance would hold a
    # second multi-GB KV cache next to the weights — measured intermittent
    # OOM on 16 GB HBM); warmup() compiles every bucket's fill graph + the
    # decode chunk and resets slot state.
    # int8 KV cache: bench default ON (halves cache residency + decode
    # attention bytes -> 24+ slots fit where bf16 OOM'd at 24).
    kv_quant = os.environ.get("RADVLM_KV_INT8", "1") == "1"
    # Multi-chip serving (RADVLM_BENCH_TP=N): tensor-parallel engine over an
    # N-device `tensor` mesh (parallel/tp.py Megatron layout, kv-head-sharded
    # cache). Requires UNFUSED params — main() skips fuse_for_inference when
    # TP is requested. On this 1-chip box it's exercised by dryrun_multichip
    # on a CPU mesh; on a real v5e-8 set RADVLM_BENCH_TP=8.
    tp = int(os.environ.get("RADVLM_BENCH_TP", "0"))
    mesh = None
    if tp > 1:
        from radvlm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh({"tensor": tp})
    # Grouped refills (RADVLM_FILL_BATCH=2: two same-bucket prefills share one
    # dispatch). Measured NEGATIVE at 7B/24 slots (1.79 vs 1.98 img/s): the
    # fixed per-fill overhead is already hidden by the pipelined decode, and
    # 2x-length fills stall decode slots longer — default stays 1.
    fill_batch = int(os.environ.get("RADVLM_FILL_BATCH", "1"))
    # DP fleet (RADVLM_BENCH_FLEET=N): N engines of RADVLM_BENCH_TP chips each
    # (serve/fleet.py) — the v5e-8 throughput layout (8 x TP1 with int4/int8
    # weights, 4 x TP2 otherwise). `slots` is PER ENGINE. Single-chip boxes
    # exercise this via dryrun_multichip / tests on the CPU mesh.
    fleet = int(os.environ.get("RADVLM_BENCH_FLEET", "0"))
    if fleet > 1:
        from radvlm_tpu.serve.fleet import FleetEngine

        b = FleetEngine(
            params, cfg, gen,
            fleet_size=fleet,
            tp_size=max(tp, 1),
            num_slots=slots, max_len=max_len,
            prompt_buckets=buckets, pad_tiles=6,
            steps_per_sync=steps_per_sync, pipeline_depth=pipeline_depth,
            kv_quant=kv_quant, fill_batch=fill_batch,
        )
        pump = lambda: b.drain(idle_timeout=600)  # noqa: E731
        warmup_timings = lambda: b.batchers[0].warmup_timings  # noqa: E731
    else:
        b = ContinuousBatcher(
            params, cfg, gen, num_slots=slots, max_len=max_len,
            prompt_buckets=buckets, pad_tiles=6,
            steps_per_sync=steps_per_sync, pipeline_depth=pipeline_depth,
            kv_quant=kv_quant, fill_batch=fill_batch, mesh=mesh,
        )
        pump = b.run
        warmup_timings = lambda: b.warmup_timings  # noqa: E731
    cache_before = _compile_cache_entries()
    t0 = time.perf_counter()
    b.warmup()
    if fleet > 1:
        b.start()
    compile_s = time.perf_counter() - t0
    cache_after = _compile_cache_entries()
    # Kernel-path provenance: which implementations the compiled graphs
    # actually use (a silent fused-W8A8 fallback or a decode-kernel predicate
    # miss must be visible in the recorded JSON, not a regression mystery).
    provenance = (b.batchers[0] if fleet > 1 else b).kernel_provenance()
    # Unloaded latency (BASELINE.md "p50 latency per report"): single request
    # on the idle engine, no queueing — the per-request number a user sees,
    # vs p50_report_completion_s which is queue-dominated under load.
    unloaded = []
    for _ in range(3):
        t0 = time.perf_counter()
        b.submit(make_sample(), NEW_TOKENS)
        for _req in pump():
            pass
        unloaded.append(time.perf_counter() - t0)
    p50_unloaded = float(np.median(unloaded))
    # Timed run. Submissions stream from a feeder thread (collate + H2D
    # happen during the engine's device waits — the production arrival
    # pattern) after a 2x-slots head start fills the pipeline.
    # RADVLM_BENCH_PROFILE=<dir>: wrap the timed window in a jax.profiler
    # trace (xplane dump for XProf/TensorBoard) to localize fill/decode time.
    import contextlib
    import threading

    from radvlm_tpu.utils import profiling

    prof_dir = os.environ.get("RADVLM_BENCH_PROFILE", "")
    prof_ctx = profiling.trace(prof_dir) if prof_dir else contextlib.nullcontext()

    # Phase stats should describe the TIMED window only (warmup + unloaded
    # probes also run the loop).
    for e in (b.batchers if fleet > 1 else [b]):
        e.host_stats = {k: type(v)() for k, v in e.host_stats.items()}

    t_start = time.perf_counter()
    done_at = []
    head = min(2 * slots, n_reqs)
    with prof_ctx:
        for _ in range(head):
            b.submit(make_sample(), NEW_TOKENS)

        def feed():
            for _ in range(n_reqs - head):
                b.submit(make_sample(), NEW_TOKENS)

        feeder = threading.Thread(target=feed)
        feeder.start()
        while len(done_at) < n_reqs:  # re-enter if the engine drains early
            for _req in pump():
                done_at.append(time.perf_counter() - t_start)
            if len(done_at) < n_reqs:
                time.sleep(0.01)
        feeder.join()
        total = time.perf_counter() - t_start

    # Spec-mode telemetry: tokens emitted per verify step (>= 1.0; plain
    # greedy is exactly 1.0 per step). Fleet mode aggregates every engine.
    spec_accept = None
    engines = b.batchers if fleet > 1 else [b]
    steps = sum(
        getattr(e, "spec_stats", {}).get("verify_steps", 0) for e in engines
    )
    if steps:
        emitted = sum(e.spec_stats["emitted"] for e in engines)
        spec_accept = round(emitted / steps, 3)

    n_chips = jax.device_count()
    print(json.dumps({
        "metric": "cxr_report_images_per_sec_per_chip",
        "value": round(n_reqs / total / n_chips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": None,  # no measured A100 reference figure in this env
        "p50_report_completion_s": round(float(np.percentile(done_at, 50)), 3),
        "p50_unloaded_s": round(p50_unloaded, 3),
        "decode_tokens_per_sec": round(n_reqs * NEW_TOKENS / total, 1),
        "model": f"radvlm-{size}",
        "engine": "continuous",
        "kv_cache": "int8" if kv_quant else "bf16",
        "fill_batch": fill_batch,
        # Prompt-lookup speculative decoding (RADVLM_SPEC_K>0): with random
        # bench weights acceptance is ~0 (outputs are arbitrary tokens), so
        # spec is off by default here; the mechanism's win tracks the real
        # workload's acceptance rate (greedy outputs are identical either way).
        "spec_k": int(os.environ.get("RADVLM_SPEC_K", "0")),
        "spec_tokens_per_step": spec_accept,
        "slots": slots,
        "fleet": fleet if fleet > 1 else 1,
        "tp": tp if tp > 1 else 1,
        "requests": n_reqs,
        "new_tokens": NEW_TOKENS,
        "n_chips": n_chips,
        "device": str(jax.devices()[0].device_kind),
        "compile_s": round(compile_s, 1),
        "warmup_breakdown_s": {
            k: round(v, 1) for k, v in warmup_timings().items()
        },
        # Provenance: engine kernel paths + host-side accelerators. A warm
        # persistent compile cache writes no new entries during warmup.
        **provenance,
        "native_anyres": _native_anyres_available(),
        "compile_cache_hit": (
            None if cache_before is None else cache_after == cache_before
        ),
        # Run-loop host phase breakdown (cumulative s over the timed run):
        # readback ~= device-bound wait for the oldest in-flight chunk;
        # fill/dispatch = host dispatch cost; the remainder of `total` not in
        # any phase is feeder starvation / loop overhead.
        "host_phase_s": {
            k: (round(v, 2) if isinstance(v, float) else v)
            for e in engines for k, v in e.host_stats.items()
        } if fleet <= 1 else None,
        **_FALLBACK_EXTRA,
    }))


def _compile_cache_entries():
    """Entry count of the persistent XLA compile cache dir (None if off)."""
    import jax

    d = jax.config.jax_compilation_cache_dir
    if not d or not os.path.isdir(d):
        return None
    return sum(len(files) for _, _, files in os.walk(d))


def _native_anyres_available() -> bool:
    from radvlm_tpu import native

    return bool(native.available())


def main():
    import jax
    import jax.numpy as jnp

    # If the tunneled TPU backend is unreachable (relay down), fall back to a
    # tiny CPU run rather than crash or hang: the driver should always record
    # a JSON line, and the "device" field makes the fallback unambiguous.
    from radvlm_tpu.utils.backend import ensure_backend

    if not ensure_backend():
        sys.stderr.write("bench: TPU tunnel relay unreachable; CPU fallback\n")
        # tiny width: a 0.5B CPU fallback was measured >10 min on the 1-core
        # driver host (risking a driver timeout with no JSON line at all);
        # tiny (16-token tiles) runs the identical engine flow in ~2 min.
        os.environ.setdefault("RADVLM_BENCH_SIZE", "tiny")
        os.environ.setdefault("RADVLM_BENCH_REQS", "4")
        os.environ.setdefault("RADVLM_BENCH_SLOTS", "2")
        os.environ.setdefault("RADVLM_BENCH_IMG_PX", "64")
        os.environ.setdefault("RADVLM_BENCH_BUCKETS", "128")
        globals()["NEW_TOKENS"] = int(
            os.environ.setdefault("RADVLM_BENCH_NEW_TOKENS", "16")
        )
        _FALLBACK_EXTRA.update(
            fallback=True,
            note=(
                "TPU tunnel down: tiny-model CPU sanity run — value is NOT a "
                "hardware measurement; see PARITY.md for the last measured "
                "7B TPU numbers"
            ),
        )

    # Persistent XLA compile cache: warm reruns load executables from disk
    # (compile_s measures cold ~74 s / warm target <15 s).
    from radvlm_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.config import IMAGE_TOKEN_INDEX
    from radvlm_tpu.generation.engine import GenerationConfig, make_generate_fn
    from radvlm_tpu.models import multimodal, radvlm

    # 7B int8 is the contract configuration (BASELINE.md headline: 7B-scale
    # report generation per chip); RADVLM_BENCH_SIZE=0.5b for the small model.
    size = os.environ.get("RADVLM_BENCH_SIZE", "7b-int8")
    if size.startswith("7b"):
        cfg = cfglib.radvlm_7b()
    elif size == "tiny":
        # CPU-fallback / smoke width: the point is a bounded end-to-end run
        # through the REAL engine flow (collate -> fill -> chunked decode),
        # not a meaningful number. A 0.5B CPU run exceeds 10 min on the
        # 1-core driver host; tiny compiles + runs in ~2 min.
        cfg = cfglib.tiny_test_config(vocab_size=4096)
    else:
        cfg = cfglib.radvlm_0_5b()
    if size.endswith("-int8"):
        # 7B bf16 (15.2 GB) doesn't fit one v5e chip next to the KV cache;
        # int8 weight-only quantization (ops/quant.py) halves residency. Build
        # the random weights already-quantized so the bf16 copy never exists.
        params = _random_quantized_params(cfg)
    elif size.endswith("-int4"):
        # W4A16: int4 decode weight stream (ops/int4_matmul.py), bf16 prefill.
        params = _random_quantized_params(cfg, bits=4)
    else:
        params = radvlm.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    if int(os.environ.get("RADVLM_BENCH_TP", "0")) <= 1:
        # The TP engine shards the UNFUSED layout (fused qkv concat order
        # breaks the Megatron head partition); single-chip fuses as usual.
        params = radvlm.fuse_for_inference(params, cfg)

    rng = np.random.default_rng(0)

    # Fixed padded shapes so every batch hits ONE compiled graph (variable image
    # sizes still flow through the anyres tiler; collate pads to these buckets).
    PAD_TILES = 6
    PAD_LEN = 4096

    def make_host_batch():
        samples = []
        for _ in range(BATCH):
            # Synthetic CXR-shaped images (portrait, ~512px, like MIMIC JPEGs
            # after the reference's preprocessing).
            h = int(rng.integers(480, 560))
            w = int(rng.integers(400, 520))
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            # ~40-token report-generation prompt with one image sentinel.
            ids = list(rng.integers(100, 50000, size=40))
            ids = [IMAGE_TOKEN_INDEX] + ids
            samples.append(multimodal.build_sample(ids, [img], cfg))
        return multimodal.collate(
            samples, pad_len=PAD_LEN, pad_tiles=PAD_TILES,
            pad_to_multiple=512, left_pad=True,
        )

    gen = GenerationConfig(max_new_tokens=NEW_TOKENS, eos_token_ids=())

    # Engine: "static" pads every batch and decodes lock-step;
    # "continuous" (default) keeps RADVLM_BENCH_SLOTS decode slots always full
    # (generation/continuous.py), amortizing the int8 weight stream over more
    # decode rows — the serving/eval default since round 2.
    engine = os.environ.get("RADVLM_BENCH_ENGINE", "continuous")
    if engine == "continuous":
        run_continuous(cfg, params, gen, size)
        return
    gen_fn = make_generate_fn(cfg, gen)

    # Warmup / compile.
    hb = make_host_batch()
    batch = {k: jnp.asarray(v) for k, v in hb.items()}
    t0 = time.perf_counter()
    out = gen_fn(params, batch, jax.random.key(1))
    int(out["num_tokens"][0])  # force full completion (axon-safe sync)
    compile_s = time.perf_counter() - t0

    # Timed runs. Host preprocessing is pipelined with device compute (a
    # background thread prepares batch i+1 while batch i generates — the
    # production loader/serving pattern); per-batch latency still covers
    # H2D + full generation.
    from concurrent.futures import ThreadPoolExecutor

    lat = []
    t_start = time.perf_counter()
    with ThreadPoolExecutor(max_workers=1) as ex:
        next_batch = ex.submit(make_host_batch)
        for i in range(BATCHES):
            hb = next_batch.result()
            if i + 1 < BATCHES:
                next_batch = ex.submit(make_host_batch)
            t0 = time.perf_counter()
            batch = {k: jnp.asarray(v) for k, v in hb.items()}
            out = gen_fn(params, batch, jax.random.key(2 + i))
            int(out["num_tokens"][0])
            lat.append(time.perf_counter() - t0)
    total = time.perf_counter() - t_start

    n_imgs = BATCH * BATCHES
    n_chips = jax.device_count()
    imgs_per_sec_chip = n_imgs / total / n_chips
    p50_latency = float(np.percentile(lat, 50))
    tokens_per_sec = n_imgs * NEW_TOKENS / total

    print(json.dumps({
        "metric": "cxr_report_images_per_sec_per_chip",
        "value": round(imgs_per_sec_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": None,  # no measured A100 reference figure in this env
        "p50_batch_latency_s": round(p50_latency, 3),
        "decode_tokens_per_sec": round(tokens_per_sec, 1),
        "model": f"radvlm-{size}",
        "batch": BATCH,
        "new_tokens": NEW_TOKENS,
        "n_chips": n_chips,
        "device": str(jax.devices()[0].device_kind),
        "compile_s": round(compile_s, 1),
        **_FALLBACK_EXTRA,
    }))


if __name__ == "__main__":
    main()
