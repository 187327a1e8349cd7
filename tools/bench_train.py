"""Training-step throughput benchmark (samples/s/chip, tokens/s, MFU).

BASELINE.md pins the reference's training scale — 1,022,742 image-instruction
pairs, 1 epoch in ~12 h on 128 GH200-class GPUs (`finetune_radio_7b.sh:4-9`),
i.e. ~0.185 samples/s/GPU — but publishes no throughput figure. This tool
measures OUR side of that contract on whatever accelerator is attached: the
jitted SFT (or QLoRA) train step over synthetic anyres CXR batches at the
reference's sample geometry (one anyres image -> ~3.4k multimodal tokens,
supervised report tail; `finetune_radio_7b.sh:53-61`).

Modes (RADVLM_TRAIN_BENCH_SIZE):
  tiny      CPU smoke (tests)
  0.5b      full SFT step, fits one chip
  7b-qlora  LoRA over an int8-frozen base (`training/lora.py` +
            `train_step.make_lora_train_step`) — the 16 GB v5e single-chip
            training mode (reference QLoRA prep, `train.py:1466-1503`)
  7b        full bf16 SFT, sharded over RADVLM_TRAIN_BENCH_MESH (needs >1 chip
            or a virtual CPU mesh)

Env knobs: RADVLM_TRAIN_BENCH_SEQ (pad bucket, default 4096), _BATCH (per-step
global batch, default 1), _STEPS (timed steps, default 8),
_MESH ("data=1,fsdp=8"; a `stage>1` axis switches the step to the GPipe
pipeline, parallel/pp.py — _BATCH must then be divisible by
data * _MICROBATCHES, and the size must not be a -qlora mode),
_MICROBATCHES (PP microbatches, default 4), _INTERLEAVE (virtual stages
per device, Megatron interleaved schedule, default 1),
_IMG_PX (square synthetic image override), _PROFILE (dir: jax.profiler
xplane trace over the timed steps).

_PACK (samples packed per row via multimodal.pack_samples, default 1 —
pad seq accordingly: ~3.5k tokens per anyres sample).

Prints ONE JSON line {"metric", "value", "unit", ...extras}. MFU counts
decoder + vision-tower matmul FLOPs (6 * params * their processed tokens;
attention-score and remat-recompute FLOPs excluded, so it is a conservative
lower bound) against the per-chip bf16 peak. `text_only_tflops_per_s` keeps
the r4 text-only accounting for comparability.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, str(default)))


def _make_batch(cfg, *, batch: int, pad_len: int, rng, pack: int = 1) -> dict:
    """Synthetic anyres CXR training batch at the reference geometry:
    [IMAGE]<prompt ~40 tok><report ~160 tok supervised>.

    pack > 1 routes through `multimodal.pack_samples`: each of the `batch`
    rows holds `pack` samples separated by segment ids (the loader's
    pack_factor path; pad_len must hold the packed row). At the reference's
    uniform anyres geometry (~3.5k tokens/sample, image-dominated) packing
    saves only the ~15% bucket pad — its real win is on the mixed-length
    training mixture — but it puts the packed path itself on the clock."""
    from radvlm_tpu.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from radvlm_tpu.models import multimodal

    img_px = _env_int("RADVLM_TRAIN_BENCH_IMG_PX", 0)
    samples = []
    for _ in range(batch * pack):
        h = img_px or int(rng.integers(480, 560))
        w = img_px or int(rng.integers(400, 520))
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        prompt = list(rng.integers(100, 1000, size=40))
        report = list(rng.integers(100, 1000, size=160))
        ids = [IMAGE_TOKEN_INDEX] + prompt + report
        labels = [IGNORE_INDEX] * (1 + len(prompt)) + report
        samples.append(multimodal.build_sample(ids, [img], cfg, labels=labels))
    if pack > 1:
        samples = [
            multimodal.pack_samples(samples[i * pack:(i + 1) * pack])
            for i in range(batch)
        ]
    pad_tiles = max(int(s.tiles.shape[0]) for s in samples)
    return multimodal.collate(
        samples, pad_len=pad_len, pad_tiles=pad_tiles, pad_to_multiple=128
    )


def _text_param_count(cfg) -> int:
    """Decoder parameter count from the config (analytic — independent of
    whether the stored base is int8/int4)."""
    t = cfg.text
    d, v, L = t.hidden_size, t.vocab_size, t.num_layers
    kv = t.num_kv_heads * t.head_dim
    attn = d * d + 2 * d * kv + d * d  # q, k, v, o
    mlp = 3 * d * t.intermediate_size
    return L * (attn + mlp) + 2 * v * d  # + embed + lm_head


def _vision_param_count(cfg) -> int:
    """Vision tower matmul parameter count (attn + mlp + patch embed)."""
    vt = cfg.vision
    d, L = vt.hidden_size, vt.num_layers
    attn = 4 * d * d
    mlp = 2 * d * vt.intermediate_size
    patch = vt.patch_size * vt.patch_size * 3 * d
    return L * (attn + mlp) + patch


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Dead-tunnel guard: pin a usable backend BEFORE the first trace (the
    # axon plugin otherwise blocks forever); degrade to a flagged tiny CPU
    # run so the caller always gets a JSON line.
    from radvlm_tpu.utils.backend import ensure_backend

    fallback_extra: dict = {}
    if not ensure_backend():
        sys.stderr.write("bench_train: TPU tunnel unreachable; CPU fallback\n")
        os.environ.setdefault("RADVLM_TRAIN_BENCH_SIZE", "tiny")
        os.environ.setdefault("RADVLM_TRAIN_BENCH_STEPS", "2")
        fallback_extra = {
            "fallback": True,
            # spread LAST in the output dict: nulls the tiny-vs-GH200 ratio,
            # which is meaningless off-hardware
            "vs_baseline": None,
            "note": "TPU tunnel down: tiny-model CPU sanity run — value is "
                    "NOT a hardware measurement",
        }

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.parallel.mesh import make_mesh
    from radvlm_tpu.training import train_step as ts
    from radvlm_tpu.training.optimizer import TrainConfig

    size = os.environ.get("RADVLM_TRAIN_BENCH_SIZE", "7b-qlora")
    seq = _env_int("RADVLM_TRAIN_BENCH_SEQ", 4096)
    batch = _env_int("RADVLM_TRAIN_BENCH_BATCH", 1)
    pack = _env_int("RADVLM_TRAIN_BENCH_PACK", 1)
    steps = _env_int("RADVLM_TRAIN_BENCH_STEPS", 8)
    mesh_spec = os.environ.get("RADVLM_TRAIN_BENCH_MESH", "")

    qlora = size.endswith("-qlora")
    base_size = size[: -len("-qlora")] if qlora else size
    if base_size == "tiny":
        cfg = cfglib.tiny_test_config()
        seq = min(seq, 512)
    elif base_size == "7b":
        cfg = cfglib.radvlm_7b()
    elif base_size == "0.5b":
        cfg = cfglib.radvlm_0_5b()
    else:
        raise SystemExit(f"unknown RADVLM_TRAIN_BENCH_SIZE={size!r}")

    mesh_shape = None
    if mesh_spec:
        mesh_shape = {
            k: int(v) for k, v in
            (kv.split("=") for kv in mesh_spec.split(","))
        }
    mesh = make_mesh(mesh_shape)
    n_chips = int(np.prod(list(mesh.shape.values()))) or 1

    rng = np.random.default_rng(0)
    host_batch = _make_batch(cfg, batch=batch, pad_len=seq, rng=rng, pack=pack)

    train_cfg = TrainConfig(
        learning_rate=1e-5, warmup_ratio=0.0, grad_accum_steps=1,
        total_steps=max(steps + 4, 8),
    )

    if qlora and dict(mesh.shape).get("stage", 1) > 1:
        raise SystemExit(
            "pipeline (stage>1) does not compose with the QLoRA bench — the "
            "default RADVLM_TRAIN_BENCH_SIZE is 7b-qlora; set a non-qlora "
            "size (e.g. 7b) for a pipeline bench"
        )
    if qlora:
        from radvlm_tpu.training.lora import LoraConfig

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)) or ".")
        from bench import _random_quantized_params

        base = _random_quantized_params(cfg, bits=8)
        state, base, step_fn = ts.setup_lora_training(
            mesh, cfg, train_cfg, LoraConfig(), base,
        )
        run = lambda st, b: step_fn(st, base, b)
        n_train_params = sum(
            int(np.prod(x.shape)) for x in jax.tree.leaves(state.params)
        )
    elif dict(mesh.shape).get("stage", 1) > 1:
        from radvlm_tpu.models import radvlm
        from radvlm_tpu.parallel import pp

        params = radvlm.init_params(cfg, jax.random.key(0), dtype=jnp.float32)
        state, step_fn, _ = pp.setup_pp_training(
            mesh, cfg, train_cfg,
            params,
            pp_cfg=pp.PPStepConfig(
                n_microbatches=_env_int("RADVLM_TRAIN_BENCH_MICROBATCHES", 4),
                interleave=_env_int("RADVLM_TRAIN_BENCH_INTERLEAVE", 1),
            ),
        )
        del params
        run = step_fn
        n_train_params = sum(
            int(np.prod(x.shape)) for x in jax.tree.leaves(state.params)
        )
    else:
        from radvlm_tpu.models import radvlm

        params = radvlm.init_params(cfg, jax.random.key(0), dtype=jnp.float32)
        state, step_fn, _ = ts.setup_training(mesh, cfg, train_cfg, params)
        del params
        run = step_fn
        n_train_params = sum(
            int(np.prod(x.shape)) for x in jax.tree.leaves(state.params)
        )

    dev_batch = ts.put_batch(mesh, host_batch)

    t0 = time.perf_counter()
    for _ in range(2):  # compile + first exec
        state, metrics = run(state, dev_batch)
    _ = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    # RADVLM_TRAIN_BENCH_PROFILE=<dir>: jax.profiler trace over the timed
    # steps (xplane dump) — localizes fwd/bwd/collective time per step.
    import contextlib

    from radvlm_tpu.utils import profiling

    prof_dir = os.environ.get("RADVLM_TRAIN_BENCH_PROFILE", "")
    prof_ctx = profiling.trace(prof_dir) if prof_dir else contextlib.nullcontext()

    times = []
    with prof_ctx:
        for _ in range(steps):
            t = time.perf_counter()
            state, metrics = run(state, dev_batch)
            _ = float(metrics["loss"])  # forces device sync (tunnel-safe)
            times.append(time.perf_counter() - t)

    step_s = float(np.median(times))
    n_samples = batch * pack
    samples_s = n_samples / step_s
    tokens = int(host_batch["tokens"].shape[0] * host_batch["tokens"].shape[1])
    sup_tokens = int((host_batch["labels"] != -100).sum())
    # Matmul-only model FLOPs: 6 * N * processed tokens (fwd 2N + bwd 4N)
    # for the decoder AND the vision tower — the tower is ~45% of real
    # compute at the reference geometry (≈3.3k image tokens of a 4096 row),
    # so counting text alone (the r4 bench) understated utilization by ~2x.
    # Remat recompute and attention-score FLOPs are real work still NOT
    # counted, so MFU remains a lower bound.
    tile_tokens = int(
        host_batch["tiles"].shape[0] * host_batch["tiles"].shape[1]
        * (cfg.vision.image_size // cfg.vision.patch_size) ** 2
    )
    flops = 6.0 * (
        _text_param_count(cfg) * tokens + _vision_param_count(cfg) * tile_tokens
    )
    text_tflops_s = 6.0 * _text_param_count(cfg) * tokens / step_s / 1e12
    tflops_s = flops / step_s / 1e12
    peak_per_chip = 197.0 if jax.devices()[0].platform == "tpu" else float("nan")
    mfu = tflops_s / (peak_per_chip * n_chips) if peak_per_chip == peak_per_chip else None

    # Reference scale: 1,022,742 pairs / (12 h * 128 GPUs) ~ 0.185 samples/s
    # per GH200 (BASELINE.md training-scale row). Geometry differs per sample;
    # this is a scale comparison, not a controlled A/B.
    ref_per_gpu = 1022742 / (12 * 3600 * 128)
    per_chip = samples_s / n_chips

    print(json.dumps({
        "metric": "train_samples_per_s_per_chip",
        "value": round(per_chip, 4),
        "unit": "samples/s/chip",
        "vs_baseline": round(per_chip / ref_per_gpu, 2),
        "mode": size,
        "n_chips": n_chips,
        "mesh": dict(mesh.shape),
        "seq": seq,
        "batch": batch,
        "pack": pack,
        "step_s": round(step_s, 4),
        "compile_s": round(compile_s, 1),
        "tokens_per_s": round(tokens / step_s, 1),
        "supervised_tokens_per_batch": sup_tokens,
        "model_tflops_per_s": round(tflops_s, 2),
        "text_only_tflops_per_s": round(text_tflops_s, 2),
        "mfu_lower_bound": round(mfu, 4) if mfu is not None else None,
        "trainable_params": n_train_params,
        "ref_samples_per_s_per_gpu": round(ref_per_gpu, 4),
        "device": jax.devices()[0].platform,
        **fallback_extra,
    }))


if __name__ == "__main__":
    main()
