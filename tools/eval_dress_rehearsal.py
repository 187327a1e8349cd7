"""Eval dress rehearsal at contract scale (VERDICT r2 item 7).

Runs the continuous-engine eval harness end-to-end over 3,314 synthetic
CXR-sized studies — the exact size of the reference's MIMIC-CXR test split
(`radvlm/evaluation/evaluate_instructions.py:195-207`) — with the tiny model
on whatever accelerator is attached. Proves at full scale:

- the wave-based submission keeps host RAM and HBM bounded (no whole-split
  residency; code-review r2 design, previously never exercised at scale);
- the harness -> batcher -> decode -> metrics -> dump pipeline sustains a
  full-split run (NLG metrics over 3,314 hypotheses included);
- records wall time, peak RSS, and device memory stats into
  EVAL_REHEARSAL.json for the round artifact.

Usage: python tools/eval_dress_rehearsal.py [--n 3314] [--new-tokens 16]
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class ByteTokenizer:
    eos_token_ids = (1,)
    pad_token_id = 0

    def encode(self, text):
        return [2 + b for b in text.encode()][:64]

    def decode(self, ids):
        return bytes(min(255, i - 2) for i in ids if i >= 2).decode(
            errors="ignore"
        )


class SyntheticReportDataset:
    """3,314 lazily generated CXR-sized studies (portrait ~512px, like MIMIC
    JPEGs post-preprocessing). Lazy __getitem__ keeps host RAM flat — holding
    the split's raw pixels would be ~2.6 GB before tiling."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        h = int(rng.integers(480, 560))
        w = int(rng.integers(400, 520))
        return {
            "img": rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8),
            "instr": {
                "question": "Provide a radiology report for this chest X-ray.",
            },
            "txt": "No acute cardiopulmonary process. Lungs are clear.",
        }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=3314)
    p.add_argument("--new-tokens", type=int, default=16)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--out", default="EVAL_REHEARSAL.json")
    args = p.parse_args()

    from radvlm_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    import jax

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.eval.harness import VLMRunner, run_task
    from radvlm_tpu.models import radvlm

    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=ByteTokenizer(),
        max_new_tokens=args.new_tokens, batch_size=args.slots,
    )
    ds = SyntheticReportDataset(args.n)

    last = [0]

    def progress(done, total):
        if done - last[0] >= 200 or done == total:
            last[0] = done
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
            print(f"{done}/{total} peak_rss={rss}MB", flush=True)

    t0 = time.perf_counter()
    results, metrics = run_task(
        runner, ds, "report_generation",
        with_clinical=False, engine="continuous", progress=progress,
    )
    wall = time.perf_counter() - t0
    assert len(results) == args.n, (len(results), args.n)

    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    dev = jax.devices()[0]
    try:
        mem = dev.memory_stats()
        hbm = {
            "bytes_in_use": int(mem.get("bytes_in_use", -1)),
            "peak_bytes_in_use": int(mem.get("peak_bytes_in_use", -1)),
        }
    except Exception:
        hbm = {"bytes_in_use": -1, "peak_bytes_in_use": -1}

    record = {
        "samples": args.n,
        "wall_s": round(wall, 1),
        "samples_per_sec": round(args.n / wall, 2),
        "peak_rss_mb": peak_rss_mb,
        "hbm": hbm,
        "device": str(dev.device_kind),
        "new_tokens": args.new_tokens,
        "slots": args.slots,
        "metrics": {k: float(v) for k, v in metrics.items()},
        "model": "tiny_test_config (scale rehearsal: pipeline + memory "
                 "bounds at the reference's 3,314-study eval size)",
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
