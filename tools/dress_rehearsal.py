"""Eval dress rehearsal at the reference's full eval-set size.

The reference evaluates report generation over the 3,314-study MIMIC-CXR test
split (`radvlm/evaluation/evaluate_instructions.py:195-207`). This script runs
OUR continuous-engine eval harness end-to-end at exactly that scale with
synthetic studies (random CXR-sized images, varied fake reports) and a tiny
random model, proving the contract-scale properties that unit tests cannot:

- the two-pass wave-based submission keeps host RSS + device memory bounded
  (pass 1 sizes buckets and drops pixels; pass 2 submits in slot-depth waves);
- the slot-refilled continuous engine sustains the full split without leaks;
- decode + stop-trim + NLG metrics (BLEU-4/ROUGE-L/CIDEr-D) run over all
  outputs and the results/metrics JSON dump succeeds at full size;
- (when run under multiple jax processes) the JSON-bytes allgather carries the
  full ragged result set.

CPU + micro model by default — the harness/engine code path is identical to
the production one; set RADVLM_REHEARSAL_TPU=1 to run on the real chip.
Writes a JSON artifact (wall time, samples/s, peak RSS, per-phase timings).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import time

if os.environ.get("RADVLM_REHEARSAL_TPU", "0") != "1":
    # --fleet N needs N visible devices; the flag must land before backend init
    _n = os.environ.get("RADVLM_REHEARSAL_DEVICES")
    if _n:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={_n}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


FINDINGS = [
    "No acute cardiopulmonary abnormality.",
    "Mild cardiomegaly with clear lungs.",
    "Small right pleural effusion, otherwise unremarkable.",
    "Bibasilar atelectasis without focal consolidation.",
    "Low lung volumes; no pneumothorax or effusion.",
    "Stable chronic interstitial changes.",
]


class SyntheticReportDataset:
    """3,314 synthetic frontal-CXR studies with the MIMIC adapter's sample
    contract for the report_generation task (img / instr.question / txt)."""

    def __init__(self, n: int, hw: int):
        self.n = n
        self.hw = hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import numpy as np

        rng = np.random.default_rng(i)
        # grayscale chest-film-like image, generated on demand (never held)
        img = rng.integers(0, 255, size=(self.hw, self.hw), dtype=np.uint8)
        img = np.stack([img] * 3, axis=-1)
        return {
            "img": img,
            "instr": {"question": "Provide a radiology report."},
            "txt": FINDINGS[i % len(FINDINGS)] + f" Study index {i}.",
        }


class ByteTokenizer:
    eos_token_ids = (1,)
    pad_token_id = 0

    def encode(self, text):
        return [2 + b for b in text.encode()][:64]

    def decode(self, ids):
        return bytes(min(255, i - 2) for i in ids if i >= 2).decode(
            errors="ignore"
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3314)
    ap.add_argument("--image-hw", type=int, default=512)
    ap.add_argument("--max-new-tokens", type=int, default=16)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--fleet", type=int, default=None,
                    help="N data-parallel engines (serve/fleet.py); set "
                         "RADVLM_REHEARSAL_DEVICES=N for a CPU run")
    ap.add_argument("--out", default="REHEARSAL.json")
    args = ap.parse_args()

    import jax

    from radvlm_tpu import config as cfglib
    from radvlm_tpu.eval.harness import VLMRunner, run_task
    from radvlm_tpu.models import radvlm

    t0 = time.time()
    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params,
        cfg=cfg,
        tokenizer=ByteTokenizer(),
        max_new_tokens=args.max_new_tokens,
        batch_size=args.slots,
        attn_impl="xla",
        fuse=False,
        fleet=args.fleet,
    )
    dataset = SyntheticReportDataset(args.n, args.image_hw)
    t_setup = time.time() - t0

    done = {"n": 0, "t": time.time()}

    def progress(k, total):
        if k - done["n"] >= 256 or k == total:
            now = time.time()
            rate = (k - done["n"]) / max(now - done["t"], 1e-9)
            print(f"[rehearsal] {k}/{total} ({rate:.1f} samples/s)", flush=True)
            done["n"], done["t"] = k, now

    t1 = time.time()
    results, metrics = run_task(
        runner,
        dataset,
        "report_generation",
        output_dir="/tmp/rehearsal_out",
        model_name="rehearsal",
        with_clinical=False,
        engine="continuous",
        progress=progress,
    )
    t_run = time.time() - t1

    assert len(results) == args.n, (len(results), args.n)
    assert all(isinstance(r["output"], str) for r in results)
    outputs_json = "/tmp/rehearsal_out/rehearsal_report_generation_output.json"
    assert os.path.getsize(outputs_json) > 0

    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    artifact = {
        "n_samples": args.n,
        "image_hw": args.image_hw,
        "max_new_tokens": args.max_new_tokens,
        "slots": args.slots,
        "fleet": args.fleet or 1,
        "platform": jax.devices()[0].platform,
        "setup_s": round(t_setup, 2),
        "run_s": round(t_run, 2),
        "samples_per_s": round(args.n / t_run, 3),
        "peak_rss_mb": round(peak_rss_mb, 1),
        "metrics": {k: round(float(v), 4) for k, v in metrics.items()},
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
