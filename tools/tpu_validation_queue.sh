#!/bin/bash
# Hardware-validation queue for when the TPU tunnel is back
# (probe: ss -tln | grep 808). Run ONE task at a time — a second TPU process
# silently queues server-side and corrupts both runs' timings; never kill a
# TPU client mid-compile (a mid-compile kill took the relay down for good
# once). ~30 s cooldown between tasks.
#
# Usage: bash tools/tpu_validation_queue.sh [task...]   (default: all, in order)
set -u
cd "$(dirname "$0")/.."

run() { echo "=== $* ==="; "$@"; echo "=== rc=$? ==="; sleep 30; }

task_golden() {    # 0. FIRST when egress/weights appear: the parity gate.
                   #    Real-checkpoint golden check (the reference's
                   #    convert_llava_onevision_weights_to_hf.py:204-250
                   #    discipline): pixel values, last-position logits, and
                   #    greedy generation vs the HF oracle on REAL weights.
                   #    Every in-repo parity claim is vs random-init HF
                   #    modules — strong for math, silent on weight-layout
                   #    mistakes only real checkpoints expose. Expected
                   #    artifact: GOLDEN_<ckpt>.json (the script prints
                   #    PASS/FAIL per check).
  run timeout 3600 env PYTHONPATH=".:${PYTHONPATH:-}" python tools/golden_check.py \
      --checkpoint "${RADVLM_GOLDEN_CKPT:-lmms-lab/llava-onevision-qwen2-0.5b-si}"
  run timeout 7200 env PYTHONPATH=".:${PYTHONPATH:-}" python tools/golden_check.py \
      --checkpoint "${RADVLM_GOLDEN_CKPT_7B:-lmms-lab/llava-onevision-qwen2-7b-si}"
}

task_realeval() {  # 0b. real-data eval metrics: the reference's contract is
                   #     metric VALUES on the actual test splits
                   #     (evaluate_instructions.py:195-207). Dress rehearsals
                   #     ran at the right scale (3,314) on synthetic data;
                   #     with datasets + a real checkpoint present, run the
                   #     harness on MIMIC-CXR/CheXpert test splits and diff
                   #     the metric table against the paper's Table 2/3.
                   #     Expected artifact: EVAL_REAL_<task>.json + metrics
                   #     dump from eval/cli.py.
  run timeout 36000 env PYTHONPATH=".:${PYTHONPATH:-}" python -m radvlm_tpu.eval.cli \
      --checkpoint "${RADVLM_EVAL_CKPT:?set RADVLM_EVAL_CKPT to a converted checkpoint}" \
      --task report_generation --data-dir "${RADVLM_DATA_ROOT:?set RADVLM_DATA_ROOT}" \
      --output-dir EVAL_REAL_report_generation
}

task_smoke() {      # 1. quick 0.5B smoke — engine + fused-W8A8 fallback sanity
  run timeout 1800 env RADVLM_BENCH_SIZE=0.5b RADVLM_BENCH_REQS=8 \
      RADVLM_BENCH_NEW_TOKENS=16 RADVLM_BENCH_SLOTS=8 python bench.py
}
task_bench7b() {    # 2. flagship bench (fused W8A8 kernel is the TPU default;
                    #    warmup falls back to the XLA emitter on compile fail)
  run timeout 3600 python bench.py
}
task_warm() {       # 3. warm rerun — persistent compile cache + parallel
                    #    warmup A/B (compare compile_s + warmup_breakdown_s)
  run timeout 3600 python bench.py
  run timeout 3600 env RADVLM_PARALLEL_WARMUP=0 python bench.py
}
task_slots32() {    # 4. 32-slot trial (int8 KV 4.25 GB + 7.6 GB weights fits)
  run timeout 3600 env RADVLM_BENCH_SLOTS=32 python bench.py
}
task_flash() {      # 5. real-TPU flash fwd+bwd + q8 decode kernel regression
  run timeout 3600 env RADVLM_TEST_TPU=1 python -m pytest \
      tests/test_tpu_flash.py -x -q
}
task_rehearsal() {  # 6. eval dress rehearsal on the chip (0.5B-class config
                    #    is set inside the tool when RADVLM_REHEARSAL_TPU=1)
  run timeout 7200 env RADVLM_REHEARSAL_TPU=1 PYTHONPATH=".:${PYTHONPATH:-}" \
      python tools/dress_rehearsal.py --n 3314 --max-new-tokens 16 \
      --slots 16 --out REHEARSAL_r03_tpu.json
}

task_spec() {       # 7. speculative decoding on-chip: verify-window graph
                    #    compiles + token parity at 0.5B, then 7B overhead
                    #    check (random weights -> acceptance ~0: spec run
                    #    must stay within ~15% of the plain bench)
  run timeout 1800 env RADVLM_BENCH_SIZE=0.5b RADVLM_BENCH_REQS=8 \
      RADVLM_BENCH_NEW_TOKENS=16 RADVLM_BENCH_SLOTS=8 RADVLM_SPEC_K=4 \
      python bench.py
  run timeout 3600 env RADVLM_SPEC_K=4 python bench.py
}

task_resume() {    # 8. multi-turn KV reuse on-chip: delta-prefill graph
                   #    (windowed cached forward) compiles on TPU and the
                   #    resumed stream bit-matches full re-prefill
  run timeout 1800 env RADVLM_TEST_TPU=1 \
      python -m pytest tests/test_kv_resume.py -x -q
}

task_train() {     # 9. training-step throughput: 0.5B full SFT then the
                   #    7B QLoRA (int8 base + LoRA) single-chip mode
  run timeout 1800 env RADVLM_TRAIN_BENCH_SIZE=0.5b PYTHONPATH=".:${PYTHONPATH:-}" \
      python tools/bench_train.py
  run timeout 3600 env RADVLM_TRAIN_BENCH_SIZE=7b-qlora PYTHONPATH=".:${PYTHONPATH:-}" \
      python tools/bench_train.py
}

if [ $# -eq 0 ]; then
  # golden + realeval lead the default order: they are the parity GATE the
  # moment egress/weights exist (they no-op with a clear error until then).
  set -- golden realeval smoke bench7b warm slots32 flash rehearsal spec resume train
fi
for t in "$@"; do "task_$t"; done
