"""GREEN evaluation CLI (reference `radvlm/evaluation/eval_green.py`).

Scores saved report-generation outputs with the GREEN LLM judge
(StanfordAIMI/GREEN-radllama2-7b). The judge backend is pluggable:
- --judge jax (default): the radllama2 judge runs NATIVELY on the TPU
  through our text importer + the slot-refilled continuous engine, all
  samples batched (greedy parity vs HF generate tested) — the reference
  needs torchrun + one GPU `generate` per sample (`eval_green.py:20-26`);
- --judge hf: torch transformers from a local path (the reference's path);
- --judge azure: any chat LLM through the AzureOpenAI client;
- --judge echo: parse-only smoke mode (expects precomputed responses).

    python -m radvlm_tpu.eval.green_cli \
        --outputs results/radvlm_report_generation_output.json \
        --judge-model /models/GREEN-radllama2-7b --int8
"""

from __future__ import annotations

import argparse
import json
import logging


def make_jax_judge(model_path: str, *, max_new_tokens: int = 512,
                   num_slots: int = 8, int8: bool = False, dtype=None):
    """GREEN judging natively on the TPU serving engine.

    The judge (StanfordAIMI/GREEN-radllama2-7b — a Llama-2 LM) loads through
    our text importer and scores ALL report pairs batched through the
    slot-refilled continuous batcher; the reference shells out to torchrun +
    one HF `generate` per sample (`radvlm/evaluation/eval_green.py:20-26`).

    The engine's fill graph is a VLM graph, so a tiny random vision tower +
    projector ride along (generation/text_lm.py) — GREEN prompts carry no
    `<image>` sentinel, so tower outputs are never spliced and the
    generations are exactly the text-only LM's. Returns a batch judge
    (`[prompts] -> [responses]`, `.batched = True`)."""
    from radvlm_tpu.generation.text_lm import TextLMEngine

    engine = TextLMEngine(
        model_path, max_new_tokens=max_new_tokens, num_slots=num_slots,
        int8=int8, dtype=dtype,
    )

    def batch_judge(prompts):
        return engine.generate_batch(prompts)

    batch_judge.batched = True
    return batch_judge


def make_hf_judge(model_path: str, *, max_new_tokens: int = 512):
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_path)
    model = AutoModelForCausalLM.from_pretrained(
        model_path, torch_dtype=torch.float32
    )
    model.eval()

    def judge(prompt: str) -> str:
        ids = tok(prompt, return_tensors="pt", truncation=True, max_length=3000)
        with torch.no_grad():
            out = model.generate(**ids, max_new_tokens=max_new_tokens)
        return tok.decode(out[0][ids["input_ids"].shape[1]:],
                          skip_special_tokens=True)

    return judge


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--outputs", required=True,
                   help="eval-harness *_output.json for report_generation")
    p.add_argument("--judge", default="jax",
                   choices=["jax", "hf", "azure", "echo"])
    p.add_argument("--judge-model", default="StanfordAIMI/GREEN-radllama2-7b")
    p.add_argument("--judge-slots", type=int, default=8,
                   help="concurrent decode slots for --judge jax")
    p.add_argument("--int8", action="store_true",
                   help="int8-quantize the jax judge's weights at load")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--save", default=None)
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from radvlm_tpu.eval.metrics.clinical import green

    results = json.load(open(args.outputs))
    if args.max_samples:
        results = results[: args.max_samples]
    refs = [r["txt"] for r in results]
    hyps = [r["output"] for r in results]

    if args.judge == "jax":
        judge = make_jax_judge(
            args.judge_model, num_slots=args.judge_slots, int8=args.int8
        )
    elif args.judge == "hf":
        judge = make_hf_judge(args.judge_model)
    elif args.judge == "azure":
        from radvlm_tpu.data.llm_clients import AzureOpenAIClient

        client = AzureOpenAIClient(model=args.judge_model)
        judge = lambda prompt: client.complete(prompt) or ""
    else:
        judge = lambda prompt: prompt  # echo: for piping/debugging only

    if getattr(judge, "batched", False):
        from radvlm_tpu.eval.metrics.clinical import green_batched

        mean, scores = green_batched(refs, hyps, judge)
    else:
        mean, scores = green(refs, hyps, judge)
    print(f"GREEN mean: {mean:.4f} over {len([s for s in scores if s is not None])} scored samples")
    if args.save:
        with open(args.save, "w") as f:
            json.dump({"green_mean": mean, "scores": scores}, f, indent=2)


if __name__ == "__main__":
    main()
