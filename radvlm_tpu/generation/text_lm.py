"""Text-only LM serving on the VLM engine.

Loads any HF decoder-family checkpoint (qwen2 / llama / mistral / gemma /
mpt / MoE — everything `hf_import.config_from_hf_dir` dispatches) and batches
prompts through the slot-refilled continuous batcher. This powers:

- the native GREEN judge (`eval/green_cli.py --judge jax`) — the reference
  needs torchrun + one HF `generate` per sample (`eval_green.py:20-26`);
- the local synthesis client (`data/llm_clients.LocalJAXClient`) — the
  reference's report filtering / conversation generation only run against
  Azure GPT-4o (`radvlm/data/utils.py:13-34`).

The engine's fill/decode graphs are VLM-shaped, so a tiny random vision
tower + projector ride along; text-only prompts carry no `<image>` sentinel,
so tower outputs are never spliced and generations are exactly the LM's
(greedy parity vs torch HF generate is tested).
"""

from __future__ import annotations

from typing import List, Optional, Sequence


class TextLMEngine:
    def __init__(
        self,
        model_path: str,
        *,
        max_new_tokens: int = 512,
        num_slots: int = 8,
        int8: bool = False,
        dtype=None,
        max_prompt_tokens: int = 3000,
        prompt_buckets: Sequence[int] = (1024, 2048, 3072),
        template=None,  # Optional data.chat.ChatTemplate: wrap prompts as one user turn
    ):
        import jax
        import jax.numpy as jnp
        from transformers import AutoTokenizer

        from radvlm_tpu import config as cfglib
        from radvlm_tpu.generation.continuous import ContinuousBatcher
        from radvlm_tpu.generation.engine import GenerationConfig
        from radvlm_tpu.models import radvlm
        from radvlm_tpu.models.hf_import import (
            config_from_hf_dir,
            import_qwen2,
            load_safetensors_dir,
            normalize_keys,
        )

        dtype = dtype or jnp.bfloat16
        text_cfg = config_from_hf_dir(model_path).text
        tiny = cfglib.tiny_test_config()
        self.cfg = cfglib.RadVLMConfig(
            vision=tiny.vision, text=text_cfg, anyres=tiny.anyres
        )
        params = radvlm.init_params(self.cfg, jax.random.key(0), dtype=dtype)
        params["text"] = import_qwen2(
            normalize_keys(load_safetensors_dir(model_path)), text_cfg, dtype
        )
        if int8:
            from radvlm_tpu.ops.quant import quantize_params

            params = quantize_params(params)

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.template = template
        self.max_prompt_tokens = max_prompt_tokens
        eos = [self.tokenizer.eos_token_id]
        if template is not None:
            for s in template.stop_strings:
                tid = self.tokenizer.convert_tokens_to_ids(s)
                if tid is not None and tid != self.tokenizer.unk_token_id:
                    eos.append(tid)
        self.eos = tuple(i for i in dict.fromkeys(eos) if i is not None)
        gen = GenerationConfig(
            max_new_tokens=max_new_tokens, eos_token_ids=self.eos,
            pad_token_id=self.tokenizer.pad_token_id or 0,
        )
        self.batcher = ContinuousBatcher(
            params, self.cfg, gen, num_slots=num_slots,
            max_len=max(prompt_buckets)
            + (-(-max_new_tokens // 128) * 128),
            prompt_buckets=tuple(prompt_buckets), pad_tiles=1,
        )
        # ONE dispatch thread owns batcher.run(): callers (possibly many —
        # the synth pipelines fan complete() out over a thread pool) only
        # submit and wait on req.done. Two threads driving run() concurrently
        # both donate/rebind the cache buffers -> use-after-donate (found by
        # filter_reports' num_workers=8 pool).
        import threading

        self._start_lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _ensure_loop(self) -> None:
        import logging
        import threading
        import time

        with self._start_lock:
            if self._thread is not None:
                return

            def loop():
                while not self._stop.is_set():
                    progressed = False
                    try:
                        for _req in self.batcher.run():
                            progressed = True
                    except Exception as e:
                        logging.getLogger(__name__).exception(
                            "text-lm engine error; failing in-flight requests"
                        )
                        self.batcher.fail_all(f"engine error: {e}")
                        time.sleep(0.25)
                    if not progressed:
                        time.sleep(0.002)

            self._thread = threading.Thread(
                target=loop, daemon=True, name="text-lm-engine"
            )
            self._thread.start()

    def shutdown(self) -> None:
        self._stop.set()

    def _render(self, prompt: str) -> str:
        if self.template is None:
            return prompt
        from radvlm_tpu.data.chat import render_generation_prompt

        return render_generation_prompt(
            [("user", prompt)], template=self.template
        )

    def generate_batch(
        self, prompts: Sequence[str], *, temperature: Optional[float] = None,
        top_p: Optional[float] = None,
    ) -> List[str]:
        """All prompts in flight at once through the continuous batcher
        (thread-safe: any number of callers share the slots)."""
        import time

        from radvlm_tpu.generation.engine import trim_at_stop_strings
        from radvlm_tpu.models import multimodal

        self._ensure_loop()
        reqs = []
        for p in prompts:
            ids = self.tokenizer(
                self._render(p), add_special_tokens=True
            ).input_ids[: self.max_prompt_tokens]
            sample = multimodal.build_sample(ids, [], self.cfg)
            reqs.append(self.batcher.submit(
                sample, temperature=temperature, top_p=top_p
            ))
        deadline = time.time() + 600
        while not all(r.done for r in reqs):
            if time.time() >= deadline:
                raise TimeoutError("text-lm generation timed out")
            time.sleep(0.005)
        out = []
        for r in reqs:
            if r.error:
                raise RuntimeError(f"text-lm engine failed: {r.error}")
            text = self.tokenizer.decode(
                [t for t in r.emitted if t not in self.eos],
                skip_special_tokens=True,
            )
            if self.template is not None:
                text = trim_at_stop_strings(text, self.template.stop_strings)
            out.append(text)
        return out

    def generate(self, prompt: str, **kw) -> str:
        return self.generate_batch([prompt], **kw)[0]
