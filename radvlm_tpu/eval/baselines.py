"""Baseline VLM zoo: unified loading + inference for the comparison models.

Rebuild of `radvlm/evaluation/models_loading_inference.py` (1,298 LoC): the eval
harness compares RadVLM against RaDialog, LLaVA-Med, CheXagent, MAIRA-2,
Qwen2-VL, and stock LLaVA-OneVision. Those models are PyTorch/HF — they stay a
torch-CPU/GPU *sidecar* here (SURVEY.md §7 hard part 5): each adapter loads via
transformers when its weights are available locally and exposes the same
`infer(image_path, prompt, chat_history) -> text` interface the harness's
result cells expect. The box-format conversions (CheXagent's `<|box|>` token
decode, MAIRA-2's original-image coordinate adjustment) are pure functions,
tested without weights.

RadVLM itself runs through the native JAX runner (`eval/harness.VLMRunner`) —
this module is only for the baselines column of the capability matrix.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Pure conversions (tested)
# ---------------------------------------------------------------------------

_CHEXAGENT_BOX_RE = re.compile(
    r"<\|box\|> \((\d+),(\d+)\),\((\d+),(\d+)\) <\|/box\|>"
)


def chexagent_boxes_to_text(generated: str) -> str:
    """CheXagent emits `<|box|> (x1,y1),(x2,y2) <|/box|>` with 0-100 integer
    coords; convert to the harness's `[0.xx, 0.yy, ...]` bbox text
    (`models_loading_inference.py:498-510`)."""
    matches = _CHEXAGENT_BOX_RE.findall(generated)
    if not matches:
        return ""
    return ", ".join(
        f"[{int(x1) / 100:.2f}, {int(y1) / 100:.2f}, "
        f"{int(x2) / 100:.2f}, {int(y2) / 100:.2f}]"
        for x1, y1, x2, y2 in matches
    )


def maira2_boxes_to_text(
    boxes: Optional[Sequence[Optional[Sequence[float]]]],
    adjust: Callable[..., Sequence[float]],
    *,
    width: int,
    height: int,
) -> str:
    """MAIRA-2 grounded-sequence boxes -> harness bbox text, adjusting each box
    from the processor's crop space back to the original image
    (`models_loading_inference.py:146-178`). `adjust` is the processor's
    `adjust_box_for_original_image_size`."""
    if not boxes:
        return ""
    out = []
    for coord in boxes:
        if coord is None:
            continue
        adj = list(adjust(coord, width=width, height=height))
        out.append(str([round(float(v), 2) for v in adj]))
    return ", ".join(out)


# ---------------------------------------------------------------------------
# Torch-sidecar adapters (need local weights; gated imports)
# ---------------------------------------------------------------------------


class BaselineModel:
    """Protocol: infer(image_path, prompt, chat_history=None) -> text."""

    name: str = "baseline"

    def infer(
        self,
        image_path: str,
        prompt: str,
        chat_history: Optional[List[Tuple[str, str]]] = None,
        *,
        max_new_tokens: int = 500,
    ) -> str:
        raise NotImplementedError


class Qwen2VLBaseline(BaselineModel):
    """Qwen2-VL / Qwen2.5-VL via transformers (`models_loading_inference.py:90-94,
    427-483`)."""

    name = "qwen2vl"

    def __init__(self, model_path: str, device: str = "cpu"):
        from transformers import AutoProcessor, Qwen2VLForConditionalGeneration

        self.processor = AutoProcessor.from_pretrained(model_path)
        self.model = Qwen2VLForConditionalGeneration.from_pretrained(model_path)
        self.model.to(device).eval()
        self.device = device

    def infer(self, image_path, prompt, chat_history=None, *, max_new_tokens=500):
        import torch
        from PIL import Image

        messages = []
        for user, assistant in chat_history or []:
            messages.append({"role": "user", "content": [{"type": "text", "text": user}]})
            messages.append({"role": "assistant", "content": [{"type": "text", "text": assistant}]})
        messages.append({
            "role": "user",
            "content": [{"type": "image"}, {"type": "text", "text": prompt}],
        })
        text = self.processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        image = Image.open(image_path).convert("RGB")
        inputs = self.processor(
            text=[text], images=[image], return_tensors="pt"
        ).to(self.device)
        with torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=max_new_tokens)
        trimmed = out[0][inputs["input_ids"].shape[1]:]
        return self.processor.decode(trimmed, skip_special_tokens=True).strip()


class CheXagentBaseline(BaselineModel):
    """CheXagent-2-3b (`models_loading_inference.py:55-61,485-513`)."""

    name = "chexagent"

    def __init__(self, model_path: str = "StanfordAIMI/CheXagent-2-3b",
                 device: str = "cpu"):
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(
            model_path, trust_remote_code=True
        )
        self.model = AutoModelForCausalLM.from_pretrained(
            model_path, torch_dtype=torch.float32, trust_remote_code=True
        )
        self.model.to(device).eval()
        self.device = device

    def infer(self, image_path, prompt, chat_history=None, *,
              max_new_tokens=500, grounding: bool = False):
        import torch

        query = self.tokenizer.from_list_format(
            [{"image": image_path}, {"text": prompt}]
        )
        conv = [
            {"from": "system", "value": "You are a helpful assistant."},
            {"from": "human", "value": query},
        ]
        input_ids = self.tokenizer.apply_chat_template(
            conv, add_generation_prompt=True, return_tensors="pt"
        )
        with torch.no_grad():
            out = self.model.generate(
                input_ids.to(self.device), do_sample=False, num_beams=1,
                max_new_tokens=max_new_tokens, use_cache=True,
            )[0]
        text = self.tokenizer.decode(out[input_ids.size(1):-1])
        if grounding:
            return chexagent_boxes_to_text(text)
        return text


class MAIRA2Baseline(BaselineModel):
    """microsoft/maira-2 report-gen + phrase grounding
    (`models_loading_inference.py:79-89,118-178`)."""

    name = "maira2"

    def __init__(self, model_path: str = "microsoft/maira-2", device: str = "cpu"):
        from transformers import AutoModelForCausalLM, AutoProcessor

        self.processor = AutoProcessor.from_pretrained(
            model_path, trust_remote_code=True
        )
        self.model = AutoModelForCausalLM.from_pretrained(
            model_path, trust_remote_code=True
        )
        self.model.to(device).eval()
        self.device = device

    def infer(self, image_path, prompt, chat_history=None, *, max_new_tokens=500):
        import torch
        from PIL import Image

        image = Image.open(image_path).convert("RGB")
        inputs = self.processor.format_and_preprocess_reporting_input(
            current_frontal=image, current_lateral=None, prior_frontal=None,
            indication=None, technique=None, comparison=None,
            prior_report=None, return_tensors="pt", get_grounding=False,
        ).to(self.device)
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=max_new_tokens, use_cache=True
            )
        decoded = self.processor.decode(
            out[0][inputs["input_ids"].shape[-1]:], skip_special_tokens=True
        )
        return self.processor.convert_output_to_plaintext_or_grounded_sequence(
            decoded
        )

    def ground(self, image_path: str, phrase: str, *, max_new_tokens=500) -> str:
        import torch
        from PIL import Image

        image = Image.open(image_path).convert("RGB")
        inputs = self.processor.format_and_preprocess_phrase_grounding_input(
            frontal_image=image, phrase=phrase, return_tensors="pt"
        ).to(self.device)
        with torch.no_grad():
            out = self.model.generate(
                **inputs, max_new_tokens=max_new_tokens, use_cache=True
            )
        decoded = self.processor.decode(
            out[0][inputs["input_ids"].shape[-1]:], skip_special_tokens=True
        )
        try:
            pred = self.processor.convert_output_to_plaintext_or_grounded_sequence(
                decoded
            )
            w, h = image.size
            return maira2_boxes_to_text(
                pred[0][1], self.processor.adjust_box_for_original_image_size,
                width=w, height=h,
            )
        except Exception:
            return ""


class LlavaOneVisionBaseline(BaselineModel):
    """Stock llava-onevision via transformers (`:97-112,382-425`) — also usable
    for torch-side verification of our JAX RadVLM outputs."""

    name = "llava-ov"

    def __init__(self, model_path: str, device: str = "cpu"):
        import torch
        from transformers import AutoProcessor, LlavaOnevisionForConditionalGeneration

        self.processor = AutoProcessor.from_pretrained(model_path)
        self.model = LlavaOnevisionForConditionalGeneration.from_pretrained(
            model_path, torch_dtype=torch.float32
        )
        self.model.to(device).eval()
        self.device = device

    def infer(self, image_path, prompt, chat_history=None, *, max_new_tokens=500):
        import torch
        from PIL import Image

        conversation = []
        for user, assistant in chat_history or []:
            conversation.append(
                {"role": "user", "content": [{"type": "text", "text": user}]}
            )
            conversation.append(
                {"role": "assistant", "content": [{"type": "text", "text": assistant}]}
            )
        conversation.append({
            "role": "user",
            "content": [{"type": "image"}, {"type": "text", "text": prompt}],
        })
        text = self.processor.apply_chat_template(
            conversation, add_generation_prompt=True
        )
        image = Image.open(image_path).convert("RGB")
        inputs = self.processor(
            images=image, text=text, return_tensors="pt"
        ).to(self.device)
        with torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=max_new_tokens)
        return self.processor.decode(
            out[0][inputs["input_ids"].shape[1]:], skip_special_tokens=True
        ).strip()


REGISTRY: Dict[str, type] = {
    "qwen2vl": Qwen2VLBaseline,
    "chexagent": CheXagentBaseline,
    "maira2": MAIRA2Baseline,
    "llava-ov": LlavaOneVisionBaseline,
}


def load_baseline(name: str, model_path: Optional[str] = None, **kw) -> BaselineModel:
    """Unified entry (the reference's `load_model_and_processor`). RaDialog and
    LLaVA-Med require their bespoke repos (LoRA + BioViL tower / in-repo arch
    rebuild) — planned adapters; the four above cover the maintained baselines."""
    if name not in REGISTRY:
        raise ValueError(
            f"unknown baseline {name!r}; available: {sorted(REGISTRY)} "
            "(radialog/llavamed need their upstream repos)"
        )
    cls = REGISTRY[name]
    return cls(model_path, **kw) if model_path else cls(**kw)
