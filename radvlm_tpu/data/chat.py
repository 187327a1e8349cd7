"""Chat templating + supervised-masking tokenization.

Rebuild of the reference's conversation machinery:
- `finetuning/llava/conversation.py` (~25 named templates, 9 separator styles) —
  RadVLM only ever uses the Qwen chatml template ("qwen_1_5",
  `conversation.py:555-581`) plus a plain template for pretraining, so this module
  implements a small declarative `ChatTemplate` with those two (plus llama3-style as
  a pattern example) instead of a 585-line class zoo;
- `preprocess_qwen` supervised masking (`finetuning/llava/train/train.py:560-633`):
  every token of system/user turns is masked to IGNORE_INDEX, assistant turns are
  supervised including their <|im_end|> terminator.

Tokenization is pluggable (`tokenize_fn: str -> List[int]`) so the same code runs
with the HF Qwen2 tokenizer in production and a fake in tests. <image> markers are
preserved as IMAGE_TOKEN_INDEX sentinels via `multimodal.tokenize_with_images`
(contract of `mm_utils.py:341-360`).

Masking is computed per-chunk (each turn rendered and tokenized separately), which
is exact for chatml because turn boundaries are literal `<|im_start|>`/`<|im_end|>`
token sequences — no cross-turn merges (the reference asserts the same property,
`train.py:619`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from radvlm_tpu.config import IGNORE_INDEX
from radvlm_tpu.models.multimodal import tokenize_with_images

TokenizeFn = Callable[[str], List[int]]


@dataclasses.dataclass(frozen=True)
class ChatTemplate:
    """Declarative chat template: how a (system, turns) conversation renders."""

    name: str
    system_fmt: str  # format with {system}
    user_fmt: str  # format with {content}
    assistant_fmt: str  # format with {content}
    assistant_prefix: str  # generation prompt (open assistant turn)
    stop_strings: Tuple[str, ...]
    default_system: str = ""

    def render(
        self,
        turns: Sequence[Tuple[str, str]],
        *,
        system: Optional[str] = None,
        add_generation_prompt: bool = False,
    ) -> str:
        """turns: [(role, content)] with role in {"user", "assistant"}."""
        out = []
        sys_txt = self.default_system if system is None else system
        if sys_txt:
            out.append(self.system_fmt.format(system=sys_txt))
        for role, content in turns:
            if role == "user":
                out.append(self.user_fmt.format(content=content))
            elif role == "assistant":
                out.append(self.assistant_fmt.format(content=content))
            else:
                raise ValueError(f"unknown role {role!r}")
        if add_generation_prompt:
            out.append(self.assistant_prefix)
        return "".join(out)


QWEN_CHATML = ChatTemplate(
    name="qwen_1_5",
    system_fmt="<|im_start|>system\n{system}<|im_end|>\n",
    user_fmt="<|im_start|>user\n{content}<|im_end|>\n",
    assistant_fmt="<|im_start|>assistant\n{content}<|im_end|>\n",
    assistant_prefix="<|im_start|>assistant\n",
    stop_strings=("<|im_end|>",),
    default_system="You are a helpful assistant.",
)

PLAIN = ChatTemplate(
    name="plain",
    system_fmt="",
    user_fmt="{content}",
    assistant_fmt="{content}\n",
    assistant_prefix="",
    stop_strings=("\n",),
    default_system="",
)

LLAMA3 = ChatTemplate(
    name="llama_3",
    system_fmt="<|start_header_id|>system<|end_header_id|>\n\n{system}<|eot_id|>",
    user_fmt="<|start_header_id|>user<|end_header_id|>\n\n{content}<|eot_id|>",
    assistant_fmt=(
        "<|start_header_id|>assistant<|end_header_id|>\n\n{content}<|eot_id|>"
    ),
    assistant_prefix="<|start_header_id|>assistant<|end_header_id|>\n\n",
    stop_strings=("<|eot_id|>",),
    default_system="You are a helpful assistant.",
)

TEMPLATES: Dict[str, ChatTemplate] = {
    t.name: t for t in (QWEN_CHATML, PLAIN, LLAMA3)
}


def tokenize_chat_supervised(
    tokenize_fn: TokenizeFn,
    turns: Sequence[Tuple[str, str]],
    *,
    template: ChatTemplate = QWEN_CHATML,
    system: Optional[str] = None,
) -> Tuple[List[int], List[int]]:
    """Render + tokenize a training conversation with supervised masking.

    Returns (token_ids, labels): token_ids contain IMAGE_TOKEN_INDEX sentinels at
    <image> positions; labels equal token_ids on assistant-turn tokens and
    IGNORE_INDEX elsewhere (image sentinels always IGNORE) — the `preprocess_qwen`
    contract (`train.py:560-633`).
    """
    ids: List[int] = []
    labels: List[int] = []

    def add(text: str, supervised: bool):
        chunk = tokenize_with_images(tokenize_fn, text)
        ids.extend(chunk)
        for t in chunk:
            labels.append(t if supervised and t >= 0 else IGNORE_INDEX)

    sys_txt = template.default_system if system is None else system
    if sys_txt:
        add(template.system_fmt.format(system=sys_txt), False)
    for role, content in turns:
        if role == "user":
            add(template.user_fmt.format(content=content), False)
        elif role == "assistant":
            # The assistant prefix tokens are prompt, the content + terminator are
            # supervised.
            fmt = template.assistant_fmt.format(content=content)
            if fmt.startswith(template.assistant_prefix):
                add(template.assistant_prefix, False)
                add(fmt[len(template.assistant_prefix):], True)
            else:
                add(fmt, True)
        else:
            raise ValueError(f"unknown role {role!r}")
    return ids, labels


def render_generation_prompt(
    turns: Sequence[Tuple[str, str]],
    *,
    template: ChatTemplate = QWEN_CHATML,
    system: Optional[str] = None,
) -> str:
    """Inference-side prompt: history + open assistant turn."""
    return template.render(turns, system=system, add_generation_prompt=True)


def llava_turns(conversations: Sequence[Dict[str, str]]) -> List[Tuple[str, str]]:
    """LLaVA-json `conversations` cells ({"from": "human"|"gpt", "value": ...})
    -> (role, content) turns (exporter contract, `create_instructions.py:29-71`)."""
    role_map = {"human": "user", "gpt": "assistant"}
    return [(role_map[c["from"]], c["value"]) for c in conversations]
