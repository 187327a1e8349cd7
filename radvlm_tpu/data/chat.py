"""Chat templating + supervised-masking tokenization.

Rebuild of the reference's conversation machinery:
- `finetuning/llava/conversation.py` (~25 named templates, 9 separator styles) —
  RadVLM only ever uses the Qwen chatml template ("qwen_1_5",
  `conversation.py:555-581`) plus a plain template for pretraining; this module
  implements a declarative `ChatTemplate` covering every separator style the
  reference's training preprocessors dispatch on (`train.py:904-935`):
  chatml/qwen, llama_3, vicuna v1 (SeparatorStyle.TWO, `conversation.py:74-83`),
  llama_2 + mistral_instruct (SeparatorStyle.LLAMA_2 [INST] wrapping with the
  system embedded in the first user turn, `:142-162`), gemma (`:131-140`),
  mpt (`:121-129`), and plain — instead of a 585-line class zoo;
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
    # llama_2-style system handling (`conversation.py:142-162`): the system
    # prompt is not a separate turn but is wrapped and prepended to the FIRST
    # user message ("<<SYS>>\n{system}\n<</SYS>>\n\n"). When set, system_fmt
    # is never emitted.
    first_user_system_wrap: str = ""

    def _fold_system(
        self, turns: Sequence[Tuple[str, str]], system: Optional[str]
    ) -> Tuple[str, List[Tuple[str, str]]]:
        """Returns (system_prefix_text, turns) with llama_2-style folding."""
        sys_txt = self.default_system if system is None else system
        turns = list(turns)
        if self.first_user_system_wrap:
            if sys_txt:
                for i, (role, content) in enumerate(turns):
                    if role == "user":
                        turns[i] = (
                            role,
                            self.first_user_system_wrap.format(system=sys_txt)
                            + content,
                        )
                        break
            return "", turns
        if sys_txt:
            return self.system_fmt.format(system=sys_txt), turns
        return "", turns

    def render(
        self,
        turns: Sequence[Tuple[str, str]],
        *,
        system: Optional[str] = None,
        add_generation_prompt: bool = False,
    ) -> str:
        """turns: [(role, content)] with role in {"user", "assistant"}."""
        out = []
        sys_prefix, turns = self._fold_system(turns, system)
        if sys_prefix:
            out.append(sys_prefix)
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

VICUNA_V1 = ChatTemplate(
    # SeparatorStyle.TWO (`conversation.py:74-83,345-354`): "{system} " then
    # "USER: {msg} " / "ASSISTANT: {msg}</s>"; the open assistant turn renders
    # as "ASSISTANT:" (role + ":" with no trailing space).
    name="v1",
    system_fmt="{system} ",
    user_fmt="USER: {content} ",
    assistant_fmt="ASSISTANT: {content}</s>",
    assistant_prefix="ASSISTANT:",
    stop_strings=("</s>",),
    default_system=(
        "A chat between a curious user and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite answers "
        "to the user's questions."
    ),
)

LLAMA2 = ChatTemplate(
    # SeparatorStyle.LLAMA_2 (`conversation.py:142-162,356-367`):
    # "<s>[INST] <<SYS>>\n{system}\n<</SYS>>\n\n{u0} [/INST] {a0} </s>"
    # "<s>[INST] {u1} [/INST] ..." — the generation prompt ends at "[/INST]".
    name="llama_2",
    system_fmt="",
    user_fmt="<s>[INST] {content} [/INST]",
    assistant_fmt=" {content} </s>",
    assistant_prefix="",
    stop_strings=("</s>",),
    default_system=(
        "You are a helpful, respectful and honest assistant. Always answer "
        "as helpfully as possible, while being safe.  Your answers should "
        "not include any harmful, unethical, racist, sexist, toxic, "
        "dangerous, or illegal content. Please ensure that your responses "
        "are socially unbiased and positive in nature.\n\nIf a question does "
        "not make any sense, or is not factually coherent, explain why "
        "instead of answering something not correct. If you don't know the "
        "answer to a question, please don't share false information."
    ),
    first_user_system_wrap="<<SYS>>\n{system}\n<</SYS>>\n\n",
)

MISTRAL_INSTRUCT = dataclasses.replace(
    # `conversation.py:399-408`: LLAMA_2 style with sep="" (no "<s>" before
    # [INST]) and an empty system.
    LLAMA2,
    name="mistral_instruct",
    user_fmt="[INST] {content} [/INST]",
    default_system="",
)

GEMMA = ChatTemplate(
    # SeparatorStyle.GEMMA (`conversation.py:131-140,454`): no system;
    # "<start_of_turn>user\n{msg}<end_of_turn>\n" / model turns alike.
    name="gemma",
    system_fmt="",
    user_fmt="<start_of_turn>user\n{content}<end_of_turn>\n",
    assistant_fmt="<start_of_turn>model\n{content}<end_of_turn>\n",
    assistant_prefix="<start_of_turn>model\n",
    stop_strings=("<end_of_turn>",),
    default_system="",
)

MPT = ChatTemplate(
    # SeparatorStyle.MPT (`conversation.py:121-129,432-441`): chatml turns
    # with no newline after <|im_end|>.
    name="mpt",
    system_fmt="<|im_start|>system\n{system}<|im_end|>",
    user_fmt="<|im_start|>user\n{content}<|im_end|>",
    assistant_fmt="<|im_start|>assistant\n{content}<|im_end|>",
    assistant_prefix="<|im_start|>assistant\n",
    stop_strings=("<|im_end|>",),
    default_system=(
        "A conversation between a user and an LLM-based AI assistant. The "
        "assistant gives helpful and honest answers."
    ),
)

TEMPLATES: Dict[str, ChatTemplate] = {
    t.name: t
    for t in (QWEN_CHATML, PLAIN, LLAMA3, VICUNA_V1, LLAMA2,
              MISTRAL_INSTRUCT, GEMMA, MPT)
}
# Reference registry aliases (`conversation.py:555-581`).
TEMPLATES["qwen_2"] = TEMPLATES["qwen_1_5"]
TEMPLATES["vicuna_v1"] = TEMPLATES["v1"]
TEMPLATES["v0_plain"] = TEMPLATES["plain"]


def tokenize_chat_supervised(
    tokenize_fn: TokenizeFn,
    turns: Sequence[Tuple[str, str]],
    *,
    template: ChatTemplate = QWEN_CHATML,
    system: Optional[str] = None,
    ref_masking: bool = False,
) -> Tuple[List[int], List[int]]:
    """Render + tokenize a training conversation with supervised masking.

    Returns (token_ids, labels): token_ids contain IMAGE_TOKEN_INDEX sentinels at
    <image> positions; labels equal token_ids on assistant-turn tokens and
    IGNORE_INDEX elsewhere (image sentinels always IGNORE).

    The default masks the assistant role prefix ("<|im_start|>assistant\\n")
    and supervises exactly content + terminator. The reference's
    `preprocess_qwen` (`train.py:560-633`) differs in two quirks:
    it supervises the WHOLE assistant render (prefix included), and it
    unmasks structural tokens ("\\n" = id 198, <|im_start|>, <|im_end|>)
    everywhere — system and user turns included. `ref_masking=True`
    reproduces those semantics exactly (tested against an oracle
    reimplementation in tests/test_chat_export.py); it only unmasks
    structural strings that the tokenizer encodes as a SINGLE token,
    matching the id-level membership test the reference does.
    """
    ids: List[int] = []
    labels: List[int] = []

    def add(text: str, supervised: bool):
        chunk = tokenize_with_images(tokenize_fn, text)
        ids.extend(chunk)
        for t in chunk:
            labels.append(t if supervised and t >= 0 else IGNORE_INDEX)

    sys_prefix, turns = template._fold_system(turns, system)
    if sys_prefix:
        add(sys_prefix, False)
    for role, content in turns:
        if role == "user":
            add(template.user_fmt.format(content=content), False)
        elif role == "assistant":
            fmt = template.assistant_fmt.format(content=content)
            if ref_masking or not fmt.startswith(template.assistant_prefix):
                # preprocess_qwen supervises the full assistant render.
                add(fmt, True)
            else:
                # The assistant prefix tokens are prompt, the content +
                # terminator are supervised.
                add(template.assistant_prefix, False)
                add(fmt[len(template.assistant_prefix):], True)
        else:
            raise ValueError(f"unknown role {role!r}")
    if ref_masking:
        unmask = set()
        for text in ("\n", "<|im_start|>", "<|im_end|>"):
            enc = tokenize_fn(text)
            if len(enc) == 1:
                unmask.add(enc[0])
        labels = [
            t if (t >= 0 and t in unmask) else l for t, l in zip(ids, labels)
        ]
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
