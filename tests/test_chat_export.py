"""Chat templating / supervised masking / exporter tests."""

import json

import numpy as np
import pytest

from radvlm_tpu.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from radvlm_tpu.data import export
from radvlm_tpu.data.chat import (
    GEMMA,
    LLAMA2,
    MISTRAL_INSTRUCT,
    MPT,
    QWEN_CHATML,
    TEMPLATES,
    VICUNA_V1,
    llava_turns,
    render_generation_prompt,
    tokenize_chat_supervised,
)


def fake_tokenize(s):
    # Deterministic, loss-free byte tokenizer (ids offset to dodge specials).
    return [256 + b for b in s.encode()]


def fake_detokenize(ids):
    return bytes(i - 256 for i in ids).decode()


def test_chatml_render():
    txt = render_generation_prompt(
        [("user", "<image>\nDescribe this X-ray.")],
    )
    assert txt == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\n<image>\nDescribe this X-ray.<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_supervised_masking_roundtrip():
    turns = [
        ("user", "<image>\nWhat do you see?"),
        ("assistant", "Cardiomegaly."),
        ("user", "Where?"),
        ("assistant", "At [0.30, 0.40, 0.70, 0.80]."),
    ]
    ids, labels = tokenize_chat_supervised(fake_tokenize, turns)
    assert len(ids) == len(labels)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    # Image sentinel is never supervised.
    assert labels[ids.index(IMAGE_TOKEN_INDEX)] == IGNORE_INDEX
    # The supervised tokens decode to exactly the assistant contents + <|im_end|>\n.
    sup = [t for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    text = fake_detokenize(sup)
    assert text == (
        "Cardiomegaly.<|im_end|>\n"
        "At [0.30, 0.40, 0.70, 0.80].<|im_end|>\n"
    )
    # Prompt regions (system/user/assistant-prefix) are all masked.
    unsup = [t for t, l in zip(ids, labels) if l == IGNORE_INDEX and t >= 0]
    assert "What do you see?" in fake_detokenize(unsup)
    # And supervised labels equal their token ids.
    assert all(l == t for t, l in zip(ids, labels) if l != IGNORE_INDEX)


def test_vicuna_v1_render():
    """SeparatorStyle.TWO (`conversation.py:74-83`): '{system} ' then
    'USER: {m} ' / 'ASSISTANT: {m}</s>'; open turn renders 'ASSISTANT:'."""
    turns = [("user", "Hi"), ("assistant", "Hello"), ("user", "Next")]
    txt = render_generation_prompt(turns, template=VICUNA_V1)
    assert txt == (
        VICUNA_V1.default_system + " "
        "USER: Hi ASSISTANT: Hello</s>USER: Next ASSISTANT:"
    )


def test_llama2_render_folds_system_into_first_user_turn():
    """SeparatorStyle.LLAMA_2 (`conversation.py:142-162`): the system prompt
    is <<SYS>>-wrapped inside the FIRST [INST] block, assistant turns render
    ' {m} </s>', and the generation prompt ends at '[/INST]'."""
    turns = [("user", "Hi"), ("assistant", "Hello"), ("user", "Next")]
    txt = render_generation_prompt(turns, template=LLAMA2, system="Be safe.")
    assert txt == (
        "<s>[INST] <<SYS>>\nBe safe.\n<</SYS>>\n\nHi [/INST]"
        " Hello </s>"
        "<s>[INST] Next [/INST]"
    )
    # mistral_instruct: same style, no <s> separator, empty default system.
    txt = render_generation_prompt(turns[:1], template=MISTRAL_INSTRUCT)
    assert txt == "[INST] Hi [/INST]"


def test_gemma_and_mpt_render():
    turns = [("user", "Hi"), ("assistant", "Hello")]
    txt = render_generation_prompt(turns + [("user", "Next")], template=GEMMA)
    assert txt == (
        "<start_of_turn>user\nHi<end_of_turn>\n"
        "<start_of_turn>model\nHello<end_of_turn>\n"
        "<start_of_turn>user\nNext<end_of_turn>\n"
        "<start_of_turn>model\n"
    )
    txt = render_generation_prompt(turns, template=MPT)
    assert txt == (
        "<|im_start|>system\n" + MPT.default_system + "<|im_end|>"
        "<|im_start|>user\nHi<|im_end|>"
        "<|im_start|>assistant\nHello<|im_end|>"
        "<|im_start|>assistant\n"
    )


def test_template_registry_aliases():
    assert TEMPLATES["vicuna_v1"] is TEMPLATES["v1"]
    assert TEMPLATES["qwen_2"] is TEMPLATES["qwen_1_5"]
    for name in ("v1", "llama_2", "mistral_instruct", "gemma", "mpt"):
        assert name in TEMPLATES


def test_supervised_masking_new_templates():
    """Per-template masking (the preprocess_v1/llama_2/gemma/mpt dispatch,
    `train.py:904-935`): user/system text masked, assistant text supervised."""
    turns = [
        ("user", "<image>\nWhat do you see?"),
        ("assistant", "Cardiomegaly."),
    ]
    for tpl, sup_expect in [
        (VICUNA_V1, " Cardiomegaly.</s>"),
        (LLAMA2, " Cardiomegaly. </s>"),
        (MISTRAL_INSTRUCT, " Cardiomegaly. </s>"),
        (GEMMA, "Cardiomegaly.<end_of_turn>\n"),
        (MPT, "Cardiomegaly.<|im_end|>"),
    ]:
        ids, labels = tokenize_chat_supervised(fake_tokenize, turns,
                                               template=tpl)
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        assert labels[ids.index(IMAGE_TOKEN_INDEX)] == IGNORE_INDEX
        sup = fake_detokenize([t for t, l in zip(ids, labels)
                               if l != IGNORE_INDEX])
        assert sup == sup_expect, (tpl.name, sup)
        unsup = fake_detokenize([t for t, l in zip(ids, labels)
                                 if l == IGNORE_INDEX and t >= 0])
        assert "What do you see?" in unsup


def test_llava_turns():
    conv = [
        {"from": "human", "value": "<image>\nQ1"},
        {"from": "gpt", "value": "A1"},
    ]
    assert llava_turns(conv) == [("user", "<image>\nQ1"), ("assistant", "A1")]


def test_llava_cell_and_export(tmp_path):
    class FakeDS:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {
                "img_path": f"/data/mimic/files/img{i}.jpg",
                "instr": {"question": f"Q{i}", "answer": f"A{i}"},
            }

    entries = [export.MixtureEntry(FakeDS(), "mimic", repeats=2, max_samples=2)]
    cells = export.export_dataset(entries, data_root="/data")
    assert len(cells) == 4  # 2 samples x 2 repeats
    c = cells[0]
    assert c["image"] == "mimic/files/img0.jpg"
    assert c["conversations"][0]["value"] == "<image>\nQ0"
    assert c["conversations"][1] == {"from": "gpt", "value": "A0"}
    assert cells[2]["id"] == "mimic_0_rep1"

    out = tmp_path / "out" / "all_train.json"
    export.write_json(cells, str(out))
    assert len(json.load(open(out))) == 4


def test_conversation_cell_passthrough():
    sample = {
        "img_path": "/x/i.jpg",
        "conversation": [
            {"from": "human", "value": "hi"},
            {"from": "gpt", "value": "hello"},
        ],
    }
    c = export.llava_cell(sample, "c0")
    assert c["conversations"][0]["value"] == "<image>\nhi"
    assert c["conversations"][1]["value"] == "hello"


def test_grpo_rec_cell():
    sample = {
        "img_path": "/x/i.jpg",
        "instr": {"question": "Locate X", "answer": "ans"},
        "boxes": [[0.1234, 0.2, 0.3, 0.4]],
    }
    c = export.grpo_rec_cell(sample, "g0")
    assert json.loads(c["solution"]) == {"bbox": [[0.12, 0.2, 0.3, 0.4]]}


def test_sampling_strategies():
    items = list(range(10))
    assert export.apply_sampling_strategy(items, "first:3") == [0, 1, 2]
    assert export.apply_sampling_strategy(items, "end:2") == [8, 9]
    assert export.apply_sampling_strategy(items, "first:50%") == [0, 1, 2, 3, 4]
    r = export.apply_sampling_strategy(items, "random:4")
    assert len(r) == 4 and r == sorted(r)
    assert export.apply_sampling_strategy(items, None) == items


def test_yaml_mixture(tmp_path):
    a = [{"id": f"a{i}"} for i in range(4)]
    b = [{"id": f"b{i}"} for i in range(4)]
    (tmp_path / "a.json").write_text(json.dumps(a))
    (tmp_path / "b.json").write_text(json.dumps(b))
    recipe = tmp_path / "mix.yaml"
    recipe.write_text(
        "datasets:\n"
        f"  - json_path: {tmp_path}/a.json\n"
        "    sampling_strategy: first:2\n"
        f"  - json_path: {tmp_path}/b.json\n"
        "    sampling_strategy: all\n"
    )
    cells = export.load_mixture(str(recipe))
    assert [c["id"] for c in cells] == ["a0", "a1", "b0", "b1", "b2", "b3"]
    # brace glob
    cells2 = export.load_mixture(f"{tmp_path}/{{a,b}}.json")
    assert len(cells2) == 8


def test_ref_masking_matches_preprocess_qwen_oracle():
    """tokenize_chat_supervised(ref_masking=True) against an oracle that
    reimplements the reference's `preprocess_qwen` (train.py:560-633)
    verbatim-in-semantics: per-turn chat-template renders, system+user turns
    masked, assistant turns fully supervised (role prefix included),
    structural ids ("\\n", <|im_start|>, <|im_end|>) unmasked everywhere,
    <image> replaced by the sentinel with label untouched (IGNORE in masked
    turns)."""
    SPECIALS = {"<|im_start|>": 1, "<|im_end|>": 2, "<image>": 3}

    def tok(s):
        # ChatML-style tokenizer: specials are single ids, else bytes.
        out = []
        i = 0
        while i < len(s):
            for sp, tid in SPECIALS.items():
                if s.startswith(sp, i):
                    out.append(tid)
                    i += len(sp)
                    break
            else:
                out.append(256 + ord(s[i]))
                i += 1
        return out

    def oracle(source, system_message="You are a helpful assistant."):
        # preprocess_qwen semantics on the same tokenizer.
        im_start, im_end = SPECIALS["<|im_start|>"], SPECIALS["<|im_end|>"]
        image_token = SPECIALS["<image>"]
        nl = tok("\n")[0]
        unmask = [nl, im_start, im_end]
        render = lambda role, content: tok(
            f"<|im_start|>{role}\n{content}<|im_end|>\n"
        )
        input_id, target = [], []
        enc = render("system", system_message)
        input_id += enc
        target += [IGNORE_INDEX] * len(enc)
        for role, content in source:
            enc = render(role, content)
            input_id += enc
            if role in ("user", "system"):
                target += [IGNORE_INDEX] * len(enc)
            else:
                target += enc
        for idx, t in enumerate(input_id):
            if t in unmask:
                target[idx] = t
            if t == image_token:
                input_id[idx] = IMAGE_TOKEN_INDEX
        return input_id, target

    turns = [
        ("user", "<image>\nWhat do you see?"),
        ("assistant", "Cardiomegaly.\nNo effusion."),
        ("user", "Where?"),
        ("assistant", "At [0.30, 0.40, 0.70, 0.80]."),
    ]
    # Our tokenize_fn sees text WITHOUT <image> (tokenize_with_images splits
    # on it), so the plain byte/special tokenizer above works for both paths.
    ids, labels = tokenize_chat_supervised(tok, turns, ref_masking=True)
    oids, olabels = oracle(turns)
    assert ids == oids
    assert labels == olabels
    # The quirks are actually exercised: assistant prefix supervised,
    # user-turn newlines unmasked.
    sup_text_ids = [t for t, l in zip(ids, labels) if l != IGNORE_INDEX]
    assert SPECIALS["<|im_start|>"] in sup_text_ids
    assert labels[ids.index(IMAGE_TOKEN_INDEX)] == IGNORE_INDEX
