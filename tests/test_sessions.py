"""Worker-side multi-turn KV reuse: session_id requests resume the previous
turn's KV (delta prefill) and the reply text is identical to a stateless
full-prefill run (serve/sessions.py + batch_worker wiring)."""

import base64
import io
import json

import numpy as np
import jax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.config import IMAGE_TOKEN_INDEX
from radvlm_tpu.eval.harness import VLMRunner
from radvlm_tpu.models import radvlm
from radvlm_tpu.serve.batch_worker import BatchWorker
from radvlm_tpu.serve.sessions import Session, SessionStore, split_delta


class ReversibleTok:
    """decode/encode are exact inverses over the whole vocab (private-use
    chars), so a turn-2 prompt containing the decoded turn-1 reply
    retokenizes to exactly the emitted ids — the session prefix match hits."""

    eos_token_ids = ()
    pad_token_id = 0

    def encode(self, text):
        out = []
        for c in text:
            o = ord(c)
            out.append(o - 0xE000 if 0xE000 <= o < 0xE000 + 300 else 2 + o % 200)
        return out

    def decode(self, ids):
        return "".join(chr(0xE000 + int(i)) for i in ids)


def _png_b64(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def worker():
    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=ReversibleTok(),
        max_new_tokens=4, batch_size=2, pad_to_multiple=8, attn_impl="xla",
    )
    w = BatchWorker(
        runner, model_names=["tiny"], num_slots=2, max_len=512,
        prompt_bucket=128,
    )
    port = w.serve_forever(host="127.0.0.1", port=0, background=True)
    yield w, f"http://127.0.0.1:{port}"
    w.shutdown()


def _gen(addr, payload):
    import requests

    r = requests.post(addr + "/worker_generate", json=payload, timeout=300)
    return r.json()


def test_session_resume_matches_stateless(worker):
    w, addr = worker
    assert w._sessions is not None
    img = _png_b64(np.full((64, 48, 3), 37, np.uint8))
    p1 = "<image>\nQ1"
    r1 = _gen(addr, {"prompt": p1, "images": [img], "max_new_tokens": 3,
                     "session_id": "sess-a"})
    assert r1["error_code"] == 0 and r1["text"]
    assert w.batcher.resume_fills == 0
    assert len(w._sessions) == 1

    # turn 2 extends the stored conversation exactly -> delta prefill
    p2 = p1 + r1["text"] + "Q2"
    r2 = _gen(addr, {"prompt": p2, "images": [img], "max_new_tokens": 3,
                     "session_id": "sess-a"})
    assert r2["error_code"] == 0
    assert w.batcher.resume_fills == 1

    # the same turn-2 conversation stateless (no session): identical text
    r2_full = _gen(addr, {"prompt": p2, "images": [img], "max_new_tokens": 3})
    assert r2["text"] == r2_full["text"]
    assert w.batcher.resume_fills == 1  # no session -> no resume

    # turn 3 keeps riding the session
    p3 = p2 + r2["text"] + "Q3"
    r3 = _gen(addr, {"prompt": p3, "images": [img], "max_new_tokens": 3,
                     "session_id": "sess-a"})
    assert r3["error_code"] == 0
    assert w.batcher.resume_fills == 2
    r3_full = _gen(addr, {"prompt": p3, "images": [img], "max_new_tokens": 3})
    assert r3["text"] == r3_full["text"]


def test_session_mismatch_falls_back(worker):
    w, addr = worker
    img = _png_b64(np.full((64, 48, 3), 99, np.uint8))
    before = w.batcher.resume_fills
    r1 = _gen(addr, {"prompt": "<image>\nA", "images": [img],
                     "max_new_tokens": 2, "session_id": "sess-b"})
    assert r1["error_code"] == 0
    # edited history (does NOT extend the stored conversation) -> full prefill
    r2 = _gen(addr, {"prompt": "<image>\nB-edited", "images": [img],
                     "max_new_tokens": 2, "session_id": "sess-b"})
    assert r2["error_code"] == 0
    assert w.batcher.resume_fills == before
    # ...and matches the stateless run
    r2_full = _gen(addr, {"prompt": "<image>\nB-edited", "images": [img],
                          "max_new_tokens": 2})
    assert r2["text"] == r2_full["text"]


def test_openai_user_field_keys_sessions(worker):
    """/v1/chat/completions `user` maps to session_id: a growing message list
    under one user resumes instead of re-prefilling."""
    import requests

    w, addr = worker
    before = w.batcher.resume_fills
    msgs = [{"role": "user", "content": "hi there"}]
    body = {"model": "tiny", "messages": msgs, "max_tokens": 3,
            "user": "oai-user-1"}
    r1 = requests.post(addr + "/v1/chat/completions", json=body,
                       timeout=300).json()
    reply = r1["choices"][0]["message"]["content"]
    msgs = msgs + [{"role": "assistant", "content": reply},
                   {"role": "user", "content": "and again"}]
    body["messages"] = msgs
    r2 = requests.post(addr + "/v1/chat/completions", json=body,
                       timeout=300).json()
    assert r2["choices"][0]["message"]["content"]
    assert w.batcher.resume_fills == before + 1


def test_session_survives_stop_string_trim(worker):
    """A client stop string trims the returned text; the stored session must
    align with the TRIMMED reply so the next turn still resumes."""
    w, addr = worker
    img = _png_b64(np.full((48, 48, 3), 7, np.uint8))
    p1 = "<image>\nS1"
    r1 = _gen(addr, {"prompt": p1, "images": [img], "max_new_tokens": 4,
                     "session_id": "sess-stop"})
    assert r1["error_code"] == 0 and len(r1["text"]) == 4
    # re-run trimming at a later reply char (one that does not also appear
    # earlier, so the trim point is deterministic): the worker must store
    # only the tokens the client saw
    stop_char = next(
        (c for c in r1["text"][2:] if c not in r1["text"][:2]), None
    )
    if stop_char is None:
        pytest.skip("degenerate greedy output: every char repeats")
    cut = r1["text"].index(stop_char)
    w._sessions.drop("sess-stop")
    r1b = _gen(addr, {"prompt": p1, "images": [img], "max_new_tokens": 4,
                      "session_id": "sess-stop", "stop": stop_char})
    assert r1b["error_code"] == 0
    assert r1b["text"] == r1["text"][:cut]
    before = w.batcher.resume_fills
    p2 = p1 + r1b["text"] + "S2"
    r2 = _gen(addr, {"prompt": p2, "images": [img], "max_new_tokens": 3,
                     "session_id": "sess-stop"})
    assert r2["error_code"] == 0
    assert w.batcher.resume_fills == before + 1
    r2_full = _gen(addr, {"prompt": p2, "images": [img], "max_new_tokens": 3})
    assert r2["text"] == r2_full["text"]


def test_store_lru_eviction():
    store = SessionStore(cap=2)
    for i in range(3):
        store.put(f"s{i}", Session(ids=[i], img_hashes=[], snapshot=None))
    assert len(store) == 2
    assert store.get("s0") is None  # LRU evicted
    assert store.get("s2") is not None


def test_split_delta_contracts():
    ent = Session(ids=[5, IMAGE_TOKEN_INDEX, 7, 9], img_hashes=["h1"],
                  snapshot=None)
    # exact extension, no new image
    assert split_delta(ent, [5, IMAGE_TOKEN_INDEX, 7, 9, 11, 12], ["h1"]) == (
        [11, 12], 1)
    # new image in the delta
    d = split_delta(
        ent, [5, IMAGE_TOKEN_INDEX, 7, 9, IMAGE_TOKEN_INDEX, 12],
        ["h1", "h2"],
    )
    assert d == ([IMAGE_TOKEN_INDEX, 12], 1)
    # not an extension / changed prefix / changed image / missing image
    assert split_delta(ent, [5, IMAGE_TOKEN_INDEX, 7], ["h1"]) is None
    assert split_delta(ent, [5, IMAGE_TOKEN_INDEX, 8, 9, 11], ["h1"]) is None
    assert split_delta(ent, [5, IMAGE_TOKEN_INDEX, 7, 9, 11], ["hX"]) is None
    assert split_delta(
        ent, [5, IMAGE_TOKEN_INDEX, 7, 9, 11], ["h1", "h2"]
    ) is None
