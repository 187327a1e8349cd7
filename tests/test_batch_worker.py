"""Batch worker: concurrent HTTP requests share the continuous batcher."""

import base64
import io
import json
import threading

import numpy as np
import jax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.eval.harness import VLMRunner
from radvlm_tpu.models import radvlm
from radvlm_tpu.serve.batch_worker import BatchWorker


class ByteTokenizer:
    eos_token_ids = (1,)
    pad_token_id = 0

    def encode(self, text):
        return [2 + b for b in text.encode()][:32]

    def decode(self, ids):
        return bytes(min(255, i - 2) for i in ids if i >= 2).decode(errors="ignore")


def test_concurrent_requests():
    from PIL import Image
    import requests

    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=ByteTokenizer(),
        max_new_tokens=4, batch_size=2, pad_to_multiple=8, attn_impl="xla",
    )
    worker = BatchWorker(
        runner, model_names=["tiny"], num_slots=2, max_len=256,
        prompt_bucket=128,
    )
    port = worker.serve_forever(host="127.0.0.1", port=0, background=True)
    addr = f"http://127.0.0.1:{port}"

    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = {
        "prompt": "<|im_start|>user\n<image>\nQ<|im_end|>\n<|im_start|>assistant\n",
        "images": [base64.b64encode(buf.getvalue()).decode()],
        "max_new_tokens": 4,
    }

    results = []
    def call(i):
        r = requests.post(addr + "/worker_generate",
                          json={**payload, "prompt": payload["prompt"] + "x" * i},
                          timeout=300)
        results.append(r.json())

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    assert all(r["error_code"] == 0 for r in results)
    status = requests.post(addr + "/worker_get_status", json={}, timeout=30).json()
    assert status["model_names"] == ["tiny"]
    worker.shutdown()


def test_streaming_chunks_match_blocking_result():
    """/worker_generate_stream yields \\0-framed cumulative-text chunks whose
    final text equals the blocking /worker_generate result (greedy), with the
    prefixes strictly growing."""
    from PIL import Image
    import requests

    class StreamTok(ByteTokenizer):
        eos_token_ids = ()  # decode all 8 tokens regardless of weights

        def decode(self, ids):
            return "".join(chr(97 + i % 26) for i in ids)

    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=StreamTok(),
        max_new_tokens=8, batch_size=2, pad_to_multiple=8, attn_impl="xla",
    )
    # the anyres-tiled 64px image pads the prompt past the 128 bucket to 256;
    # max_len must leave >= 8 tokens of cache headroom past that pad (the
    # engine clamps max_new_tokens to the cache fit)
    worker = BatchWorker(
        runner, model_names=["tiny"], num_slots=2, max_len=384,
        prompt_bucket=128,
    )
    port = worker.serve_forever(host="127.0.0.1", port=0, background=True)
    addr = f"http://127.0.0.1:{port}"

    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = {
        "prompt": "<|im_start|>user\n<image>\nQ<|im_end|>\n<|im_start|>assistant\n",
        "images": [base64.b64encode(buf.getvalue()).decode()],
        "max_new_tokens": 8,
    }
    blocking = requests.post(
        addr + "/worker_generate", json=payload, timeout=300
    ).json()
    assert blocking["error_code"] == 0

    r = requests.post(addr + "/worker_generate_stream", json=payload,
                      stream=True, timeout=300)
    chunks = [
        json.loads(c) for c in r.content.split(b"\0") if c
    ]
    assert all(c["error_code"] == 0 for c in chunks)
    texts = [c["text"] for c in chunks]
    assert texts[-1] == blocking["text"] and len(texts[-1]) == 8
    for a, b in zip(texts, texts[1:]):
        assert b.startswith(a) and len(b) > len(a)
    # one cumulative chunk per DRAINED BURST (consumer-paced: between 1 chunk,
    # if all 8 tokens were queued before the first read, and 8)
    assert 1 <= len(chunks) <= 8
    worker.shutdown()


def test_stream_cancellation_frees_slot():
    """A stream whose consumer stops early (stop string) must not leak the
    slot: subsequent requests still complete."""
    class NoEosTok(ByteTokenizer):
        eos_token_ids = ()  # no natural stop: only the cancel ends the stream

    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=NoEosTok(),
        max_new_tokens=64, batch_size=1, pad_to_multiple=8, attn_impl="xla",
    )
    worker = BatchWorker(
        runner, model_names=["tiny"], num_slots=1, max_len=256,
        prompt_bucket=64,
    )
    req = worker._submit({"prompt": "hi", "max_new_tokens": 64}, stream=True)
    t = req.stream_q.get(timeout=120)  # first token: the slot is active
    assert isinstance(t, int)
    req.cancelled = True  # what generate_stream does when a stop string fires
    while True:  # the ENGINE thread frees the slot and sends the sentinel
        t = req.stream_q.get(timeout=120)
        if t is None:
            break
    # at most (pipeline_depth+1) in-flight chunks drained past the cancel
    assert req.done and len(req.emitted) < 64
    # the single slot is free again: a follow-up request completes
    out = worker.generate({"prompt": "hello again", "max_new_tokens": 2})
    assert out["error_code"] == 0
    worker.shutdown()


def test_heartbeat_keeps_registration_alive(monkeypatch):
    """Found by driving the live stack: a register-once batch worker expires
    after HEARTBEAT_EXPIRATION on the controller and every proxied request
    503s. The worker must heartbeat (and re-register when the controller
    forgot it)."""
    import time

    from radvlm_tpu.serve import worker as worker_mod
    from radvlm_tpu.serve.controller import Registry

    monkeypatch.setattr(worker_mod, "HEARTBEAT_INTERVAL", 0.05)

    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=ByteTokenizer(),
        max_new_tokens=2, batch_size=2, pad_to_multiple=8, attn_impl="xla",
    )

    registry = Registry()
    beats = []

    class FakeResp:
        def json(self):
            return {"exist": True}

    def fake_post(url, json=None, timeout=None):
        if url.endswith("/receive_heart_beat"):
            beats.append(json["worker_name"])
            registry.heartbeat(json["worker_name"], json["queue_length"])
        elif url.endswith("/register_worker"):
            registry.register(
                json["worker_name"], json["model_names"],
                speed=json.get("speed", 1.0),
                queue_length=json.get("queue_length", 0),
            )
        return FakeResp()

    import requests as requests_mod

    monkeypatch.setattr(requests_mod, "post", fake_post)

    w = BatchWorker(
        runner, model_names=["tiny"], num_slots=2, max_len=256,
        prompt_bucket=64,
        controller_address="http://fake", worker_address="http://w1",
    )
    try:
        port = w.serve_forever(port=0, background=True)
        assert port
        deadline = time.time() + 5
        while len(beats) < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert len(beats) >= 2, "worker never heartbeat"
        assert registry.get_worker_address("tiny") == "http://w1"
    finally:
        w.shutdown()


def test_engine_error_fails_queued_requests_loudly():
    """On an engine error the worker must error EVERY waiter — including
    requests still sitting in the batcher queue (never filled into a slot).
    A drained-but-silent waiter would present empty text as success
    (ADVICE r2 / VERDICT r3 item 9)."""
    from PIL import Image
    import requests

    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=ByteTokenizer(),
        max_new_tokens=4, batch_size=2, pad_to_multiple=8, attn_impl="xla",
    )
    # num_slots=1: with >1 concurrent requests at least one stays QUEUED
    worker = BatchWorker(
        runner, model_names=["tiny"], num_slots=1, max_len=256,
        prompt_bucket=128,
    )
    # Engine loop raises on every run() entry: nothing ever decodes.
    def boom():
        raise RuntimeError("injected engine crash")
        yield  # pragma: no cover  (generator shape like the real run())

    worker.batcher.run = boom
    port = worker.serve_forever(host="127.0.0.1", port=0, background=True)
    addr = f"http://127.0.0.1:{port}"

    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = {
        "prompt": "<|im_start|>user\n<image>\nQ<|im_end|>\n<|im_start|>assistant\n",
        "images": [base64.b64encode(buf.getvalue()).decode()],
        "max_new_tokens": 4,
    }
    results = []

    def call(i):
        r = requests.post(
            addr + "/worker_generate",
            json={**payload, "prompt": payload["prompt"] + "x" * i},
            timeout=60,
        )
        results.append(r.json())

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 3
    for r in results:
        assert r["error_code"] != 0, r  # loud failure, never silent-empty
        assert "engine" in r["text"] or "error" in r["text"].lower(), r
    worker.shutdown()
