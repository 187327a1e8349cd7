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
