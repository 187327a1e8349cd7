"""Serving tests: registry dispatch logic + a real HTTP round trip
(controller -> worker -> streamed tokens) with the tiny model.

The reference's only check here was a manual smoke script
(`serve/test_message.py`); this makes the round trip an automated test.
"""

import base64
import io
import json
import threading
import time

import numpy as np
import jax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.eval.harness import VLMRunner
from radvlm_tpu.models import radvlm
from radvlm_tpu.serve.controller import Controller, Registry
from radvlm_tpu.serve.worker import ModelWorker


class ByteTokenizer:
    eos_token_ids = (1,)
    pad_token_id = 0

    def encode(self, text):
        return [2 + b for b in text.encode()][:48]

    def decode(self, ids):
        return bytes(min(255, i - 2) for i in ids if i >= 2).decode(errors="ignore")


def test_registry_dispatch():
    r = Registry("shortest_queue")
    r.register("http://w1", ["m"], speed=1.0, queue_length=5)
    r.register("http://w2", ["m"], speed=1.0, queue_length=0)
    assert r.get_worker_address("m") == "http://w2"
    # w2's queue was bumped; repeated picks alternate once loads equalize
    assert r.list_models() == ["m"]
    assert r.get_worker_address("other") == ""

    lot = Registry("lottery")
    lot.register("http://a", ["m"], speed=0.0)
    lot.register("http://b", ["m"], speed=3.0)
    rng = np.random.default_rng(0)
    picks = {lot.get_worker_address("m", rng=rng) for _ in range(10)}
    assert picks == {"http://b"}  # zero-speed worker never picked


def test_registry_heartbeat_expiry():
    r = Registry()
    r.register("http://w1", ["m"])
    assert r.heartbeat("http://w1", 3)
    assert not r.heartbeat("http://nope", 0)
    assert r.expire_stale(now=time.time() + 1000) == ["http://w1"]
    assert r.list_models() == []


@pytest.mark.slow
def test_http_round_trip():
    from PIL import Image

    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=ByteTokenizer(),
        max_new_tokens=6, batch_size=1, pad_to_multiple=8, attn_impl="xla",
    )
    worker = ModelWorker(runner, model_names=["tiny"], controller_address=None)
    wport = worker.serve_forever(host="127.0.0.1", port=0, background=True)

    controller = Controller(host="127.0.0.1", port=0)
    controller.serve_forever(background=True)
    cport = controller.port

    import requests

    caddr = f"http://127.0.0.1:{cport}"
    requests.post(caddr + "/register_worker", json={
        "worker_name": f"http://127.0.0.1:{wport}",
        "model_names": ["tiny"],
    }, timeout=10)
    models = requests.post(caddr + "/list_models", json={}, timeout=10).json()
    assert models["models"] == ["tiny"]

    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = {
        "model": "tiny",
        "prompt": "<|im_start|>user\n<image>\nDescribe.<|im_end|>\n"
                  "<|im_start|>assistant\n",
        "images": [base64.b64encode(buf.getvalue()).decode()],
        "max_new_tokens": 6,
    }
    chunks = []
    with requests.post(caddr + "/worker_generate_stream", json=payload,
                       stream=True, timeout=300) as r:
        assert r.status_code == 200
        b = b""
        for chunk in r.iter_content(chunk_size=None):
            b += chunk
        for msg in b.split(b"\0"):
            if msg:
                chunks.append(json.loads(msg))
    assert chunks, "no chunks streamed"
    assert all(c["error_code"] == 0 for c in chunks)
    # Cumulative text grows monotonically.
    for a, bb in zip(chunks, chunks[1:]):
        assert bb["text"].startswith(a["text"])
    worker.shutdown()
    controller.shutdown()
