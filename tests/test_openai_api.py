"""OpenAI-compatible chat endpoint (serve/openai_api.py + batch_worker glue):
message->prompt conversion, SSE delta framing, and a live HTTP round-trip
(blocking + streaming) against the tiny worker."""

import base64
import io
import json

import numpy as np
import jax
import pytest

from radvlm_tpu import config as cfglib
from radvlm_tpu.data.chat import QWEN_CHATML
from radvlm_tpu.models import radvlm
from radvlm_tpu.serve import openai_api as oai


def test_messages_to_request_text_and_images():
    png_b64 = base64.b64encode(b"fakepng").decode()
    body = {
        "messages": [
            {"role": "system", "content": "Be brief."},
            {"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{png_b64}"}},
                {"type": "text", "text": "Describe the scan."},
            ]},
        ],
        "max_tokens": 32,
        "temperature": 0.5,
        "stop": ["###"],
    }
    req = oai.messages_to_request(body, QWEN_CHATML)
    assert req["images"] == [png_b64]
    assert req["max_new_tokens"] == 32
    assert req["temperature"] == 0.5
    assert req["stop"] == "###"
    assert "<image>\nDescribe the scan." in req["prompt"]
    assert req["prompt"].startswith("<|im_start|>system\nBe brief.")
    assert req["prompt"].endswith("<|im_start|>assistant\n")


def test_messages_to_request_rejects_bad_input():
    with pytest.raises(ValueError, match="last message"):
        oai.messages_to_request({"messages": [
            {"role": "assistant", "content": "hi"}]})
    with pytest.raises(ValueError, match="data: image URLs"):
        oai.messages_to_request({"messages": [{
            "role": "user",
            "content": [{"type": "image_url",
                         "image_url": {"url": "https://x/y.png"}}],
        }]})
    with pytest.raises(ValueError, match="unsupported role"):
        oai.messages_to_request({"messages": [
            {"role": "tool", "content": "x"},
            {"role": "user", "content": "q"}]})


def test_sse_stream_emits_deltas():
    chunks = iter([
        {"text": "he", "error_code": 0},
        {"text": "hello", "error_code": 0},
        {"text": "hello!", "error_code": 0},
    ])
    frames = list(oai.sse_stream("m", chunks, "chatcmpl-x", 1))
    assert frames[-1] == b"data: [DONE]\n\n"
    payloads = [
        json.loads(f.decode()[len("data: "):]) for f in frames[:-1]
    ]
    deltas = [p["choices"][0]["delta"] for p in payloads]
    assert deltas[0] == {"role": "assistant"}
    contents = [d.get("content", "") for d in deltas[1:]]
    assert "".join(contents) == "hello!"
    assert payloads[-1]["choices"][0]["finish_reason"] == "stop"


@pytest.mark.slow
def test_chat_completions_http_round_trip():
    import requests
    from PIL import Image

    from radvlm_tpu.eval.harness import VLMRunner
    from radvlm_tpu.serve.batch_worker import BatchWorker

    class Tok:
        eos_token_ids = ()
        pad_token_id = 0

        def encode(self, text):
            return [2 + b for b in text.encode()][:48]

        def decode(self, ids):
            return "".join(chr(97 + i % 26) for i in ids)

    cfg = cfglib.tiny_test_config(vocab_size=300)
    params = radvlm.init_params(cfg, jax.random.key(0))
    runner = VLMRunner(
        params=params, cfg=cfg, tokenizer=Tok(),
        max_new_tokens=8, batch_size=2, pad_to_multiple=8, attn_impl="xla",
    )
    worker = BatchWorker(
        runner, model_names=["radvlm-tiny"], num_slots=2, max_len=384,
        prompt_bucket=128,
    )
    port = worker.serve_forever(host="127.0.0.1", port=0, background=True)
    addr = f"http://127.0.0.1:{port}"

    models = requests.get(addr + "/v1/models", timeout=30).json()
    assert models["data"][0]["id"] == "radvlm-tiny"

    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(buf, format="PNG")
    body = {
        "model": "radvlm-tiny",
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {
                "url": "data:image/png;base64,"
                       + base64.b64encode(buf.getvalue()).decode()}},
            {"type": "text", "text": "Report?"},
        ]}],
        "max_tokens": 8,
    }
    r = requests.post(addr + "/v1/chat/completions", json=body, timeout=300)
    assert r.status_code == 200
    out = r.json()
    assert out["object"] == "chat.completion"
    content = out["choices"][0]["message"]["content"]
    assert isinstance(content, str) and len(content) == 8

    r = requests.post(addr + "/v1/chat/completions",
                      json={**body, "stream": True}, stream=True, timeout=300)
    events = [ln for ln in r.content.decode().split("\n\n") if ln.strip()]
    assert events[-1] == "data: [DONE]"
    payloads = [json.loads(e[len("data: "):]) for e in events[:-1]]
    streamed = "".join(
        p["choices"][0]["delta"].get("content", "") for p in payloads
    )
    assert streamed == content  # greedy: stream matches the blocking result

    # malformed body -> 400 invalid_request_error
    r = requests.post(addr + "/v1/chat/completions",
                      json={"messages": [{"role": "assistant",
                                          "content": "x"}]}, timeout=30)
    assert r.status_code == 400
    assert r.json()["error"]["type"] == "invalid_request_error"

    # unknown model -> 404 model_not_found (omitting model still serves the
    # worker's single model, matching the reference worker's direct door)
    r = requests.post(addr + "/v1/chat/completions",
                      json={**body, "model": "nope"}, timeout=30)
    assert r.status_code == 404
    assert r.json()["error"]["code"] == "model_not_found"

    # controller as OpenAI gateway: /v1 requests dispatch to the worker
    from radvlm_tpu.serve.controller import Controller

    ctrl = Controller(host="127.0.0.1", port=0)
    ctrl.serve_forever(background=True)
    caddr = f"http://127.0.0.1:{ctrl.port}"
    requests.post(caddr + "/register_worker", json={
        "worker_name": addr, "model_names": ["radvlm-tiny"],
    }, timeout=30)
    models = requests.get(caddr + "/v1/models", timeout=30).json()
    assert [m["id"] for m in models["data"]] == ["radvlm-tiny"]
    r = requests.post(caddr + "/v1/chat/completions", json=body, timeout=300)
    assert r.status_code == 200
    assert r.json()["choices"][0]["message"]["content"] == content
    r = requests.post(caddr + "/v1/chat/completions",
                      json={**body, "stream": True}, stream=True, timeout=300)
    assert r.content.decode().rstrip().endswith("data: [DONE]")
    r = requests.post(caddr + "/v1/chat/completions",
                      json={**body, "model": "nope"}, timeout=30)
    assert r.status_code == 503
    ctrl.shutdown()
    worker.shutdown()
