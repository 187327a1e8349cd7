"""Web UI server tests: session state, chat/vote logging, regenerate,
multi-image turns (behavioral rebuild of `gradio_web_server.py` /
`gradio_multi_image.py` driven over real HTTP with a canned worker)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from radvlm_tpu.serve.controller import Controller
from radvlm_tpu.serve.web import WebApp, make_handler

requests = pytest.importorskip("requests")


class CannedWorker:
    """Streams two cumulative chunks ("Hel", "Hello") for any prompt and
    records the requests it saw."""

    def __init__(self):
        self.seen = []
        self.error_mode = False  # stream an error chunk instead of text

        worker = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                data = json.loads(self.rfile.read(n) or b"{}")
                worker.seen.append(data)
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.end_headers()
                if worker.error_mode:
                    self.wfile.write(
                        json.dumps({"text": "error: boom",
                                    "error_code": 1}).encode() + b"\0"
                    )
                    self.wfile.flush()
                    return
                for text in ("Hel", "Hello"):
                    self.wfile.write(
                        json.dumps({"text": text, "error_code": 0}).encode()
                        + b"\0"
                    )
                    self.wfile.flush()

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        threading.Thread(target=self.server.serve_forever, daemon=True).start()


@pytest.fixture()
def stack(tmp_path):
    worker = CannedWorker()
    controller = Controller(host="127.0.0.1", port=0)
    controller.serve_forever(background=True)
    caddr = f"http://127.0.0.1:{controller.port}"
    requests.post(caddr + "/register_worker", json={
        "worker_name": f"http://127.0.0.1:{worker.port}",
        "model_names": ["radvlm"],
    }, timeout=10)
    app = WebApp(caddr, log_dir=str(tmp_path / "logs"))
    web = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    wport = web.server_address[1]
    threading.Thread(target=web.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{wport}", app, worker, tmp_path
    web.shutdown()
    controller.shutdown()
    worker.server.shutdown()


def _chat(waddr, sid, text, images=(), **kw):
    body = {"session_id": sid, "model": "radvlm", "text": text,
            "images": list(images), "max_new_tokens": 8, **kw}
    with requests.post(waddr + "/api/chat", json=body, stream=True,
                       timeout=30) as r:
        assert r.status_code == 200
        raw = b"".join(r.iter_content(chunk_size=None))
    return [json.loads(m) for m in raw.split(b"\0") if m]


def test_chat_session_state_and_log(stack):
    waddr, app, worker, tmp = stack
    d = requests.post(waddr + "/api/new", json={}, timeout=10).json()
    sid = d["session_id"]
    assert d["models"] == ["radvlm"]

    chunks = _chat(waddr, sid, "Describe the X-ray.", images=["aW1n"])
    assert chunks[-1]["text"] == "Hello"

    # Server-side state holds both turns; the worker saw a chatml prompt with
    # one <image> sentinel and the uploaded image.
    sess = app.sessions.get(sid)
    assert [r for r, _ in sess.turns] == ["user", "assistant"]
    assert sess.turns[-1][1] == "Hello"
    req = worker.seen[-1]
    assert req["prompt"].count("<image>") == 1
    assert req["prompt"].rstrip().endswith("<|im_start|>assistant")
    assert req["images"] == ["aW1n"]

    # Second turn reuses history: prompt embeds the first exchange.
    _chat(waddr, sid, "Any pleural effusion?")
    req2 = worker.seen[-1]
    assert "Describe the X-ray." in req2["prompt"]
    assert "Hello" in req2["prompt"]
    assert len(worker.seen) == 2

    # Chat log: date-named JSONL with the reference record shape.
    logs = list((tmp / "logs").glob("*-conv.json"))
    assert len(logs) == 1
    records = [json.loads(l) for l in logs[0].read_text().splitlines()]
    assert [r["type"] for r in records] == ["chat", "chat"]
    rec = records[-1]
    assert rec["model"] == "radvlm"
    assert rec["state"]["messages"][-1] == ["assistant", "Hello"]
    assert len(rec["images"]) == 1 and len(rec["images"][0]) == 64  # sha256


def test_vote_and_regenerate(stack):
    waddr, app, worker, tmp = stack
    sid = requests.post(waddr + "/api/new", json={}, timeout=10).json()["session_id"]
    _chat(waddr, sid, "hi")

    for vtype in ("upvote", "downvote", "flag"):
        r = requests.post(waddr + "/api/vote", json={
            "session_id": sid, "type": vtype, "model": "radvlm"}, timeout=10)
        assert r.status_code == 200
    r = requests.post(waddr + "/api/vote", json={
        "session_id": sid, "type": "nope", "model": "radvlm"}, timeout=10)
    assert r.status_code == 400

    # Regenerate: drops the assistant turn and re-runs the same user turn.
    n_seen = len(worker.seen)
    with requests.post(waddr + "/api/regenerate", json={
            "session_id": sid, "model": "radvlm", "max_new_tokens": 8},
            stream=True, timeout=30) as r:
        assert r.status_code == 200
        b"".join(r.iter_content(chunk_size=None))
    assert len(worker.seen) == n_seen + 1
    sess = app.sessions.get(sid)
    assert [r for r, _ in sess.turns] == ["user", "assistant"]

    # Nothing to regenerate after clearing.
    requests.post(waddr + "/api/clear", json={"session_id": sid}, timeout=10)
    r = requests.post(waddr + "/api/regenerate", json={"session_id": sid},
                      timeout=10)
    assert r.status_code == 400

    logs = list((tmp / "logs").glob("*-conv.json"))
    records = [json.loads(l) for l in logs[0].read_text().splitlines()]
    types = [r["type"] for r in records]
    assert types.count("upvote") == types.count("downvote") == 1
    assert types.count("flag") == 1 and types.count("chat") == 2


def test_multi_image_turn_and_limits(stack):
    waddr, app, worker, _ = stack
    sid = requests.post(waddr + "/api/new", json={}, timeout=10).json()["session_id"]
    _chat(waddr, sid, "Compare the two views.", images=["QQ==", "Qg=="])
    req = worker.seen[-1]
    assert req["prompt"].count("<image>") == 2
    assert req["images"] == ["QQ==", "Qg=="]

    # Over the per-turn image cap -> 400, session state unchanged.
    body = {"session_id": sid, "model": "radvlm", "text": "x",
            "images": ["QQ=="] * 9}
    r = requests.post(waddr + "/api/chat", json=body, timeout=10)
    assert r.status_code == 400
    assert len(app.sessions.get(sid).turns) == 2

    # Unknown session -> 400.
    r = requests.post(waddr + "/api/chat", json={
        "session_id": "nope", "text": "x"}, timeout=10)
    assert r.status_code == 400


def test_refresh_all_workers_endpoint(stack):
    waddr, app, worker, _ = stack
    r = requests.post(app.controller + "/refresh_all_workers", json={},
                      timeout=10)
    assert r.status_code == 200 and r.json()["ok"]
    assert app.list_models() == ["radvlm"]


def test_stream_error_rolls_back_session_state(stack):
    """A worker stream error must not leave a dangling user turn (re-send
    would duplicate <image> sentinels) and must keep regenerate clickable."""
    waddr, app, worker, _ = stack
    sid = requests.post(waddr + "/api/new", json={}, timeout=10).json()["session_id"]
    _chat(waddr, sid, "first", images=["QQ=="])
    sess = app.sessions.get(sid)
    assert [r for r, _ in sess.turns] == ["user", "assistant"]

    # chat error: user turn + its images rolled back
    worker.error_mode = True
    chunks = _chat(waddr, sid, "second", images=["Qg=="])
    assert chunks[-1]["error_code"] == 1
    assert [r for r, _ in sess.turns] == ["user", "assistant"]
    assert sess.images == ["QQ=="]

    # re-send after the error produces a well-formed prompt (one sentinel
    # per image, no doubled user turns)
    worker.error_mode = False
    _chat(waddr, sid, "second again", images=["Qg=="])
    assert [r for r, _ in sess.turns] == ["user", "assistant"] * 2
    req = worker.seen[-1]
    assert req["prompt"].count("<image>") == 2
    assert req["images"] == ["QQ==", "Qg=="]

    # regenerate error: the popped assistant turn is restored
    worker.error_mode = True
    with requests.post(waddr + "/api/regenerate", json={
            "session_id": sid, "model": "radvlm"}, stream=True,
            timeout=30) as r:
        b"".join(r.iter_content(chunk_size=None))
    assert [r for r, _ in sess.turns] == ["user", "assistant"] * 2
    assert sess.turns[-1][1] == "Hello"
