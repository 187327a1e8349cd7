"""Serving model worker: loads the model, streams generations over HTTP.

Rebuild of the reference worker (`finetuning/llava/serve/model_worker.py`): same
protocol — register with the controller, heartbeat with queue length
(`model_worker.py:77-93`), `/worker_generate_stream` taking base64 images +
prompt and yielding \\0-delimited JSON chunks with cumulative text
(`:107-190`), a concurrency semaphore (`:222-226`), and tokens/sec accounting.

The decode loop streams from the TPU via the engine's jitted (prefill, step)
pair instead of a torch generate thread + TextIteratorStreamer.
"""

from __future__ import annotations

import base64
import dataclasses
import io
import json
import logging
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np

from radvlm_tpu.config import RadVLMConfig
from radvlm_tpu.data.chat import QWEN_CHATML
from radvlm_tpu.generation.engine import (
    GenerationConfig,
    make_stream_fns,
    stream_generate,
    trim_at_stop_strings,
)
from radvlm_tpu.models import multimodal

log = logging.getLogger(__name__)

HEARTBEAT_INTERVAL = 15  # seconds (reference constants.py:1)


def load_image_from_base64(data: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB"))


class ModelWorker:
    def __init__(
        self,
        runner,  # eval.harness.VLMRunner (params+cfg+tokenizer)
        *,
        model_names: List[str],
        worker_address: str = "",
        controller_address: Optional[str] = None,
        limit_concurrency: int = 2,
    ):
        self.runner = runner
        self.model_names = model_names
        self.worker_id = str(uuid.uuid4())[:8]
        self.worker_address = worker_address
        self.controller_address = controller_address
        self.semaphore = threading.Semaphore(limit_concurrency)
        self.active = 0
        self._lock = threading.Lock()
        self._stream_fns = None
        self._stop = threading.Event()

    # --- controller protocol ---

    def register(self):
        if not self.controller_address:
            return
        import requests

        requests.post(
            self.controller_address + "/register_worker",
            json={
                "worker_name": self.worker_address,
                "model_names": self.model_names,
                "speed": 1.0,
                "queue_length": self.queue_length(),
            },
            timeout=30,
        )

    def queue_length(self) -> int:
        with self._lock:
            return self.active

    def heartbeat_loop(self):
        import requests

        while not self._stop.wait(HEARTBEAT_INTERVAL):
            try:
                r = requests.post(
                    self.controller_address + "/receive_heart_beat",
                    json={
                        "worker_name": self.worker_address,
                        "queue_length": self.queue_length(),
                    },
                    timeout=10,
                )
                if not r.json().get("exist"):
                    self.register()
            except Exception as e:
                log.warning("heartbeat failed: %s", e)

    # --- generation ---

    def generate_stream(self, params_req: Dict[str, Any]):
        """Yield dicts with cumulative text (reference chunk contract)."""
        import jax
        import jax.numpy as jnp

        prompt = params_req["prompt"]
        images = [
            load_image_from_base64(b) for b in params_req.get("images", [])
        ]
        gen = GenerationConfig(
            max_new_tokens=int(params_req.get("max_new_tokens", 256)),
            temperature=float(params_req.get("temperature", 0.0)),
            top_p=float(params_req.get("top_p", 1.0)),
            eos_token_ids=self.runner.tokenizer.eos_token_ids,
            pad_token_id=self.runner.tokenizer.pad_token_id,
        )
        stops = list(self.runner.template.stop_strings) + list(
            filter(None, [params_req.get("stop")])
        )

        tok = self.runner.tokenizer
        ids = multimodal.tokenize_with_images(tok.encode, prompt)
        sample = multimodal.build_sample(ids, images, self.runner.cfg)
        batch = multimodal.collate(
            [sample], pad_to_multiple=self.runner.pad_to_multiple, left_pad=True
        )
        batch = {k: jnp.asarray(v) for k, v in batch.items()}

        with self._lock:
            # Init under the lock: two concurrent first requests would each
            # pay the multi-minute compile and one result would be discarded.
            if self._stream_fns is None:
                self._stream_fns = make_stream_fns(
                    self.runner.cfg, attn_impl=self.runner.attn_impl
                )
            self.active += 1
            # Per-request rng: wall-clock seconds collide across concurrent
            # requests (identical "samples" at temperature > 0).
            self._req_counter = getattr(self, "_req_counter", 0) + 1
            rng = jax.random.key(self._req_counter)
        t0 = time.perf_counter()
        n_tok = 0
        try:
            out_ids: List[int] = []
            for tok_np in stream_generate(
                self.runner.params, self.runner.cfg, batch, gen,
                stream_fns=self._stream_fns,
                rng=rng,
            ):
                t = int(tok_np[0])
                n_tok += 1
                if t in gen.eos_token_ids:
                    break
                out_ids.append(t)
                raw = tok.decode(out_ids)  # decode ONCE per step
                text = trim_at_stop_strings(raw, stops)
                yield {"text": text, "error_code": 0}
                if text != raw:  # a stop string fired
                    break
            dt = time.perf_counter() - t0
            log.info("generated %d tokens in %.2fs (%.1f tok/s)",
                     n_tok, dt, n_tok / max(dt, 1e-9))
        finally:
            with self._lock:
                self.active -= 1

    # --- HTTP ---

    def make_handler(worker):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                log.debug("http: " + fmt, *args)

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _read(self):
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def do_POST(self):
                if self.path == "/worker_get_status":
                    self._json({
                        "model_names": worker.model_names,
                        "speed": 1.0,
                        "queue_length": worker.queue_length(),
                    })
                elif self.path == "/worker_generate_stream":
                    try:
                        data = self._read()
                    except (ValueError, UnicodeDecodeError):
                        self._json({"text": "malformed JSON body", "error_code": 1},
                                   code=400)
                        return
                    acquired = worker.semaphore.acquire(timeout=120)
                    if not acquired:
                        self._json({"text": "server overloaded", "error_code": 3},
                                   code=503)
                        return
                    try:
                        self.send_response(200)
                        self.send_header("Content-Type", "application/octet-stream")
                        self.end_headers()
                        for chunk in worker.generate_stream(data):
                            self.wfile.write(json.dumps(chunk).encode() + b"\0")
                            self.wfile.flush()
                    except Exception as e:
                        log.exception("generation failed")
                        try:
                            self.wfile.write(
                                json.dumps(
                                    {"text": f"error: {e}", "error_code": 1}
                                ).encode() + b"\0"
                            )
                        except Exception:
                            pass
                    finally:
                        worker.semaphore.release()
                else:
                    self._json({"error": "unknown endpoint"}, code=404)

        return Handler

    def serve_forever(self, host: str = "0.0.0.0", port: int = 21002,
                      *, background: bool = False):
        server = ThreadingHTTPServer((host, port), self.make_handler())
        self._server = server
        port = server.server_address[1]
        if not self.worker_address:
            self.worker_address = f"http://localhost:{port}"
        if self.controller_address:
            self.register()
            threading.Thread(target=self.heartbeat_loop, daemon=True).start()
        if background:
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
            return port
        server.serve_forever()

    def shutdown(self):
        self._stop.set()
        if getattr(self, "_server", None):
            self._server.shutdown()
