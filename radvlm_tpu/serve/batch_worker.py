"""High-throughput batch worker: concurrent requests share a continuous batcher.

The reference pairs its threaded worker with an SGLang-runtime worker for
throughput (`finetuning/llava/serve/sglang_worker.py`). The TPU-native analog:
HTTP requests enqueue into one `ContinuousBatcher` (slot-refilled, always-full
decode) driven by a single engine thread — or, with `fleet=N`, into a
`serve/fleet.py` FleetEngine (one batcher per chip / TP submesh). Same
controller protocol as `serve/worker.py` (register/heartbeat/status);
`/worker_generate` returns one JSON result, `/worker_generate_stream` streams
\\0-framed cumulative-text chunks as the engine emits tokens (bursts of <=
steps_per_sync per decode-chunk readback), the reference worker's streaming
contract.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from radvlm_tpu.generation.continuous import ContinuousBatcher
from radvlm_tpu.generation.engine import GenerationConfig, trim_at_stop_strings
from radvlm_tpu.models import multimodal
from radvlm_tpu.serve.worker import HEARTBEAT_INTERVAL, load_image_from_base64

log = logging.getLogger(__name__)


class BatchWorker:
    def __init__(
        self,
        runner,  # eval.harness.VLMRunner
        *,
        model_names,
        num_slots: int = 8,
        max_len: int = 8192,
        prompt_bucket: int = 4096,
        controller_address: Optional[str] = None,
        worker_address: str = "",
        kv_quant: Optional[bool] = None,  # None -> RADVLM_KV_INT8 env
        fleet: Optional[int] = None,  # N data-parallel engines (serve/fleet.py)
        fleet_tp: int = 1,  # chips per fleet engine (TP submesh size)
    ):
        self.runner = runner
        self.model_names = list(model_names)
        self.controller_address = controller_address
        self.worker_address = worker_address
        gen = GenerationConfig(
            max_new_tokens=runner.max_new_tokens,
            eos_token_ids=runner.tokenizer.eos_token_ids,
            pad_token_id=runner.tokenizer.pad_token_id,
        )
        self._events: Dict[int, threading.Event] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        # Multi-turn KV reuse (serve/sessions.py): requests carrying a
        # "session_id" keep their finished KV on device and later turns
        # prefill only the new tokens. TP-mesh engines don't support resume
        # (and fleet TP groups are meshes), so sessions stay off there.
        self._sessions = None
        self._session_ctx: Dict[int, Any] = {}  # uid -> (sid, ids, hashes)
        tp_engine = fleet_tp > 1 if fleet else getattr(runner, "mesh", None)
        if not tp_engine:
            from radvlm_tpu.serve.sessions import SessionStore

            store = SessionStore()
            if store.cap > 0:
                self._sessions = store
        if fleet:
            # One engine per chip (or per TP submesh): the reference's
            # one-worker-per-GPU fleet folded into this process; the fleet
            # runs its own dispatch threads + failure isolation.
            from radvlm_tpu.serve.fleet import FleetEngine

            self.batcher = None
            self.fleet = FleetEngine(
                runner.params, runner.cfg, gen,
                fleet_size=fleet,
                tp_size=fleet_tp,
                num_slots=num_slots, max_len=max_len,
                prompt_buckets=(prompt_bucket,),
                attn_impl=runner.attn_impl,
                kv_quant=kv_quant,
                on_complete=self._signal_done,
            )
            self.fleet.warmup()
            if self._sessions is not None:
                # before start(): the dispatch loops are not running yet, so
                # driving each batcher's run() directly is safe
                for b in self.fleet.batchers:
                    self._warmup_engine_sessions(b)
            self.fleet.start()
            return
        self.fleet = None
        self.batcher = ContinuousBatcher(
            runner.params, runner.cfg, gen,
            num_slots=num_slots, max_len=max_len,
            prompt_buckets=(prompt_bucket,),
            attn_impl=runner.attn_impl,
            kv_quant=kv_quant,
            mesh=getattr(runner, "mesh", None),
        )
        # Compile all fill/decode graphs at startup: the first live request
        # should stream immediately, not sit behind a minutes-long XLA compile.
        self.batcher.warmup()
        if self._sessions is not None:
            self._warmup_engine_sessions(self.batcher)
        self._engine_thread = threading.Thread(target=self._engine_loop, daemon=True)
        self._engine_thread.start()

    def _warmup_engine_sessions(self, b) -> None:
        """Compile the text-only resume-fill graph before serving: the first
        resumed turn of a live chat would otherwise stall every slot on its
        XLA compile mid-stream (same contract as ContinuousBatcher.warmup).
        Runs a real 2-turn dummy conversation through the engine — cheap at
        the tiny delta shapes — before its dispatch loop starts. Image-delta
        graphs (rare) still compile lazily."""
        dummy = multimodal.build_sample(
            list(range(2, 8)), [], self.runner.cfg
        )
        r1 = b.submit(dummy, max_new_tokens=1, keep_kv=True)
        for _ in b.run():
            pass
        snap = r1.kv_snapshot
        if snap is not None and snap.widx + 128 <= b.max_len:
            b.submit(
                multimodal.build_sample(list(range(2, 6)), [], self.runner.cfg),
                max_new_tokens=1, resume=r1.kv_snapshot,
            )
            for _ in b.run():
                pass
        b.resume_fills = 0  # telemetry counts LIVE resumes, not warmup

    def _signal_done(self, req) -> None:
        self._finalize_session(req)
        with self._lock:
            ev = self._events.get(req.uid)
        if ev:
            ev.set()

    def _finalize_session(self, req) -> None:
        """Store the finished request's KVSnapshot under its session id (runs
        on the engine/fleet completion path — the snapshot is cut by the
        engine thread at emission time, so it exists by now).

        Stored ids must be exactly what the CLIENT's next prompt will extend:
        (a) only the snapshot-covered emitted tokens (KVSnapshot.n_reply — the
        final token can be uncovered at pipeline_depth=0), and (b) only up to
        the stop-string trim the worker applied to the returned text — the
        client never saw tokens past the stop, so storing them would make
        every future prefix match miss and silently disable reuse."""
        with self._lock:
            ctx = self._session_ctx.pop(req.uid, None)
        if ctx is None or req.error or req.kv_snapshot is None:
            return
        from radvlm_tpu.serve.sessions import Session

        sid, ids, img_hashes, stops = ctx
        snap = req.kv_snapshot
        covered = snap.n_reply
        tok = self.runner.tokenizer
        raw = tok.decode(req.emitted)
        trimmed = trim_at_stop_strings(raw, stops)
        if trimmed != raw:
            t = None
            for i in range(len(req.emitted), -1, -1):
                d = tok.decode(req.emitted[:i])
                if d == trimmed:
                    t = i
                    break
                if len(d) < len(trimmed):
                    break  # decodes only shrink from here
            if t is None:
                return  # stop cut mid-token: no storable clean boundary
            covered = min(covered, t)
        self._sessions.put(sid, Session(
            ids=list(ids) + list(req.emitted[:covered]),
            img_hashes=img_hashes,
            snapshot=snap.truncated(snap.n_reply - covered),
        ))

    def _engine_loop(self):
        """Drive the batcher forever; signal request completion events.

        The loop must survive any per-batch exception: an engine crash here
        would silently kill the daemon thread and leave every future request
        hanging until its HTTP timeout."""
        while not self._stop.is_set():
            progressed = False
            try:
                for req in self.batcher.run():
                    progressed = True
                    self._signal_done(req)
            except Exception as e:
                log.exception("batcher engine error; continuing")
                # on_each pops each failed request's session context (no
                # snapshot to store) and wakes its waiter.
                self.batcher.fail_all(
                    f"engine error: {e}", on_each=self._signal_done
                )
                with self._lock:
                    for ev in self._events.values():
                        ev.set()
            if not progressed:
                time.sleep(0.005)

    def queue_length(self) -> int:
        if self.fleet is not None:
            return self.fleet.queue_length()
        return self.batcher.queue.qsize() + len(self.batcher._active())

    def _submit(self, params_req: Dict[str, Any], *, stream: bool = False):
        """Build the multimodal sample and enqueue it; returns the Request
        (raises ValueError for protocol errors, e.g. over-bucket prompts).

        Requests carrying a "session_id" participate in multi-turn KV reuse
        (serve/sessions.py): if the prompt exactly extends the stored
        conversation, only the delta tokens are prefilled (resume=); the
        finished turn's KV is snapshotted for the next one. Every miss path
        is the plain full prefill."""
        prompt = params_req["prompt"]
        images = [load_image_from_base64(b) for b in params_req.get("images", [])]
        tok = self.runner.tokenizer
        ids = multimodal.tokenize_with_images(tok.encode, prompt)
        engine = self.fleet if self.fleet is not None else self.batcher
        kw = dict(
            max_new_tokens=int(params_req.get("max_new_tokens", 256)),
            # per-request sampling (same protocol fields serve/worker.py
            # honors; each slot samples with its own params)
            temperature=(
                float(params_req["temperature"])
                if "temperature" in params_req else None
            ),
            top_p=(
                float(params_req["top_p"])
                if "top_p" in params_req else None
            ),
            stream=stream,
        )
        sid = params_req.get("session_id")
        keep = bool(sid) and self._sessions is not None
        req = None
        if keep:
            from radvlm_tpu.serve.sessions import image_hash, split_delta

            img_hashes = [image_hash(im) for im in images]
            ent = self._sessions.get(sid)
            delta = split_delta(ent, ids, img_hashes) if ent else None
            if delta is not None:
                d_ids, k = delta
                try:
                    req = engine.submit(
                        multimodal.build_sample(
                            d_ids, images[k:], self.runner.cfg
                        ),
                        keep_kv=True, resume=ent.snapshot, **kw,
                    )
                except (ValueError, RuntimeError):
                    # geometry overflow / quarantined fleet engine: the full
                    # prefill below serves the turn (reuse is best-effort)
                    req = None
        if req is None:
            req = engine.submit(
                multimodal.build_sample(ids, images, self.runner.cfg),
                keep_kv=keep, **kw,
            )
        if keep:
            with self._lock:
                self._session_ctx[req.uid] = (
                    sid, ids, img_hashes, self._stops(params_req)
                )
            if req.done:
                # completion raced the registration (tiny prompts): finalize
                # here — the pop makes this idempotent with _signal_done
                self._finalize_session(req)
        return req

    def _stops(self, params_req: Dict[str, Any]):
        return list(self.runner.template.stop_strings) + list(
            filter(None, [params_req.get("stop")])
        )

    def generate_stream(self, params_req: Dict[str, Any]):
        """Yield cumulative-text chunks as the engine emits tokens (the
        reference worker/SGLang-worker streaming contract). Tokens arrive in
        bursts of <= steps_per_sync from the chunked decode readback; each
        DRAINED BURST costs one decode + one chunk (per-token decode of the
        growing prefix would be O(n^2) host work per stream)."""
        import queue as _queue

        try:
            req = self._submit(params_req, stream=True)
        except ValueError as e:
            yield {"text": f"error: {e}", "error_code": 1}
            return
        tok = self.runner.tokenizer
        stops = self._stops(params_req)
        out_ids = []
        deadline = time.time() + 600
        try:
            done = False
            while not done:
                try:
                    t = req.stream_q.get(timeout=1.0)
                except _queue.Empty:
                    if time.time() >= deadline:
                        yield {"text": "timeout", "error_code": 4}
                        return
                    continue
                if t is None:
                    break
                burst = [t]
                while True:  # drain the rest of this readback burst
                    try:
                        t = req.stream_q.get_nowait()
                    except _queue.Empty:
                        break
                    if t is None:
                        done = True
                        break
                    burst.append(t)
                out_ids.extend(burst)
                raw = tok.decode(out_ids)
                text = trim_at_stop_strings(raw, stops)
                yield {"text": text, "error_code": 0}
                if text != raw:  # a stop string fired mid-stream
                    return
            if req.error:
                yield {"text": f"error: {req.error}", "error_code": 1}
        finally:
            # stop-string return, timeout, or the CLIENT DISCONNECTING
            # (GeneratorExit via the HTTP handler closing us): tell the
            # engine to free the slot instead of decoding to max_new_tokens
            # for nobody.
            if not req.done:
                req.cancelled = True

    def generate(self, params_req: Dict[str, Any]) -> Dict[str, Any]:
        ev = threading.Event()
        try:
            req = self._submit(params_req)
        except ValueError as e:  # e.g. prompt exceeds the largest bucket
            return {"text": f"error: {e}", "error_code": 1}
        with self._lock:
            self._events[req.uid] = ev
        # The event can be registered AFTER the engine already finished the
        # request (submit -> engine completes -> we register): wait in short
        # intervals and also trust req.done so that race never shows as a
        # spurious 600s timeout (code-review finding).
        deadline = time.time() + 600
        ok = False
        while time.time() < deadline:
            if ev.wait(timeout=1.0) or req.done:
                ok = True
                break
        with self._lock:
            self._events.pop(req.uid, None)
        if req.error:
            return {"text": f"error: {req.error}", "error_code": 1}
        if not ok:
            return {"text": "timeout", "error_code": 4}
        text = trim_at_stop_strings(
            self.runner.tokenizer.decode(req.emitted), self._stops(params_req)
        )
        return {"text": text, "error_code": 0}

    # --- HTTP (same registry protocol as serve/worker.py) ---

    def make_handler(worker):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                log.debug("http: " + fmt, *args)

            def _read(self):
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n) or b"{}")

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/v1/models":
                    from radvlm_tpu.serve import openai_api as oai

                    self._json(oai.models_json(worker.model_names, oai.now()))
                else:
                    self._json({"error": "unknown endpoint"}, code=404)

            def do_POST(self):
                if self.path == "/worker_get_status":
                    self._json({
                        "model_names": worker.model_names,
                        "speed": 1.0,
                        "queue_length": worker.queue_length(),
                    })
                elif self.path == "/worker_generate":
                    try:
                        data = self._read()
                    except (ValueError, UnicodeDecodeError):
                        self._json({"text": "malformed JSON body",
                                    "error_code": 1}, code=400)
                        return
                    self._json(worker.generate(data))
                elif self.path == "/v1/chat/completions":
                    from radvlm_tpu.serve import openai_api as oai

                    try:
                        data = self._read()
                        params_req = oai.messages_to_request(
                            data, worker.runner.template
                        )
                    except (ValueError, UnicodeDecodeError, TypeError) as e:
                        self._json({"error": {
                            "message": str(e), "type": "invalid_request_error",
                        }}, code=400)
                        return
                    model = data.get("model") or worker.model_names[0]
                    if model not in worker.model_names:
                        self._json({"error": {
                            "message": f"model {model!r} not found",
                            "type": "invalid_request_error",
                            "code": "model_not_found",
                        }}, code=404)
                        return
                    req_id, created = oai.new_request_id(), oai.now()
                    if data.get("stream"):
                        self.send_response(200)
                        self.send_header("Content-Type", "text/event-stream")
                        self.send_header("Cache-Control", "no-cache")
                        self.end_headers()
                        gen_chunks = worker.generate_stream(params_req)
                        try:
                            for frame in oai.sse_stream(
                                model, gen_chunks, req_id, created
                            ):
                                self.wfile.write(frame)
                                self.wfile.flush()
                        except (BrokenPipeError, ConnectionResetError):
                            log.info("SSE client disconnected")
                        finally:
                            gen_chunks.close()
                        return
                    result = worker.generate(params_req)
                    if result.get("error_code", 0) != 0:
                        self._json({"error": {
                            "message": result.get("text", "generation failed"),
                            "type": "server_error",
                        }}, code=500)
                        return
                    self._json(
                        oai.completion_json(model, result, req_id, created)
                    )
                elif self.path == "/v1/models":
                    from radvlm_tpu.serve import openai_api as oai

                    self._json(oai.models_json(worker.model_names, oai.now()))
                elif self.path == "/worker_generate_stream":
                    try:
                        data = self._read()
                    except (ValueError, UnicodeDecodeError):
                        self._json({"text": "malformed JSON body",
                                    "error_code": 1}, code=400)
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.end_headers()
                    # true streaming: one \0-framed cumulative-text chunk per
                    # engine emission burst; a client disconnect closes the
                    # generator, whose finally-cancel frees the decode slot
                    gen_chunks = worker.generate_stream(data)
                    try:
                        for chunk in gen_chunks:
                            self.wfile.write(
                                json.dumps(chunk).encode() + b"\0"
                            )
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        log.info("stream client disconnected")
                    finally:
                        gen_chunks.close()
                else:
                    self._json({"error": "unknown endpoint"}, code=404)

        return Handler

    def serve_forever(self, host="0.0.0.0", port=21003, *, background=False):
        server = ThreadingHTTPServer((host, port), self.make_handler())
        self._server = server
        port = server.server_address[1]
        if not self.worker_address:
            self.worker_address = f"http://localhost:{port}"
        if self.controller_address:
            self._register()
            # Heartbeat loop (found live: register-once workers expire after
            # HEARTBEAT_EXPIRATION on the controller and every proxied request
            # then 503s — same contract as serve/worker.py heartbeat_loop).
            threading.Thread(target=self._heartbeat_loop, daemon=True).start()
        if background:
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
            return port
        server.serve_forever()

    def _register(self):
        import requests

        requests.post(
            self.controller_address + "/register_worker",
            json={
                "worker_name": self.worker_address,
                "model_names": self.model_names,
                "speed": 2.0,  # batcher worker advertises higher speed
                "queue_length": self.queue_length(),
            },
            timeout=30,
        )

    def _heartbeat_loop(self):
        import requests

        from radvlm_tpu.serve.worker import HEARTBEAT_INTERVAL

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
                    self._register()
            except Exception as e:
                log.warning("heartbeat failed: %s", e)

    def shutdown(self):
        self._stop.set()
        if self.fleet is not None:
            self.fleet.shutdown()
        if getattr(self, "_server", None):
            self._server.shutdown()
