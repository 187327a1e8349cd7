"""Browser chat UI (rebuild of `finetuning/llava/serve/gradio_web_server.py`).

This image ships no gradio; the UI is a single static page served by the same
stdlib HTTP stack, talking to the controller's streaming endpoint with fetch()
streaming. Supports image upload (base64), multi-turn history with the qwen
chatml template rendered client-side, temperature/max-tokens controls.

    python -m radvlm_tpu.serve.web --controller http://localhost:21001 --port 7860
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>radvlm-tpu chat</title>
<style>
body { font-family: system-ui, sans-serif; max-width: 880px; margin: 2rem auto; }
#log { border: 1px solid #ccc; border-radius: 8px; padding: 1rem; min-height: 320px; }
.msg { margin: .5rem 0; white-space: pre-wrap; }
.user { color: #14532d; } .assistant { color: #1e3a8a; }
#controls { display: flex; gap: .5rem; margin-top: 1rem; }
#q { flex: 1; padding: .5rem; }
img.preview { max-height: 180px; display: block; margin: .5rem 0; }
</style></head>
<body>
<h2>radvlm-tpu &mdash; chest X-ray assistant</h2>
<input type="file" id="img" accept="image/*">
<img class="preview" id="preview" hidden>
<div id="log"></div>
<div id="controls">
  <input id="q" placeholder="Ask about the X-ray..." >
  <button id="send">Send</button>
  <label>max tokens <input id="maxtok" type="number" value="512" style="width:5em"></label>
  <label>temp <input id="temp" type="number" step="0.1" value="0" style="width:4em"></label>
</div>
<script>
const SYSTEM = "<|im_start|>system\\nYou are a helpful assistant.<|im_end|>\\n";
let history = [];   // {role, content}
let imageB64 = null, firstTurn = true;
document.getElementById('img').onchange = ev => {
  const f = ev.target.files[0];
  if (!f) return;
  const r = new FileReader();
  r.onload = () => {
    imageB64 = r.result.split(',')[1];
    const p = document.getElementById('preview');
    p.src = r.result; p.hidden = false;
  };
  r.readAsDataURL(f);
};
function renderPrompt() {
  let s = SYSTEM;
  for (const m of history) {
    s += `<|im_start|>${m.role}\\n${m.content}<|im_end|>\\n`;
  }
  return s + "<|im_start|>assistant\\n";
}
function addMsg(cls, text) {
  const d = document.createElement('div');
  d.className = 'msg ' + cls;
  d.textContent = (cls === 'user' ? 'you: ' : 'radvlm: ') + text;
  document.getElementById('log').appendChild(d);
  return d;
}
async function send() {
  const q = document.getElementById('q').value.trim();
  if (!q) return;
  document.getElementById('q').value = '';
  let content = q;
  if (firstTurn && imageB64) content = "<image>\\n" + q;
  firstTurn = false;
  history.push({role: 'user', content});
  addMsg('user', q);
  const out = addMsg('assistant', '');
  const resp = await fetch('/api/generate', {
    method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({
      model: 'radvlm',
      prompt: renderPrompt(),
      images: imageB64 ? [imageB64] : [],
      max_new_tokens: +document.getElementById('maxtok').value,
      temperature: +document.getElementById('temp').value,
    }),
  });
  const reader = resp.body.getReader();
  const dec = new TextDecoder();
  let buf = '', text = '';
  for (;;) {
    const {done, value} = await reader.read();
    if (done) break;
    buf += dec.decode(value, {stream: true});
    let i;
    while ((i = buf.indexOf('\\0')) >= 0) {
      const chunk = buf.slice(0, i); buf = buf.slice(i + 1);
      if (!chunk) continue;
      const msg = JSON.parse(chunk);
      if (msg.error_code) { out.textContent += ` [error: ${msg.text}]`; return; }
      text = msg.text;
      out.textContent = 'radvlm: ' + text;
    }
  }
  history.push({role: 'assistant', content: text});
}
document.getElementById('send').onclick = send;
document.getElementById('q').addEventListener('keydown', e => {
  if (e.key === 'Enter') send();
});
</script>
</body></html>
"""


def make_handler(controller_address: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def do_GET(self):
            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/api/generate":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                data = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, UnicodeDecodeError):
                self.send_response(400)
                self.end_headers()
                return
            import requests

            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            with requests.post(
                controller_address + "/worker_generate_stream",
                json=data, stream=True, timeout=600,
            ) as r:
                for chunk in r.iter_content(chunk_size=None):
                    self.wfile.write(chunk)
                    self.wfile.flush()

    return Handler


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller", default="http://localhost:21001")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(args.controller)
    )
    print(f"web ui on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
