"""Minimal HTTP serving layer over :class:`clip_codec_tpu.codec.ClipCodec`.

Stdlib-only (no web framework): a threaded HTTP server exposing the codec as
a service — the deployment surface the reference lacks entirely.

Endpoints:

* ``GET  /healthz``               -> ``{"status": "ok", "dim": D}``
* ``POST /compress``              -> body: one image file (PNG/JPEG bytes);
  response: one ``.clp`` frame (``application/octet-stream``).
  Requires CLIP weights.
* ``POST /decompress?size=256&steps=50&sampler=ddim|dpmpp`` -> body: one ``.clp`` frame;
  response: reconstructed PNG. Requires a trained decoder checkpoint.
* ``POST /embed``                 -> body: one ``.clp`` frame; response:
  JSON ``{"embedding": [...]}`` (dequantized, L2-normalized).

Run: ``python -m clip_codec_tpu.serve --store_dir store [--port 8700]``.
Requests are serialized through one lock — a single accelerator executes one
program at a time anyway; concurrency belongs at the batch dimension.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np
from PIL import Image

from .codec import ClipCodec


def make_handler(codec: ClipCodec):
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {"status": "ok", "dim": codec.dim})
            else:
                self._json(404, {"error": "unknown endpoint"})

        def do_POST(self):
            url = urlparse(self.path)
            q = parse_qs(url.query)
            try:
                if url.path == "/compress":
                    img = Image.open(io.BytesIO(self._body()))
                    with lock:
                        blob = codec.compress([img], batch_size=1)[0]
                    self._send(200, blob, "application/octet-stream")
                elif url.path == "/embed":
                    with lock:
                        z = codec.decode_embeddings([self._body()])[0]
                    self._json(200, {"embedding": [float(v) for v in z]})
                elif url.path == "/decompress":
                    size = int(q.get("size", ["256"])[0])
                    steps = int(q.get("steps", ["50"])[0])
                    sampler = q.get("sampler", ["ddim"])[0]
                    with lock:
                        img = codec.decompress([self._body()], size=size, steps=steps,
                                               batch_size=1, sampler=sampler)[0]
                    buf = io.BytesIO()
                    Image.fromarray(((img + 1.0) * 127.5).astype(np.uint8)).save(buf, format="PNG")
                    self._send(200, buf.getvalue(), "image/png")
                else:
                    self._json(404, {"error": "unknown endpoint"})
            except RuntimeError as e:  # weight-gated paths
                self._json(503, {"error": str(e)})
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(store_dir: str, weights: Optional[str] = None, host: str = "127.0.0.1", port: int = 8700):
    codec = ClipCodec.load(store_dir, weights=weights)
    server = ThreadingHTTPServer((host, port), make_handler(codec))
    print(f"[serve] codec (dim={codec.dim}) on http://{host}:{port}")
    return server


def main() -> None:
    ap = argparse.ArgumentParser(description="Serve a ClipCodec store over HTTP.")
    ap.add_argument("--store_dir", type=str, required=True)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8700)
    from .cli._common import add_int8_flag, apply_int8_flag

    add_int8_flag(ap)
    args = ap.parse_args()
    apply_int8_flag(args)
    serve(args.store_dir, args.weights, args.host, args.port).serve_forever()


if __name__ == "__main__":
    main()
