"""Minimal HTTP serving layer over :class:`clip_codec_tpu.codec.ClipCodec`.

Stdlib-only (no web framework): a threaded HTTP server exposing the codec as
a service — the deployment surface the reference lacks entirely.

Endpoints:

* ``GET  /healthz``               -> ``{"status": "ok", "dim": D}``
* ``POST /compress``              -> body: one image file (PNG/JPEG bytes);
  response: one ``.clp`` frame (``application/octet-stream``).
  Requires CLIP weights.
* ``POST /decompress?size=256&steps=50&sampler=ddim|dpmpp&seed=N`` -> body: one
  ``.clp`` frame; response: reconstructed PNG (``seed`` reproduces the
  trajectory; omitted = fresh sample per request). Requires a trained
  decoder checkpoint.
* ``POST /embed``                 -> body: one ``.clp`` frame; response:
  JSON ``{"embedding": [...]}`` (dequantized, L2-normalized).

Run: ``python -m clip_codec_tpu.serve --store_dir store [--port 8700]``.
Requests are serialized through one lock — a single accelerator executes one
program at a time anyway; concurrency belongs at the batch dimension.

``--artifact decoder.jaxprog`` serves ``/decompress`` from an AOT-exported
program (``cli.export_decoder``) instead of tracing the model: no flax model
construction or compile at startup, and the size/steps/sampler statics are
validated against the artifact's metadata header (412 on mismatch — the
program is compiled for exactly one configuration; re-export for another).
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


def make_handler(codec: ClipCodec, artifact=None):
    """``artifact``: optional ``(call, params, quant)`` from an AOT-exported
    pixel decompressor — replaces the traced /decompress path (``quant`` is
    the int8 calibration sidecar, None for bf16 artifacts)."""
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
                    if artifact is not None:
                        call, params, quant = artifact
                        meta = call.meta
                        mismatches = {
                            k: (q[k][0], meta[k]) for k, cast in
                            (("size", int), ("steps", int), ("sampler", str))
                            if k in q and cast(q[k][0]) != meta[k]
                        }
                        if mismatches:
                            self._json(412, {
                                "error": "artifact statics mismatch; re-export "
                                         "with cli.export_decoder",
                                "requested": {k: v[0] for k, v in mismatches.items()},
                                "artifact": {k: meta[k] for k in mismatches},
                            })
                            return
                        z = codec.decode_embeddings([self._body()])
                        seed = int(q.get("seed", ["0"])[0])
                        kw = {} if quant is None else {"quant": quant}
                        with lock:
                            img = np.asarray(call(params, z, seed=seed, **kw))[0]
                    else:
                        size = int(q.get("size", ["256"])[0])
                        steps = int(q.get("steps", ["50"])[0])
                        sampler = q.get("sampler", ["ddim"])[0]
                        seed = (int(q["seed"][0]) if "seed" in q else None)
                        with lock:
                            img = codec.decompress([self._body()], size=size, steps=steps,
                                                   batch_size=1, sampler=sampler, seed=seed)[0]
                    buf = io.BytesIO()
                    Image.fromarray(((np.clip(img, -1, 1) + 1.0) * 127.5).astype(np.uint8)).save(buf, format="PNG")
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


def serve(store_dir: str, weights: Optional[str] = None, host: str = "127.0.0.1",
          port: int = 8700, artifact: Optional[str] = None):
    codec = ClipCodec.load(store_dir, weights=weights)
    art = None
    if artifact is not None:
        if weights is None:
            raise ValueError("--artifact serving still needs --weights (params "
                             "are call-time arguments, not baked into artifacts)")
        from .deploy import load_decompressor
        from .utils.checkpoint import load_unet_checkpoint
        from .utils.config import ModelConfig

        call = load_decompressor(artifact)
        if call.meta["batch_size"] != 1:
            raise ValueError(
                f"serving artifacts must be exported with --batch_size 1 "
                f"(got {call.meta['batch_size']}); requests carry one frame")
        if call.meta["z_dim"] != codec.dim:
            raise ValueError(
                f"artifact was exported for z_dim={call.meta['z_dim']} but the "
                f"store carries dim={codec.dim} embeddings; re-export against "
                f"this store's checkpoint")
        import jax

        backend = jax.default_backend()
        if backend not in call.platforms:
            raise ValueError(
                f"artifact was lowered for platforms {call.platforms} but this "
                f"box runs {backend!r}; re-export with --platforms {backend}")
        quant = None
        if call.meta.get("int8"):
            from .utils.checkpoint import load_params

            sidecar = f"{artifact}.quant.msgpack"
            try:
                quant = jax.device_put(load_params(sidecar))
            except FileNotFoundError:
                raise ValueError(
                    f"int8 artifact: calibration sidecar {sidecar} not found "
                    f"(cli.export_decoder --int8 writes it)") from None
        mc = ModelConfig.find_for_checkpoint(weights)
        ch_mult = mc.ch_mult if mc else (1, 2, 2)
        # device_put ONCE: host numpy params would re-upload the whole tree
        # per request (inside the serialization lock) on remote transports
        art = (call, jax.device_put(load_unet_checkpoint(weights, ch_mult)), quant)
    server = ThreadingHTTPServer((host, port), make_handler(codec, artifact=art))
    mode = f", artifact={artifact}" if artifact else ""
    print(f"[serve] codec (dim={codec.dim}{mode}) on http://{host}:{port}")
    return server


def main() -> None:
    ap = argparse.ArgumentParser(description="Serve a ClipCodec store over HTTP.")
    ap.add_argument("--store_dir", type=str, required=True)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--artifact", type=str, default=None,
                    help="AOT-exported decoder.jaxprog (cli.export_decoder); "
                         "serves /decompress without tracing the model")
    from .cli._common import add_int8_flag, apply_int8_flag

    add_int8_flag(ap)
    args = ap.parse_args()
    apply_int8_flag(args)
    serve(args.store_dir, args.weights, args.host, args.port,
          artifact=args.artifact).serve_forever()


if __name__ == "__main__":
    main()
