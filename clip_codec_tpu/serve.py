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
* ``POST /decompress_sd?guidance=5.0&seed=N&format=png|jpeg`` -> body: one
  ``.clp`` frame; reconstructs via the SD latent path. Requires
  ``--sd_artifact`` + ``--adapter`` (and the SD weight env vars).
* ``GET  /search?q=<text>&k=10``  -> text->image retrieval over the store
  (exact IP index over the store's embeddings; reference feature
  ``cli/search_text.py`` as a service). Response: JSON
  ``{"results": [{"path": ..., "score": ...}]}``. Requires CLIP weights
  (text tower); 503 with the env-var message otherwise.
* ``POST /search_image?k=10``     -> image->image retrieval: body is either
  a ``.clp`` frame (dequantized on host — no weights needed) or raw image
  bytes (CLIP-encoded, weight-gated). Same JSON response as ``/search``.
  The reference intends this capability but its ``encode_image_to_vec``
  helper is dead code that crashes when called (``cli/search_text.py:24-28``).
* ``GET  /stats``                 -> per-endpoint request counts, decompress
  latency percentiles, and the micro-batcher's measured fill rate.

Run: ``python -m clip_codec_tpu.serve --store_dir store [--port 8700]``.
Device work is serialized through ONE lock shared by every endpoint and the
micro-batch worker — a single accelerator executes one program at a time
anyway; concurrency belongs at the batch dimension.

``--artifact decoder.jaxprog`` serves ``/decompress`` from an AOT-exported
program (``cli.export_decoder``) instead of tracing the model: no flax model
construction or compile at startup, and the size/steps/sampler statics are
validated against the artifact's metadata header (412 on mismatch — the
program is compiled for exactly one configuration; re-export for another).
A batch>1 artifact turns on micro-batching: concurrent requests are
coalesced into one program call (gather window ``--batch_wait_ms``), so
throughput under load follows the measured batch-scaling curve instead of
paying a full program per request; ``seed`` is rejected in this mode (one
program call has one seed).
"""

from __future__ import annotations

import argparse
import io
import itertools
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np
from PIL import Image

from .codec import ClipCodec


_MAX_BODY_BYTES = 64 << 20


class _BodyTooLarge(ValueError):
    def __init__(self, n: int):
        super().__init__(f"request body {n} bytes exceeds the "
                         f"{_MAX_BODY_BYTES}-byte limit")


class _Server(ThreadingHTTPServer):
    """ThreadingHTTPServer with a real accept backlog: the TCPServer default
    (request_queue_size=5) resets connections when more than a handful of
    clients connect at once — exactly the burst micro-batching invites."""

    request_queue_size = 128
    daemon_threads = True


class _MicroBatcher:
    """Coalesce concurrent /decompress requests into ONE program call.

    An artifact compiled for batch B costs the same per call whether 1 or B
    rows are real (static shapes), so the server gathers up to B concurrent
    requests inside a small window and pads the rest — latency for a lone
    request is one batch-B call, throughput under load follows the measured
    batch-scaling curve (B=16 is the 256px knee, docs/performance.md) instead
    of B=1 per request. One worker thread owns the device; HTTP threads park
    on per-request events.
    """

    def __init__(self, run_batch, batch_size: int, max_wait_ms: float = 5.0):
        self._run = run_batch  # (z (B, D) float32, seed int) -> (B, H, W, C)
        self.batch_size = batch_size
        self._wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._seeds = itertools.count()
        self.calls = 0          # program invocations
        self.rows_served = 0    # real (non-padding) rows across them
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    @property
    def fill_rate(self) -> float:
        """Mean fraction of each program call's batch that was real work."""
        return self.rows_served / (self.calls * self.batch_size) if self.calls else 0.0

    def submit(self, z_row: np.ndarray, timeout: float = 600.0) -> np.ndarray:
        done = threading.Event()
        slot: dict = {}
        self._q.put((z_row, done, slot))
        if not done.wait(timeout):
            raise RuntimeError("batched decompress timed out")
        if "err" in slot:
            raise slot["err"]
        return slot["img"]

    def _loop(self) -> None:
        while True:
            batch = [self._q.get()]
            deadline = time.monotonic() + self._wait
            while len(batch) < self.batch_size:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            zs = np.stack([b[0] for b in batch]).astype(np.float32)
            if len(batch) < self.batch_size:  # pad with the last row
                zs = np.concatenate(
                    [zs, np.repeat(zs[-1:], self.batch_size - len(batch), axis=0)])
            try:
                imgs = self._run(zs, next(self._seeds))
                self.calls += 1
                self.rows_served += len(batch)
                for i, (_, done, slot) in enumerate(batch):
                    slot["img"] = imgs[i]
                    done.set()
            except Exception as e:  # deliver the failure to every waiter
                for _, done, slot in batch:
                    slot["err"] = e
                    done.set()


class _Searcher:
    """Lazy text->image retrieval over the store: the feature matrix and
    index build on first use (store decode, no weights needed); the CLIP
    text tower is also lazy so weight-less servers still start and /search
    returns 503 with the env-var message instead of failing at boot."""

    def __init__(self, store_dir, codec: ClipCodec, lock: threading.Lock,
                 ivf: bool = False, nlist: Optional[int] = None, nprobe: int = 8,
                 u8: bool = False):
        self._store_dir = Path(store_dir)
        self._codec = codec
        self._lock = lock
        self._init_lock = threading.Lock()
        self._index = None
        self._paths = None
        self._ivf = (ivf, nlist, nprobe)
        self._u8 = u8

    def _ensure_index(self):
        from .cli.search_text import load_codes, load_features
        from .index import (
            build_index, build_index_u8, build_ivf_index, build_ivf_index_u8,
        )

        with self._init_lock:
            if self._index is None:
                use_ivf, nlist, nprobe = self._ivf
                if self._u8:
                    codes, scale, zero, self._paths = load_codes(self._store_dir)
                    self._index = (
                        build_ivf_index_u8(codes, scale, zero,
                                           nlist=nlist, nprobe=nprobe)
                        if use_ivf else build_index_u8(codes, scale, zero)
                    )
                elif use_ivf:
                    feats, self._paths = load_features(self._store_dir)
                    self._index = build_ivf_index(feats, nlist=nlist, nprobe=nprobe)
                else:
                    feats, self._paths = load_features(self._store_dir)
                    self._index = build_index(feats)

    def _ensure_encoder(self):
        """Caller must hold the DEVICE lock: /compress lazily builds the same
        codec.encoder under it (codec.compress), and two concurrent
        first-requests would otherwise construct the ~600MB CLIP tower twice
        (double upload, leaked device buffers)."""
        if self._codec.encoder is None:
            from .encoders import ClipEncoder

            self._codec.encoder = ClipEncoder()  # raises RuntimeError -> 503

    def search(self, text: str, k: int):
        from .index import search_index

        self._ensure_index()
        with self._lock:
            self._ensure_encoder()
            qvec = self._codec.encoder.encode_text(text)[0]
            return search_index(qvec, self._index, self._paths, k=k)

    def search_image(self, body: bytes, k: int):
        """Image->image retrieval: body is either a ``.clp`` frame (CLPF
        magic — dequantized on host, NO weights needed) or raw image bytes
        (CLIP-encoded, weight-gated like /compress)."""
        from .io.bitstream import MAGIC
        from .index import search_index

        self._ensure_index()
        if body[:4] == MAGIC:
            qvec = self._codec.decode_embeddings_host([body])[0]
            with self._lock:
                return search_index(qvec, self._index, self._paths, k=k)
        from .encoders.clip import preprocess_pil_u8

        img = Image.open(io.BytesIO(body))  # PIL error -> 400 via handler
        with self._lock:
            self._ensure_encoder()
            x = preprocess_pil_u8(img, self._codec.encoder.cfg.image_size)
            qvec = self._codec.encoder.encode_image_array(x[None])[0]
            return search_index(qvec, self._index, self._paths, k=k)


def make_handler(codec: ClipCodec, artifact=None, batcher: Optional[_MicroBatcher] = None,
                 sd=None, lock: Optional[threading.Lock] = None,
                 searcher: Optional[_Searcher] = None):
    """``artifact``: optional ``(call, params, quant)`` from an AOT-exported
    pixel decompressor — replaces the traced /decompress path (``quant`` is
    the int8 calibration sidecar, None for bf16 artifacts). ``batcher``:
    micro-batching worker for batch>1 artifacts. ``sd``: optional
    ``(call, unet_params, vae_params, adapter_params, quant)`` SD artifact
    backing /decompress_sd. ``lock``: the device lock — pass the one the
    micro-batcher shares so exactly one program is in flight at a time."""
    lock = lock if lock is not None else threading.Lock()
    stats_lock = threading.Lock()
    counts: dict = {}
    latencies: list = []  # rolling /decompress* wall times, capped

    def record(endpoint: str, dt: Optional[float] = None) -> None:
        with stats_lock:
            counts[endpoint] = counts.get(endpoint, 0) + 1
            if dt is not None:
                latencies.append(dt)
                if len(latencies) > 512:
                    del latencies[: len(latencies) - 512]

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
            """Read the request body, bounded: a client declaring a huge
            Content-Length must not buffer gigabytes into server RAM.
            64 MiB covers any real /compress image; raises ValueError
            (mapped to 413 by callers) past it."""
            n = int(self.headers.get("Content-Length", 0))
            if n > _MAX_BODY_BYTES:
                raise _BodyTooLarge(n)
            return self.rfile.read(n)

        def _check_format(self, q) -> bool:
            """Validate ?format= BEFORE any compute — a bad value must not
            cost a full diffusion run under the lock."""
            fmt = q.get("format", ["png"])[0].lower()
            if fmt not in ("png", "jpeg", "jpg"):
                self._json(400, {"error": f"unknown format {fmt!r}; png or jpeg"})
                return False
            return True

        def _check_statics(self, q, meta) -> bool:
            """412 when query params conflict with the artifact's baked
            statics — the program is compiled for exactly one configuration."""
            mismatches = {
                k: (q[k][0], meta[k]) for k, cast in
                (("size", int), ("steps", int), ("sampler", str), ("eta", float))
                if k in q and cast(q[k][0]) != meta[k]
            }
            if mismatches:
                self._json(412, {
                    "error": "artifact statics mismatch; re-export with "
                             "cli.export_decoder",
                    "requested": {k: v[0] for k, v in mismatches.items()},
                    "artifact": {k: meta[k] for k in mismatches},
                })
                return False
            return True

        def _send_image(self, img: np.ndarray, q) -> None:
            fmt = q.get("format", ["png"])[0].lower()
            if img.dtype == np.uint8:  # output="uint8" artifact
                arr = img
            else:
                arr = ((np.clip(img, -1, 1) + 1.0) * 127.5).astype(np.uint8)
            buf = io.BytesIO()
            if fmt == "png":
                Image.fromarray(arr).save(buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png")
            else:
                # measured 6x cheaper to encode than PNG on this image class
                Image.fromarray(arr).save(buf, format="JPEG", quality=92)
                self._send(200, buf.getvalue(), "image/jpeg")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {"status": "ok", "dim": codec.dim})
            elif path == "/stats":
                with stats_lock:
                    lat = sorted(latencies)
                    out = {
                        "requests": dict(counts),
                        "decompress_latency_s": {
                            "n": len(lat),
                            "p50": lat[len(lat) // 2] if lat else None,
                            "p95": lat[int(len(lat) * 0.95)] if lat else None,
                        },
                    }
                if batcher is not None:
                    out["micro_batch"] = {
                        "batch_size": batcher.batch_size,
                        "calls": batcher.calls,
                        "fill_rate": round(batcher.fill_rate, 4),
                    }
                self._json(200, out)
            elif path == "/search":
                q = parse_qs(urlparse(self.path).query)
                if "q" not in q or not q["q"][0]:
                    self._json(400, {"error": "missing ?q=<text query>"})
                    return
                if searcher is None:
                    self._json(503, {"error": "no store attached for search"})
                    return
                try:
                    k = int(q.get("k", ["10"])[0])
                    hits = searcher.search(q["q"][0], k=k)
                    record("search")
                    self._json(200, {"results": [
                        {"path": p, "score": s} for p, s in hits]})
                except RuntimeError as e:  # weight-gated text tower
                    self._json(503, {"error": str(e)})
                except Exception as e:
                    self._json(400, {"error": f"{type(e).__name__}: {e}"})
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
                    record("compress")
                    self._send(200, blob, "application/octet-stream")
                elif url.path == "/embed":
                    with lock:
                        z = codec.decode_embeddings([self._body()])[0]
                    record("embed")
                    self._json(200, {"embedding": [float(v) for v in z]})
                elif url.path == "/search_image":
                    if searcher is None:
                        self._json(503, {"error": "no store attached for search"})
                        return
                    k = int(q.get("k", ["10"])[0])
                    hits = searcher.search_image(self._body(), k=k)
                    record("search_image")
                    self._json(200, {"results": [
                        {"path": p, "score": s} for p, s in hits]})
                elif url.path == "/decompress":
                    t0 = time.monotonic()
                    if not self._check_format(q):
                        return
                    if artifact is not None:
                        call, params, quant = artifact
                        if not self._check_statics(q, call.meta):
                            return
                        # host-side frame decode: a device round-trip here
                        # staggers arrivals past the micro-batch gather window
                        if batcher is not None:
                            if "seed" in q:
                                self._json(400, {
                                    "error": "seed is per-program: batched "
                                             "serving (artifact batch_size > 1) "
                                             "coalesces requests; export with "
                                             "--batch_size 1 for seeded serving"})
                                return
                            z = codec.decode_embeddings_host([self._body()])[0]
                            img = batcher.submit(z)
                        else:
                            z = codec.decode_embeddings_host([self._body()])
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
                    record("decompress", time.monotonic() - t0)
                    self._send_image(img, q)
                elif url.path == "/decompress_sd":
                    t0 = time.monotonic()
                    if sd is None:
                        self._json(503, {"error": "no SD artifact loaded; start "
                                                  "with --sd_artifact + --adapter"})
                        return
                    sd_call, up, vp, ap_, sd_quant = sd
                    if not self._check_format(q) or not self._check_statics(q, sd_call.meta):
                        return
                    z = codec.decode_embeddings_host([self._body()])
                    seed = int(q.get("seed", ["0"])[0])
                    guidance = float(q.get("guidance", ["5.0"])[0])
                    kw = {} if sd_quant is None else {"quant": sd_quant}
                    with lock:
                        img = np.asarray(sd_call(up, vp, ap_, z, seed=seed,
                                                 guidance_scale=guidance, **kw))[0]
                    record("decompress_sd", time.monotonic() - t0)
                    self._send_image(img, q)
                else:
                    self._json(404, {"error": "unknown endpoint"})
            except _BodyTooLarge as e:
                self._json(413, {"error": str(e)})
            except RuntimeError as e:  # weight-gated paths
                self._json(503, {"error": str(e)})
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def serve(store_dir: str, weights: Optional[str] = None, host: str = "127.0.0.1",
          port: int = 8700, artifact: Optional[str] = None,
          batch_wait_ms: float = 5.0, sd_artifact: Optional[str] = None,
          adapter: Optional[str] = None, search_ivf: bool = False,
          search_nlist: Optional[int] = None, search_nprobe: int = 8,
          search_u8: bool = False):
    codec = ClipCodec.load(store_dir, weights=weights)
    art = None
    batcher = None
    device_lock = threading.Lock()  # one program in flight at a time
    if adapter is not None and sd_artifact is None:
        raise ValueError("--adapter only makes sense with --sd_artifact")
    sd = _load_sd_serving(sd_artifact, adapter, codec) if sd_artifact else None
    if artifact is not None:
        if weights is None:
            raise ValueError("--artifact serving still needs --weights (params "
                             "are call-time arguments, not baked into artifacts)")
        import jax

        from .deploy import load_decompressor
        from .utils.checkpoint import load_unet_checkpoint
        from .utils.config import ModelConfig

        call = load_decompressor(artifact)
        quant = _validate_artifact(call, codec, artifact)
        # the codec already parsed this checkpoint for its (unreachable in
        # artifact mode) traced path — reuse the host tree instead of a
        # second msgpack parse; device_put ONCE, host numpy params would
        # re-upload the whole tree per request on remote transports
        if codec.unet_params is not None:
            host_params = codec.unet_params
        else:
            mc = ModelConfig.find_for_checkpoint(weights)
            host_params = load_unet_checkpoint(weights, mc.ch_mult if mc else (1, 2, 2))
        art = (call, jax.device_put(host_params), quant)
        c, p, qn = art
        kw = {} if qn is None else {"quant": qn}

        def run(zs, seed):
            with device_lock:
                return np.asarray(c(p, zs, seed=seed, **kw))

        # warm at startup: the first program call compiles (~13 s at flagship
        # scale over a remote transport) — pay it before accepting traffic
        run(np.zeros((call.meta["batch_size"], codec.dim), np.float32), 0)
        if call.meta["batch_size"] > 1:
            # batch>1 artifact: micro-batch concurrent requests into one call
            batcher = _MicroBatcher(run, batch_size=call.meta["batch_size"],
                                    max_wait_ms=batch_wait_ms)
    server = _Server(
        (host, port),
        make_handler(codec, artifact=art, batcher=batcher, sd=sd, lock=device_lock,
                     searcher=_Searcher(store_dir, codec, device_lock,
                                        ivf=search_ivf, nlist=search_nlist,
                                        nprobe=search_nprobe, u8=search_u8)))
    mode = f", artifact={artifact}" if artifact else ""
    if batcher is not None:
        mode += f", micro-batch={batcher.batch_size}"
    if sd is not None:
        mode += f", sd_artifact={sd_artifact}"
    print(f"[serve] codec (dim={codec.dim}{mode}) on http://{host}:{port}")
    return server


def _validate_artifact(call, codec: ClipCodec, artifact_path: str):
    """Fail-fast startup checks shared by the pixel and SD artifact paths:
    embedding dim, lowering platform, and (for int8 artifacts) the
    calibration sidecar. Returns the device_put quant tree or None."""
    import jax

    if call.meta["z_dim"] != codec.dim:
        raise ValueError(
            f"{artifact_path}: exported for z_dim={call.meta['z_dim']} but the "
            f"store carries dim={codec.dim} embeddings; re-export against "
            f"this store's checkpoint")
    backend = jax.default_backend()
    if backend not in call.platforms:
        raise ValueError(
            f"{artifact_path}: lowered for platforms {call.platforms} but this "
            f"box runs {backend!r}; re-export with --platforms {backend}")
    if not call.meta.get("int8"):
        return None
    from .utils.checkpoint import load_params

    sidecar = f"{artifact_path}.quant.msgpack"
    try:
        return jax.device_put(load_params(sidecar))
    except FileNotFoundError:
        raise ValueError(
            f"int8 artifact: calibration sidecar {sidecar} not found "
            f"(cli.export_decoder --int8 writes it)") from None


def _load_sd_serving(sd_artifact: str, adapter: Optional[str], codec: ClipCodec):
    """Load + validate + warm the SD artifact backing /decompress_sd.

    Frozen UNet/VAE come from $CLIP_CODEC_SD_UNET_WEIGHTS /
    $CLIP_CODEC_SD_VAE_WEIGHTS (torch or converted msgpack), the trained
    adapter from ``adapter``; all three ride as call-time arguments."""
    import jax

    from .cli.reconstruct_sd_diffusion import load_adapter_params
    from .deploy import load_sd_decompressor

    if adapter is None:
        raise ValueError("--sd_artifact needs --adapter <trained adapter checkpoint>")
    from pathlib import Path

    from .weights.convert_sd import load_sd_params, require_sd_weight_paths

    unet_path, vae_path = require_sd_weight_paths()

    call = load_sd_decompressor(sd_artifact)
    if call.meta["batch_size"] != 1:
        raise ValueError(
            f"SD serving artifacts must be exported with --batch_size 1 (got "
            f"{call.meta['batch_size']}): guidance_scale is per program call, "
            f"so requests cannot be coalesced")
    quant = _validate_artifact(call, codec, sd_artifact)
    up, vp = load_sd_params(unet_path, vae_path)
    up, vp = jax.device_put(up), jax.device_put(vp)
    ap_ = jax.device_put(load_adapter_params(Path(adapter)))
    kw = {} if quant is None else {"quant": quant}
    # warm before accepting traffic (first call compiles)
    np.asarray(call(up, vp, ap_, np.zeros((1, codec.dim), np.float32),
                    seed=0, guidance_scale=5.0, **kw))
    return (call, up, vp, ap_, quant)


def main() -> None:
    ap = argparse.ArgumentParser(description="Serve a ClipCodec store over HTTP.")
    ap.add_argument("--store_dir", type=str, required=True)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--artifact", type=str, default=None,
                    help="AOT-exported decoder.jaxprog (cli.export_decoder); "
                         "serves /decompress without tracing the model")
    ap.add_argument("--batch_wait_ms", type=float, default=5.0,
                    help="micro-batching gather window for batch>1 artifacts")
    ap.add_argument("--sd_artifact", type=str, default=None,
                    help="AOT-exported SD program (cli.export_decoder --sd); "
                         "serves /decompress_sd (SD weights via env vars)")
    ap.add_argument("--adapter", type=str, default=None,
                    help="trained SD adapter checkpoint (with --sd_artifact)")
    from .cli._common import add_int8_flag, apply_int8_flag

    ap.add_argument("--search_ivf", action="store_true",
                    help="serve /search from the clustered IVF index "
                         "(FAISS IndexIVFFlat analogue) instead of exact "
                         "search — for large stores")
    ap.add_argument("--search_nlist", type=int, default=None,
                    help="IVF cluster count (default ~sqrt(N))")
    ap.add_argument("--search_nprobe", type=int, default=8,
                    help="IVF cells probed per query")
    ap.add_argument("--search_u8", action="store_true",
                    help="serve /search and /search_image from a "
                         "uint8-resident index (the store's codes stay "
                         "compressed on device — 4x less HBM than fp32); "
                         "composes with --search_ivf")
    add_int8_flag(ap)
    args = ap.parse_args()
    apply_int8_flag(args)
    serve(args.store_dir, args.weights, args.host, args.port,
          artifact=args.artifact, batch_wait_ms=args.batch_wait_ms,
          sd_artifact=args.sd_artifact, adapter=args.adapter,
          search_ivf=args.search_ivf, search_nlist=args.search_nlist,
          search_nprobe=args.search_nprobe,
          search_u8=args.search_u8).serve_forever()


if __name__ == "__main__":
    main()
