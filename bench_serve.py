"""End-to-end HTTP serving benchmark: the full production path.

Measures what a client actually sees from ``clip_codec_tpu.serve`` backed by
an AOT artifact with micro-batching: HTTP + .clp decode + the compiled
DDIM trajectory on chip + PNG encode, under ``--concurrency`` parallel
clients. Complements bench.py (raw chip throughput, no serving stack).

    python bench_serve.py                      # flagship DDIM-50 256px, B=16
    python bench_serve.py --artifact dec.jaxprog   # reuse an exported program

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} where
vs_baseline compares against the same documented 2.0 img/s A100 estimate as
bench.py (the reference has no serving layer at all — its closest path is
one CLI process per image).
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import tempfile
import threading
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

A100_REFERENCE_IMGS_PER_SEC = 2.0  # bench.py's documented estimate


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", type=str, default="ddim",
                    choices=("ddim", "ddim_std", "dpmpp"),
                    help="dpmpp --steps 10 is the measured serving knee "
                         "(docs/performance.md): >= ddim-50 quality on "
                         "converged models at ~5x the rate")
    ap.add_argument("--batch", type=int, default=16, help="artifact batch (micro-batching)")
    ap.add_argument("--n_requests", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=32)
    ap.add_argument("--z_dim", type=int, default=512)
    ap.add_argument("--base", type=int, default=128)
    ap.add_argument("--artifact", type=str, default=None,
                    help="reuse an exported program (must match size/steps/batch/z_dim)")
    ap.add_argument("--format", type=str, default="png", choices=("png", "jpeg"))
    ap.add_argument("--output", type=str, default="uint8", choices=("float32", "uint8"),
                    help="artifact output dtype (uint8 = 4x smaller transfer)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
    from clip_codec_tpu.deploy import export_decompressor
    from clip_codec_tpu.io.bitstream import compress_frame
    from clip_codec_tpu.io.store import write_store
    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.serve import serve
    from clip_codec_tpu.utils.checkpoint import save_params
    from clip_codec_tpu.utils.config import ModelConfig

    tmp = Path(tempfile.mkdtemp(prefix="bench_serve_"))
    rng = np.random.default_rng(0)

    # store of random embeddings (the serving input is the .clp frame)
    feats = rng.standard_normal((args.n_requests, args.z_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp / "store"
    write_store(store, feats, [f"img{i}.png" for i in range(args.n_requests)],
                np.asarray(scale), np.asarray(zero), q)
    blobs = [compress_frame(q[i].tobytes()) for i in range(args.n_requests)]

    # random flagship decoder checkpoint (throughput is weight-independent)
    mc = ModelConfig(z_dim=args.z_dim, base=args.base, ch_mult=(1, 2, 2))
    net = CLIPCondUNet(z_dim=mc.z_dim, base=mc.base, ch_mult=mc.ch_mult, dtype=jnp.bfloat16)
    params = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)),
        jnp.zeros((1, mc.z_dim)), jnp.zeros((1,), jnp.int32))["params"]
    ckpt = save_params(store / "diffusion_unet_final.msgpack", params)
    mc.save(store)

    if args.artifact:
        art = Path(args.artifact)
    else:
        print(f"[bench_serve] exporting (trace+lower, one-time)...", file=sys.stderr)
        t0 = time.time()
        art = export_decompressor(params, mc, tmp / "dec.jaxprog", size=args.size,
                                  steps=args.steps, sampler=args.sampler,
                                  batch_size=args.batch, output=args.output)
        print(f"[bench_serve] export {time.time()-t0:.0f}s", file=sys.stderr)

    srv = serve(str(store), weights=str(ckpt), port=0, artifact=str(art),
                batch_wait_ms=20.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    addr = srv.server_address

    def request(i: int):
        c = http.client.HTTPConnection(*addr, timeout=1200)
        c.request("POST", f"/decompress?format={args.format}", body=blobs[i])
        r = c.getresponse()
        d = r.read()
        c.close()
        assert r.status == 200, d[:200]
        return d

    request(0)  # warm: compile on first program call
    t0 = time.time()
    sem = threading.Semaphore(args.concurrency)
    threads = []
    errs = []

    def worker(i):
        try:
            request(i)
        except Exception as e:  # pragma: no cover
            errs.append(e)
        finally:
            sem.release()

    for i in range(args.n_requests):
        sem.acquire()
        t = threading.Thread(target=worker, args=(i,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    dt = time.time() - t0
    if errs:
        raise errs[0]
    v = args.n_requests / dt
    print(json.dumps({
        "metric": f"e2e HTTP serving img/s ({args.sampler.upper()}-{args.steps} {args.size}px, "
                  f"micro-batch {args.batch}, {args.concurrency} clients, {args.format})",
        "value": round(v, 3), "unit": "images/sec",
        "vs_baseline": round(v / A100_REFERENCE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
