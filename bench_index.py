"""Dev benchmark: retrieval index at store scale on real TPU.

Run manually (not by the driver): ``python bench_index.py``. Compares the
exact FlatIPIndex (one (Q,N)x(N,D) matmul + top_k) against the clustered
IVFIndex (centroid matmul -> nprobe-list gather -> einsum) at large N.

Per-dispatch timing over the tunneled transport is meaningless here (the
~35 ms dispatch latency dwarfs both searches — measured: N=1M exact and IVF
both "cost" ~55 ms/dispatch), so ON-DEVICE cost uses the repo's in-scan
differencing method: run L searches inside one ``lax.scan`` (distinct query
per step so nothing hoists), time L=2 and L=22, and difference — the delta
is 20 pure on-device searches. Expectation from the bandwidth model: exact
search reads the full N*D matrix from HBM per query batch (2 GB at N=1M,
d=512 -> ~2.5 ms at v5e HBM speed); the uint8-resident variants read the
RAW store codes (4x fewer bytes, dequantize folded into the dot); IVF reads
nlist centroids + the nprobe*cap gathered rows per query (~10 MB at
nprobe=16) — the win is the read-volume ratio, and it grows linearly
with N.

Measured (v5e chip, in-scan, 20-search delta, round 3):

  N=1M:   Q=1  exact 2.773 ms | exact-u8 1.085 ms (2.6x) |
               ivf 0.010 ms | ivf-u8 0.024 ms
          Q=64 exact 4.100 ms | exact-u8 3.452 ms (1.2x) |
               ivf 2.843 ms | ivf-u8 2.782 ms
  N=100k: Q=1  exact 0.263 ms | exact-u8 0.094 ms (2.8x) |
               ivf 0.011 ms | ivf-u8 0.052 ms
          Q=64 exact 0.306 ms | exact-u8 0.300 ms |
               ivf 1.152 ms | ivf-u8 0.865 ms

Reading the table: single-query EXACT search is HBM-read-bound, so u8
delivers 2.6-2.8x there (not the full 4x: the in-dot u8->f32 convert is
VPU work the fp32 path doesn't do). Batched exact search (Q=64) is
f32-MXU-bound, so u8 gains little. IVF at Q=1 is so small that u8's convert
overhead makes it slightly SLOWER (0.01 vs 0.02 ms — both negligible);
at Q=64 the gather traffic dominates and ivf-u8 wins 1.3x. The u8 variants'
constant wins are capacity: 4x more vectors per chip's HBM, and the store's
codes ARE the index (no fp32 matrix ever materialized). Build cost: 95 s at
N=1M (host bucketing + 10 on-device Lloyd iterations), pad overhead 1.18x.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from clip_codec_tpu.codecs import fit_affine, quantize
from clip_codec_tpu.index import (build_index, build_index_u8,
                                  build_ivf_index, build_ivf_index_u8)
from clip_codec_tpu.index.ivf import _ivf_search, _ivf_u8_search
from clip_codec_tpu.index.search import _search_jit, _u8_search_jit


def _scan_time(body, arrays, qs, L, reps=5):
    """Time a scan of `body(q, *arrays)` over the first L query batches.
    ``arrays`` ride as jit ARGUMENTS — closure-capturing the 0.2–2 GB
    feature matrix serializes it into the program body and blows the
    remote-compile limit (HTTP 413, measured)."""

    @jax.jit
    def run(qs_l, *arrs):
        def step(acc, q):
            s, _ = body(q, *arrs)
            return acc + jnp.sum(s), None

        acc, _ = jax.lax.scan(step, jnp.float32(0.0), qs_l)
        return acc

    sub = qs[:L]
    float(run(sub, *arrays))  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = run(sub, *arrays)
    float(out)
    return (time.time() - t0) / reps


def on_device_search_ms(body, arrays, qs):
    """20-search scan delta -> ms per search, dispatch-free. (20, not the
    round-2 10: sub-ms searches at N=100k were inside the differencing
    noise — a u8 probe once measured NEGATIVE at L-delta 10.)"""
    t2 = _scan_time(body, arrays, qs, 2)
    t22 = _scan_time(body, arrays, qs, 22)
    return (t22 - t2) / 20 * 1e3


def main():
    rng = np.random.default_rng(0)
    d = 512
    for n in (100_000, 1_000_000):
        feats = rng.standard_normal((n, d), dtype=np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)

        flat = build_index(feats)
        scale, zero = fit_affine(feats)
        codes = np.asarray(quantize(feats, scale, zero))
        u8 = build_index_u8(codes, scale, zero)
        t0 = time.time()
        nlist = int(round(np.sqrt(n))) * 4  # finer cells: smaller probe reads
        ivf = build_ivf_index(feats, nlist=nlist, nprobe=16, iters=10)
        build_s = time.time() - t0
        ivf_u8 = build_ivf_index_u8(codes, scale, zero, nlist=nlist,
                                    nprobe=16, iters=10)
        cap = int(ivf.lists.shape[1])
        print(f"N={n} d={d}: IVF build {build_s:.1f}s "
              f"(nlist={ivf.nlist}, cap={cap}, "
              f"pad overhead {ivf.nlist * cap / n:.2f}x)")

        for label, nq in (("Q=64", 64), ("Q=1 ", 1)):
            qs = rng.standard_normal((22, nq, d)).astype(np.float32)
            qs /= np.linalg.norm(qs, axis=2, keepdims=True)
            qs = jnp.asarray(qs)
            ms_flat = on_device_search_ms(
                lambda q, f: _search_jit(f, q, 10), (flat.feats,), qs)
            ms_u8 = on_device_search_ms(
                lambda q, c, s, z, inv: _u8_search_jit(c, s, z, inv, q, 10),
                (u8.codes, u8.scale, u8.zero, u8.inv_norms), qs)
            ms_ivf = on_device_search_ms(
                lambda q, c, ls, ids: _ivf_search(c, ls, ids, q, 10, 16),
                (ivf.centroids, ivf.lists, ivf.list_ids), qs)
            ms_ivf_u8 = on_device_search_ms(
                lambda q, c, ls, li, ids, s, z: _ivf_u8_search(
                    c, ls, li, ids, s, z, q, 10, 16),
                (ivf_u8.centroids, ivf_u8.lists, ivf_u8.list_inv,
                 ivf_u8.list_ids, ivf_u8.scale, ivf_u8.zero), qs)
            # recall on this data is the ANN worst case (random isotropic
            # vectors have no cluster structure); report it for honesty
            q0 = np.asarray(qs[0])
            _, i_ref = flat.search(q0, 10)
            _, i_ivf = ivf.search(q0, 10)
            recall = np.mean([
                len(set(a.tolist()) & set(b.tolist())) / 10.0
                for a, b in zip(i_ivf, i_ref)
            ])
            print(f"  {label} on-device: exact {ms_flat:7.3f} ms | "
                  f"exact-u8 {ms_u8:7.3f} ms ({ms_flat/ms_u8:4.1f}x) | "
                  f"ivf(nprobe=16) {ms_ivf:7.3f} ms ({ms_flat/ms_ivf:5.1f}x) | "
                  f"ivf-u8 {ms_ivf_u8:7.3f} ms | recall@10 {recall:.2f} "
                  f"(isotropic-random = worst case)")


if __name__ == "__main__":
    main()
