"""Dev benchmark: retrieval index at store scale on real TPU.

Run manually (not by the driver): ``python bench_index.py``. Compares the
exact FlatIPIndex (one (Q,N)x(N,D) matmul + top_k) against the clustered
IVFIndex (centroid matmul -> nprobe-list gather -> einsum) at large N,
plus k-means build time. Timing forces np.asarray materialization on the
(Q,k) outputs — tiny, so tunnel download cost is negligible here; what
dominates is the per-dispatch ~35ms tunnel latency, so each config is timed
as many searches amortized per call via batched queries AND reported
per-dispatch for the Q=1 text-query case.

Interpretation guide: exact search reads the full N*D matrix from HBM per
query batch; IVF reads nlist*D centroids + nprobe*cap*D gathered rows. The
crossover therefore scales with N/(nlist + nprobe*cap).
"""

import time

import numpy as np

from clip_codec_tpu.index import build_index, build_ivf_index


def timeit(fn, reps=20):
    fn()  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    _ = np.asarray(out[0])
    return (time.time() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    d = 512
    for n in (100_000, 1_000_000):
        feats = rng.standard_normal((n, d), dtype=np.float32)
        feats /= np.linalg.norm(feats, axis=1, keepdims=True)
        q = rng.standard_normal((64, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        q1 = q[:1]

        flat = build_index(feats)
        t0 = time.time()
        nlist = int(round(np.sqrt(n))) * 4  # finer cells: smaller probe reads
        ivf = build_ivf_index(feats, nlist=nlist, nprobe=16, iters=10)
        build_s = time.time() - t0
        cap = int(ivf.lists.shape[1])
        print(f"N={n} d={d}: IVF build {build_s:.1f}s "
              f"(nlist={ivf.nlist}, cap={cap}, "
              f"pad overhead {ivf.nlist * cap / n:.2f}x)")

        for label, qq in (("Q=64", q), ("Q=1 ", q1)):
            t_flat = timeit(lambda: flat.search(qq, 10))
            t_ivf = timeit(lambda: ivf.search(qq, 10))
            _, i_ref = flat.search(qq, 10)
            _, i_ivf = ivf.search(qq, 10)
            recall = np.mean([
                len(set(a.tolist()) & set(b.tolist())) / 10.0
                for a, b in zip(i_ivf, i_ref)
            ])
            print(f"  {label} exact {t_flat*1e3:7.2f} ms | "
                  f"ivf(nprobe=16) {t_ivf*1e3:7.2f} ms | "
                  f"{t_flat/t_ivf:4.1f}x | recall@10 {recall:.2f} "
                  f"(random isotropic vectors = ANN worst case; "
                  f"clustered real embeddings recall far higher)")


if __name__ == "__main__":
    main()
