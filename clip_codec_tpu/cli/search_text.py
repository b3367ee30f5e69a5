"""Text -> image retrieval over the compressed store.

Flag-compatible with the reference (``cli/search_text.py:45-51``):
``--store_dir --query --k --use_gpu``. Output format matches: one
``score\\tpath`` line per hit.

Reference behaviors kept: features come from ``decoded.npy`` when present
(the reference *requires* it — its in-file bitstream path is dead placeholder
code, ``search_text.py:36-43``). Improvements: when ``decoded.npy`` is absent
we decode the store's bitstreams directly instead of exiting;
``--data_parallel`` row-shards the feature matrix over every chip
(:class:`~clip_codec_tpu.index.ShardedFlatIPIndex`) for stores past one
chip's HBM — exact search, identical results; and ``--ivf`` switches to the
clustered ANN index (:class:`~clip_codec_tpu.index.IVFIndex`, the FAISS
``IndexIVFFlat`` analogue) with ``--nlist``/``--nprobe`` knobs.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ._common import default_device


def load_features(store_dir: Path):
    with open(store_dir / "manifest.json", "r", encoding="utf-8") as f:
        paths = [rec["image"] for rec in json.load(f)]
    decoded_path = store_dir / "decoded.npy"
    if decoded_path.exists():
        return np.load(decoded_path), paths
    from ..io.store import Store

    return Store.open(store_dir).decode_all(renormalize=True), paths


def main() -> None:
    ap = argparse.ArgumentParser(description="Search images with a text query against an exact IP index.")
    ap.add_argument("--store_dir", type=str, required=True)
    ap.add_argument("--query", type=str, required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--use_gpu", action="store_true")  # accepted for parity; placement is JAX's
    ap.add_argument("--data_parallel", action="store_true",
                    help="row-shard the feature matrix over all chips "
                         "(ShardedFlatIPIndex) — for stores past one chip's "
                         "HBM; results identical to the single-chip index")
    ap.add_argument("--ivf", action="store_true",
                    help="use the clustered IVF index (FAISS IndexIVFFlat "
                         "analogue) instead of exact search — probes only "
                         "--nprobe of --nlist k-means cells per query")
    ap.add_argument("--nlist", type=int, default=None,
                    help="IVF cluster count (default ~sqrt(N))")
    ap.add_argument("--nprobe", type=int, default=8,
                    help="IVF cells probed per query (higher = better "
                         "recall; nprobe >= nlist is exact)")
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--bpe", type=str, default=None)
    args = ap.parse_args()

    from ..encoders import ClipEncoder
    from ..index import build_index, build_ivf_index, build_sharded_index, search_index

    store_dir = Path(args.store_dir)
    feats, paths = load_features(store_dir)
    if args.data_parallel:
        from ..parallel import make_mesh

        idx = build_sharded_index(feats, make_mesh())
    elif args.ivf:
        idx = build_ivf_index(feats, nlist=args.nlist, nprobe=args.nprobe)
    else:
        idx = build_index(feats, use_gpu=args.use_gpu)
    encoder = ClipEncoder(weights_path=args.weights, bpe_path=args.bpe)
    qvec = encoder.encode_text(args.query)[0]
    for p, s in search_index(qvec, idx, paths, k=args.k):
        print(f"{s:.4f}\t{p}")


if __name__ == "__main__":
    main()
