"""Retrieval index (layer L7): exact inner-product search on device.

The reference wraps FAISS ``IndexFlatIP`` (``index/faiss_index.py:13-31``).
For L2-normalized CLIP vectors at the codec's scale (<=O(1e5) x 512) exact
search is one jitted matmul + ``lax.top_k`` on the TPU — no native ANN
library needed (SURVEY.md §2.4). API mirrors the reference: ``build_index``/
``search_index`` with k clamped to ntotal.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class FlatIPIndex:
    """Exact inner-product index over an (N, D) feature matrix."""

    feats: jax.Array  # (N, D) float32, resident on device

    @property
    def ntotal(self) -> int:
        return int(self.feats.shape[0])

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, D) queries -> (scores (Q, k), ids (Q, k)), descending."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if self.ntotal == 0:  # empty store: no candidates, not a top_k crash
            nq = int(q.shape[0])
            return np.zeros((nq, 0), np.float32), np.zeros((nq, 0), np.int32)
        k = max(1, min(k, self.ntotal))
        scores, ids = _search_jit(self.feats, q, k)
        return np.asarray(scores), np.asarray(ids)


from functools import partial


@partial(jax.jit, static_argnames=("k",))
def _search_jit(feats: jax.Array, q: jax.Array, k: int):
    sims = q @ feats.T  # (Q, N) inner products on the MXU
    return jax.lax.top_k(sims, k)


def build_index(feats: np.ndarray, use_gpu: bool = False) -> FlatIPIndex:
    """API-parity constructor (``faiss_index.py:13-19``); ``use_gpu`` is
    accepted and ignored — placement is JAX's (the TPU when present)."""
    del use_gpu
    return FlatIPIndex(feats=jnp.asarray(np.asarray(feats, dtype=np.float32)))


def search_index(
    qvec: np.ndarray, index: FlatIPIndex, paths: Sequence[str], k: int = 10
) -> List[Tuple[str, float]]:
    """Top-k (path, score) for one query vector (``faiss_index.py:23-31``)."""
    scores, ids = index.search(np.asarray(qvec)[None, :], k)
    out: List[Tuple[str, float]] = []
    for j, i in enumerate(ids[0]):
        if i < 0:
            continue
        out.append((paths[int(i)], float(scores[0, j])))
    return out


# --------------------------------------------------------------- multi-chip


@dataclass
class ShardedFlatIPIndex:
    """Exact inner-product index with the feature ROWS sharded over the
    ``data`` axis of a device mesh — the scale-out shape for stores past one
    chip's HBM. Search runs per-shard matmul + local ``top_k`` inside a
    ``shard_map`` (so only ``k`` candidates per shard cross the ICI, never
    the (Q, N) score matrix), then one global merge. Results are identical
    to :class:`FlatIPIndex` (exact search, no approximation).
    """

    feats: jax.Array  # (N_padded, D), row-sharded over 'data'
    ntotal: int       # real rows (pre-padding)
    mesh: object

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if self.ntotal == 0:  # empty store: no candidates, not a top_k crash
            nq = int(q.shape[0])
            return np.zeros((nq, 0), np.float32), np.zeros((nq, 0), np.int32)
        k = max(1, min(k, self.ntotal))
        # per-shard candidates: local top-min(k, shard) with GLOBAL row ids
        scores, ids = _sharded_candidates(self.mesh, self.feats, q, k)
        # global merge on host-sized data: (Q, k * n_shards) candidates
        scores = np.asarray(scores)
        ids = np.asarray(ids)
        scores = np.where(ids < self.ntotal, scores, -np.inf)  # drop padding
        order = np.argsort(-scores, axis=1)[:, :k]
        rows = np.arange(scores.shape[0])[:, None]
        return scores[rows, order], ids[rows, order]


def _sharded_candidates(mesh, feats, q, k: int):
    from jax.sharding import PartitionSpec as P

    shard_rows = feats.shape[0] // mesh.shape["data"]
    kk = min(k, shard_rows)

    def local(feats_l, q_l):
        sims = q_l @ feats_l.T  # (Q, N/n) on this shard's MXU
        s, i = jax.lax.top_k(sims, kk)
        base = jax.lax.axis_index("data").astype(jnp.int32) * shard_rows
        return s, base + i.astype(jnp.int32)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P()),
        out_specs=(P(None, "data"), P(None, "data")),
        check_vma=False,
    )
    return jax.jit(fn)(feats, q)


def build_sharded_index(feats: np.ndarray, mesh) -> ShardedFlatIPIndex:
    """Row-shard ``feats`` over ``mesh``'s ``data`` axis (zero-padding to a
    multiple; padded rows can never win — their ids are masked at merge)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    feats = np.asarray(feats, np.float32)
    n = mesh.shape["data"]
    ntotal = feats.shape[0]
    pad = (-ntotal) % n
    if pad:
        feats = np.concatenate([feats, np.zeros((pad, feats.shape[1]), np.float32)])
    sharded = jax.device_put(feats, NamedSharding(mesh, P("data", None)))
    return ShardedFlatIPIndex(feats=sharded, ntotal=ntotal, mesh=mesh)
