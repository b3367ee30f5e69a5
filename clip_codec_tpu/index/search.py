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
        k = max(1, min(k, self.ntotal))
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
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
