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

    def search(self, queries: np.ndarray, k: int,
               recall_target: float | None = None,
               ) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, D) queries -> (scores (Q, k), ids (Q, k)), descending.

        ``recall_target=None`` (default) ranks with exact ``lax.top_k``.
        A value in (0, 1] switches to ``lax.approx_max_k`` — the TPU's
        PartialReduce op, which FUSES ranking into the score matmul. At
        N=1M, Q=64 the exact ``top_k`` costs 2.7 ms on top of a 1.4 ms dot;
        ``recall_target=0.95`` makes ranking free (4.10 -> 1.36 ms total,
        measured 95% recall@10). Exact search is already ranking-bound only
        for BATCHED queries — Q=1 gains nothing — so this is the bulk-query
        knob. ``recall_target=1.0`` is exact but no faster; on non-TPU
        backends approx_max_k falls back to exact sorting."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if self.ntotal == 0:  # empty store: no candidates, not a top_k crash
            nq = int(q.shape[0])
            return np.zeros((nq, 0), np.float32), np.zeros((nq, 0), np.int32)
        k = max(1, min(k, self.ntotal))
        scores, ids = _search_jit(self.feats, q, k, recall_target)
        return np.asarray(scores), np.asarray(ids)


from functools import partial


def _rank(sims: jax.Array, k: int, recall_target: float | None):
    """Exact top_k, or the dot-fused TPU PartialReduce when a recall target
    is given (see FlatIPIndex.search)."""
    if recall_target is None:
        return jax.lax.top_k(sims, k)
    return jax.lax.approx_max_k(sims, k, recall_target=recall_target)


@partial(jax.jit, static_argnames=("k", "recall_target"))
def _search_jit(feats: jax.Array, q: jax.Array, k: int,
                recall_target: float | None = None):
    sims = q @ feats.T  # (Q, N) inner products on the MXU
    return _rank(sims, k, recall_target)


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


# ------------------------------------------------------------ uint8-resident


@partial(jax.jit, static_argnames=("k", "recall_target"))
def _u8_search_jit(codes, scale, zero, inv_norms, q, k: int,
                   recall_target: float | None = None):
    """Exact IP search directly over the store's uint8 codes.

    The dequantize+renormalize fold: with x_i = scale*u_i + zero and
    x̂_i = x_i/‖x_i‖, the score q·x̂_i = ((q*scale)·u_i + q·zero) / ‖x_i‖ —
    so the (N, D) matrix stays uint8 in HBM (4x less read traffic and
    resident memory than fp32; the search is HBM-read-bound) and only the
    (D,)-sized query work touches fp32. XLA fuses the u8->f32 convert into
    the dot: measured temp_size_in_bytes == 0 at (1M, 512)."""
    qs = q * scale[None, :]                              # (Q, D)
    qz = q @ zero                                        # (Q,)
    sims = qs @ codes.astype(jnp.float32).T              # (Q, N) on the MXU
    sims = (sims + qz[:, None]) * inv_norms[None, :]
    return _rank(sims, k, recall_target)


@jax.jit
def _u8_inv_norms(codes, scale, zero, eps: float = 1e-9):
    """1/‖scale*u_i + zero‖ per row, computed on device (the elementwise
    dequantize fuses into the reduction — no (N, D) fp32 temp)."""
    x = codes.astype(jnp.float32) * scale[None, :] + zero[None, :]
    n = jnp.sqrt(jnp.sum(x * x, axis=-1))
    return 1.0 / jnp.maximum(n, eps)


@dataclass
class U8FlatIPIndex:
    """Exact inner-product index resident as the store's RAW uint8 codes.

    Same hits as :class:`FlatIPIndex` over the dequantized+renormalized
    matrix (scores differ only by fp32 summation order, ~1e-6), at 1/4 the
    HBM footprint and read traffic — the store stays compressed on device.
    Build straight from ``Store.read_codes()`` + ``codec_meta.npz``; the
    fp32 feature matrix is never materialized anywhere.
    """

    codes: jax.Array      # (N, D) uint8, resident on device
    scale: jax.Array      # (D,) float32
    zero: jax.Array       # (D,) float32
    inv_norms: jax.Array  # (N,) float32

    @property
    def ntotal(self) -> int:
        return int(self.codes.shape[0])

    def search(self, queries: np.ndarray, k: int,
               recall_target: float | None = None,
               ) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, D) queries -> (scores (Q, k), ids (Q, k)), descending.
        ``recall_target`` as on :meth:`FlatIPIndex.search` (the u8 path is
        even more ranking-bound at batched Q: the dot reads 4x less)."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if self.ntotal == 0:
            nq = int(q.shape[0])
            return np.zeros((nq, 0), np.float32), np.zeros((nq, 0), np.int32)
        k = max(1, min(k, self.ntotal))
        scores, ids = _u8_search_jit(
            self.codes, self.scale, self.zero, self.inv_norms, q, k,
            recall_target,
        )
        return np.asarray(scores), np.asarray(ids)


def build_index_u8(
    codes: np.ndarray, scale: np.ndarray, zero: np.ndarray
) -> U8FlatIPIndex:
    """Build the uint8-resident exact index from quantized codes + codec
    meta (``Store.read_codes()`` / ``codec_meta.npz``). Row norms are
    computed once on device at build."""
    codes = jnp.asarray(np.ascontiguousarray(codes, dtype=np.uint8))
    scale = jnp.asarray(np.asarray(scale, np.float32))
    zero = jnp.asarray(np.asarray(zero, np.float32))
    if codes.shape[0] == 0:
        inv = jnp.zeros((0,), jnp.float32)
    else:
        inv = _u8_inv_norms(codes, scale, zero)
    return U8FlatIPIndex(codes=codes, scale=scale, zero=zero, inv_norms=inv)


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
        scores, ids = _sharded_candidates(self.mesh, self.feats, q, k, self.ntotal)
        return _merge_candidates(scores, ids, self.ntotal, k)


def _merge_candidates(scores, ids, ntotal: int, k: int):
    """Global merge of per-shard candidates on host-sized data:
    (Q, k * n_shards) -> (Q, k), dropping padded rows (id >= ntotal)."""
    scores = np.asarray(scores)
    ids = np.asarray(ids)
    scores = np.where(ids < ntotal, scores, -np.inf)
    order = np.argsort(-scores, axis=1)[:, :k]
    rows = np.arange(scores.shape[0])[:, None]
    return scores[rows, order], ids[rows, order]


def _sharded_candidates(mesh, feats, q, k: int, ntotal: int):
    from jax.sharding import PartitionSpec as P

    shard_rows = feats.shape[0] // mesh.shape["data"]
    kk = min(k, shard_rows)

    def local(feats_l, q_l):
        sims = q_l @ feats_l.T  # (Q, N/n) on this shard's MXU
        # mask padding rows to -inf BEFORE the local top_k: a zero-padded
        # row scores exactly 0, which would displace real rows with
        # NEGATIVE scores from the local candidate set (and the merge would
        # then drop the true hit, not recover it)
        base = jax.lax.axis_index("data").astype(jnp.int32) * shard_rows
        gids = base + jnp.arange(shard_rows, dtype=jnp.int32)
        sims = jnp.where(gids[None, :] < ntotal, sims, -jnp.inf)
        s, i = jax.lax.top_k(sims, kk)
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


@dataclass
class ShardedU8FlatIPIndex:
    """Row-sharded :class:`U8FlatIPIndex`: the uint8 codes are sharded over
    the ``data`` mesh axis, so a multi-chip store holds 4x the vectors per
    chip vs the fp32 sharded index. Search = per-shard folded-dequantize dot
    + local ``top_k`` inside a ``shard_map`` (only ``k`` candidates per
    shard cross the ICI), then the same exact global merge."""

    codes: jax.Array      # (N_padded, D) uint8, row-sharded over 'data'
    scale: jax.Array      # (D,) float32, replicated
    zero: jax.Array       # (D,) float32, replicated
    inv_norms: jax.Array  # (N_padded,) float32, row-sharded over 'data'
    ntotal: int           # real rows (pre-padding)
    mesh: object

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if self.ntotal == 0:
            nq = int(q.shape[0])
            return np.zeros((nq, 0), np.float32), np.zeros((nq, 0), np.int32)
        k = max(1, min(k, self.ntotal))
        scores, ids = _sharded_u8_candidates(
            self.mesh, self.codes, self.scale, self.zero, self.inv_norms, q, k,
            self.ntotal,
        )
        return _merge_candidates(scores, ids, self.ntotal, k)


def _sharded_u8_candidates(mesh, codes, scale, zero, inv_norms, q, k: int,
                           ntotal: int):
    from jax.sharding import PartitionSpec as P

    shard_rows = codes.shape[0] // mesh.shape["data"]
    kk = min(k, shard_rows)

    def local(codes_l, scale_l, zero_l, inv_l, q_l):
        qs = q_l * scale_l[None, :]
        qz = q_l @ zero_l
        sims = qs @ codes_l.astype(jnp.float32).T      # (Q, N/n) this shard
        sims = (sims + qz[:, None]) * inv_l[None, :]
        # padding rows (inv_norm 0) score (0+qz)*0 = 0, which beats real
        # NEGATIVE scores — mask to -inf before the local top_k (see
        # _sharded_candidates)
        base = jax.lax.axis_index("data").astype(jnp.int32) * shard_rows
        gids = base + jnp.arange(shard_rows, dtype=jnp.int32)
        sims = jnp.where(gids[None, :] < ntotal, sims, -jnp.inf)
        s, i = jax.lax.top_k(sims, kk)
        return s, base + i.astype(jnp.int32)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P(), P(), P("data"), P()),
        out_specs=(P(None, "data"), P(None, "data")),
        check_vma=False,
    )
    return jax.jit(fn)(codes, scale, zero, inv_norms, q)


def build_sharded_index_u8(
    codes: np.ndarray, scale: np.ndarray, zero: np.ndarray, mesh
) -> ShardedU8FlatIPIndex:
    """Row-shard raw store codes over ``mesh``'s ``data`` axis. Padding rows
    (all-zero codes, inv_norm 0) are masked to -inf before each shard's
    local top_k — their raw score would be exactly 0, which outranks real
    negative-scoring rows — and dropped by id at merge as a second layer."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = mesh.shape["data"]
    ntotal = codes.shape[0]
    pad = (-ntotal) % n
    scale = jnp.asarray(np.asarray(scale, np.float32))
    zero = jnp.asarray(np.asarray(zero, np.float32))
    inv = (np.asarray(_u8_inv_norms(jnp.asarray(codes), scale, zero))
           if ntotal else np.zeros((0,), np.float32))
    if pad:
        codes = np.concatenate([codes, np.zeros((pad, codes.shape[1]), np.uint8)])
        inv = np.concatenate([inv, np.zeros((pad,), np.float32)])
    sharded_codes = jax.device_put(codes, NamedSharding(mesh, P("data", None)))
    sharded_inv = jax.device_put(inv, NamedSharding(mesh, P("data")))
    return ShardedU8FlatIPIndex(
        codes=sharded_codes, scale=scale, zero=zero,
        inv_norms=sharded_inv, ntotal=ntotal, mesh=mesh,
    )
