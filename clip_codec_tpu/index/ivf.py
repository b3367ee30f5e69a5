"""IVF (inverted-file) retrieval index: clustered ANN search on device.

The reference's retrieval layer is FAISS ``IndexFlatIP`` (exact,
``index/faiss_index.py:13-31``) — our :class:`~.search.FlatIPIndex` covers
that. FAISS's standard next step for large stores is ``IndexIVFFlat``:
k-means-cluster the vectors into ``nlist`` inverted lists, probe only the
``nprobe`` lists whose centroids score highest for a query. This module is
the TPU-native equivalent:

* **training** is Lloyd k-means run on device — each iteration is one
  ``(N, nlist)`` matmul on the MXU plus a ``segment_sum`` update, jitted;
* **storage** is a single dense ``(nlist, cap, D)`` tensor of zero-padded
  inverted lists (static shapes — XLA-friendly; padding rows carry id −1 and
  are masked to −inf before ranking), so
* **search** is one jitted program: centroid matmul → ``top_k`` probe →
  list gather → one einsum over the gathered candidates → masked ``top_k``.
  No host-side list walking, no dynamic shapes.

Semantics match FAISS IVF with ``METRIC_INNER_PRODUCT``: training minimizes
L2 (identical ordering to cosine for the codec's L2-normalized CLIP/DINO
embeddings), probing and scoring use inner product, and queries that probe
fewer than ``k`` candidates pad the tail with id −1 (callers already skip
negative ids, matching ``faiss_index.py:28-30``).

Memory note: the padded layout costs ``nlist * cap * D`` floats where
``cap`` is the LARGEST list. ``build_ivf_index`` rebalances by default
(``max_imbalance``) by spilling overflow rows to their next-nearest
centroid, which keeps ``cap`` within a small multiple of N/nlist while
preserving exactness-under-full-probe (every row lives in exactly one list).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["IVFIndex", "ShardedIVFIndex", "build_ivf_index", "build_ivf_index_u8", "kmeans", "shard_ivf_index"]


# ------------------------------------------------------------------ k-means


@partial(jax.jit, donate_argnums=(1,))
def _lloyd_step(feats: jax.Array, centroids: jax.Array):
    """One Lloyd iteration. L2 assignment via the IP trick (feats have
    constant norm per row as far as argmin is concerned): argmin ||x-c||^2 =
    argmax (x.c - ||c||^2/2). Returns (new_centroids, assignments)."""
    scores = feats @ centroids.T - 0.5 * jnp.sum(centroids * centroids, axis=1)
    assign = jnp.argmax(scores, axis=1)  # (N,)
    nlist = centroids.shape[0]
    sums = jax.ops.segment_sum(feats, assign, num_segments=nlist)
    counts = jax.ops.segment_sum(
        jnp.ones((feats.shape[0],), jnp.float32), assign, num_segments=nlist
    )
    # empty cluster: keep the previous centroid (FAISS reassigns; for the
    # codec's scale an idle centroid simply never wins a probe)
    new = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centroids
    )
    return new, assign


def kmeans(
    feats: np.ndarray, nlist: int, iters: int = 10, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Plain Lloyd k-means on device. Returns (centroids (nlist, D) fp32,
    assignments (N,) int32). Deterministic: init samples ``nlist`` distinct
    rows with a seeded host RNG."""
    feats = np.asarray(feats, np.float32)
    n = feats.shape[0]
    if nlist > n:
        raise ValueError(f"nlist={nlist} > ntotal={n}")
    rng = np.random.default_rng(seed)
    init = rng.choice(n, size=nlist, replace=False)
    cent = jnp.asarray(feats[np.sort(init)])
    dev_feats = jnp.asarray(feats)
    assign = None
    for _ in range(max(1, int(iters))):
        cent, assign = _lloyd_step(dev_feats, cent)
    return np.asarray(cent), np.asarray(assign, np.int32)


# ------------------------------------------------------------------- search


def _rank_candidates(sims, ids, k: int):
    """Mask padding rows, flatten the probed pool, top-k with −1 id padding
    when the pool is smaller than k (static shapes throughout)."""
    sims = jnp.where(ids >= 0, sims, -jnp.inf)
    qn = sims.shape[0]
    sims = sims.reshape(qn, -1)
    ids = ids.reshape(qn, -1)
    if sims.shape[1] < k:
        pad = k - sims.shape[1]
        sims = jnp.pad(sims, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
    s, j = jax.lax.top_k(sims, k)
    return s, jnp.take_along_axis(ids, j, axis=1)


@partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search(centroids, lists, list_ids, q, k: int, nprobe: int):
    cscores = q @ centroids.T                       # (Q, nlist) on the MXU
    _, probe = jax.lax.top_k(cscores, nprobe)       # (Q, nprobe)
    cand = lists[probe]                             # (Q, nprobe, cap, D)
    ids = list_ids[probe]                           # (Q, nprobe, cap)
    sims = jnp.einsum("qd,qpcd->qpc", q, cand)
    return _rank_candidates(sims, ids, k)


@partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_u8_search(centroids, lists, list_inv, list_ids, scale, zero, q,
                   k: int, nprobe: int):
    """IVF probe over uint8-resident lists: the same folded dequantize as
    :func:`~.search._u8_search_jit` — q·x̂ = ((q*scale)·u + q·zero)/‖x‖ with
    per-entry 1/‖x‖ precomputed at build — so both the resident lists and
    the per-query gather move 4x fewer bytes than fp32."""
    cscores = q @ centroids.T
    _, probe = jax.lax.top_k(cscores, nprobe)
    cand = lists[probe]                             # (Q, nprobe, cap, D) u8
    inv = list_inv[probe]                           # (Q, nprobe, cap)
    ids = list_ids[probe]
    qs = q * scale[None, :]
    qz = q @ zero
    sims = jnp.einsum("qd,qpcd->qpc", qs, cand.astype(jnp.float32))
    sims = (sims + qz[:, None, None]) * inv
    return _rank_candidates(sims, ids, k)


@dataclass
class IVFIndex:
    """Clustered inner-product index (FAISS ``IndexIVFFlat`` analogue).

    ``lists``/``list_ids`` hold every vector exactly once, bucketed by
    nearest centroid and zero-padded to the common capacity; searching with
    ``nprobe >= nlist`` is therefore EXACT (identical hits to
    :class:`~.search.FlatIPIndex`).

    uint8-resident variant (:func:`build_ivf_index_u8`): ``lists`` holds the
    store's RAW quantized codes with per-entry ``list_inv`` = 1/‖x‖ and the
    codec ``scale``/``zero`` — 4x less resident HBM and gather traffic, the
    dequantize folded into the probe einsum.
    """

    centroids: jax.Array   # (nlist, D) fp32
    lists: jax.Array       # (nlist, cap, D) fp32 — or uint8 codes (u8 mode)
    list_ids: jax.Array    # (nlist, cap) int32, -1 = padding
    ntotal: int
    nprobe: int = 8        # default probe width for .search
    # u8 mode only (None in fp32 mode):
    scale: jax.Array | None = None      # (D,) fp32
    zero: jax.Array | None = None       # (D,) fp32
    list_inv: jax.Array | None = None   # (nlist, cap) fp32, 0 on padding

    @property
    def nlist(self) -> int:
        return int(self.centroids.shape[0])

    def search(
        self, queries: np.ndarray, k: int, nprobe: int | None = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, D) queries -> (scores (Q, k), ids (Q, k)) descending; ids are
        −1 past the number of candidates the probed lists held (FAISS
        semantics — callers skip negatives)."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        if self.ntotal == 0:
            nq = int(q.shape[0])
            return np.zeros((nq, 0), np.float32), np.zeros((nq, 0), np.int32)
        k = max(1, min(k, self.ntotal))
        np_ = self.nprobe if nprobe is None else int(nprobe)
        np_ = max(1, min(np_, self.nlist))
        if self.scale is not None:
            scores, ids = _ivf_u8_search(
                self.centroids, self.lists, self.list_inv, self.list_ids,
                self.scale, self.zero, q, k, np_
            )
        else:
            scores, ids = _ivf_search(
                self.centroids, self.lists, self.list_ids, q, k, np_
            )
        return np.asarray(scores), np.asarray(ids)


def _rebalance(
    feats: np.ndarray, centroids: np.ndarray, assign: np.ndarray, cap: int
) -> np.ndarray:
    """Spill rows of over-full clusters to their next-nearest centroid with
    room, keeping every row in exactly one list and every list <= cap.
    Host cost is O(spill * nlist) — scores are computed only for members of
    over-full clusters, never the full (N, nlist) matrix."""
    counts = np.bincount(assign, minlength=centroids.shape[0])
    half_cn = 0.5 * np.sum(centroids**2, axis=1)
    spill_rows = []
    for c in np.where(counts > cap)[0]:
        members = np.where(assign == c)[0]
        # keep the rows that like c most; spill the rest
        keep_rank = feats[members] @ centroids[c] - half_cn[c]
        spill = members[np.argsort(-keep_rank)[cap:]]
        counts[c] -= len(spill)
        spill_rows.append(spill)
    if not spill_rows:
        return assign
    spill = np.concatenate(spill_rows)
    order = np.argsort(-(feats[spill] @ centroids.T - half_cn), axis=1)
    for j, r in enumerate(spill):
        for alt in order[j]:
            if counts[alt] < cap:
                assign[r] = alt
                counts[alt] += 1
                break
    return assign


def build_ivf_index(
    feats: np.ndarray,
    nlist: int | None = None,
    nprobe: int = 8,
    iters: int = 10,
    seed: int = 0,
    max_imbalance: float = 4.0,
) -> IVFIndex:
    """Train k-means and bucket ``feats`` into padded inverted lists.

    ``nlist`` defaults to ~sqrt(N) (FAISS guidance). ``max_imbalance`` caps
    list capacity at ``max_imbalance * ceil(N/nlist)``; overflow rows are
    reassigned to their next-nearest centroid (recall impact is marginal —
    spilled rows sit near a cluster boundary by construction). Set it to
    ``None`` to keep raw assignments (cap = largest list)."""
    feats = np.asarray(feats, np.float32)
    n, d = feats.shape if feats.ndim == 2 else (0, 0)
    if n == 0:
        return _empty_ivf(d)
    slots = _train_and_slot(feats, nlist, iters, seed, max_imbalance)
    centroids, nlist, cap, sorted_assign, slot, row_order = slots
    lists = np.zeros((nlist, cap, d), np.float32)
    ids = np.full((nlist, cap), -1, np.int32)
    lists[sorted_assign, slot] = feats[row_order]
    ids[sorted_assign, slot] = row_order
    return IVFIndex(
        centroids=jnp.asarray(centroids), lists=jnp.asarray(lists),
        list_ids=jnp.asarray(ids), ntotal=n,
        nprobe=max(1, min(int(nprobe), nlist)),
    )


def _empty_ivf(d: int) -> IVFIndex:
    z = jnp.zeros((1, max(d, 1)), jnp.float32)
    return IVFIndex(
        centroids=z, lists=z[:, None, :],
        list_ids=jnp.full((1, 1), -1, jnp.int32), ntotal=0, nprobe=1,
    )


def _resolve_nlist(n: int, nlist) -> int:
    if nlist is None:
        nlist = max(1, min(n, int(round(np.sqrt(n)))))
    return max(1, min(int(nlist), n))


def _slot(assign: np.ndarray, nlist: int):
    """Vectorized slot assignment (stable-sort rows by cluster, slot = rank
    in run). Returns (cap, sorted_assign, slot, row_order)."""
    n = assign.shape[0]
    counts = np.bincount(assign, minlength=nlist)
    cap = max(1, int(counts.max()))
    row_order = np.argsort(assign, kind="stable")
    sorted_assign = assign[row_order]
    starts = np.searchsorted(sorted_assign, np.arange(nlist))
    slot = np.arange(n) - starts[sorted_assign]
    return cap, sorted_assign, slot, row_order


def _train_and_slot(feats, nlist, iters, seed, max_imbalance):
    """k-means train + rebalance + slot assignment — shared by the fp32 and
    (small-store) u8 builders so both bucket identically."""
    n = feats.shape[0]
    nlist = _resolve_nlist(n, nlist)
    centroids, assign = kmeans(feats, nlist, iters=iters, seed=seed)
    if max_imbalance is not None and nlist > 1:
        cap = int(np.ceil(max_imbalance * np.ceil(n / nlist)))
        assign = _rebalance(feats, centroids, assign.copy(), cap)
    cap, sorted_assign, slot, row_order = _slot(assign, nlist)
    return centroids, nlist, cap, sorted_assign, slot, row_order


@jax.jit
def _assign_chunk(c_u8, cent, scale, zero, half_cn):
    """Batched u8 assignment: dequantize+renormalize a code chunk on device
    (fused — no full fp32 matrix) and apply :func:`_lloyd_step`'s rule."""
    x = c_u8.astype(jnp.float32) * scale[None, :] + zero[None, :]
    nrm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    xhat = x / jnp.maximum(nrm, 1e-9)
    return jnp.argmax(xhat @ cent.T - half_cn[None, :], axis=1).astype(jnp.int32)


def _assign_codes_batched(codes, scale, zero, centroids,
                          batch: int = 131072) -> np.ndarray:
    """Assign every code row to its nearest centroid in fixed-size device
    batches — peak device fp32 is one (batch, D) chunk, never (N, D)."""
    n = codes.shape[0]
    cent = jnp.asarray(centroids)
    half = jnp.asarray(0.5 * np.sum(centroids.astype(np.float32) ** 2, axis=1))
    scale_d = jnp.asarray(scale)
    zero_d = jnp.asarray(zero)
    out = np.empty((n,), np.int32)
    for lo in range(0, n, batch):
        chunk = codes[lo:lo + batch]
        pad = batch - chunk.shape[0]
        if pad:  # pad to the common shape: one compiled program for all chunks
            chunk = np.concatenate(
                [chunk, np.zeros((pad, chunk.shape[1]), np.uint8)])
        a = np.asarray(_assign_chunk(jnp.asarray(chunk), cent,
                                     scale_d, zero_d, half))
        out[lo:lo + batch] = a[: batch - pad] if pad else a
    return out


def build_ivf_index_u8(
    codes: np.ndarray,
    scale: np.ndarray,
    zero: np.ndarray,
    nlist: int | None = None,
    nprobe: int = 8,
    iters: int = 10,
    seed: int = 0,
    max_imbalance: float = 4.0,
) -> IVFIndex:
    """IVF over the store's RAW uint8 codes (``Store.read_codes()`` +
    ``codec_meta.npz``): k-means trains on the dequantized+renormalized
    vectors (identical clustering to the fp32 builder given the same data),
    but the resident inverted lists hold the uint8 codes + per-entry
    1/‖x‖ — 4x less device memory and probe-gather traffic."""
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    scale = np.asarray(scale, np.float32)
    zero = np.asarray(zero, np.float32)
    n, d = codes.shape if codes.ndim == 2 else (0, 0)
    if n == 0:
        idx = _empty_ivf(d)  # ntotal=0 short-circuits .search before any math
        idx.scale = jnp.ones((max(d, 1),), jnp.float32)
        idx.zero = jnp.zeros((max(d, 1),), jnp.float32)
        idx.lists = jnp.zeros(idx.lists.shape, jnp.uint8)
        idx.list_inv = jnp.zeros((1, 1), jnp.float32)
        return idx
    x = codes.astype(np.float32) * scale + zero  # host fp32 (RAM, not HBM)
    inv = 1.0 / np.maximum(np.linalg.norm(x, axis=1), 1e-9)
    feats = x * inv[:, None]
    nlist = _resolve_nlist(n, nlist)
    train_cap = 256 * nlist  # FAISS max_points_per_centroid guidance
    if n > train_cap:
        # large store: train k-means on a subsample (device fp32 is the
        # sample, not (N, D)) and assign all rows in fixed-size device
        # batches straight from the codes — peak HBM stays ~the u8 index
        # itself, preserving the 4x-capacity point of this builder
        sel = np.sort(np.random.default_rng(seed).choice(
            n, train_cap, replace=False))
        centroids, _ = kmeans(feats[sel], nlist, iters=iters, seed=seed)
        assign = _assign_codes_batched(codes, scale, zero, centroids)
        if max_imbalance is not None and nlist > 1:
            lcap = int(np.ceil(max_imbalance * np.ceil(n / nlist)))
            assign = _rebalance(feats, centroids, assign, lcap)
        cap, sorted_assign, slot, row_order = _slot(assign, nlist)
    else:
        # small store: identical train/bucket path to the fp32 builder
        slots = _train_and_slot(feats, nlist, iters, seed, max_imbalance)
        centroids, nlist, cap, sorted_assign, slot, row_order = slots
    lists = np.zeros((nlist, cap, d), np.uint8)
    list_inv = np.zeros((nlist, cap), np.float32)
    ids = np.full((nlist, cap), -1, np.int32)
    lists[sorted_assign, slot] = codes[row_order]
    list_inv[sorted_assign, slot] = inv[row_order]
    ids[sorted_assign, slot] = row_order
    return IVFIndex(
        centroids=jnp.asarray(centroids), lists=jnp.asarray(lists),
        list_ids=jnp.asarray(ids), ntotal=n,
        nprobe=max(1, min(int(nprobe), nlist)),
        scale=jnp.asarray(scale), zero=jnp.asarray(zero),
        list_inv=jnp.asarray(list_inv),
    )


# --------------------------------------------------------------- multi-chip


@lru_cache(maxsize=32)
def _sharded_ivf_search_fn(mesh, local_nlist: int, kk: int, nprobe: int,
                           u8: bool):
    """Build (once per (mesh, shape-config)) the jitted ``shard_map`` search
    program for :class:`ShardedIVFIndex`. Hoisted to a module-level cache so
    repeated ``search`` calls hit the jit cache instead of retracing — the
    class exists for single-query latency, so per-call retraces would defeat
    it. ``scale``/``zero`` are ARGUMENTS (not closure captures) so the cache
    key stays hashable and the arrays are jit operands."""
    from jax.sharding import PartitionSpec as P

    def local(cent, lists_l, ids_l, inv_l, scale, zero, q_l):
        # Every shard computes the SAME global top-``nprobe`` probe set from
        # the replicated centroids (deterministic), gathers only the probed
        # lists it OWNS (the rest are masked to id −1), and returns its local
        # top candidates. The union of owned lists across shards is exactly
        # the single-device probe set, so the merged hits are identical to
        # :class:`IVFIndex` — sharding buys HBM capacity, not a different ANN.
        cscores = q_l @ cent.T                      # (Q, nlist_real)
        _, probe = jax.lax.top_k(cscores, nprobe)   # global list ids
        base = jax.lax.axis_index("data").astype(jnp.int32) * local_nlist
        lp = probe - base
        own = (lp >= 0) & (lp < local_nlist)        # (Q, nprobe)
        lpc = jnp.clip(lp, 0, local_nlist - 1)
        cand = lists_l[lpc]                         # (Q, nprobe, cap, D)
        ids = jnp.where(own[..., None], ids_l[lpc], -1)
        if u8:
            qs = q_l * scale[None, :]
            qz = q_l @ zero
            sims = jnp.einsum("qd,qpcd->qpc", qs, cand.astype(jnp.float32))
            sims = (sims + qz[:, None, None]) * inv_l[lpc]
        else:
            sims = jnp.einsum("qd,qpcd->qpc", q_l, cand)
        sims = jnp.where(ids >= 0, sims, -jnp.inf)
        nq = q_l.shape[0]
        s, j = jax.lax.top_k(sims.reshape(nq, -1), kk)
        return s, jnp.take_along_axis(ids.reshape(nq, -1), j, axis=1)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None, None), P("data", None),
                  P("data", None), P(), P(), P()),
        out_specs=(P(None, "data"), P(None, "data")),
        check_vma=False,
    )
    return jax.jit(fn)


def _sharded_ivf_candidates(mesh, centroids, lists, list_ids, list_inv,
                            scale, zero, q, k: int, nprobe: int):
    """Dispatch one sharded IVF probe through the cached jitted program."""
    n_sh = mesh.shape["data"]
    local_nlist = lists.shape[0] // n_sh
    cap = lists.shape[1]
    kk = min(k, nprobe * cap)
    u8 = list_inv is not None
    inv_arg = list_inv if u8 else jnp.zeros_like(list_ids, jnp.float32)
    scale_arg = scale if u8 else jnp.zeros((q.shape[1],), jnp.float32)
    zero_arg = zero if u8 else jnp.zeros((q.shape[1],), jnp.float32)
    fn = _sharded_ivf_search_fn(mesh, local_nlist, kk, nprobe, u8)
    return fn(centroids, lists, list_ids, inv_arg, scale_arg, zero_arg, q)


@dataclass
class ShardedIVFIndex:
    """IVF index with the inverted lists row-sharded over a mesh's ``data``
    axis — the >HBM-store shape of :class:`IVFIndex` (same hits; the sharded
    flat index covers exact search, this covers single-query latency).
    Centroids are replicated (nlist × D is small); fp32 and uint8-resident
    list storage both supported (``scale``/``zero``/``list_inv`` set = u8).
    Build with :func:`shard_ivf_index`."""

    centroids: jax.Array   # (nlist_real, D) fp32, replicated
    lists: jax.Array       # (nlist_padded, cap, D), sharded over 'data'
    list_ids: jax.Array    # (nlist_padded, cap) int32, sharded; -1 = padding
    ntotal: int
    nlist_real: int
    mesh: object
    nprobe: int = 8
    scale: jax.Array | None = None
    zero: jax.Array | None = None
    list_inv: jax.Array | None = None  # sharded over 'data' in u8 mode

    def search(self, queries: np.ndarray, k: int, nprobe: int | None = None):
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None]
        nq = int(q.shape[0])
        if self.ntotal == 0:
            return np.zeros((nq, 0), np.float32), np.zeros((nq, 0), np.int32)
        k = max(1, min(k, self.ntotal))
        np_ = self.nprobe if nprobe is None else int(nprobe)
        np_ = max(1, min(np_, self.nlist_real))
        scores, ids = _sharded_ivf_candidates(
            self.mesh, self.centroids, self.lists, self.list_ids,
            self.list_inv, self.scale, self.zero, q, k, np_,
        )
        # host merge (candidate counts are k*n_shards — host-sized): every
        # real list is owned by exactly one shard, so no dedup is needed
        scores = np.asarray(scores)
        ids = np.asarray(ids)
        scores = np.where(ids >= 0, scores, -np.inf)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        rows = np.arange(nq)[:, None]
        s, i = scores[rows, order], ids[rows, order]
        i = np.where(np.isfinite(s), i, -1)  # FAISS semantics past the tail
        s = np.where(np.isfinite(s), s, 0.0).astype(np.float32)
        if s.shape[1] < k:  # nprobe*cap*n_shards < k: pad to exactly k
            pad = k - s.shape[1]  # columns, matching IVFIndex's contract
            s = np.pad(s, ((0, 0), (0, pad)))
            i = np.pad(i, ((0, 0), (0, pad)), constant_values=-1)
        return s, i


def shard_ivf_index(index: IVFIndex, mesh) -> ShardedIVFIndex:
    """Row-shard an :class:`IVFIndex`'s inverted lists over ``mesh``'s
    ``data`` axis (fp32 or u8). Lists are zero-padded to a multiple of the
    shard count with id −1 rows, which are masked before ranking and can
    never be probed (probe ids come from the unpadded centroids)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_sh = mesh.shape["data"]
    lists = np.asarray(index.lists)
    ids = np.asarray(index.list_ids)
    nlist_real, cap, d = lists.shape
    pad = (-nlist_real) % n_sh
    if pad:
        lists = np.concatenate([lists, np.zeros((pad, cap, d), lists.dtype)])
        ids = np.concatenate([ids, np.full((pad, cap), -1, np.int32)])
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    inv = None
    if index.list_inv is not None:
        inv = np.asarray(index.list_inv)
        if pad:
            inv = np.concatenate([inv, np.zeros((pad, cap), np.float32)])
        inv = put(inv, P("data", None))
    return ShardedIVFIndex(
        centroids=put(np.asarray(index.centroids), P()),
        lists=put(lists, P("data", None, None)),
        list_ids=put(ids, P("data", None)),
        ntotal=index.ntotal, nlist_real=nlist_real, mesh=mesh,
        nprobe=index.nprobe,
        scale=None if index.scale is None else put(np.asarray(index.scale), P()),
        zero=None if index.zero is None else put(np.asarray(index.zero), P()),
        list_inv=inv,
    )
