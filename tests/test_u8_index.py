"""Uint8-resident retrieval index: exact search directly over the store's
quantized codes. Beyond-reference surface (the reference decodes to fp32 and
hands FAISS a float matrix, ``cli/search_text.py:54`` + ``index/faiss_index.py:13``);
here the (N, D) matrix stays uint8 on device — 4x less HBM traffic/footprint
on a search that is HBM-read-bound — with the dequantize+renormalize folded
into the dot: q·x̂_i = ((q*scale)·u_i + q·zero)/‖x_i‖."""

import numpy as np
import pytest

from clip_codec_tpu.codecs import fit_affine, quantize
from clip_codec_tpu.index import (
    build_index,
    build_index_u8,
    build_sharded_index_u8,
    search_index,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _quantized_store(rng, n, d):
    feats = rng.standard_normal((n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    codes = np.asarray(quantize(feats, scale, zero))
    return codes, np.asarray(scale), np.asarray(zero)


def _dequant_renorm(codes, scale, zero):
    x = codes.astype(np.float32) * scale + zero
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)


def test_u8_matches_fp32_flat(rng):
    """Same hits and scores (to fp32 summation order) as FlatIPIndex built
    over the dequantized+renormalized matrix — the math is a refactoring of
    the same expression, not an approximation."""
    codes, scale, zero = _quantized_store(rng, 120, 32)
    feats = _dequant_renorm(codes, scale, zero)
    q = rng.standard_normal((4, 32)).astype(np.float32)

    flat = build_index(feats)
    u8 = build_index_u8(codes, scale, zero)
    assert u8.ntotal == 120
    for k in (1, 7, 500):
        s0, i0 = flat.search(q, k)
        s1, i1 = u8.search(q, k)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)


def test_u8_self_query_and_interop(rng):
    """search_index interop: a store row dequantized as the query ranks its
    own row first with score ~1 (the --query_clp / /search_image path)."""
    codes, scale, zero = _quantized_store(rng, 50, 16)
    feats = _dequant_renorm(codes, scale, zero)
    paths = [f"img_{i}.png" for i in range(50)]
    u8 = build_index_u8(codes, scale, zero)
    res = search_index(feats[7], u8, paths, k=5)
    assert res[0][0] == "img_7.png"
    assert res[0][1] == pytest.approx(1.0, abs=1e-5)
    sims = feats @ feats[7]
    order = np.argsort(-sims)[:5]
    assert [r[0] for r in res] == [paths[i] for i in order]


def test_u8_empty_store(rng):
    u8 = build_index_u8(np.zeros((0, 16), np.uint8),
                        np.ones(16, np.float32), np.zeros(16, np.float32))
    s, i = u8.search(rng.standard_normal((2, 16)).astype(np.float32), k=5)
    assert s.shape == (2, 0) and i.shape == (2, 0)


def test_sharded_u8_matches_flat(rng):
    """Row-sharded u8 search over the 8-device mesh == single-device u8,
    incl. non-divisible N (all-zero padding rows masked at merge) and
    k > shard_rows."""
    from clip_codec_tpu.parallel import make_mesh

    codes, scale, zero = _quantized_store(rng, 53, 16)  # 53 % 8 != 0
    q = rng.standard_normal((3, 16)).astype(np.float32)

    u8 = build_index_u8(codes, scale, zero)
    sharded = build_sharded_index_u8(codes, scale, zero, make_mesh(8))
    assert sharded.ntotal == 53
    for k in (1, 5, 9, 500):
        s0, i0 = u8.search(q, k)
        s1, i1 = sharded.search(q, k)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-6, atol=1e-6)

    empty = build_sharded_index_u8(np.zeros((0, 16), np.uint8),
                                   np.ones(16, np.float32),
                                   np.zeros(16, np.float32), make_mesh(8))
    s, i = empty.search(q, k=5)
    assert s.shape == (3, 0) and i.shape == (3, 0)


def test_recall_target_ranking(rng):
    """`recall_target` switches ranking to the dot-fused TPU PartialReduce
    (`lax.approx_max_k`): rt=1.0 must equal exact top_k; any rt returns
    well-formed descending results whose every (id, score) pair is a true
    store entry. (On CPU approx_max_k falls back to exact sorting — the
    approximation only engages on TPU, where it was measured at 95%
    recall@10 for rt=0.95 and 5.9x bulk-search speed vs exact fp32.)"""
    codes, scale, zero = _quantized_store(rng, 300, 32)
    feats = _dequant_renorm(codes, scale, zero)
    q = rng.standard_normal((8, 32)).astype(np.float32)

    for idx in (build_index(feats), build_index_u8(codes, scale, zero)):
        s0, i0 = idx.search(q, 10)
        s1, i1 = idx.search(q, 10, recall_target=1.0)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-6, atol=1e-6)
        s2, i2 = idx.search(q, 10, recall_target=0.9)
        assert s2.shape == (8, 10) and i2.shape == (8, 10)
        assert np.all(np.diff(s2, axis=1) <= 1e-6)          # descending
        true = feats @ q.T                                   # (N, Q)
        got = np.take_along_axis(true.T, i2, axis=1)         # score of each id
        np.testing.assert_allclose(s2, got, atol=1e-4)       # real entries


def test_sharded_padding_never_displaces_negative_hits():
    """Regression: padding rows score exactly 0, which outranks real rows
    when every true score is NEGATIVE — unmasked, a shard's local top_k
    returns the pad row and the merge then drops the true best hit instead
    of recovering it. N=9 on 8 devices pads to 16 (7 pad rows); the query
    scores every row negative with row 8 (alone on the last shard with a
    pad row) the global best."""
    from clip_codec_tpu.index import build_sharded_index, build_sharded_index_u8
    from clip_codec_tpu.parallel import make_mesh

    d = 16
    feats = np.eye(9, d, dtype=np.float32)        # unit one-hot rows
    q = -np.ones(d, np.float32)
    q[8] = -0.1                                   # row 8: least-negative score
    q /= np.linalg.norm(q)

    mesh = make_mesh(8)
    sharded = build_sharded_index(feats, mesh)
    s, i = sharded.search(q, k=1)
    assert i[0, 0] == 8 and s[0, 0] < 0

    scale, zero = fit_affine(feats)
    codes = np.asarray(quantize(feats, scale, zero))
    u8 = build_sharded_index_u8(codes, np.asarray(scale), np.asarray(zero), mesh)
    s, i = u8.search(q, k=1)
    assert i[0, 0] == 8 and s[0, 0] < 0


def test_ivf_u8_full_probe_matches_u8_flat(rng):
    """uint8-resident IVF with nprobe >= nlist probes every list -> identical
    hits to the u8 flat index (exactness preserved through the bucketing),
    and identical clustering/hits to the fp32 IVF given the same data."""
    from clip_codec_tpu.index import build_ivf_index, build_ivf_index_u8

    codes, scale, zero = _quantized_store(rng, 200, 32)
    feats = _dequant_renorm(codes, scale, zero)
    q = rng.standard_normal((5, 32)).astype(np.float32)

    u8_flat = build_index_u8(codes, scale, zero)
    ivf_u8 = build_ivf_index_u8(codes, scale, zero, nlist=8, nprobe=8)
    s0, i0 = u8_flat.search(q, 10)
    s1, i1 = ivf_u8.search(q, 10)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)

    # same clustering as the fp32 builder on the same (dequantized) data
    ivf_f32 = build_ivf_index(feats, nlist=8, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ivf_u8.list_ids),
                                  np.asarray(ivf_f32.list_ids))
    s2, i2 = ivf_f32.search(q, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_ivf_u8_subsampled_train_path(rng):
    """Stores past 256*nlist rows train k-means on a subsample and assign
    every row in device batches from the codes (never materializing the
    (N, D) fp32 matrix on device). Exactness-under-full-probe holds
    regardless of which path trained the centroids."""
    from clip_codec_tpu.index import build_ivf_index_u8
    from clip_codec_tpu.index.ivf import _assign_codes_batched

    codes, scale, zero = _quantized_store(rng, 600, 16)  # 600 > 256*nlist=512
    u8_flat = build_index_u8(codes, scale, zero)
    ivf = build_ivf_index_u8(codes, scale, zero, nlist=2, nprobe=2)
    assert sorted(np.asarray(ivf.list_ids).ravel()[
        np.asarray(ivf.list_ids).ravel() >= 0].tolist()) == list(range(600))
    q = rng.standard_normal((4, 16)).astype(np.float32)
    s0, i0 = u8_flat.search(q, 10)
    s1, i1 = ivf.search(q, 10)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-5)

    # batched assignment == one-shot assignment rule (chunk padding exact)
    cent = np.asarray(ivf.centroids)
    x = codes.astype(np.float32) * scale + zero
    xhat = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)
    ref = np.argmax(xhat @ cent.T - 0.5 * np.sum(cent**2, axis=1), axis=1)
    got = _assign_codes_batched(codes, scale, zero, cent, batch=128)
    np.testing.assert_array_equal(got, ref.astype(np.int32))


def test_ivf_u8_partial_probe_and_empty(rng):
    """Partial probe returns well-formed (desc-sorted, -1-padded) results;
    the empty store short-circuits."""
    from clip_codec_tpu.index import build_ivf_index_u8

    codes, scale, zero = _quantized_store(rng, 120, 16)
    ivf = build_ivf_index_u8(codes, scale, zero, nlist=10, nprobe=2)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    s, i = ivf.search(q, 100)  # k > probed pool: tail padded with -1
    assert s.shape == (3, 100)
    valid = i >= 0
    assert valid.any() and (~valid).any()
    for r in range(3):
        vs = s[r][valid[r]]
        assert np.all(np.diff(vs) <= 1e-6)
        assert np.all(np.isneginf(s[r][~valid[r]]))

    empty = build_ivf_index_u8(np.zeros((0, 16), np.uint8),
                               np.ones(16, np.float32),
                               np.zeros(16, np.float32))
    s, i = empty.search(q, 5)
    assert s.shape == (3, 0) and i.shape == (3, 0)


def test_store_read_codes_roundtrip(rng, tmp_path):
    """Store.read_codes returns the exact uint8 matrix that was written;
    decode_all equals its dequantization (the u8 index's input contract)."""
    from clip_codec_tpu.io.store import Store, write_store

    codes, scale, zero = _quantized_store(rng, 9, 16)
    feats = _dequant_renorm(codes, scale, zero)
    write_store(tmp_path / "s", feats, [f"i{i}.png" for i in range(9)],
                scale, zero, codes)
    st = Store.open(tmp_path / "s")
    got = st.read_codes()
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, codes)
    np.testing.assert_allclose(st.decode_all(), feats, rtol=1e-6, atol=1e-6)
