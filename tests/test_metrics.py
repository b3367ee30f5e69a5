"""Metric tests: PSNR/SSIM against independent numpy oracles, LPIPS mechanics,
index search parity."""

import numpy as np
import pytest

from clip_codec_tpu.eval.metrics import psnr, psnr_batch, ssim, ssim_batch, to_uint8
from clip_codec_tpu.index import build_index, search_index


def test_to_uint8_truncates():
    # The reference's _to_uint8 truncates (no rounding): 0.9 maps via
    # (0.9+1)*127.5 = 242.25 -> 242.
    img = np.array([[[0.9]]], dtype=np.float32)
    assert to_uint8(img)[0, 0, 0] == 242


def test_psnr_matches_numpy(rng):
    a = rng.uniform(-1, 1, (3, 16, 16)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)
    x1 = to_uint8(a).astype(np.float64)
    x2 = to_uint8(b).astype(np.float64)
    expect = 20 * np.log10(255 / np.sqrt(np.mean((x1 - x2) ** 2)))
    assert psnr(a, b) == pytest.approx(expect, rel=1e-5)
    assert psnr(a, a) == float("inf")
    # batched NHWC agrees with scalar API
    got = float(psnr_batch(a.transpose(1, 2, 0)[None], b.transpose(1, 2, 0)[None])[0])
    assert got == pytest.approx(expect, rel=1e-4)


def _np_ssim_oracle(x, y, win=7, data_range=255.0):
    """Straight transcription of skimage's uniform-window SSIM on the valid
    interior (what remains after skimage's pad crop)."""
    from numpy.lib.stride_tricks import sliding_window_view

    def uf(a):
        v = sliding_window_view(a, (win, win), axis=(0, 1))
        return v.mean(axis=(-2, -1))

    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    chans = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        ux, uy = uf(xc), uf(yc)
        vx = cov_norm * (uf(xc * xc) - ux * ux)
        vy = cov_norm * (uf(yc * yc) - uy * uy)
        vxy = cov_norm * (uf(xc * yc) - ux * uy)
        c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
        chans.append(s.mean())
    return float(np.mean(chans))


def test_ssim_matches_oracle(rng):
    a = rng.uniform(-1, 1, (24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)
    expect = _np_ssim_oracle(to_uint8(a), to_uint8(b))
    assert ssim(a, b) == pytest.approx(expect, abs=2e-4)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    # CHW input accepted like the reference
    assert ssim(a.transpose(2, 0, 1), b.transpose(2, 0, 1)) == pytest.approx(expect, abs=2e-4)


def test_ssim_batch_consistency(rng):
    a = rng.uniform(-1, 1, (4, 24, 24, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), -1, 1).astype(np.float32)
    batched = np.asarray(ssim_batch(a, b))
    for i in range(4):
        assert batched[i] == pytest.approx(ssim(a[i], b[i]), abs=1e-6)


def test_lpips_mechanics(rng):
    """Random-weight LPIPS: identity -> 0, symmetry, positivity."""
    from clip_codec_tpu.eval.lpips import LPIPSModel, VGG_CFG

    convs = []
    cin = 3
    for item in VGG_CFG:
        if item == "M":
            continue
        convs.append({
            "kernel": (rng.standard_normal((3, 3, cin, item)) * 0.05).astype(np.float32),
            "bias": np.zeros(item, np.float32),
        })
        cin = item
    params = {
        "shift": np.array([-0.030, -0.088, -0.188], np.float32),
        "scale": np.array([0.458, 0.448, 0.450], np.float32),
        "convs": convs,
        "lins": [np.abs(rng.standard_normal(c)).astype(np.float32) for c in (64, 128, 256, 512, 512)],
    }
    m = LPIPSModel(params)
    a = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    d_aa = float(m.distance(a, a)[0])
    d_ab = float(m.distance(a, b)[0])
    d_ba = float(m.distance(b, a)[0])
    assert d_aa == pytest.approx(0.0, abs=1e-6)
    assert d_ab > 0
    assert d_ab == pytest.approx(d_ba, rel=1e-5)


def test_lpips_gated_nan():
    from clip_codec_tpu.eval.metrics import lpips_distance

    a = np.zeros((3, 8, 8), np.float32)
    assert np.isnan(lpips_distance(a, a))  # no weights configured -> NaN


def test_index_search(rng):
    feats = rng.standard_normal((50, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    paths = [f"img_{i}.png" for i in range(50)]
    idx = build_index(feats)
    assert idx.ntotal == 50
    # self-query: best hit is the vector itself with score ~1
    res = search_index(feats[7], idx, paths, k=5)
    assert res[0][0] == "img_7.png"
    assert res[0][1] == pytest.approx(1.0, abs=1e-5)
    # scores descending, exact parity with numpy argsort
    sims = feats @ feats[7]
    order = np.argsort(-sims)[:5]
    assert [r[0] for r in res] == [paths[i] for i in order]
    # k larger than ntotal clamps
    res_all = search_index(feats[0], idx, paths, k=500)
    assert len(res_all) == 50


def test_empty_index_returns_empty(rng):
    """A 0-row store yields empty results instead of a top_k crash (the
    fresh-store /search case)."""
    from clip_codec_tpu.index import build_index, build_sharded_index
    from clip_codec_tpu.parallel import make_mesh

    empty = np.zeros((0, 16), np.float32)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    flat = build_index(empty)
    s, i = flat.search(q, k=5)
    assert s.shape == (2, 0) and i.shape == (2, 0)
    assert search_index(q[0], flat, [], k=5) == []
    sharded = build_sharded_index(empty, make_mesh(8))
    s, i = sharded.search(q, k=5)
    assert s.shape == (2, 0) and i.shape == (2, 0)


def test_sharded_index_matches_flat(rng):
    """Row-sharded exact search over the 8-device mesh returns the same
    (scores, ids) as the single-device index — incl. a non-divisible N
    (padding masked at merge) and k > shard_rows."""
    from clip_codec_tpu.index import build_index, build_sharded_index
    from clip_codec_tpu.parallel import make_mesh

    feats = rng.standard_normal((53, 16)).astype(np.float32)  # 53 % 8 != 0
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    q = rng.standard_normal((3, 16)).astype(np.float32)

    flat = build_index(feats)
    sharded = build_sharded_index(feats, make_mesh(8))
    assert sharded.ntotal == 53
    for k in (1, 5, 9, 500):  # 9 > ceil(56/8)=7 shard rows; 500 clamps
        s0, i0 = flat.search(q, k)
        s1, i1 = sharded.search(q, k)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(s0, s1, rtol=1e-6, atol=1e-6)


def test_lpips_batch_weights_present(rng):
    """The eval CLI's batched LPIPS path with (random) weights PRESENT: one
    jitted forward scores the whole batch, per-row equal to the scalar API."""
    from clip_codec_tpu.eval.lpips import LPIPSModel, VGG_CFG
    from clip_codec_tpu.eval.metrics import lpips_batch, lpips_distance

    convs, cin = [], 3
    for item in VGG_CFG:
        if item == "M":
            continue
        convs.append({
            "kernel": rng.standard_normal((3, 3, cin, item)).astype(np.float32) * 0.05,
            "bias": np.zeros((item,), np.float32),
        })
        cin = item
    params = {
        "shift": np.array([-0.030, -0.088, -0.188], np.float32),
        "scale": np.array([0.458, 0.448, 0.450], np.float32),
        "convs": convs,
        "lins": [np.abs(rng.standard_normal(c)).astype(np.float32) for c in (64, 128, 256, 512, 512)],
    }
    m = LPIPSModel(params)
    a = rng.standard_normal((3, 32, 32, 3)).astype(np.float32) * 0.3
    b = rng.standard_normal((3, 32, 32, 3)).astype(np.float32) * 0.3
    batch = lpips_batch(a, b, lpips_model=m)
    assert batch.shape == (3,)
    for j in range(3):
        one = lpips_distance(a[j].transpose(2, 0, 1), b[j].transpose(2, 0, 1), lpips_model=m)
        np.testing.assert_allclose(batch[j], one, rtol=1e-5, atol=1e-6)


def test_lpips_and_clip_batch_gated_nan():
    from clip_codec_tpu.eval.metrics import clip_similarity_batch, lpips_batch

    a = np.zeros((2, 16, 16, 3), np.float32)
    assert np.isnan(lpips_batch(a, a, lpips_model=None)).all() or True  # singleton may be None
    # force the no-weights path explicitly
    import clip_codec_tpu.eval.metrics as M

    old_l, old_lt = M._LPIPS_SINGLETON, M._LPIPS_TRIED
    old_c, old_ct = M._CLIP_SINGLETON, M._CLIP_TRIED
    M._LPIPS_SINGLETON, M._LPIPS_TRIED = None, True
    M._CLIP_SINGLETON, M._CLIP_TRIED = None, True
    try:
        assert np.isnan(lpips_batch(a, a)).all()
        assert np.isnan(clip_similarity_batch(a, a)).all()
    finally:
        M._LPIPS_SINGLETON, M._LPIPS_TRIED = old_l, old_lt
        M._CLIP_SINGLETON, M._CLIP_TRIED = old_c, old_ct
