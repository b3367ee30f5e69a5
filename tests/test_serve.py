"""HTTP serving layer: drive a live server through real sockets."""

import http.client
import json
import threading

import numpy as np
import pytest
from PIL import Image

from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
from clip_codec_tpu.io.bitstream import compress_frame
from clip_codec_tpu.io.store import write_store
from clip_codec_tpu.serve import serve
from clip_codec_tpu.train import DiffusionTrainConfig, train_diffusion


def _tiny_trained_store(tmp):
    """Store of 4 random embeddings + 1-epoch-trained tiny UNet checkpoint."""
    rng = np.random.default_rng(0)
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(4):
        p = img_dir / f"{i}.png"
        Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((4, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp / "store"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)
    ckpt = train_diffusion(store, config=DiffusionTrainConfig(
        out_size=16, epochs=1, batch_size=4, timesteps=50, base=8, ch_mult=(1, 2), bf16=False))
    return store, q, ckpt


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    store, q, _ = _tiny_trained_store(tmp_path_factory.mktemp("serve"))
    srv = serve(str(store), port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address, q
    srv.shutdown()


def _request(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def test_healthz(server):
    addr, _ = server
    status, ctype, data = _request(addr, "GET", "/healthz")
    assert status == 200
    assert json.loads(data) == {"status": "ok", "dim": 16}


def test_embed_endpoint(server):
    addr, q = server
    blob = compress_frame(q[0].tobytes())
    status, _, data = _request(addr, "POST", "/embed", blob)
    assert status == 200
    z = np.array(json.loads(data)["embedding"], np.float32)
    assert z.shape == (16,)
    assert abs(np.linalg.norm(z) - 1.0) < 1e-4


def test_decompress_endpoint(server):
    addr, q = server
    blob = compress_frame(q[1].tobytes())
    status, ctype, data = _request(addr, "POST", "/decompress?size=16&steps=3", blob)
    assert status == 200
    assert ctype == "image/png"
    import io as _io

    img = Image.open(_io.BytesIO(data))
    assert img.size == (16, 16)


def test_decompress_endpoint_dpmpp(server):
    addr, q = server
    blob = compress_frame(q[1].tobytes())
    status, ctype, data = _request(
        addr, "POST", "/decompress?size=16&steps=3&sampler=dpmpp", blob)
    assert status == 200
    assert ctype == "image/png"
    import io as _io

    assert Image.open(_io.BytesIO(data)).size == (16, 16)
    # unknown sampler name -> client error, not a server crash
    status, _, data = _request(
        addr, "POST", "/decompress?size=16&steps=3&sampler=euler", blob)
    assert status == 400
    assert "unknown sampler" in json.loads(data)["error"]


def test_compress_gated_without_weights(server, monkeypatch):
    monkeypatch.delenv("CLIP_CODEC_CLIP_WEIGHTS", raising=False)
    addr, _ = server
    buf_img = Image.new("RGB", (16, 16), (100, 50, 25))
    import io as _io

    buf = _io.BytesIO()
    buf_img.save(buf, format="PNG")
    status, _, data = _request(addr, "POST", "/compress", buf.getvalue())
    assert status == 503
    assert "CLIP" in json.loads(data)["error"]


def test_search_endpoint(server, monkeypatch):
    """GET /search: 400 without ?q=, 503 without CLIP weights, then a real
    retrieval round-trip with the text tower stubbed (runs AFTER the
    /compress gate test — the stub gets cached on the codec)."""
    addr, _ = server
    status, _, data = _request(addr, "GET", "/search")
    assert status == 400

    monkeypatch.delenv("CLIP_CODEC_CLIP_WEIGHTS", raising=False)
    status, _, data = _request(addr, "GET", "/search?q=cat")
    assert status == 503
    assert "CLIP" in json.loads(data)["error"]

    import clip_codec_tpu.encoders as enc

    class _StubEncoder:
        def __init__(self, **kw):
            pass

        def encode_text(self, text):
            v = np.zeros((1, 16), np.float32)
            v[0, 0] = 1.0
            return v

    monkeypatch.setattr(enc, "ClipEncoder", _StubEncoder)
    status, _, data = _request(addr, "GET", "/search?q=cat&k=2")
    assert status == 200
    res = json.loads(data)["results"]
    assert len(res) == 2
    assert res[0]["score"] >= res[1]["score"]
    assert res[0]["path"].endswith(".png")


def test_searcher_ivf_matches_flat(tmp_path, monkeypatch):
    """_Searcher(ivf=True) with nprobe >= nlist returns the same hits as the
    exact searcher (--search_ivf server flag plumbs to this)."""
    import threading as _threading

    import clip_codec_tpu.encoders as enc
    from clip_codec_tpu.codec import ClipCodec
    from clip_codec_tpu.serve import _Searcher

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((12, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "store"
    write_store(store, feats, [f"img{i}.png" for i in range(12)],
                np.asarray(scale), np.asarray(zero), q)

    class _StubEncoder:
        def __init__(self, **kw):
            pass

        def encode_text(self, text):
            return feats[5:6]

    monkeypatch.setattr(enc, "ClipEncoder", _StubEncoder)
    codec = ClipCodec.load(store)
    lock = _threading.Lock()
    flat = _Searcher(store, codec, lock).search("x", k=4)
    codec2 = ClipCodec.load(store)
    ivf = _Searcher(store, codec2, lock, ivf=True, nlist=3, nprobe=3).search("x", k=4)
    assert [p for p, _ in ivf] == [p for p, _ in flat]
    np.testing.assert_allclose([s for _, s in ivf], [s for _, s in flat], atol=1e-4)
    assert flat[0][0] == "img5.png"


def test_searcher_u8_matches_flat(tmp_path, monkeypatch):
    """_Searcher(u8=True) serves /search from the uint8-resident index:
    identical hits to the fp32 flat searcher."""
    import threading as _threading

    import clip_codec_tpu.encoders as enc
    from clip_codec_tpu.codec import ClipCodec
    from clip_codec_tpu.serve import _Searcher

    rng = np.random.default_rng(9)
    feats = rng.standard_normal((12, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "store"
    write_store(store, feats, [f"img{i}.png" for i in range(12)],
                np.asarray(scale), np.asarray(zero), q)

    class _StubEncoder:
        def __init__(self, **kw):
            pass

        def encode_text(self, text):
            return feats[5:6]

    monkeypatch.setattr(enc, "ClipEncoder", _StubEncoder)
    lock = _threading.Lock()
    flat = _Searcher(store, ClipCodec.load(store), lock).search("x", k=4)
    u8 = _Searcher(store, ClipCodec.load(store), lock, u8=True).search("x", k=4)
    assert [p for p, _ in u8] == [p for p, _ in flat]
    np.testing.assert_allclose([s for _, s in u8], [s for _, s in flat],
                               atol=1e-4)
    assert u8[0][0] == "img5.png"


def test_search_image_clp_endpoint(server):
    """POST /search_image with a .clp frame body: weight-free image->image
    retrieval — the dequantized query's nearest store row is itself. (The
    reference intends this capability but its encode_image_to_vec helper is
    dead code that crashes when called, cli/search_text.py:24-28.)"""
    addr, q = server
    blob = compress_frame(q[1].tobytes())
    status, _, data = _request(addr, "POST", "/search_image?k=3", blob)
    assert status == 200
    res = json.loads(data)["results"]
    assert len(res) == 3
    assert res[0]["path"].endswith("1.png")
    assert res[0]["score"] > 0.99
    assert res[0]["score"] >= res[1]["score"] >= res[2]["score"]
    # body that is neither a .clp frame nor a decodable image -> 400
    status, _, data = _request(addr, "POST", "/search_image", b"not an image")
    assert status == 400


def test_searcher_raw_image_query(tmp_path, monkeypatch):
    """_Searcher.search_image with raw image bytes routes through the CLIP
    image tower: preprocess_pil_u8 geometry + encode_image_array (stubbed to
    return a known store row)."""
    import io as _io
    import threading as _threading
    from types import SimpleNamespace

    import clip_codec_tpu.encoders as enc
    from clip_codec_tpu.codec import ClipCodec
    from clip_codec_tpu.serve import _Searcher

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((6, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "store"
    write_store(store, feats, [f"img{i}.png" for i in range(6)],
                np.asarray(scale), np.asarray(zero), q)

    seen = {}

    class _StubImgEncoder:
        cfg = SimpleNamespace(image_size=32)

        def __init__(self, **kw):
            pass

        def encode_image_array(self, x):
            seen["shape"], seen["dtype"] = x.shape, x.dtype
            return feats[4:5]

    monkeypatch.setattr(enc, "ClipEncoder", _StubImgEncoder)
    buf = _io.BytesIO()
    Image.fromarray(np.zeros((20, 40, 3), np.uint8)).save(buf, format="PNG")
    hits = _Searcher(store, ClipCodec.load(store),
                     _threading.Lock()).search_image(buf.getvalue(), k=2)
    assert hits[0][0] == "img4.png"
    assert seen["shape"] == (1, 32, 32, 3) and seen["dtype"] == np.uint8


def test_bad_bitstream_400(server):
    addr, _ = server
    status, _, data = _request(addr, "POST", "/embed", b"garbage")
    assert status == 400
    assert "error" in json.loads(data)


def test_oversized_body_413(server):
    """A client declaring a huge Content-Length gets 413 before the server
    buffers anything (RAM-exhaustion guard)."""
    addr, _ = server
    conn = http.client.HTTPConnection(*addr, timeout=120)
    conn.putrequest("POST", "/embed")
    conn.putheader("Content-Length", str(1 << 31))
    conn.endheaders()
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    assert resp.status == 413
    assert "limit" in json.loads(data)["error"]


def test_decompression_bomb_400(server):
    """A tiny .clp frame declaring a 64 MiB payload is rejected by the
    bitstream layer's bomb guard and surfaces as a client error."""
    addr, _ = server
    bomb = compress_frame(b"\x00" * (64 << 20))
    assert len(bomb) < 10_000
    status, _, data = _request(addr, "POST", "/embed", bomb)
    assert status == 400
    assert "bomb" in json.loads(data)["error"]


def test_unknown_endpoint_404(server):
    addr, _ = server
    status, _, _ = _request(addr, "POST", "/nope", b"")
    assert status == 404


# ---------------------------------------------------------------- artifact


@pytest.fixture(scope="module")
def artifact_server(tmp_path_factory):
    """Server whose /decompress runs the AOT-exported program."""
    from clip_codec_tpu.deploy import export_decompressor
    from clip_codec_tpu.utils.checkpoint import load_params
    from clip_codec_tpu.utils.config import ModelConfig

    tmp = tmp_path_factory.mktemp("serve_art")
    store, q, ckpt = _tiny_trained_store(tmp)
    mc = ModelConfig.find_for_checkpoint(ckpt)
    art = export_decompressor(load_params(ckpt), mc, tmp / "dec.jaxprog",
                              size=16, steps=3, batch_size=1)
    srv = serve(str(store), weights=str(ckpt), port=0, artifact=str(art))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address, q, (store, ckpt, mc, tmp)
    srv.shutdown()


def test_sd_artifact_serving(tmp_path_factory, monkeypatch):
    """/decompress_sd: tiny SD artifact + msgpack env weights + adapter,
    driven over a real socket; guidance is a live per-request knob."""
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.deploy import export_sd_decompressor
    from clip_codec_tpu.models.sd import (
        AutoencoderKL, SDClipAdapter, SDUNet, SDUNetConfig, VAEConfig,
    )
    from clip_codec_tpu.utils.checkpoint import save_params

    tmp = tmp_path_factory.mktemp("serve_sd")
    store, q, _ = _tiny_trained_store(tmp)  # 16-dim embeddings

    ucfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16,
                        heads=2, freq_dim=8)
    vcfg = VAEConfig(block_out=(8, 16), layers_per_block=1, latent_ch=4)
    k = jax.random.PRNGKey(0)
    up = SDUNet(ucfg).init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 2, 16)))["params"]
    vp = AutoencoderKL(vcfg).init(k, jnp.zeros((1, 16, 16, 3)),
                                  jax.random.PRNGKey(1))["params"]
    ap = SDClipAdapter(in_dim=16, ctx_dim=16, n_tokens=2).init(
        k, jnp.zeros((1, 16)))["params"]
    monkeypatch.setenv("CLIP_CODEC_SD_UNET_WEIGHTS",
                       str(save_params(tmp / "sd_unet.msgpack", up)))
    monkeypatch.setenv("CLIP_CODEC_SD_VAE_WEIGHTS",
                       str(save_params(tmp / "sd_vae.msgpack", vp)))
    adapter = save_params(tmp / "adapter.msgpack", ap)
    art = export_sd_decompressor(up, vp, ap, tmp / "sd.jaxprog",
                                 unet_cfg=ucfg, vae_cfg=vcfg, size=16,
                                 steps=3, batch_size=1)

    srv = serve(str(store), port=0, sd_artifact=str(art), adapter=str(adapter))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        addr = srv.server_address
        blob = compress_frame(q[0].tobytes())
        status, ctype, data = _request(addr, "POST", "/decompress_sd?seed=4", blob)
        assert status == 200 and ctype == "image/png"
        import io as _io

        assert Image.open(_io.BytesIO(data)).size == (16, 16)
        # guidance is traced: one artifact serves every value, images differ
        d0 = _request(addr, "POST", "/decompress_sd?seed=4&guidance=0", blob)[2]
        assert d0 != data
        # reproducible per seed
        assert _request(addr, "POST", "/decompress_sd?seed=4", blob)[2] == data
        # /decompress (pixel) is independent and 503s cleanly without weights
        st, _, d = _request(addr, "POST", "/decompress_sd", b"garbage")
        assert st == 400
    finally:
        srv.shutdown()


def test_sd_artifact_serving_dpmpp(tmp_path_factory, monkeypatch):
    """/decompress_sd with a DPM-Solver++(2M) artifact (the recommended SD
    serving mode, VERDICT r4 item 4): export with sampler='dpmpp', serve
    over a socket, and check the statics contract — ?sampler=dpmpp matches
    the baked meta, ?sampler=ddim 412s."""
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.deploy import export_sd_decompressor
    from clip_codec_tpu.models.sd import (
        AutoencoderKL, SDClipAdapter, SDUNet, SDUNetConfig, VAEConfig,
    )
    from clip_codec_tpu.utils.checkpoint import save_params

    tmp = tmp_path_factory.mktemp("serve_sd_dpmpp")
    store, q, _ = _tiny_trained_store(tmp)  # 16-dim embeddings

    ucfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16,
                        heads=2, freq_dim=8)
    vcfg = VAEConfig(block_out=(8, 16), layers_per_block=1, latent_ch=4)
    k = jax.random.PRNGKey(0)
    up = SDUNet(ucfg).init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 2, 16)))["params"]
    vp = AutoencoderKL(vcfg).init(k, jnp.zeros((1, 16, 16, 3)),
                                  jax.random.PRNGKey(1))["params"]
    ap = SDClipAdapter(in_dim=16, ctx_dim=16, n_tokens=2).init(
        k, jnp.zeros((1, 16)))["params"]
    monkeypatch.setenv("CLIP_CODEC_SD_UNET_WEIGHTS",
                       str(save_params(tmp / "sd_unet.msgpack", up)))
    monkeypatch.setenv("CLIP_CODEC_SD_VAE_WEIGHTS",
                       str(save_params(tmp / "sd_vae.msgpack", vp)))
    adapter = save_params(tmp / "adapter.msgpack", ap)
    art = export_sd_decompressor(up, vp, ap, tmp / "sd_dpmpp.jaxprog",
                                 unet_cfg=ucfg, vae_cfg=vcfg, size=16,
                                 steps=3, batch_size=1, sampler="dpmpp")

    srv = serve(str(store), port=0, sd_artifact=str(art), adapter=str(adapter))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        addr = srv.server_address
        blob = compress_frame(q[0].tobytes())
        st, ctype, data = _request(
            addr, "POST", "/decompress_sd?seed=4&sampler=dpmpp", blob)
        assert st == 200 and ctype == "image/png"
        import io as _io

        assert Image.open(_io.BytesIO(data)).size == (16, 16)
        # deterministic solver, reproducible per seed
        assert _request(addr, "POST",
                        "/decompress_sd?seed=4&sampler=dpmpp", blob)[2] == data
        # statics contract: the artifact is compiled for dpmpp only
        st, _, d = _request(addr, "POST", "/decompress_sd?sampler=ddim", blob)
        assert st == 412
        assert json.loads(d)["artifact"]["sampler"] == "dpmpp"
    finally:
        srv.shutdown()


def test_sd_endpoint_503_when_unconfigured(server):
    addr, q = server
    blob = compress_frame(q[0].tobytes())
    status, _, data = _request(addr, "POST", "/decompress_sd", blob)
    assert status == 503
    assert "sd_artifact" in json.loads(data)["error"]


def test_artifact_decompress(artifact_server):
    addr, q, _ = artifact_server
    blob = compress_frame(q[2].tobytes())
    status, ctype, data = _request(addr, "POST", "/decompress?seed=7", blob)
    assert status == 200 and ctype == "image/png"
    import io as _io

    assert Image.open(_io.BytesIO(data)).size == (16, 16)
    # same seed reproduces the PNG byte-for-byte; a different seed does not
    assert _request(addr, "POST", "/decompress?seed=7", blob)[2] == data
    assert _request(addr, "POST", "/decompress?seed=8", blob)[2] != data


def test_stats_endpoint(artifact_server):
    addr, q, _ = artifact_server
    blob = compress_frame(q[3].tobytes())
    assert _request(addr, "POST", "/decompress", blob)[0] == 200
    status, _, data = _request(addr, "GET", "/stats")
    assert status == 200
    st = json.loads(data)
    assert st["requests"]["decompress"] >= 1
    assert st["decompress_latency_s"]["p50"] > 0


def test_microbatch_fill_rate_in_stats(artifact_server):
    """Under concurrent load the batcher's measured fill rate shows up."""
    _, q, (store, ckpt, mc, tmp) = artifact_server
    from clip_codec_tpu.deploy import export_decompressor
    from clip_codec_tpu.utils.checkpoint import load_params

    art = export_decompressor(load_params(ckpt), mc, tmp / "dec_stats.jaxprog",
                              size=16, steps=3, batch_size=2)
    srv = serve(str(store), weights=str(ckpt), port=0, artifact=str(art),
                batch_wait_ms=100.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        addr = srv.server_address
        blobs = [compress_frame(q[i].tobytes()) for i in range(4)]
        threads = [threading.Thread(
            target=lambda i=i: _request(addr, "POST", "/decompress", blobs[i]))
            for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        st = json.loads(_request(addr, "GET", "/stats")[2])
        mb = st["micro_batch"]
        assert mb["batch_size"] == 2 and mb["calls"] >= 2
        assert 0 < mb["fill_rate"] <= 1.0
    finally:
        srv.shutdown()


def test_artifact_statics_mismatch_412(artifact_server):
    addr, q, _ = artifact_server
    blob = compress_frame(q[2].tobytes())
    # matching statics are accepted explicitly
    assert _request(addr, "POST", "/decompress?size=16&steps=3", blob)[0] == 200
    status, _, data = _request(addr, "POST", "/decompress?steps=50", blob)
    assert status == 412
    err = json.loads(data)
    assert err["requested"] == {"steps": "50"} and err["artifact"] == {"steps": 3}


def test_microbatched_artifact_serving(artifact_server):
    """batch>1 artifact: concurrent requests coalesce into one program call;
    lone requests are padded; ?seed= is rejected (one call, one seed)."""
    _, q, (store, ckpt, mc, tmp) = artifact_server
    from clip_codec_tpu.deploy import export_decompressor
    from clip_codec_tpu.utils.checkpoint import load_params

    art = export_decompressor(load_params(ckpt), mc, tmp / "dec_b4.jaxprog",
                              size=16, steps=3, batch_size=4)
    srv = serve(str(store), weights=str(ckpt), port=0, artifact=str(art),
                batch_wait_ms=50.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        addr = srv.server_address
        blobs = [compress_frame(q[i].tobytes()) for i in range(4)]

        # lone request: padded to the artifact batch, still one PNG back
        status, ctype, data = _request(addr, "POST", "/decompress", blobs[0])
        assert status == 200 and ctype == "image/png"
        import io as _io

        assert Image.open(_io.BytesIO(data)).size == (16, 16)

        # concurrent requests share one call (distinct embeddings -> images)
        results = [None] * 4
        def hit(i):
            results[i] = _request(addr, "POST", "/decompress", blobs[i])
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None and r[0] == 200 for r in results)
        pngs = {r[2] for r in results}
        assert len(pngs) == 4  # four different embeddings, four images

        # seed is per-program: rejected in micro-batching mode
        status, _, data = _request(addr, "POST", "/decompress?seed=7", blobs[0])
        assert status == 400 and "seed is per-program" in json.loads(data)["error"]
    finally:
        srv.shutdown()
