"""End-to-end encode pipeline with synthesized tiny CLIP weights: images ->
ClipEncoder -> quantize -> .clp store -> decode -> retrieval. Exercises the
exact code path of cli.encode_images without real pretrained files."""

import gzip

import numpy as np
import pytest
from PIL import Image

from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
from clip_codec_tpu.encoders.clip import CLIPConfig
from clip_codec_tpu.io.store import Store, write_store
from clip_codec_tpu.index import build_index, search_index

TINY_CFG = CLIPConfig(
    image_size=32, patch_size=16,
    vision_dim=32, vision_depth=2, vision_heads=2, vision_mlp=64,
    text_dim=32, text_depth=2, text_heads=2, text_mlp=64,
    vocab_size=100, context_length=12, embed_dim=16, eos_token_id=99,
)


@pytest.fixture(scope="module")
def tiny_clip_ckpt(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    torch.manual_seed(0)
    hf = transformers.CLIPModel(transformers.CLIPConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64, image_size=32, patch_size=16, hidden_act="quick_gelu"),
        text_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                         intermediate_size=64, vocab_size=100, max_position_embeddings=12,
                         hidden_act="quick_gelu", eos_token_id=99),
        projection_dim=16,
    ))
    p = tmp_path_factory.mktemp("w") / "tiny_clip.bin"
    torch.save(hf.state_dict(), p)
    return str(p)


@pytest.fixture(scope="module")
def tiny_encoder(tiny_clip_ckpt):
    import jax.numpy as jnp

    from clip_codec_tpu.encoders import ClipEncoder

    return ClipEncoder(weights_path=tiny_clip_ckpt, cfg=TINY_CFG, dtype=jnp.float32)


def test_encode_images_pipeline(tiny_encoder, tmp_path, rng):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(5):
        p = img_dir / f"im{i}.png"
        Image.fromarray(rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    # a corrupt file must be silently skipped (cli/encode_images.py:42-43)
    bad = img_dir / "broken.png"
    bad.write_bytes(b"not an image")
    paths.insert(2, str(bad))

    feats, kept = tiny_encoder.encode_images(paths, batch_size=2)
    assert feats.shape == (5, 16)
    assert str(bad) not in kept
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)

    # quantize + store + decode round trip
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "store"
    write_store(store, feats, kept, np.asarray(scale), np.asarray(zero), q)
    z = Store.open(store).decode_all()
    # cosine similarity between original and decoded embedding near 1
    cos = np.sum(z * feats, axis=1)
    assert np.all(cos > 0.999)


def test_u8_encode_bit_identical_to_fp32(tiny_encoder, rng):
    """The uint8 encode transfer (preprocess_pil_u8 + on-device LUT
    normalize) is bit-identical to the host-normalized fp32 path: the LUT
    reproduces host normalize exactly for every (value, channel), so the
    ViT runs the same program on bit-equal inputs."""
    from clip_codec_tpu.encoders.clip import (
        CLIP_MEAN, CLIP_STD, clip_normalize_table, preprocess_pil, preprocess_pil_u8,
    )

    # table exactness over the full input domain
    table = clip_normalize_table()
    v = (np.arange(256, dtype=np.float32) / 255.0)[:, None]
    np.testing.assert_array_equal(table, (v - CLIP_MEAN) / CLIP_STD)

    img = Image.fromarray(rng.integers(0, 256, (40, 50, 3), dtype=np.uint8))
    u8 = preprocess_pil_u8(img, tiny_encoder.cfg.image_size)
    f32 = preprocess_pil(img, tiny_encoder.cfg.image_size)
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(
        f32, (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD)

    za = tiny_encoder.encode_image_array(f32[None])
    zb = tiny_encoder.encode_image_array(u8[None])
    np.testing.assert_array_equal(za, zb)


def test_batch_padding_invariance(tiny_encoder, tmp_path, rng):
    """Embeddings must not depend on batch padding (fixed-shape batches pad
    the tail with zero images)."""
    img_dir = tmp_path / "imgs2"
    img_dir.mkdir()
    paths = []
    for i in range(3):
        p = img_dir / f"x{i}.png"
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    f_b2, _ = tiny_encoder.encode_images(paths, batch_size=2)  # 2 + padded 1
    f_b8, _ = tiny_encoder.encode_images(paths, batch_size=8)  # all padded
    np.testing.assert_allclose(f_b2, f_b8, rtol=2e-5, atol=2e-6)


def test_data_parallel_encode_matches_single(tiny_encoder, tiny_clip_ckpt, tmp_path, rng):
    """ClipEncoder(mesh=...) row-shards each batch over the 8-device mesh
    (params replicated); embeddings match the single-device encoder. Also
    exercises the batch_size round-up to a mesh multiple (3 -> 8)."""
    import jax.numpy as jnp

    from clip_codec_tpu.encoders import ClipEncoder
    from clip_codec_tpu.parallel import make_mesh

    img_dir = tmp_path / "imgs_dp"
    img_dir.mkdir()
    paths = []
    for i in range(5):
        p = img_dir / f"d{i}.png"
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))

    dp = ClipEncoder(weights_path=tiny_clip_ckpt, cfg=TINY_CFG, dtype=jnp.float32,
                     mesh=make_mesh(8))
    f_dp, kept_dp = dp.encode_images(paths, batch_size=3)  # rounds up to 8
    f_one, kept_one = tiny_encoder.encode_images(paths, batch_size=8)
    assert kept_dp == kept_one
    np.testing.assert_allclose(f_dp, f_one, rtol=2e-5, atol=2e-6)


def test_text_retrieval_flow(tiny_encoder, tmp_path, rng):
    """Tokenizer (synthetic merges) -> text tower -> IP index search."""
    merges = ["t h", "th e</w>", "c a", "ca t</w>", "d o", "do g</w>"]
    bpe = tmp_path / "bpe.txt.gz"
    with gzip.open(bpe, "wt", encoding="utf-8") as f:
        f.write("#version: tiny\n" + "\n".join(merges) + "\n")
    tiny_encoder._bpe_path = str(bpe)
    tiny_encoder._tokenizer = None

    # the tiny vocab ids exceed vocab_size=100; clamp through modulo to stay
    # a pure mechanics test of the flow
    tok = tiny_encoder.tokenizer
    ids = tok(["the cat", "the dog"]) % 100
    import jax.numpy as jnp

    zt = np.asarray(tiny_encoder._embed_tokens(jnp.asarray(ids)))
    assert zt.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(zt, axis=1), 1.0, rtol=1e-5)

    feats = rng.standard_normal((10, 16)).astype(np.float32)
    feats[3] = zt[0] + 0.01 * rng.standard_normal(16)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    idx = build_index(feats)
    res = search_index(zt[0], idx, [f"p{i}" for i in range(10)], k=3)
    assert res[0][0] == "p3"


def test_encode_cli_append(tiny_encoder, tiny_clip_ckpt, tmp_path, rng, monkeypatch, capsys):
    """cli.encode_images --append: a second encode run ADDS to the store
    under the existing codec meta — old frames byte-identical, manifest
    grows, retrieval sees the new rows (no add operation exists in the
    reference; it re-encodes whole directories)."""
    import sys

    import clip_codec_tpu.encoders as encoders_mod
    from clip_codec_tpu.cli.encode_images import main

    def mkimgs(sub, n, start=0):
        d = tmp_path / sub
        d.mkdir()
        for i in range(start, start + n):
            Image.fromarray(rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
                            ).save(d / f"im{i}.png")
        return d

    monkeypatch.setattr(encoders_mod, "ClipEncoder",
                        lambda **kw: tiny_encoder)
    store = tmp_path / "store"
    d1 = mkimgs("a", 4)
    monkeypatch.setattr(sys, "argv", ["x", "--img_dir", str(d1),
                                      "--out_dir", str(store), "--device", "cpu"])
    main()
    meta0 = (store / "codec_meta.npz").read_bytes()
    frames0 = {p.name: p.read_bytes() for p in store.glob("*.clp")}

    d2 = mkimgs("b", 2, start=10)
    monkeypatch.setattr(sys, "argv", ["x", "--img_dir", str(d2),
                                      "--out_dir", str(store), "--device", "cpu",
                                      "--append"])
    main()
    assert "Appended 2" in capsys.readouterr().out
    assert (store / "codec_meta.npz").read_bytes() == meta0
    for name, blob in frames0.items():
        assert (store / name).read_bytes() == blob

    st = Store.open(store)
    assert len(st) == 6
    z = st.decode_all()
    idx = build_index(z)
    hits = search_index(z[5], idx, [r["image"] for r in st.manifest], k=1)
    assert hits[0][0].endswith("im11.png")
