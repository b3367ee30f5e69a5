"""CLI plumbing tests: flag surfaces, full reconstruct/eval flows on a tiny
trained model, graceful gating when pretrained weights are absent."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
from clip_codec_tpu.io.store import write_store
from clip_codec_tpu.train import DiffusionTrainConfig, train_diffusion


@pytest.fixture(scope="module")
def trained_store(tmp_path_factory):
    """Tiny store + trained tiny UNet checkpoint, shared across CLI tests."""
    rng = np.random.default_rng(0)
    tmp = tmp_path_factory.mktemp("cli")
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(4):
        p = img_dir / f"im{i}.png"
        Image.fromarray(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((4, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp / "store"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)
    cfg = DiffusionTrainConfig(out_size=16, epochs=1, batch_size=4, timesteps=50,
                               base=8, ch_mult=(1, 2), bf16=False)
    ckpt = train_diffusion(store, config=cfg, save_dir=tmp / "ckpt")
    return store, ckpt, tmp


def _run_cli(monkeypatch, module_main, argv):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    module_main()


def test_reconstruct_cli(trained_store, monkeypatch):
    from clip_codec_tpu.cli.reconstruct_diffusion import main

    store, ckpt, tmp = trained_store
    out = tmp / "recon.png"
    _run_cli(monkeypatch, main, [
        "--store_dir", str(store), "--bitstream", str(store / "im0.clp"),
        "--weights", str(ckpt), "--out", str(out), "--steps", "5",
        "--size", "16", "--device", "cpu", "--base", "8", "--ch_mult", "1,2",
    ])
    img = Image.open(out)
    assert img.size == (16, 16)


def test_reconstruct_cli_dpmpp(trained_store, monkeypatch):
    from clip_codec_tpu.cli.reconstruct_diffusion import main

    store, ckpt, tmp = trained_store
    out = tmp / "recon_dpmpp.png"
    _run_cli(monkeypatch, main, [
        "--store_dir", str(store), "--bitstream", str(store / "im0.clp"),
        "--weights", str(ckpt), "--out", str(out), "--steps", "5",
        "--size", "16", "--device", "cpu", "--base", "8", "--ch_mult", "1,2",
        "--sampler", "dpmpp",
    ])
    assert Image.open(out).size == (16, 16)


def test_reconstruct_cli_ddim_std(trained_store, monkeypatch):
    from clip_codec_tpu.cli.reconstruct_diffusion import main

    store, ckpt, tmp = trained_store
    out = tmp / "recon_std.png"
    _run_cli(monkeypatch, main, [
        "--store_dir", str(store), "--bitstream", str(store / "im0.clp"),
        "--weights", str(ckpt), "--out", str(out), "--steps", "5",
        "--size", "16", "--device", "cpu", "--base", "8", "--ch_mult", "1,2",
        "--sampler", "ddim_std",
    ])
    assert Image.open(out).size == (16, 16)


def test_reconstruct_cli_int8(trained_store, monkeypatch):
    """--int8 runs the quantized serving path end-to-end and resets cleanly."""
    from clip_codec_tpu.cli.reconstruct_diffusion import main
    from clip_codec_tpu.ops import int8_enabled, set_int8_conv

    store, ckpt, tmp = trained_store
    out = tmp / "recon_int8.png"
    try:
        _run_cli(monkeypatch, main, [
            "--store_dir", str(store), "--bitstream", str(store / "im0.clp"),
            "--weights", str(ckpt), "--out", str(out), "--steps", "5",
            "--size", "16", "--device", "cpu", "--base", "8", "--ch_mult", "1,2",
            "--int8",
        ])
        assert int8_enabled()
    finally:
        set_int8_conv(False)
    assert Image.open(out).size == (16, 16)


def test_eval_cli(trained_store, monkeypatch, capsys):
    from clip_codec_tpu.cli.eval import main

    store, ckpt, tmp = trained_store
    out_json = tmp / "metrics.json"
    _run_cli(monkeypatch, main, [
        "--store_dir", str(store), "--weights", str(ckpt), "--size", "16",
        "--steps", "5", "--device", "cpu", "--base", "8", "--ch_mult", "1,2",
        "--batch_size", "3", "--out_json", str(out_json),
    ])
    out = capsys.readouterr().out
    assert "Average PSNR:" in out
    assert "Average SSIM:" in out
    assert "Average LPIPS: nan" in out  # gated: no LPIPS weights in this env
    recs = json.loads(out_json.read_text())
    assert len(recs) == 4
    assert set(recs[0].keys()) == {"image", "psnr", "ssim", "lpips", "clip_sim"}
    assert all(np.isfinite(r["psnr"]) for r in recs)


def test_eval_cli_int8(trained_store, monkeypatch, capsys):
    """--int8 on eval runs the statically-calibrated serving path."""
    from clip_codec_tpu.cli.eval import main
    from clip_codec_tpu.ops import set_int8_conv

    store, ckpt, tmp = trained_store
    try:
        _run_cli(monkeypatch, main, [
            "--store_dir", str(store), "--weights", str(ckpt), "--size", "16",
            "--steps", "4", "--device", "cpu", "--base", "8", "--ch_mult", "1,2",
            "--batch_size", "4", "--int8",
        ])
    finally:
        set_int8_conv(False)
    out = capsys.readouterr().out
    psnr_line = [ln for ln in out.splitlines() if "Average PSNR" in ln][0]
    assert np.isfinite(float(psnr_line.split(":")[1].split()[0]))


def test_encode_cli_gated_without_weights(trained_store, monkeypatch):
    from clip_codec_tpu.cli.encode_images import main

    store, ckpt, tmp = trained_store
    monkeypatch.delenv("CLIP_CODEC_CLIP_WEIGHTS", raising=False)
    with pytest.raises(RuntimeError, match="CLIP_CODEC_CLIP_WEIGHTS"):
        _run_cli(monkeypatch, main, [
            "--img_dir", str(tmp / "imgs"), "--out_dir", str(tmp / "enc"), "--device", "cpu",
        ])


def test_encode_cli_rejects_unknown_model(trained_store, monkeypatch):
    from clip_codec_tpu.cli.encode_images import main

    store, ckpt, tmp = trained_store
    with pytest.raises(SystemExit, match="ViT-B-32"):
        _run_cli(monkeypatch, main, [
            "--img_dir", str(tmp / "imgs"), "--out_dir", str(tmp / "enc"),
            "--model", "ViT-L-14", "--device", "cpu",
        ])


def test_search_text_feature_fallback(trained_store):
    """load_features decodes bitstreams when decoded.npy is absent, and
    prefers decoded.npy when present (reference requires the file)."""
    from clip_codec_tpu.cli.search_text import load_features

    store, ckpt, tmp = trained_store
    feats, paths = load_features(store)
    assert feats.shape == (4, 16)
    assert len(paths) == 4
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5)

    custom = np.ones((4, 16), np.float32)
    np.save(store / "decoded.npy", custom)
    feats2, _ = load_features(store)
    np.testing.assert_array_equal(feats2, custom)
    (store / "decoded.npy").unlink()


def test_search_text_cli_sharded_matches_flat(trained_store, monkeypatch, capsys):
    """--data_parallel routes search through the row-sharded index over the
    8-device mesh; printed (score, path) lines are identical to the
    single-device index. CLIP is stubbed (query encode needs weights); the
    4-row store also exercises padding to the 8-way mesh (shard_rows=1)."""
    import clip_codec_tpu.encoders as encoders_mod
    from clip_codec_tpu.cli.search_text import main

    store, ckpt, tmp = trained_store
    qvec = np.load(store / "codec_meta.npz")["scale"].astype(np.float32)
    qvec /= np.linalg.norm(qvec)

    class _StubEncoder:
        def __init__(self, **kw):
            pass

        def encode_text(self, text):
            return qvec[None, :]

    monkeypatch.setattr(encoders_mod, "ClipEncoder", _StubEncoder)

    _run_cli(monkeypatch, main, ["--store_dir", str(store), "--query", "x", "--k", "3"])
    flat_out = capsys.readouterr().out
    _run_cli(monkeypatch, main, ["--store_dir", str(store), "--query", "x",
                                 "--k", "3", "--data_parallel"])
    sharded_out = capsys.readouterr().out

    def parse(out):
        rows = [ln.split("\t") for ln in out.strip().splitlines()]
        return [p for _, p in rows], np.array([float(s) for s, _ in rows])

    flat_paths, flat_scores = parse(flat_out)
    sh_paths, sh_scores = parse(sharded_out)
    assert len(flat_paths) == 3
    assert flat_paths == sh_paths
    np.testing.assert_allclose(flat_scores, sh_scores, atol=1e-4)

    # --ivf with nprobe=nlist is exact -> identical hits to the flat index
    _run_cli(monkeypatch, main, ["--store_dir", str(store), "--query", "x",
                                 "--k", "3", "--ivf", "--nlist", "2",
                                 "--nprobe", "2"])
    ivf_paths, ivf_scores = parse(capsys.readouterr().out)
    assert ivf_paths == flat_paths
    np.testing.assert_allclose(ivf_scores, flat_scores, atol=1e-4)


def test_search_cli_u8_matches_flat(trained_store, monkeypatch, capsys):
    """--u8 searches the store's uint8 codes directly (dequantize folded into
    the dot): identical hits to the fp32 flat index; --u8 --ivf composes
    (uint8-resident inverted lists), exact at nprobe >= nlist."""
    from clip_codec_tpu.cli.search_text import main

    store, ckpt, tmp = trained_store
    args = ["--store_dir", str(store), "--query_clp", str(store / "im2.clp"),
            "--k", "3"]
    _run_cli(monkeypatch, main, args)
    flat = capsys.readouterr().out
    _run_cli(monkeypatch, main, args + ["--u8"])
    u8 = capsys.readouterr().out
    _run_cli(monkeypatch, main,
             args + ["--u8", "--ivf", "--nlist", "2", "--nprobe", "2"])
    u8_ivf = capsys.readouterr().out

    def parse(out):
        rows = [ln.split("\t") for ln in out.strip().splitlines()]
        return [p for _, p in rows], np.array([float(s) for s, _ in rows])

    f_paths, f_scores = parse(flat)
    for out in (u8, u8_ivf):
        u_paths, u_scores = parse(out)
        assert u_paths == f_paths and len(f_paths) == 3
        np.testing.assert_allclose(u_scores, f_scores, atol=1e-4)


def test_search_cli_query_clp(trained_store, monkeypatch, capsys):
    """--query_clp: image->image search from a compressed frame alone — no
    CLIP weights involved. The frame's own store row is the top hit. (The
    reference's image-query helper is dead code that crashes when called,
    cli/search_text.py:24-28.)"""
    from clip_codec_tpu.cli.search_text import main

    store, ckpt, tmp = trained_store
    _run_cli(monkeypatch, main, ["--store_dir", str(store),
                                 "--query_clp", str(store / "im2.clp"),
                                 "--k", "2"])
    rows = [ln.split("\t") for ln in capsys.readouterr().out.strip().splitlines()]
    assert rows[0][1].endswith("im2.png")
    assert float(rows[0][0]) > 0.99

    # frame from a different-dim store -> clean error, not a numpy traceback
    # (the .clp header carries no dim — reference quirk)
    from clip_codec_tpu.io.bitstream import compress_frame

    bad = store / "wrong_dim.clp"
    bad.write_bytes(compress_frame(np.zeros(7, np.uint8).tobytes()))
    with pytest.raises(SystemExit):
        _run_cli(monkeypatch, main, ["--store_dir", str(store),
                                     "--query_clp", str(bad)])


def test_search_cli_query_image(trained_store, monkeypatch, capsys):
    """--query_image routes through the B=1 encode_image_array path with
    preprocess_pil_u8 geometry (stubbed to a known store vector); exactly
    one query flag is enforced by argparse."""
    from types import SimpleNamespace

    import clip_codec_tpu.encoders as encoders_mod
    from clip_codec_tpu.cli.search_text import main

    store, ckpt, tmp = trained_store
    with open(store / "manifest.json", "r", encoding="utf-8") as f:
        img_path = json.load(f)[3]["image"]

    from clip_codec_tpu.io.store import Store

    feats = Store.open(store).decode_all(renormalize=True)
    seen = {}

    class _StubEncoder:
        cfg = SimpleNamespace(image_size=32)

        def __init__(self, **kw):
            pass

        def encode_image_array(self, x):
            seen["shape"], seen["dtype"] = x.shape, x.dtype
            return feats[3:4]

    monkeypatch.setattr(encoders_mod, "ClipEncoder", _StubEncoder)
    _run_cli(monkeypatch, main, ["--store_dir", str(store),
                                 "--query_image", img_path, "--k", "1"])
    rows = [ln.split("\t") for ln in capsys.readouterr().out.strip().splitlines()]
    assert rows[0][1].endswith("im3.png")
    assert float(rows[0][0]) > 0.999
    assert seen["shape"] == (1, 32, 32, 3) and seen["dtype"] == np.uint8

    with pytest.raises(SystemExit):  # --query and --query_image are exclusive
        _run_cli(monkeypatch, main, ["--store_dir", str(store), "--query", "x",
                                     "--query_image", img_path])
    with pytest.raises(SystemExit):  # unreadable image -> clean error
        _run_cli(monkeypatch, main, ["--store_dir", str(store),
                                     "--query_image", str(tmp / "absent.png")])
    with pytest.raises(SystemExit):  # no sharded IVF: refuse, don't drop a flag
        _run_cli(monkeypatch, main, ["--store_dir", str(store), "--query", "x",
                                     "--ivf", "--data_parallel"])


def test_model_config_autopickup(trained_store, monkeypatch, tmp_path):
    """Training writes model_config.json; reconstruct CLI rebuilds the right
    model without --base/--ch_mult flags (the reference silently mismatches)."""
    from clip_codec_tpu.cli.reconstruct_diffusion import main
    from clip_codec_tpu.utils.config import ModelConfig

    store, ckpt, tmp = trained_store
    mc = ModelConfig.find_for_checkpoint(ckpt)
    assert mc is not None
    assert mc.base == 8 and mc.ch_mult == (1, 2) and mc.timesteps == 50

    out = tmp_path / "auto.png"
    _run_cli(monkeypatch, main, [
        "--store_dir", str(store), "--bitstream", str(store / "im0.clp"),
        "--weights", str(ckpt), "--out", str(out), "--steps", "3",
        "--size", "16", "--device", "cpu",
    ])
    assert out.exists()


def test_train_cli(trained_store, monkeypatch, tmp_path, capsys):
    """The beyond-reference train CLI end-to-end on a tiny store."""
    from clip_codec_tpu.cli.train import main

    store, ckpt, tmp = trained_store
    _run_cli(monkeypatch, main, [
        "--store_dir", str(store), "--out_size", "16", "--epochs", "1",
        "--batch_size", "4", "--timesteps", "50", "--base", "8",
        "--ch_mult", "1,2", "--no_bf16", "--device", "cpu",
        "--save_dir", str(tmp_path / "tcli"),
    ])
    out = capsys.readouterr().out
    assert "Final checkpoint:" in out
    assert (tmp_path / "tcli" / "diffusion_unet_final.msgpack").exists()
    assert (tmp_path / "tcli" / "model_config.json").exists()


def test_precompute_latents_cli(trained_store, monkeypatch, tmp_path):
    """Full CLI-level run of cli.precompute_latents on a tiny VAE: the
    reference format contract (cli/precompute_latents.py:8-13,26-31) —
    fp16 CHW (4, S/8, S/8) npz key 'lat' under latents/<stem>.npz, plus
    manifest_latents.json with the added 'latent' field. The diffusers
    checkpoint converter is covered by test_sd_convert.py; here it is
    stubbed so the CLI's own pipeline (args, store IO, batching, scaling,
    format) is what's under test."""
    import jax

    from clip_codec_tpu.models.sd import AutoencoderKL
    from tests.test_sd import TINY_VAE

    store, _, _ = trained_store
    vae = AutoencoderKL(TINY_VAE)
    vae_params = vae.init(
        jax.random.PRNGKey(0), np.zeros((1, 16, 16, 3), np.float32), jax.random.PRNGKey(1)
    )["params"]

    import clip_codec_tpu.models.sd as sd_mod
    import clip_codec_tpu.weights.convert_sd as conv_mod

    monkeypatch.setattr(sd_mod, "SD15_VAE", TINY_VAE)
    monkeypatch.setattr(conv_mod, "load_sd_params", lambda **kw: (None, vae_params))
    fake_ckpt = tmp_path / "vae.bin"
    fake_ckpt.write_bytes(b"stub")  # existence-gated only; loader is stubbed

    from clip_codec_tpu.cli.precompute_latents import main

    _run_cli(monkeypatch, main, [
        "--store_dir", str(store), "--size", "16", "--batch_size", "3",
        "--device", "cpu", "--vae_weights", str(fake_ckpt),
    ])

    manifest = json.loads((store / "manifest_latents.json").read_text())
    assert len(manifest) == 4
    down = 2 ** (len(TINY_VAE.block_out) - 1)
    for rec in manifest:
        lat_path = Path(rec["latent"])
        assert lat_path.exists() and lat_path.parent.name == "latents"
        lat = np.load(lat_path)["lat"]
        assert lat.dtype == np.float16  # format parity: fp16 CHW
        assert lat.shape == (TINY_VAE.latent_ch, 16 // down, 16 // down)
        assert np.isfinite(lat).all()


def test_precompute_latents_cli_gated_without_weights(trained_store, monkeypatch):
    from clip_codec_tpu.cli.precompute_latents import main

    store, _, _ = trained_store
    monkeypatch.delenv("CLIP_CODEC_SD_VAE_WEIGHTS", raising=False)
    with pytest.raises(RuntimeError, match="SD VAE weights"):
        _run_cli(monkeypatch, main, ["--store_dir", str(store), "--device", "cpu"])


def test_eval_cli_data_parallel(trained_store, monkeypatch, capsys):
    """--data_parallel shards the reconstruction batch over the 8 virtual
    devices; aggregates must match the single-device run to fp tolerance."""
    from clip_codec_tpu.cli.eval import main

    store, ckpt, tmp = trained_store
    common = ["--store_dir", str(store), "--weights", str(ckpt), "--size", "16",
              "--steps", "4", "--device", "cpu", "--batch_size", "8", "--seed", "3"]
    _run_cli(monkeypatch, main, common)
    single = capsys.readouterr().out
    _run_cli(monkeypatch, main, common + ["--data_parallel"])
    sharded = capsys.readouterr().out
    import re

    def agg(out, key):
        return float(re.search(rf"Average {key}: ([-\d.]+)", out).group(1))

    assert abs(agg(single, "PSNR") - agg(sharded, "PSNR")) < 0.05
    assert abs(agg(single, "SSIM") - agg(sharded, "SSIM")) < 0.005
