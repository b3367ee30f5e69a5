"""SD adapter-training loop + inversion-guided sampling at tiny config."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
from clip_codec_tpu.io.store import write_store
from clip_codec_tpu.models.sd import AutoencoderKL, SDUNet, StableDiffusionDecoder
from tests.test_sd import TINY_UNET, TINY_VAE


@pytest.fixture
def tiny_decoder(rng):
    vae = AutoencoderKL(TINY_VAE)
    unet = SDUNet(TINY_UNET)
    x = jnp.zeros((1, 16, 16, 3))
    vae_params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    lat0 = jnp.zeros((1, 8, 8, 4))
    ctx0 = jnp.zeros((1, 8, 16))
    unet_params = unet.init(jax.random.PRNGKey(2), lat0, jnp.zeros((1,), jnp.int32), ctx0)["params"]
    return StableDiffusionDecoder(
        vae_params, unet_params, clip_dim=32, n_tokens=8,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, dtype=jnp.float32,
    )


@pytest.fixture
def sd_store(tmp_path, tiny_decoder):
    """Store with images, bitstreams AND latents (manifest_latents.json) —
    built by the shared helper also used by the cluster workers."""
    from tests.sd_fixtures import build_tiny_sd_store

    return build_tiny_sd_store(tmp_path, tiny_decoder)


def test_sd_adapter_training(sd_store, tiny_decoder, tmp_path, capsys):
    from clip_codec_tpu.train.sd_diffusion_train import SDTrainConfig, train_sd_diffusion

    before = jax.tree_util.tree_map(np.copy, tiny_decoder.adapter_params)
    cfg = SDTrainConfig(epochs=2, batch_size=4, lr=1e-3, timesteps=100)
    ckpt = train_sd_diffusion(sd_store, tiny_decoder, config=cfg, save_dir=tmp_path / "ck", image_size=16)
    assert ckpt.exists()
    assert (tmp_path / "ck" / "sd_adapter_ep1.msgpack").exists()
    # only the adapter changed
    after = tiny_decoder.adapter_params
    diffs = [not np.allclose(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after))]
    assert any(diffs), "adapter params did not train"
    out = capsys.readouterr().out
    assert "epoch 2/2" in out


def test_inversion_guided_sampling(tiny_decoder, rng):
    z = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)

    def toy_embed(x_m11):  # cheap differentiable 'encoder'
        pooled = jnp.mean(x_m11, axis=(1, 2))  # (B, 3)
        return jnp.tile(pooled, (1, 11))[:, :32]

    out = tiny_decoder.sample_with_inversion(
        z, z, toy_embed, (1, 8, 8, 4), steps=4, guidance_scale=2.0,
        inv_weight=0.5, inv_every=2, rng=jax.random.PRNGKey(0), decode_pixels=False,
    )
    assert out.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())
    # inversion changes the trajectory vs plain CFG sampling
    plain = tiny_decoder.sample(z, (1, 8, 8, 4), steps=4, guidance_scale=2.0,
                                rng=jax.random.PRNGKey(0), decode_pixels=False)
    assert not np.allclose(np.asarray(out), np.asarray(plain))


def test_adapter_checkpoint_prefix_stripping(tiny_decoder, tmp_path):
    """Reference-style torch adapter checkpoints load through the tolerant
    path (container + module./adapter. prefixes)."""
    torch = pytest.importorskip("torch")
    from clip_codec_tpu.cli.reconstruct_sd_diffusion import load_adapter_params

    # Build a torch adapter state dict shaped like the reference's
    # SDClipAdapter (proj.0 LayerNorm, proj.1/proj.3 Linear).
    t_adapter = torch.nn.Sequential()
    sd = {
        "adapter": {
            "module.proj.0.weight": torch.randn(32),
            "module.proj.0.bias": torch.randn(32),
            "module.proj.1.weight": torch.randn(64, 32),
            "module.proj.1.bias": torch.randn(64),
            "module.proj.3.weight": torch.randn(16 * 8, 64),
            "module.proj.3.bias": torch.randn(16 * 8),
        }
    }
    p = tmp_path / "adapter.pt"
    torch.save(sd, p)
    params = load_adapter_params(p)
    assert set(params.keys()) == {"ln", "fc1", "fc2"}
    assert params["fc1"]["kernel"].shape == (32, 64)
    assert params["fc2"]["kernel"].shape == (64, 128)


def _biggest_embedded_const_bytes(lowered) -> int:
    """Largest dense constant EMBEDDED in a lowered jit module. Closure-
    captured arrays appear here as dense<"0x..."> blobs (what the remote
    compile transport actually ships); arguments do not. Validated to
    discriminate: a deliberately closure-captured tiny decoder shows its
    512 KB adapter kernel, the product paths show 0."""
    import re as _re

    best = 0
    for m in _re.finditer(r'dense<"0x([0-9a-fA-F]+)"', lowered.as_text()):
        best = max(best, len(m.group(1)) // 2)
    return best


def test_sd_step_carries_no_large_closure_constants(tiny_decoder):
    """Round-2 review (weak #1): the jitted SD train step must take every
    frozen parameter tree as an ARGUMENT — at real scale the 860M UNet
    closure-captured into the program body exceeds the remote-compile
    transport limit. Trace the step and assert no multi-MB constants."""
    import optax

    from clip_codec_tpu.train.sd_diffusion_train import SDTrainConfig, make_sd_train_step

    cfg = SDTrainConfig(timesteps=50)
    tx = optax.adamw(1e-3)
    step = make_sd_train_step(tiny_decoder, tx, cfg)
    a = tiny_decoder.adapter_params
    opt = tx.init(a)
    frozen = {"unet": tiny_decoder.unet_params, "vae": tiny_decoder.vae_params}
    B = 2
    args = (
        a, opt, frozen,
        jnp.zeros((B, 32), jnp.float32), jnp.zeros((B, 8, 8, 4), jnp.float32),
        jnp.zeros((B, 16, 16, 3), jnp.float32), jnp.ones((B,), jnp.float32),
        jax.random.PRNGKey(0),
    )
    biggest = _biggest_embedded_const_bytes(step.lower(*args, perc_on=False))
    assert biggest < 100_000, (
        f"step embeds a {biggest/1e3:.0f} KB constant in its program body — "
        "frozen params must be jit arguments"
    )


def test_sd_data_workers_equivalence(sd_store):
    """Threaded batch assembly is bit-identical to the synchronous path."""
    from clip_codec_tpu.train.sd_diffusion_train import SDStoreData

    sync = SDStoreData(sd_store, image_size=16)
    pooled = SDStoreData(sd_store, image_size=16, workers=3)
    idx = np.array([3, 0, 2, 1])
    for a, b in zip(sync.batch(idx), pooled.batch(idx)):
        np.testing.assert_array_equal(a, b)


def test_sd_u8_pipeline_bit_identical_to_fp32(sd_store, tiny_decoder):
    """uint8 GT transfer + on-device scale_m11_u8 == host-scaled fp32
    (bit-equal loss and adapter params; same step program both ways)."""
    import optax

    from clip_codec_tpu.train.data import scale_m11_u8
    from clip_codec_tpu.train.sd_diffusion_train import (
        SDStoreData,
        SDTrainConfig,
        make_sd_train_step,
    )

    cfg = SDTrainConfig(timesteps=50, out_size=16)
    tx = optax.adamw(1e-3)
    data = SDStoreData(sd_store, image_size=16)
    idx = np.arange(4)
    z, lat0, img_f32 = data.batch(idx)
    _, _, img_u8 = data.batch(idx, u8=True)
    assert img_u8.dtype == np.uint8
    scaled = scale_m11_u8(jnp.asarray(img_u8))
    np.testing.assert_array_equal(img_f32, np.asarray(scaled))  # bit-exact
    w = np.ones((4,), np.float32)
    rng = jax.random.PRNGKey(3)
    step = make_sd_train_step(tiny_decoder, tx, cfg)
    frozen = {"unet": tiny_decoder.unet_params, "vae": tiny_decoder.vae_params}

    def run(img):
        a = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), tiny_decoder.adapter_params
        )
        opt = tx.init(a)
        a2, _, loss = step(a, opt, frozen, jnp.asarray(z), jnp.asarray(lat0),
                           img, jnp.asarray(w), rng, perc_on=False)
        return float(loss), jax.tree_util.tree_map(np.asarray, a2)

    loss_a, pa = run(jnp.asarray(img_f32))
    loss_b, pb = run(scaled)
    assert loss_a == loss_b
    jax.tree_util.tree_map(np.testing.assert_array_equal, pa, pb)


def test_sd_dp_step_matches_single_device(sd_store, tiny_decoder):
    """The SD adapter step under data parallelism equals the single-device
    step (grad psum reassociation tolerance only)."""
    import optax

    from clip_codec_tpu.parallel import make_mesh, replicate, shard_batch
    from clip_codec_tpu.train.sd_diffusion_train import (
        SDStoreData,
        SDTrainConfig,
        make_sd_train_step,
    )

    cfg = SDTrainConfig(timesteps=50, out_size=16)
    tx = optax.adamw(1e-3)
    data = SDStoreData(sd_store, image_size=16)
    z, lat0, img = data.batch(np.arange(4))
    w = np.ones((4,), np.float32)
    rng = jax.random.PRNGKey(7)

    def run(mesh):
        step = make_sd_train_step(tiny_decoder, tx, cfg)
        # copy=True: the step donates a_params/opt_state, and both runs start
        # from the decoder's same underlying buffers
        a = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), tiny_decoder.adapter_params
        )
        opt = tx.init(a)
        frozen = {"unet": tiny_decoder.unet_params, "vae": tiny_decoder.vae_params}
        if mesh is None:
            args = tuple(jnp.asarray(x) for x in (z, lat0, img, w))
        else:
            a = replicate(mesh, a)
            opt = replicate(mesh, opt)
            frozen = replicate(mesh, frozen)
            args = shard_batch(mesh, z, lat0, img, w)
        a2, _, loss = step(a, opt, frozen, *args, rng, perc_on=False)
        return float(loss), jax.tree_util.tree_map(np.asarray, a2)

    loss_1, a_1 = run(None)
    loss_dp, a_dp = run(make_mesh(4))
    assert np.isclose(loss_1, loss_dp, rtol=1e-5)
    # adamw's rsqrt amplifies the grad-psum reassociation drift near zero
    # second moments; 1e-3 relative still pins the update math.
    for x, y in zip(jax.tree_util.tree_leaves(a_1), jax.tree_util.tree_leaves(a_dp)):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-4)


def test_sd_train_resume_and_ema(sd_store, tiny_decoder, tmp_path, capsys):
    """Orbax full-state resume + adapter EMA, mirroring the pixel trainer."""
    from clip_codec_tpu.train.sd_diffusion_train import SDTrainConfig, train_sd_diffusion

    ck = tmp_path / "ck"
    cfg = SDTrainConfig(epochs=1, batch_size=4, lr=1e-3, timesteps=50, ema_decay=0.5)
    train_sd_diffusion(sd_store, tiny_decoder, config=cfg, save_dir=ck, image_size=16)
    cfg2 = SDTrainConfig(epochs=2, batch_size=4, lr=1e-3, timesteps=50, ema_decay=0.5)
    final = train_sd_diffusion(
        sd_store, tiny_decoder, config=cfg2, save_dir=ck, image_size=16, resume=True
    )
    out = capsys.readouterr().out
    assert "resumed from epoch 1" in out
    assert final.exists()
    assert (ck / "sd_adapter_ema_final.msgpack").exists()
    assert (ck / "sd_adapter_ep2.msgpack").exists()


def test_train_sd_cli_e2e(sd_store, tiny_decoder, tmp_path, monkeypatch, capsys):
    """The reference's missing CLI surface: python -m ...train.sd_diffusion_train
    flags drive a tiny run end-to-end from converted (.msgpack) weights."""
    import sys

    from clip_codec_tpu.cli.train_sd import main
    from clip_codec_tpu.utils.checkpoint import save_params

    wdir = tmp_path / "w"
    save_params(wdir / "unet.msgpack", tiny_decoder.unet_params)
    save_params(wdir / "vae.msgpack", tiny_decoder.vae_params)
    monkeypatch.setenv("CLIP_CODEC_SD_UNET_WEIGHTS", str(wdir / "unet.msgpack"))
    monkeypatch.setenv("CLIP_CODEC_SD_VAE_WEIGHTS", str(wdir / "vae.msgpack"))
    monkeypatch.delenv("CLIP_CODEC_DINO_WEIGHTS", raising=False)
    monkeypatch.delenv("CLIP_CODEC_LPIPS_WEIGHTS", raising=False)
    save_dir = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--store_dir", str(sd_store), "--out_size", "16",
        "--epochs", "1", "--batch_size", "4", "--lr", "1e-3",
        "--timesteps", "50", "--heads", "2", "--device", "cpu",
        "--save_dir", str(save_dir),
    ])
    main()
    out = capsys.readouterr().out
    assert "epoch 1/1" in out
    assert (save_dir / "sd_adapter_final.msgpack").exists()
    assert (save_dir / "sd_adapter_ep1.msgpack").exists()


def test_reconstruct_sd_cli_e2e(sd_store, tiny_decoder, tmp_path, monkeypatch, capsys):
    """Full SD CLI loop: train the adapter (train_sd CLI), then reconstruct a
    bitstream through the reconstruct_sd_diffusion CLI with inferred
    configs, with and without --int8."""
    import sys

    import PIL.Image

    from clip_codec_tpu.cli.reconstruct_sd_diffusion import main as rec_main
    from clip_codec_tpu.utils.checkpoint import save_params

    wdir = tmp_path / "w"
    save_params(wdir / "unet.msgpack", tiny_decoder.unet_params)
    save_params(wdir / "vae.msgpack", tiny_decoder.vae_params)
    save_params(wdir / "adapter.msgpack", tiny_decoder.adapter_params)
    monkeypatch.setenv("CLIP_CODEC_SD_UNET_WEIGHTS", str(wdir / "unet.msgpack"))
    monkeypatch.setenv("CLIP_CODEC_SD_VAE_WEIGHTS", str(wdir / "vae.msgpack"))
    bit = sorted(Path(sd_store).glob("*.clp"))[0]

    for extra, name in ([], "fp"), (["--int8"], "int8"):
        out = tmp_path / f"rec_{name}.png"
        monkeypatch.setattr(sys, "argv", [
            "prog", "--store_dir", str(sd_store), "--bitstream", str(bit),
            "--adapter", str(wdir / "adapter.msgpack"), "--steps", "2",
            "--size", "32", "--heads", "2", "--inv_weight", "0",
            "--device", "cpu", "--out", str(out)] + extra)
        rec_main()
        img = np.asarray(PIL.Image.open(out))
        assert img.shape == (32, 32, 3)

    # --int8 + inversion guidance is rejected (round() kills the latent grad)
    monkeypatch.setattr(sys, "argv", [
        "prog", "--store_dir", str(sd_store), "--bitstream", str(bit),
        "--adapter", str(wdir / "adapter.msgpack"), "--inv_weight", "1.0",
        "--int8"])
    with pytest.raises(SystemExit, match="int8"):
        rec_main()


def test_sd_sampling_carries_no_large_closure_constants(tiny_decoder):
    """The CFG DDIM sampling program must also take the frozen UNet/VAE
    params as ARGUMENTS (at SD-1.5 scale a closure-captured UNet serializes
    ~3.4 GB into the program body; same rule as the train step)."""
    from clip_codec_tpu.models.sd.decoder import _cfg_ddim_sample

    low = _cfg_ddim_sample.lower(
        tiny_decoder.unet, tiny_decoder.vae, tiny_decoder.adapter,
        {"params": tiny_decoder.unet_params}, tiny_decoder.vae_params,
        tiny_decoder.adapter_params,
        jnp.zeros((1, 32)), jnp.zeros((1, 32)), jax.random.PRNGKey(0),
        jnp.float32(2.0),
        embed_fn=None, shape=(1, 8, 8, 4), steps=2, eta=0.0,
        inv_weight=0.0, inv_every=1, decode_pixels=True,
        scaling=tiny_decoder.scaling_factor,
    )
    biggest = _biggest_embedded_const_bytes(low)
    assert biggest < 100_000, (
        f"sampling embeds a {biggest/1e3:.0f} KB constant in its program "
        "body — params must be jit arguments"
    )


def test_sd_decoder_static_int8_calibration(tiny_decoder):
    """calibrate_int8_scales gives the SD product surface the static int8
    mode: scales recorded once ride sample() and forward(); outputs stay
    finite and differ from the fp trajectory (quantization engaged)."""
    from clip_codec_tpu.models.sd import SDUNet, StableDiffusionDecoder
    from tests.test_sd import TINY_UNET, TINY_VAE

    dec = StableDiffusionDecoder(
        tiny_decoder.vae_params, tiny_decoder.unet_params,
        adapter_params=tiny_decoder.adapter_params, clip_dim=32, n_tokens=8,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, dtype=jnp.float32, int8=True,
    )
    z = jnp.asarray(np.random.default_rng(3).standard_normal((1, 32)), jnp.float32)
    dec.calibrate_int8_scales(z, (1, 8, 8, 4), timesteps=(40, 5))
    assert dec.unet_quant is not None
    assert all(float(v) > 0 for v in jax.tree_util.tree_leaves(dec.unet_quant))
    out = np.asarray(dec.sample(z, (1, 8, 8, 4), steps=3, guidance_scale=2.0))
    assert np.isfinite(out).all()
    fp = np.asarray(tiny_decoder.sample(z, (1, 8, 8, 4), steps=3, guidance_scale=2.0))
    assert not np.allclose(out, fp)  # int8 trajectory diverges from fp
