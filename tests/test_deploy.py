"""AOT deployment artifacts (deploy.py): export the full decompress program
via jax.export, reload it, and check it reproduces the live path without
touching the model-building code.

The deserialized program goes through XLA's AOT loader, which may codegen for
slightly different machine features than the live JIT (observed: CPU AOT
compiled with +prefer-no-scatter/+prefer-no-gather while the host JIT is not)
— so artifact-vs-live comparison uses the repo's fp32 tolerance (~1e-4), while
artifact-vs-itself (same seed) stays bitwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_codec_tpu.deploy import (
    export_decompressor,
    export_sd_decompressor,
    load_decompressor,
    load_sd_decompressor,
    make_decompress_fn,
)
from clip_codec_tpu.models import CLIPCondUNet
from clip_codec_tpu.utils.config import ModelConfig

MC = ModelConfig(z_dim=8, base=8, ch_mult=(1, 2), timesteps=25, schedule="cosine")


@pytest.fixture(scope="module")
def tiny_params():
    net = CLIPCondUNet(z_dim=MC.z_dim, base=MC.base, ch_mult=MC.ch_mult, dtype=jnp.bfloat16)
    return net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, MC.z_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]


def test_export_roundtrip(tmp_path, tiny_params, rng):
    """Artifact output matches the live sampler; same seed is reproducible."""
    path = export_decompressor(
        tiny_params, MC, tmp_path / "dec.jaxprog", size=16, steps=4, batch_size=2
    )
    assert path.exists() and path.stat().st_size < 5_000_000  # no weights inside

    call = load_decompressor(path)
    z = jnp.asarray(rng.standard_normal((2, MC.z_dim)), jnp.float32)
    out = call(tiny_params, z, seed=3)
    assert out.shape == (2, 16, 16, 3)

    live = make_decompress_fn(MC, size=16, steps=4)(tiny_params, z, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), atol=1e-4)

    # seeds change the trajectory; same seed reproduces it
    out2 = call(tiny_params, z, seed=4)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(call(tiny_params, z, seed=3)))


def test_export_dpmpp_variant(tmp_path, tiny_params, rng):
    path = export_decompressor(
        tiny_params, MC, tmp_path / "dec_dpm.jaxprog", size=16, steps=4,
        batch_size=1, sampler="dpmpp",
    )
    call = load_decompressor(path)
    z = jnp.asarray(rng.standard_normal((1, MC.z_dim)), jnp.float32)
    out = call(tiny_params, z)
    assert bool(jnp.isfinite(out).all())
    live = make_decompress_fn(MC, size=16, steps=4, sampler="dpmpp")(
        tiny_params, z, jnp.int32(0)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), atol=1e-4)


def test_export_ddim_std_variant(tmp_path, tiny_params, rng):
    path = export_decompressor(
        tiny_params, MC, tmp_path / "dec_std.jaxprog", size=16, steps=4,
        batch_size=1, sampler="ddim_std",
    )
    call = load_decompressor(path)
    z = jnp.asarray(rng.standard_normal((1, MC.z_dim)), jnp.float32)
    out = call(tiny_params, z)
    assert bool(jnp.isfinite(out).all())
    live = make_decompress_fn(MC, size=16, steps=4, sampler="ddim_std")(
        tiny_params, z, jnp.int32(0)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(live), atol=1e-4)
    # the three samplers produce three distinct trajectories from one seed
    ddim = make_decompress_fn(MC, size=16, steps=4, sampler="ddim")(
        tiny_params, z, jnp.int32(0)
    )
    assert not np.allclose(np.asarray(out), np.asarray(ddim), atol=1e-3)


def test_shape_and_tree_mismatches_raise(tmp_path, tiny_params, rng):
    path = export_decompressor(
        tiny_params, MC, tmp_path / "dec.jaxprog", size=16, steps=2, batch_size=2
    )
    call = load_decompressor(path)
    with pytest.raises(ValueError):
        call(tiny_params, jnp.zeros((3, MC.z_dim)))  # wrong batch
    with pytest.raises(ValueError):
        call(tiny_params, jnp.zeros((2, MC.z_dim + 1)))  # wrong dim
    bad_params = {"nope": jnp.zeros((1,))}
    with pytest.raises((ValueError, TypeError)):
        call(bad_params, jnp.zeros((2, MC.z_dim)))


def test_export_decoder_cli(tmp_path, tiny_params, rng, monkeypatch):
    """cli.export_decoder: checkpoint + model_config.json → loadable artifact."""
    import sys

    from clip_codec_tpu.cli.export_decoder import main
    from clip_codec_tpu.utils.checkpoint import save_params

    ckpt = save_params(tmp_path / "ckpt" / "unet.msgpack", tiny_params)
    MC.save(tmp_path / "ckpt")
    out = tmp_path / "dec.jaxprog"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--weights", str(ckpt), "--out", str(out), "--size", "16",
        "--steps", "3", "--batch_size", "1", "--device", "cpu",
    ])
    main()
    call = load_decompressor(out)
    z = jnp.asarray(rng.standard_normal((1, MC.z_dim)), jnp.float32)
    img = call(tiny_params, z, seed=1)
    assert img.shape == (1, 16, 16, 3) and bool(jnp.isfinite(img).all())


def test_seed_parity_traced_vs_artifact(tmp_path, tiny_params, rng):
    """The same ?seed= must sample the same image whether served by the
    traced ClipCodec path or the AOT artifact — operators switch between
    the two deployment modes and clients rely on seed reproducibility."""
    from clip_codec_tpu.codec import ClipCodec
    from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
    from clip_codec_tpu.io.bitstream import compress_frame

    feats = rng.standard_normal((2, MC.z_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    codec = ClipCodec(np.asarray(scale), np.asarray(zero), tiny_params, MC)
    blob = compress_frame(q[0].tobytes())

    traced = codec.decompress([blob], size=16, steps=3, batch_size=1, seed=9)[0]
    art = export_decompressor(tiny_params, MC, tmp_path / "sp.jaxprog",
                              size=16, steps=3, batch_size=1)
    z = codec.decode_embeddings([blob])
    out = np.asarray(load_decompressor(art)(tiny_params, z, seed=9))[0]
    np.testing.assert_allclose(out, traced, atol=1e-4)


def test_uint8_output_artifact(tmp_path, tiny_params, rng):
    """output='uint8' folds the PNG-prep conversion into the program —
    pixel-identical to converting the float32 artifact's output on host."""
    z = jnp.asarray(rng.standard_normal((2, MC.z_dim)), jnp.float32)
    f32 = export_decompressor(
        tiny_params, MC, tmp_path / "f32.jaxprog", size=16, steps=3, batch_size=2)
    u8 = export_decompressor(
        tiny_params, MC, tmp_path / "u8.jaxprog", size=16, steps=3, batch_size=2,
        output="uint8")
    ref = np.asarray(load_decompressor(f32)(tiny_params, z, seed=4))
    out = np.asarray(load_decompressor(u8)(tiny_params, z, seed=4))
    assert out.dtype == np.uint8
    host = ((np.clip(ref, -1, 1) + 1.0) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(out, host)
    assert load_decompressor(u8).meta["output"] == "uint8"


def test_sharded_export_matches_single_device(tmp_path, tiny_params, rng):
    """DP + spatial sharded artifacts sample the SAME images from the same
    seed as the single-device artifact; mesh-shape mismatches fail fast."""
    from clip_codec_tpu.deploy import (
        export_sharded_decompressor, load_sharded_decompressor,
    )
    from clip_codec_tpu.parallel import make_mesh

    z = jnp.asarray(rng.standard_normal((4, MC.z_dim)), jnp.float32)
    single = export_decompressor(
        tiny_params, MC, tmp_path / "dec1.jaxprog", size=16, steps=3, batch_size=4)
    ref = load_decompressor(single)(tiny_params, z, seed=6)

    mesh = make_mesh(4)  # data=4
    art = export_sharded_decompressor(
        tiny_params, MC, tmp_path / "dec_dp.jaxprog", mesh,
        size=16, steps=3, batch_size=4)
    call = load_sharded_decompressor(art, mesh)
    assert call.meta["sharded"] and call.meta["mesh"] == {"data": 4, "model": 1}
    out = call(tiny_params, z, seed=6)
    # DP shards only the batch: per-sample math is untouched -> BITWISE
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # spatial: height over the model axis on a (data=4, model=2) mesh.
    # Partitioned convs/GN reduce in a different order, so a bf16 net drifts
    # ~1 ulp per forward (measured 3.9e-3 after one step) and trajectories
    # compound — compare ONE step at that measured scale, not the full run.
    smesh = make_mesh(8, model_parallel=2)
    sart = export_sharded_decompressor(
        tiny_params, MC, tmp_path / "dec_sp.jaxprog", smesh, spatial=True,
        size=16, steps=1, batch_size=4)
    sout = load_sharded_decompressor(sart, smesh)(tiny_params, z, seed=6)
    ref1 = make_decompress_fn(MC, size=16, steps=1)(tiny_params, z, jnp.int32(6))
    np.testing.assert_allclose(np.asarray(sout), np.asarray(ref1), atol=2e-2)

    # wrong mesh shape / wrong loader both fail with pointers
    with pytest.raises(ValueError, match="exported for mesh"):
        load_sharded_decompressor(sart, mesh)
    with pytest.raises(ValueError, match="load_sharded_decompressor"):
        load_decompressor(art)
    with pytest.raises(ValueError, match="not a sharded artifact"):
        load_sharded_decompressor(single, mesh)


def test_export_decoder_cli_sd(tmp_path, rng, monkeypatch):
    """cli.export_decoder --sd: env msgpack weights + adapter checkpoint ->
    loadable SD artifact with inferred adapter geometry."""
    import sys

    import jax as _jax

    from clip_codec_tpu.cli.export_decoder import main
    from clip_codec_tpu.models.sd import (
        AutoencoderKL, SDClipAdapter, SDUNet, SDUNetConfig, VAEConfig,
    )
    from clip_codec_tpu.utils.checkpoint import save_params

    ucfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16,
                        heads=2, freq_dim=8)
    vcfg = VAEConfig(block_out=(8, 16), layers_per_block=1, latent_ch=4)
    k = _jax.random.PRNGKey(0)
    up = SDUNet(ucfg).init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 2, 16)))["params"]
    vp = AutoencoderKL(vcfg).init(k, jnp.zeros((1, 16, 16, 3)),
                                  _jax.random.PRNGKey(1))["params"]
    ap = SDClipAdapter(in_dim=8, ctx_dim=16, n_tokens=2).init(
        k, jnp.zeros((1, 8)))["params"]
    monkeypatch.setenv("CLIP_CODEC_SD_UNET_WEIGHTS",
                       str(save_params(tmp_path / "u.msgpack", up)))
    monkeypatch.setenv("CLIP_CODEC_SD_VAE_WEIGHTS",
                       str(save_params(tmp_path / "v.msgpack", vp)))
    adapter = save_params(tmp_path / "a.msgpack", ap)
    out = tmp_path / "sd_cli.jaxprog"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--sd", "--adapter", str(adapter), "--out", str(out),
        "--size", "16", "--steps", "2", "--heads", "2", "--device", "cpu",
    ])
    main()
    call = load_sd_decompressor(out)
    assert call.meta["z_dim"] == 8 and call.meta["n_tokens"] == 2
    z = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    img = call(up, vp, ap, z, seed=1)
    assert img.shape == (1, 16, 16, 3) and bool(jnp.isfinite(img).all())


def test_tp_sharded_sd_export(tmp_path, rng):
    """TP(model=2) SD artifact: Megatron-sharded frozen UNet in the exported
    program; one step matches the single-device artifact at the bf16-TP
    drift scale (psum reduction order differs per shard)."""
    import jax as _jax

    from clip_codec_tpu.deploy import (
        export_sd_decompressor, export_sharded_sd_decompressor,
        load_sd_decompressor, load_sharded_sd_decompressor,
    )
    from clip_codec_tpu.models.sd import (
        AutoencoderKL, SDClipAdapter, SDUNet, SDUNetConfig, VAEConfig,
    )
    from clip_codec_tpu.parallel import make_mesh

    ucfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16,
                        heads=2, freq_dim=8)
    vcfg = VAEConfig(block_out=(8, 16), layers_per_block=1, latent_ch=4)
    k = _jax.random.PRNGKey(0)
    up = SDUNet(ucfg).init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1, 2, 16)))["params"]
    vp = AutoencoderKL(vcfg).init(k, jnp.zeros((1, 16, 16, 3)),
                                  _jax.random.PRNGKey(1))["params"]
    ap = SDClipAdapter(in_dim=8, ctx_dim=16, n_tokens=2).init(
        k, jnp.zeros((1, 8)))["params"]
    z = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)

    single = export_sd_decompressor(up, vp, ap, tmp_path / "sd1.jaxprog",
                                    unet_cfg=ucfg, vae_cfg=vcfg, size=16,
                                    steps=1, batch_size=1)
    ref = np.asarray(load_sd_decompressor(single)(up, vp, ap, z, seed=2,
                                                  guidance_scale=3.0))

    mesh = make_mesh(2, model_parallel=2)  # (data=1, model=2)
    art = export_sharded_sd_decompressor(up, vp, ap, tmp_path / "sd_tp.jaxprog",
                                         mesh, unet_cfg=ucfg, vae_cfg=vcfg,
                                         size=16, steps=1, batch_size=1)
    call = load_sharded_sd_decompressor(art, mesh)
    assert call.meta["mesh"] == {"data": 1, "model": 2}
    out = np.asarray(call(up, vp, ap, z, seed=2, guidance_scale=3.0))
    np.testing.assert_allclose(out, ref, atol=2e-2)

    with pytest.raises(ValueError, match="load_sharded_sd_decompressor"):
        load_sd_decompressor(art)
    with pytest.raises(ValueError, match="exported for mesh"):
        load_sharded_sd_decompressor(art, make_mesh(4, model_parallel=4))


def test_loader_rejects_foreign_files(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="not a clip_codec_tpu exported program"):
        load_decompressor(p)


def test_int8_artifact_roundtrip(tmp_path, tiny_params, rng, monkeypatch):
    """--int8 export: program + calibration sidecar reproduce the live
    static-int8 sampler; the loader demands the quant collection."""
    import sys

    from clip_codec_tpu.cli.export_decoder import main
    from clip_codec_tpu.diffusion import NoiseSchedule, make_sampler
    from clip_codec_tpu.utils.checkpoint import load_params, save_params

    ckpt = save_params(tmp_path / "ckpt" / "unet.msgpack", tiny_params)
    MC.save(tmp_path / "ckpt")
    out = tmp_path / "dec_int8.jaxprog"
    monkeypatch.setattr(sys, "argv", [
        "prog", "--weights", str(ckpt), "--out", str(out), "--size", "16",
        "--steps", "3", "--batch_size", "1", "--device", "cpu", "--int8",
    ])
    main()
    quant = load_params(str(out) + ".quant.msgpack")
    call = load_decompressor(out)
    assert call.meta["int8"] is True
    z = jnp.asarray(rng.standard_normal((1, MC.z_dim)), jnp.float32)
    with pytest.raises(ValueError, match="quant"):
        call(tiny_params, z)
    img = call(tiny_params, z, seed=2, quant=quant)
    assert img.shape == (1, 16, 16, 3) and bool(jnp.isfinite(img).all())

    # live static-int8 path (explicit int8 net + same quant collection)
    net = CLIPCondUNet(z_dim=MC.z_dim, base=MC.base, ch_mult=MC.ch_mult,
                       dtype=jnp.bfloat16, int8=True)
    smp = make_sampler("ddim", NoiseSchedule.create(MC.timesteps, MC.schedule))
    live = smp.sample(
        lambda p, x, zz, t: net.apply(p, x, zz, t), z, (1, 16, 16, 3),
        steps=3, rng=jax.random.PRNGKey(2),
        model_params={"params": tiny_params, "quant": quant},
    )
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(jnp.clip(live, -1, 1)), atol=1e-4)


def test_sd_export_roundtrip(tmp_path, rng):
    """SD-path artifact: matches the live StableDiffusionDecoder.sample and
    serves every guidance_scale (traced scalar) from one program."""
    from clip_codec_tpu.models.sd import (
        SDUNetConfig, StableDiffusionDecoder, VAEConfig,
    )

    from clip_codec_tpu.models.sd import AutoencoderKL, SDClipAdapter, SDUNet

    ucfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16,
                        heads=2, freq_dim=8)
    vcfg = VAEConfig(block_out=(8, 16), layers_per_block=1, latent_ch=4)

    unet = SDUNet(ucfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    adapter = SDClipAdapter(in_dim=8, ctx_dim=ucfg.cross_dim, n_tokens=2)
    k = jax.random.PRNGKey(0)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                   jnp.zeros((1, 2, ucfg.cross_dim)))["params"]
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(1))["params"]
    ap = adapter.init(k, jnp.zeros((1, 8)))["params"]

    # clip_dim / hidden / n_tokens are inferred from the adapter tree
    path = export_sd_decompressor(
        up, vp, ap, tmp_path / "sd.jaxprog", unet_cfg=ucfg, vae_cfg=vcfg,
        size=16, steps=3, batch_size=2,
    )
    assert path.stat().st_size < 5_000_000  # no weights inside

    call = load_sd_decompressor(path)
    z = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    out = call(up, vp, ap, z, seed=5, guidance_scale=4.0)
    assert out.shape == (2, 16, 16, 3) and bool(jnp.isfinite(out).all())

    live_dec = StableDiffusionDecoder(
        vae_params=vp, unet_params=up, adapter_params=ap, clip_dim=8,
        n_tokens=2, unet_cfg=ucfg, vae_cfg=vcfg,
    )
    live = live_dec.sample(z, (2, 8, 8, 4), steps=3, guidance_scale=4.0,
                           rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.clip(live, -1, 1)), atol=1e-4)

    # one artifact, every CFG value: guidance is traced, not baked
    out_g0 = call(up, vp, ap, z, seed=5, guidance_scale=0.0)
    assert not np.array_equal(np.asarray(out), np.asarray(out_g0))

    # kind routing: the pixel loader refuses an sd artifact with a pointer
    with pytest.raises(ValueError, match="'sd' artifact"):
        load_decompressor(path)

    # --- static-int8 SD artifact: matches the live calibrated decoder
    live_dec_i8 = StableDiffusionDecoder(
        vae_params=vp, unet_params=up, adapter_params=ap, clip_dim=8,
        n_tokens=2, unet_cfg=ucfg, vae_cfg=vcfg, int8=True,
    )
    live_dec_i8.calibrate_int8_scales(z, (2, 8, 8, 4))
    path8 = export_sd_decompressor(
        up, vp, ap, tmp_path / "sd_i8.jaxprog", unet_cfg=ucfg, vae_cfg=vcfg,
        size=16, steps=3, batch_size=2, quant=live_dec_i8.unet_quant,
    )
    call8 = load_sd_decompressor(path8)
    assert call8.meta["int8"] is True
    with pytest.raises(ValueError, match="quant"):
        call8(up, vp, ap, z)
    out8 = call8(up, vp, ap, z, seed=5, guidance_scale=4.0,
                 quant=live_dec_i8.unet_quant)
    live8 = live_dec_i8.sample(z, (2, 8, 8, 4), steps=3, guidance_scale=4.0,
                               rng=jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        np.asarray(out8), np.asarray(jnp.clip(live8, -1, 1)), atol=1e-4)
    # int8 actually changes the trajectory vs the bf16 artifact
    assert not np.allclose(np.asarray(out8), np.asarray(out), atol=1e-3)
