"""Int8 inference mode: checkpoint-compatible params, bounded quantization
error, clean switch semantics (ops/int8.py — beyond-reference serving mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_codec_tpu.models import CLIPCondUNet
from clip_codec_tpu.ops import int8_enabled, set_int8_conv


@pytest.fixture
def int8_mode():
    set_int8_conv(True)
    try:
        yield
    finally:
        set_int8_conv(False)


def _tree_shapes(t):
    return jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), t)


def test_param_tree_identical_across_switch(int8_mode):
    """A checkpoint trained with nn.Conv must load unchanged in int8 mode:
    same tree, same shapes, same fresh-init VALUES (same rng path)."""
    net = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3)
    args = (
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32),
    )
    p_int8 = net.init(*args)["params"]
    set_int8_conv(False)
    p_fp = net.init(*args)["params"]
    assert _tree_shapes(p_int8) == _tree_shapes(p_fp)
    for a, b in zip(jax.tree_util.tree_leaves(p_int8), jax.tree_util.tree_leaves(p_fp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_conv_error_bounded():
    """Dynamic int8 conv vs the exact fp conv: ~1% relative error on
    unit-scale inputs (per-channel weight scales, per-tensor act scale)."""
    from clip_codec_tpu.ops.int8 import dynamic_int8_conv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)) * 0.01, jnp.float32)

    got = dynamic_int8_conv(x, w, b, (1, 1), ((1, 1), (1, 1)))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + b

    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, f"relative error {rel}"
    # strided variant (the downsample config)
    got_s = dynamic_int8_conv(x, w, b, (2, 2), ((1, 1), (1, 1)))
    want_s = jax.lax.conv_general_dilated(x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn) + b
    assert got_s.shape == want_s.shape
    rel = float(jnp.linalg.norm(got_s - want_s) / jnp.linalg.norm(want_s))
    assert rel < 0.02


def test_unet_forward_close_in_int8(int8_mode):
    """Whole-model check: the int8 U-Net's eps prediction stays within a few
    percent of the fp forward on the same params."""
    net = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x, z, t)["params"]

    got = net.apply({"params": params}, x, z, t)
    set_int8_conv(False)
    want = net.apply({"params": params}, x, z, t)
    set_int8_conv(True)

    assert bool(jnp.isfinite(got).all())
    rel = float(jnp.linalg.norm(got - want) / (jnp.linalg.norm(want) + 1e-9))
    assert rel < 0.08, f"relative error {rel}"


def test_switch_restores_exact_fp():
    assert not int8_enabled()
    net = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3)
    x = jnp.zeros((1, 16, 16, 3))
    z = jnp.zeros((1, 16))
    t = jnp.zeros((1,), jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x, z, t)["params"]
    a = net.apply({"params": params}, x, z, t)
    b = net.apply({"params": params}, x, z, t)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_static_calibration(int8_mode):
    """calibrate_int8 records per-conv absmax; the static path equals the
    dynamic path bitwise on the calibration batch (same scales) and stays
    close to fp on unseen batches."""
    from clip_codec_tpu.ops import calibrate_int8

    net = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3)
    rng = np.random.default_rng(2)
    xa = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    xb = jnp.asarray(rng.standard_normal((2, 16, 16, 3)) * 1.5, jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    params = net.init(jax.random.PRNGKey(0), xa, z, t)["params"]

    quant = calibrate_int8(net.apply, {"params": params}, (xa, z, t))
    leaves = jax.tree_util.tree_leaves(quant)
    assert len(leaves) >= 7  # 4 ResBlock convs + in? (ResBlocks + downsample)
    assert all(float(v) > 0 for v in leaves)

    dyn = net.apply({"params": params}, xa, z, t)
    static = net.apply({"params": params, "quant": quant}, xa, z, t)
    # calibration records FP-path activations while the dynamic path absmaxes
    # its own int8-path activations, so downstream scales differ slightly —
    # the two quantizations must agree closely, not bitwise
    rel = float(jnp.linalg.norm(static - dyn) / (jnp.linalg.norm(dyn) + 1e-9))
    assert rel < 0.05, rel

    # unseen batch: still finite and close to fp
    static_b = net.apply({"params": params, "quant": quant}, xb, z, t)
    set_int8_conv(False)
    fp_b = net.apply({"params": params}, xb, z, t)
    set_int8_conv(True)
    rel = float(jnp.linalg.norm(static_b - fp_b) / (jnp.linalg.norm(fp_b) + 1e-9))
    assert rel < 0.15, rel


def test_explicit_int8_field_coexists_in_one_process():
    """Round-2 review: a bf16/fp parity model and an int8 serving model must
    coexist in one process with no ordering ritual. The explicit int8=
    module field pins each model; the process switch only feeds int8=None
    defaults."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    t = jnp.asarray([5, 9], jnp.int32)
    kw = dict(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3)
    net_fp = CLIPCondUNet(**kw, int8=False)
    net_q = CLIPCondUNet(**kw, int8=True)
    params = net_fp.init(jax.random.PRNGKey(0), x, z, t)["params"]

    # Oracles built the legacy way, via the process switch.
    want_fp = np.asarray(CLIPCondUNet(**kw).apply({"params": params}, x, z, t))
    set_int8_conv(True)
    try:
        want_q = np.asarray(CLIPCondUNet(**kw).apply({"params": params}, x, z, t))
    finally:
        set_int8_conv(False)
    assert np.abs(want_fp - want_q).max() > 0  # int8 really changes outputs

    # Interleaved applies of the two pinned models, switch OFF throughout:
    # each must match its oracle bit-for-bit.
    got_q1 = np.asarray(net_q.apply({"params": params}, x, z, t))
    got_fp = np.asarray(net_fp.apply({"params": params}, x, z, t))
    got_q2 = np.asarray(net_q.apply({"params": params}, x, z, t))
    np.testing.assert_array_equal(got_fp, want_fp)
    np.testing.assert_array_equal(got_q1, want_q)
    np.testing.assert_array_equal(got_q2, want_q)


def test_calibrate_unet_scales_to_schedule_length():
    """Advisor r2: calibration t values follow the model's schedule length
    (95%/50%/5% points) instead of hard-coded 1000-schedule values."""
    from clip_codec_tpu.ops.int8 import calibrate_unet

    seen = []
    net = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1,), img_ch=3, int8=True)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8)),
        jnp.zeros((1,), jnp.int32),
    )["params"]

    def spy_apply(variables, x, z, t, mutable=None):
        seen.append(int(np.asarray(t)[0]))
        return net.apply(variables, x, z, t, mutable=mutable)

    quant = calibrate_unet(spy_apply, {"params": params}, 8, 8, timesteps=50, batch=1)
    assert seen == [48, 25, 2]  # within the 50-step schedule
    assert jax.tree_util.tree_leaves(quant), "no scales recorded"


def test_calibrate_without_int8_model_raises():
    net = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1,), img_ch=3, int8=False)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 8)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    from clip_codec_tpu.ops.int8 import calibrate_unet

    with pytest.raises(RuntimeError, match="int8"):
        calibrate_unet(net.apply, {"params": params}, 8, 8, timesteps=50, batch=1)


def test_sd_unet_int8_field():
    """The SD UNet's int8 serving mode: identical param tree (checkpoints
    serve unchanged), finite outputs with bounded quantization error, and
    fp/int8 models coexist via the explicit field."""
    from clip_codec_tpu.models.sd import SDUNet
    from clip_codec_tpu.models.sd.unet import SDUNetConfig

    cfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16, heads=2, freq_dim=8)
    rng = np.random.default_rng(5)
    lat = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([3, 40], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 3, 16)), jnp.float32)
    net_fp = SDUNet(cfg, int8=False)
    net_q = SDUNet(cfg, int8=True)
    p_fp = net_fp.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    p_q = net_q.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    assert _tree_shapes(p_fp) == _tree_shapes(p_q)
    for a, b in zip(jax.tree_util.tree_leaves(p_fp), jax.tree_util.tree_leaves(p_q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_fp = np.asarray(net_fp.apply({"params": p_fp}, lat, t, ctx))
    y_q = np.asarray(net_q.apply({"params": p_fp}, lat, t, ctx))
    assert np.isfinite(y_q).all()
    rel = np.linalg.norm(y_q - y_fp) / np.linalg.norm(y_fp)
    assert 0 < rel < 0.25, rel  # changed but bounded


def test_sd_unet_int8_static_calibration():
    """calibrate_int8 over the SD UNet records per-Dense/per-Conv absmax and
    the static path stays within range of the dynamic one."""
    from clip_codec_tpu.models.sd import SDUNet
    from clip_codec_tpu.models.sd.unet import SDUNetConfig
    from clip_codec_tpu.ops.int8 import calibrate_int8

    cfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16, heads=2, freq_dim=8)
    rng = np.random.default_rng(6)
    lat = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([3, 40], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 3, 16)), jnp.float32)
    net = SDUNet(cfg, int8=True)
    params = net.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    quant = calibrate_int8(net.apply, {"params": params}, (lat, t, ctx))
    leaves = jax.tree_util.tree_leaves(quant)
    assert len(leaves) > 10  # dense + conv sites recorded
    y_sta = np.asarray(net.apply({"params": params, "quant": quant}, lat, t, ctx))
    assert np.isfinite(y_sta).all()
    # Static and dynamic paths drift apart layer-by-layer (calibration
    # records FP-activation absmax; dynamic adapts to the already-quantized
    # upstream), so the meaningful bound is vs the fp oracle.
    y_fp = np.asarray(SDUNet(cfg, int8=False).apply({"params": params}, lat, t, ctx))
    rel = np.linalg.norm(y_sta - y_fp) / np.linalg.norm(y_fp)
    assert 0 < rel < 0.25, rel


def test_init_does_not_seed_calibration_scales():
    """Review r3 #1: Module.init (where every collection is mutable) must
    NOT take the calibration branch — init of an int8 model returns only
    'params', and applying the full init dict equals the dynamic path."""
    net = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3, int8=True)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    t = jnp.asarray([5, 9], jnp.int32)
    variables = net.init(jax.random.PRNGKey(0), x, z, t)
    assert set(variables.keys()) == {"params"}, (
        f"init leaked collections: {sorted(variables)}"
    )
    full = np.asarray(net.apply(variables, x, z, t))
    dyn = np.asarray(net.apply({"params": variables["params"]}, x, z, t))
    np.testing.assert_array_equal(full, dyn)


def test_sd_vae_stays_fp_under_process_int8_switch():
    """Review r3 #2: the VAE is pinned fp — the process-wide int8 switch
    (cli --int8 path) must not change a single bit of VAE encode/decode."""
    from clip_codec_tpu.models.sd import AutoencoderKL
    from clip_codec_tpu.models.sd.vae import VAEConfig

    cfg = VAEConfig(block_out=(8, 16), layers_per_block=1)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    want = np.asarray(vae.apply({"params": params}, x, jax.random.PRNGKey(2)))
    set_int8_conv(True)
    try:
        got = np.asarray(AutoencoderKL(cfg).apply({"params": params}, x, jax.random.PRNGKey(2)))
    finally:
        set_int8_conv(False)
    np.testing.assert_array_equal(got, want)


def test_int8_dense_param_tree_and_error():
    """Int8Dense: identical param tree to nn.Dense (same rng path) and
    bounded dynamic-quant error at SD-like shapes."""
    from flax import linen as nn

    from clip_codec_tpu.ops.int8 import Int8Dense

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((4, 64, 48)), jnp.float32)
    p_q = Int8Dense(32).init(jax.random.PRNGKey(0), x)["params"]
    p_fp = nn.Dense(32).init(jax.random.PRNGKey(0), x)["params"]
    assert _tree_shapes(p_q) == _tree_shapes(p_fp)
    for a, b in zip(jax.tree_util.tree_leaves(p_q), jax.tree_util.tree_leaves(p_fp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    got = Int8Dense(32).apply({"params": p_fp}, x)
    want = nn.Dense(32).apply({"params": p_fp}, x)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02, rel
    # no-bias variant (the attention projections)
    p_nb = Int8Dense(32, use_bias=False).init(jax.random.PRNGKey(0), x)["params"]
    assert set(p_nb.keys()) == {"kernel"}
    y = Int8Dense(32, use_bias=False).apply({"params": p_nb}, x)
    assert np.isfinite(np.asarray(y)).all()


def _tiny_sd_decoder(timesteps: int):
    from clip_codec_tpu.models.sd import AutoencoderKL, SDUNet, StableDiffusionDecoder
    from tests.test_sd import TINY_UNET, TINY_VAE

    vae = AutoencoderKL(TINY_VAE)
    unet = SDUNet(TINY_UNET)
    x = jnp.zeros((1, 16, 16, 3))
    vae_params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    lat0 = jnp.zeros((1, 8, 8, 4))
    ctx0 = jnp.zeros((1, 8, 16))
    unet_params = unet.init(
        jax.random.PRNGKey(2), lat0, jnp.zeros((1,), jnp.int32), ctx0
    )["params"]
    return StableDiffusionDecoder(
        vae_params, unet_params, clip_dim=32, n_tokens=8,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, dtype=jnp.float32,
        int8=True, timesteps=timesteps,
    )


def test_sd_calibration_uses_schedule_fractions(monkeypatch):
    """StableDiffusionDecoder.calibrate_int8_scales must calibrate at
    FRACTIONS of the decoder's own schedule length (the round-2 pixel-path
    fix, mirrored): a timesteps=50 model calibrates at t in {48, 25, 2},
    never at the absolute 1000-schedule points {950, 500, 50} which lie
    outside its sampling range."""
    import clip_codec_tpu.ops.int8 as int8mod

    dec = _tiny_sd_decoder(timesteps=50)
    seen = []
    real = int8mod.calibrate_int8

    def spy(apply_fn, variables, *batches):
        seen.extend(int(np.asarray(b[1])[0]) for b in batches)
        return real(apply_fn, variables, *batches)

    monkeypatch.setattr(int8mod, "calibrate_int8", spy)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32)), jnp.float32)
    dec.calibrate_int8_scales(z, (1, 8, 8, 4))
    # cond + uncond context at each of the 95%/50%/5% schedule points
    assert seen == [48, 48, 25, 25, 2, 2]
    assert all(t < 50 for t in seen)
    assert jax.tree_util.tree_leaves(dec.unet_quant), "no scales recorded"


def test_sd_short_schedule_sampling_stays_in_range():
    """A short-schedule decoder must build its DDIM grid from its OWN
    schedule length (timesteps plumbed into _cfg_ddim_sample), so the UNet
    never sees t >= T."""
    from clip_codec_tpu.models.sd.decoder import sd_ddim_timesteps

    dec = _tiny_sd_decoder(timesteps=50)
    assert dec.timesteps == 50
    assert dec.tables.alphas_cumprod.shape == (50,)
    ts = sd_ddim_timesteps(5, 50)
    assert ts.max() < 50 and ts.min() >= 0
    # end-to-end: one tiny sample through the real jitted path
    z = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32)), jnp.float32)
    dec.calibrate_int8_scales(z, (1, 8, 8, 4))
    img = dec.sample(z, (1, 8, 8, 4), steps=5, guidance_scale=1.5)
    assert img.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
