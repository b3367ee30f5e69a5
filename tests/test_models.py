"""Shape/dtype tests for the Flax models (mirrors the reference's smoke tests,
``tests/test_blocks.py:5-10`` and ``tests/test_unet.py:7-12``, then goes
further: gradient flow, dtype threading, resolution independence)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_codec_tpu.models import (
    AttnBlock,
    CLIPCondDecoder,
    CLIPCondUNet,
    DWConvBlock,
    FeatureToImageDecoderLite,
    FiLM,
    ResBlock,
    timestep_embedding,
)


def test_film_preserves_shape(rng):
    m = FiLM(16)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, h)
    y = m.apply(params, x, h)
    assert y.shape == x.shape


def test_resblock_preserves_shape(rng):
    m = ResBlock(16)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    y = m.apply(m.init(jax.random.PRNGKey(0), x, h), x, h)
    assert y.shape == x.shape


def test_attnblock_runs_and_preserves_shape(rng):
    # The reference AttnBlock crashes on forward (models/blocks.py:60-68,
    # batched-matmul shape bug); ours implements the intended semantics.
    m = AttnBlock(16)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    y = m.apply(m.init(jax.random.PRNGKey(0), x, h), x, h)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_dwconv_changes_channels(rng):
    m = DWConvBlock(8, 24)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 8)), jnp.float32)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (2, 8, 8, 24)


def test_unet_small_config(rng):
    # Mirror of tests/test_unet.py:7-12 (z_dim=512, base=64, ch_mult=(1,2), 64px).
    net = CLIPCondUNet(z_dim=512, base=64, ch_mult=(1, 2), img_ch=3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    t = jnp.array([3, 500], jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x, z, t)
    y = net.apply(params, x, z, t)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_unet_resolution_free(rng):
    # Fully convolutional: same params work at other resolutions.
    net = CLIPCondUNet(z_dim=32, base=16, ch_mult=(1, 2), img_ch=3)
    z = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
    t = jnp.array([10], jnp.int32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), z, t)
    for s in (16, 48):
        y = net.apply(params, jnp.zeros((1, s, s, 3)), z, t)
        assert y.shape == (1, s, s, 3)


def test_unet_bf16_compute(rng):
    net = CLIPCondUNet(z_dim=32, base=16, ch_mult=(1, 2), img_ch=3, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((1, 32)), jnp.float32)
    t = jnp.array([10], jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x, z, t)
    # params stay fp32, output follows compute dtype
    assert params["params"]["in_conv"]["kernel"].dtype == jnp.float32
    y = net.apply(params, x, z, t)
    assert y.dtype == jnp.bfloat16


def test_unet_gradients_flow(rng):
    net = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    t = jnp.array([5], jnp.int32)
    params = net.init(jax.random.PRNGKey(0), x, z, t)

    def loss(p):
        return jnp.mean(net.apply(p, x, z, t) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_timestep_embedding_properties():
    emb = timestep_embedding(jnp.array([0, 1, 999]), 256)
    assert emb.shape == (3, 256)
    # t=0: cos part all ones, sin part all zeros
    np.testing.assert_allclose(np.asarray(emb[0, :128]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 128:]), 0.0, atol=1e-6)
    # odd dim pads with zero
    emb3 = timestep_embedding(jnp.array([7]), 9)
    assert emb3.shape == (1, 9)
    assert float(emb3[0, -1]) == 0.0


def test_clip_cond_decoder_shapes(rng):
    z = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    m = CLIPCondDecoder(in_dim=64, base=32, out_size=64)
    y = m.apply(m.init(jax.random.PRNGKey(0), z), z)
    assert y.shape == (2, 64, 64, 3)
    assert float(jnp.abs(y).max()) <= 1.0  # tanh head


def test_clip_cond_decoder_stage_plan():
    # out_size=512 builds only TWO stages due to the reference's len(stages)
    # loop quirk (decoders.py:13) — 8*2^0 < 512, 8*2^3 < 512, 8*2^6 == 512 stop.
    plan, c = CLIPCondDecoder.stage_plan(192, 512)
    assert len(plan) == 2
    assert plan == [(192, 96), (96, 48)]
    assert c == 48


def test_lite_decoder_shapes(rng):
    z = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    m = FeatureToImageDecoderLite(in_dim=32, base=32, out_size=64)
    y = m.apply(m.init(jax.random.PRNGKey(0), z), z)
    assert y.shape == (2, 64, 64, 3)


def test_phase_decomposed_upsampler_equivalence(rng):
    """ConvTranspose4x2 phase-decomposed path == flax ConvTranspose, on the
    same params (ops/conv_transpose.py): identical math, init, and tree."""
    from clip_codec_tpu.models import CLIPCondUNet

    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    z = rng.standard_normal((2, 16)).astype(np.float32)
    t = np.array([3, 40], np.int32)
    a = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3, phase_decomposed_up=True)
    b = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3, phase_decomposed_up=False)
    pa = a.init(jax.random.PRNGKey(5), x[:1], z[:1], t[:1])
    pb = b.init(jax.random.PRNGKey(5), x[:1], z[:1], t[:1])
    # same param tree AND same fresh-init values (same rng paths + fan rule)
    assert jax.tree_util.tree_structure(pa) == jax.tree_util.tree_structure(pb)
    for la, lb in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    ya = np.asarray(a.apply(pa, x, z, t))
    yb = np.asarray(b.apply(pb, x, z, t))
    np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)


def test_conv_transpose_onegemm_exactness(rng):
    """conv_transpose_k4s2_onegemm (one 2x2 conv, 4*Cout channels, shifted
    output slices — the measured winner at Cin>=512 upsampler shapes,
    scripts/probe_upsampler.py) is exact vs both the 4-conv phase form and
    jax.lax.conv_transpose, including the >=512-channel auto-gate shape."""
    import jax.numpy as jnp

    from clip_codec_tpu.ops.conv_transpose import (
        conv_transpose_k4s2,
        conv_transpose_k4s2_onegemm,
    )

    for (B, H, W, ci, co) in [(2, 5, 7, 3, 4), (1, 8, 8, 512, 16), (3, 4, 6, 256, 5)]:
        x = jnp.asarray(rng.standard_normal((B, H, W, ci)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((4, 4, co, ci)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        got = conv_transpose_k4s2_onegemm(x, k, b)
        want_phase = conv_transpose_k4s2(x, k, b)
        want_direct = jax.lax.conv_transpose(
            x, k, strides=(2, 2), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        ) + b
        assert got.shape == (B, 2 * H, 2 * W, co)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want_phase))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want_direct), rtol=1e-5, atol=1e-5)


def test_remat_exactness_and_grads():
    """remat=True (jax.checkpoint around ResBlocks) changes memory, not
    math: identical param tree, bit-equal forward, grads equal to
    recompute-rounding tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_codec_tpu.models import CLIPCondUNet

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    kw = dict(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3)
    p = CLIPCondUNet(**kw).init(jax.random.PRNGKey(0), x, z, t)["params"]
    p2 = CLIPCondUNet(**kw, remat=True).init(jax.random.PRNGKey(0), x, z, t)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    y1 = CLIPCondUNet(**kw).apply({"params": p}, x, z, t)
    y2 = CLIPCondUNet(**kw, remat=True).apply({"params": p}, x, z, t)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    g1 = jax.grad(lambda pp: jnp.sum(CLIPCondUNet(**kw).apply({"params": pp}, x, z, t) ** 2))(p)
    g2 = jax.grad(lambda pp: jnp.sum(CLIPCondUNet(**kw, remat=True).apply({"params": pp}, x, z, t) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_sd_remat_forward_matches():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_codec_tpu.models.sd import SDUNet
    from clip_codec_tpu.models.sd.unet import SDUNetConfig

    cfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16, heads=2, freq_dim=8)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([3, 7], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 3, 16)), jnp.float32)
    ps = SDUNet(cfg).init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    y1 = SDUNet(cfg).apply({"params": ps}, lat, t, ctx)
    y2 = SDUNet(cfg, remat=True).apply({"params": ps}, lat, t, ctx)
    # checkpoint boundaries change XLA fusion (and thus fp rounding) even in
    # the forward — equality to fp32-noise tolerance is the correct bar
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=2e-6)
