"""Space-to-batch folded ResBlock (ops/spatial_fold.py) parity tests.

The folded path must be math-identical to the direct path (fp32
reassociation only): same param tree, same outputs, same gradients. The
edge cases that matter: image-edge zero padding (SAME-conv semantics on the
POST-norm tensor), interior halo duplication, per-image GN statistics.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def block_io():
    import jax

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 16, 32), np.float32)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 256), np.float32)
    return x, h


def test_folded_matches_direct(block_io):
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.models.blocks import ResBlock

    x, h = block_io
    direct = ResBlock(32, fold_spatial=1)
    p = direct.init(jax.random.PRNGKey(0), x, h)
    y0 = direct.apply(p, x, h)
    for chunks in (2, 4, 8):
        y1 = ResBlock(32, fold_spatial=chunks).apply(p, x, h)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5, rtol=1e-5)
    # param tree identical (folded init must produce the same checkpoint shape)
    p_f = ResBlock(32, fold_spatial=4).init(jax.random.PRNGKey(0), x, h)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_f)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p_f))
    )


def test_folded_gradients_match(block_io):
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.models.blocks import ResBlock

    x, h = block_io
    direct = ResBlock(32, fold_spatial=1)
    folded = ResBlock(32, fold_spatial=4)
    p = direct.init(jax.random.PRNGKey(0), x, h)

    def loss(p, mod):
        return jnp.sum(jnp.square(mod.apply(p, x, h)))

    g0 = jax.grad(loss)(p, direct)
    g1 = jax.grad(loss)(p, folded)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-12))
        assert rel < 1e-4, rel


def test_auto_gate():
    from clip_codec_tpu.ops.spatial_fold import fold_chunks

    # headline/CI shapes never fold
    assert fold_chunks((16, 256, 256, 128)) == 1
    assert fold_chunks((8, 512, 512, 128)) == 1
    assert fold_chunks((16, 1024, 1024, 128)) == 1  # B above the gate
    assert fold_chunks((1, 1024, 1024, 128)) == 1  # B=1 already well-tiled
    assert fold_chunks((2, 128, 128, 128)) == 1  # below min_h
    # the measured-win regime folds to effective batch >= 8
    assert fold_chunks((2, 1024, 1024, 128)) == 4
    assert fold_chunks((4, 1024, 1024, 128)) == 2
    assert fold_chunks((2, 256, 256, 128)) == 4
    # B=3 rounds UP past the non-divisor 3 (eff 6 measured to regress)
    assert fold_chunks((3, 1024, 1024, 128)) == 4
    # chunk rows must stay >= 64: H=256 B=4 folds to 2 (rows 128), and a
    # hypothetical H=256 needing f>4 would refuse rather than go below 64
    assert fold_chunks((4, 256, 256, 128)) == 2
    # indivisible H degrades gracefully (prime H has no chunking divisor)
    assert fold_chunks((2, 1021, 17, 128)) == 1
    # non-power-of-two H folds on its actual divisors (1025 = 5 * 205 rows)
    assert fold_chunks((2, 1025, 17, 128)) == 5


def test_fold_unfold_roundtrip():
    import jax.numpy as jnp

    from clip_codec_tpu.ops.spatial_fold import fold_halo, unfold

    x = jnp.arange(2 * 32 * 4 * 3, dtype=jnp.float32).reshape(2, 32, 4, 3)
    xc = fold_halo(x, chunks=4, halo=2)
    assert xc.shape == (8, 12, 4, 3)
    # valid rows reassemble exactly
    np.testing.assert_array_equal(np.asarray(unfold(xc[:, 2:-2], 2)), np.asarray(x))
    # interior halos duplicate neighbor rows; image edges are zero
    np.testing.assert_array_equal(np.asarray(xc[1, 0:2]), np.asarray(x[0, 6:8]))
    assert float(jnp.abs(xc[0, 0:2]).max()) == 0.0
    assert float(jnp.abs(xc[3, -2:]).max()) == 0.0
    np.testing.assert_array_equal(np.asarray(xc[4, 0:2]), 0 * np.asarray(xc[4, 0:2]))


def test_int8_mode_composes(block_io):
    """The folded path must build/apply under the int8 serving mode with the
    same param/quant collections as the direct path."""
    import jax

    from clip_codec_tpu.models.blocks import ResBlock

    x, h = block_io
    direct = ResBlock(32, fold_spatial=1, int8=True)
    folded = ResBlock(32, fold_spatial=4, int8=True)
    p = direct.init(jax.random.PRNGKey(0), x, h)
    y0 = direct.apply(p, x, h)
    y1 = folded.apply(p, x, h)
    # int8 quantization grids differ between the two layouts (per-tensor
    # absmax over different padding), so require agreement only to the
    # int8 error scale.
    err = float(np.max(np.abs(np.asarray(y0) - np.asarray(y1))))
    scale = float(np.max(np.abs(np.asarray(y0)))) + 1e-12
    assert err / scale < 0.05, (err, scale)


def test_whole_model_fold_parity():
    """CLIPCondUNet forward at a folding shape (H=256, B=2) with the auto
    gate on vs the process-wide disable — covers the ResBlock fold, the
    folded head conv, and the folded upsampler in one trace."""
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.ops import set_fold_spatial

    net = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1, 2), img_ch=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 256, 3), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8), jnp.float32)
    t = jnp.array([3, 40], jnp.int32)
    p = net.init(jax.random.PRNGKey(2), x[:1], z[:1], t[:1])
    try:
        y_fold = net.apply(p, x, z, t)
        set_fold_spatial(False)
        y_direct = net.apply(p, x, z, t)
    finally:
        set_fold_spatial(True)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_direct),
                               atol=5e-5, rtol=1e-5)


def test_folded_conv_transpose_parity():
    """folded_conv_transpose_k4s2 vs jax.lax.conv_transpose at a shape INSIDE
    the fold gate (B=2, H=256 — CI's whole-model test runs at 256px where
    transpose inputs are H<=128, below the gate, so this is the only CI
    coverage of the folded upsampler path)."""
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.ops.spatial_fold import fold_chunks, folded_conv_transpose_k4s2

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 16, 8), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 8), jnp.float32) * 0.1
    assert fold_chunks(x.shape) > 1  # the shape must actually exercise the fold
    y_fold = folded_conv_transpose_k4s2(x, k)
    assert y_fold is not None
    y_direct = jax.lax.conv_transpose(
        x, k, strides=(2, 2), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )
    assert y_fold.shape == y_direct.shape == (2, 512, 32, 4)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_direct),
                               atol=2e-5, rtol=1e-5)
    # outside the gate (B=1) the helper declines and the caller goes direct
    assert folded_conv_transpose_k4s2(x[:1], k) is None


def test_paired_fold_exact_float64():
    """The chained-pair path (halo 4 -> 2 -> 0, one fold per stage) is
    MATHEMATICALLY identical to two direct ResBlocks: in float64 (where the
    GN stat dtype promotes with the input, making fp64 a true oracle) both
    forward and gradients agree to ~1e-14. In fp32, GN-stat reassociation
    noise shows up amplified on cancellation-dominated leaves (conv bias /
    FiLM shift — GroupNorm's mean subtraction cancels constant shifts), so
    exactness is asserted HERE, at f64, not there."""
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        import jax.numpy as jnp

        from clip_codec_tpu.models.blocks import ResBlock
        from clip_codec_tpu.ops import spatial_fold as sf

        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 256, 16, 16), jnp.float64)
        h = jax.random.normal(jax.random.PRNGKey(1), (2, 32), jnp.float64)
        rb0 = ResBlock(16, dtype=jnp.float64, fold_spatial=1)
        rb1 = ResBlock(16, dtype=jnp.float64, fold_spatial=1)
        as64 = lambda t: jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), t)
        p0 = as64(rb0.init(jax.random.PRNGKey(2), x, h))
        p1 = as64(rb1.init(jax.random.PRNGKey(3), x, h))
        B = 2

        def loss_pair(ps):
            a, b = ps
            xc = sf.fold_halo(x, 4, halo=4)
            xc = rb0.apply(a, xc, h, folded_batch=B, halo=4)
            xc = rb1.apply(b, xc, h, folded_batch=B, halo=2)
            y = sf.unfold(xc, B)
            return jnp.sum(jnp.square(y)), y

        def loss_direct(ps):
            a, b = ps
            y = rb1.apply(b, rb0.apply(a, x, h), h)
            return jnp.sum(jnp.square(y)), y

        (_, yp), g0 = jax.value_and_grad(loss_pair, has_aux=True)((p0, p1))
        (_, yd), g1 = jax.value_and_grad(loss_direct, has_aux=True)((p0, p1))
        assert float(jnp.abs(yp - yd).max()) < 1e-12
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            rel = float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-30))
            assert rel < 1e-12, rel
    finally:
        jax.config.update("jax_enable_x64", False)
