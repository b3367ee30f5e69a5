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
