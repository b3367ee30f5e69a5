"""Phase-decomposed nearest-up+conv (ops/upsample.py): exactness vs the
materialized resize+conv, module param-tree compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_codec_tpu.ops.upsample import nearest_up_conv


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _ref(x, k, b):
    B, H, W, C = x.shape
    up = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
    y = jax.lax.conv_general_dilated(
        up, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b).astype(x.dtype)


@pytest.mark.parametrize("H,Cin,Cout", [(8, 16, 24), (5, 8, 8), (16, 4, 12)])
def test_fp32_exact(rng, H, Cin, Cout):
    x = jnp.asarray(rng.standard_normal((2, H, H, Cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    got = nearest_up_conv(x, k, b)
    want = _ref(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_bf16_one_rounding(rng):
    """bf16 compute from fp32 weights: the collapsed taps are summed in fp32
    and rounded ONCE — same precision class as the plain path's per-tap
    rounding; difference stays within a few bf16 quanta of the output."""
    x32 = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)
    k32 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)) * 0.1, jnp.float32)
    x = x32.astype(jnp.bfloat16)
    got = nearest_up_conv(x, k32.astype(jnp.bfloat16), b).astype(jnp.float32)
    want = np.asarray(_ref(x32, k32, b))
    scale = np.abs(want).max()
    assert np.abs(np.asarray(got) - want).max() / scale < 0.03


def test_module_param_tree_and_parity(rng):
    """Upsample2D(fused=True) declares the same conv/{kernel,bias} tree with
    the same init values as the plain module, and matches its output."""
    from clip_codec_tpu.models.sd.layers import Upsample2D

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    pf = Upsample2D(16, fused=True).init(jax.random.PRNGKey(0), x)["params"]
    pp = Upsample2D(16, fused=False).init(jax.random.PRNGKey(0), x)["params"]
    tu = jax.tree_util
    assert tu.tree_map(lambda a: a.shape, pf) == tu.tree_map(lambda a: a.shape, pp)
    for a, b in zip(tu.tree_leaves(pf), tu.tree_leaves(pp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    yf = Upsample2D(16, fused=True).apply({"params": pp}, x)
    yp = Upsample2D(16, fused=False).apply({"params": pp}, x)
    assert yf.shape == yp.shape == (1, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), atol=1e-5, rtol=1e-5)


def test_grad_flows(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    gk = jax.grad(lambda kk: jnp.sum(nearest_up_conv(x, kk, b) ** 2))(k)
    gk_ref = jax.grad(lambda kk: jnp.sum(_ref(x, kk, b) ** 2))(k)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), atol=1e-4, rtol=1e-4)
