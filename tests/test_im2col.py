"""im2col boundary conv (ops/im2col.py) vs lax.conv — exactness + gating.

The on-chip win (3.59 vs 14.9 ms at 1024px B=2, 12x at B=1) is measured by
scripts/probe_boundary_conv.py; here we pin the math and the trace-time
gate so the headline program can never silently change."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_codec_tpu.ops.im2col import conv3x3_im2col, im2col_gate


def _ref(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.parametrize("shape", [(2, 16, 16, 3, 32), (1, 8, 24, 3, 8), (3, 12, 12, 8, 16)])
def test_matches_lax_conv_fp32(rng, shape):
    B, H, W, cin, cout = shape
    x = jnp.asarray(rng.standard_normal((B, H, W, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3x3_im2col(x, k, b)), np.asarray(_ref(x, k, b)),
        rtol=1e-6, atol=1e-6,
    )


def test_matches_lax_conv_bf16(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 32)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(32) * 0.1, jnp.float32)
    y, yr = conv3x3_im2col(x, k, b), _ref(x, k, b)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yr, np.float32), rtol=2e-2, atol=2e-2
    )


def test_gradients_match(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 8)) * 0.1, jnp.float32)
    b = jnp.zeros(8, jnp.float32)
    g1 = jax.grad(lambda k: jnp.sum(conv3x3_im2col(x, k, b) ** 2))(k)
    g2 = jax.grad(lambda k: jnp.sum(_ref(x, k, b) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


def test_gate():
    # measured-win regime: huge-spatial, thin channels, TPU only
    assert im2col_gate((2, 1024, 1024, 3), backend="tpu")
    assert im2col_gate((1, 1024, 1024, 3), backend="tpu")
    assert im2col_gate((2, 512, 512, 3), backend="tpu")
    assert not im2col_gate((16, 256, 256, 3), backend="tpu")   # headline
    assert not im2col_gate((8, 512, 512, 3), backend="tpu")    # big batch
    assert not im2col_gate((2, 1024, 1024, 128), backend="tpu")  # wide convs
    assert not im2col_gate((2, 1024, 1024, 3), backend="cpu")
    assert not im2col_gate((2, 1024, 1024, 3))  # default backend = cpu here


def test_unet_in_conv_param_tree_identical(rng):
    """Forcing the im2col path must not change the param tree (same
    `in_conv` {kernel, bias} via _ConvParams) or the math."""
    from clip_codec_tpu.models import CLIPCondUNet

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    t = jnp.asarray([3], jnp.int32)
    net = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1, 2), img_ch=3, fused_pallas=False)
    p = net.init(jax.random.PRNGKey(0), x, z, t)
    kernel = p["params"]["in_conv"]["kernel"]
    bias = p["params"]["in_conv"]["bias"]
    direct = jnp.asarray(
        jax.lax.conv_general_dilated(
            x, kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    ) + bias
    np.testing.assert_allclose(
        np.asarray(conv3x3_im2col(x, kernel, bias)), np.asarray(direct),
        rtol=1e-5, atol=1e-5,
    )
