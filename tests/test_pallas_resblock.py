"""Fused affine+SiLU+conv3x3 kernel vs the jnp oracle (interpret mode on
CPU; the on-chip win is measured by bench_profile.py / bench_ops.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from clip_codec_tpu.ops.pallas_resblock import (
    affine_silu_conv3x3,
    affine_silu_conv3x3_reference,
)


def _mk(rng, B, H, W, cin, cout, dtype, with_add):
    x = rng.standard_normal((B, H, W, cin)).astype(np.float32)
    A = (0.5 + rng.random((B, cin))).astype(np.float32)
    Bv = rng.standard_normal((B, cin)).astype(np.float32) * 0.1
    w9 = (rng.standard_normal((9, cin, cout)) * 0.05).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32) * 0.1
    add = rng.standard_normal((B, H, W, cout)).astype(np.float32) if with_add else None
    cast = lambda a: None if a is None else jnp.asarray(a, dtype)
    return cast(x), jnp.asarray(A), jnp.asarray(Bv), cast(w9), jnp.asarray(bias), cast(add)


@pytest.mark.parametrize("with_add", [False, True], ids=["plain", "residual"])
@pytest.mark.parametrize("shape", [(2, 16, 16, 8, 8), (1, 8, 8, 16, 8), (2, 24, 8, 8, 16)])
def test_matches_reference_fp32(rng, shape, with_add):
    B, H, W, cin, cout = shape
    args = _mk(rng, B, H, W, cin, cout, jnp.float32, with_add)
    with pltpu.force_tpu_interpret_mode():
        y, mom = affine_silu_conv3x3(*args, want_moments=True)
    y_ref, mom_ref = affine_silu_conv3x3_reference(*args, want_moments=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mom), np.asarray(mom_ref), rtol=1e-4, atol=1e-3)


def test_matches_reference_bf16(rng):
    args = _mk(rng, 2, 16, 16, 8, 8, jnp.bfloat16, True)
    with pltpu.force_tpu_interpret_mode():
        y, _ = affine_silu_conv3x3(*args)
    y_ref, _ = affine_silu_conv3x3_reference(*args)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_linear_variant_matches_reference(rng):
    """affine_conv3x3 (no activation — the GN->head-conv / in-conv form),
    including the 3-channel boundary widths."""
    from clip_codec_tpu.ops.pallas_resblock import affine_conv3x3

    for (cin, cout) in ((8, 3), (3, 8), (8, 8)):
        x, A, Bv, w9, bias, _ = _mk(rng, 2, 16, 16, cin, cout, jnp.float32, False)
        with pltpu.force_tpu_interpret_mode():
            y, _ = affine_conv3x3(x, A, Bv, w9, bias)
        y_ref, _ = affine_silu_conv3x3_reference(x, A, Bv, w9, bias, linear=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)

    # gradients flow through the linear variant's custom_vjp too
    x, A, Bv, w9, bias, _ = _mk(rng, 1, 8, 8, 8, 8, jnp.float32, False)

    def loss_pallas(w9):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(affine_conv3x3(x, A, Bv, w9, bias)[0] ** 2)

    def loss_ref(w9):
        return jnp.sum(affine_silu_conv3x3_reference(x, A, Bv, w9, bias, linear=True)[0] ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pallas)(w9)), np.asarray(jax.grad(loss_ref)(w9)),
        rtol=1e-4, atol=1e-4,
    )


def test_fused_block_gate():
    """The auto gates are OFF everywhere (r5): the fused kernels measured
    at PARITY with the fold/XLA paths after the terminal's compiler stack
    improved (probe tables in docs/performance.md "1024px re-measured").
    The kernels stay force-able via fused_pallas=True, parity-pinned by the
    tests above."""
    from clip_codec_tpu.ops.pallas_resblock import fused_block_gate as gate

    for shape in [
        (2, 1024, 1024, 128), (8, 1024, 1024, 128), (2, 512, 512, 256),
        (16, 256, 256, 128), (2, 128, 128, 512),
    ]:
        assert not gate(shape, backend="tpu")
    assert not gate((2, 1024, 1024, 128), backend="cpu")
    assert not gate((2, 1024, 1024, 128))  # default backend here is cpu


def test_fused_boundary_gate():
    from clip_codec_tpu.ops.pallas_resblock import fused_boundary_gate as gate

    # default OFF everywhere (parity with the fold path, r5)
    assert not gate((2, 1024, 1024, 128), 3, backend="tpu")
    assert not gate((2, 512, 512, 128), 3, backend="tpu")
    assert not gate((16, 256, 256, 128), 3, backend="tpu")
    # and STRUCTURALLY impossible for thin-lane inputs: Mosaic rejects HBM
    # memref slices with a non-128-aligned lane dim (measured on chip r5,
    # probe_boundary_conv.py — "must be aligned to tiling (128), but is 3")
    assert not gate((2, 1024, 1024, 3), 128, backend="tpu")
    assert not gate((2, 1024, 1024, 8), 128, backend="tpu")
    assert not gate((2, 1024, 1024, 128), 3, backend="cpu")


def test_resblock_pallas_path_parity(rng):
    """ResBlock(fused_pallas=True) — the two-kernel whole-block form with
    GN2 stats derived from kernel-1 moments — vs the direct path: identical
    param tree, matching output (fp32; interpret mode)."""
    from clip_codec_tpu.models.blocks import ResBlock

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 16)), jnp.float32)
    h = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    direct = ResBlock(16, fused_pallas=False)
    fused = ResBlock(16, fused_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        p_f = fused.init(jax.random.PRNGKey(0), x, h)
    p_d = direct.init(jax.random.PRNGKey(0), x, h)
    assert jax.tree_util.tree_structure(p_f) == jax.tree_util.tree_structure(p_d)
    for a, b in zip(jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_d = direct.apply(p_d, x, h)
    with pltpu.force_tpu_interpret_mode():
        y_f = fused.apply(p_d, x, h)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_d), rtol=1e-4, atol=1e-4)


def test_unet_pallas_path_parity(rng):
    """CLIPCondUNet(fused_pallas=True) forward vs the default path at a tiny
    config — covers the rb_pair dispatch and the mid blocks."""
    from clip_codec_tpu.models import CLIPCondUNet

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    t = jnp.asarray([3, 40], jnp.int32)
    net_d = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1, 2), img_ch=3, fused_pallas=False)
    net_f = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1, 2), img_ch=3, fused_pallas=True)
    p = net_d.init(jax.random.PRNGKey(0), x[:1], z[:1], t[:1])
    with pltpu.force_tpu_interpret_mode():
        p_f = net_f.init(jax.random.PRNGKey(0), x[:1], z[:1], t[:1])
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_f)
    y_d = net_d.apply(p, x, z, t)
    with pltpu.force_tpu_interpret_mode():
        y_f = net_f.apply(p, x, z, t)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_d), rtol=2e-4, atol=2e-4)


def test_gradients_flow(rng):
    """custom_vjp backward (XLA reference path) under jax.grad, incl. the
    moments cotangent."""
    args = _mk(rng, 1, 8, 8, 8, 8, jnp.float32, True)
    x, A, B, w9, bias, add = args

    def loss_pallas(x, w9):
        with pltpu.force_tpu_interpret_mode():
            y, mom = affine_silu_conv3x3(x, A, B, w9, bias, add, want_moments=True)
            return jnp.sum(y**2) + 0.1 * jnp.sum(mom)

    def loss_ref(x, w9):
        y, mom = affine_silu_conv3x3_reference(x, A, B, w9, bias, add, want_moments=True)
        return jnp.sum(y**2) + 0.1 * jnp.sum(mom)

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w9)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w9)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-4)
