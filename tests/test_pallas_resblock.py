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
