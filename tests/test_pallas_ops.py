"""Pallas kernel correctness (interpret mode on CPU) vs the jnp reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_codec_tpu.ops.groupnorm import group_norm, group_norm_silu


def _interp_forward(x, scale, bias, groups, eps=1e-5):
    from jax.experimental.pallas import tpu as pltpu

    from clip_codec_tpu.ops import pallas_groupnorm as pg

    with pltpu.force_tpu_interpret_mode():
        return pg._forward(x, scale, bias, groups, eps)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 16), 8), ((1, 16, 8, 32), 4), ((2, 12, 4, 8), 8)])
def test_pallas_matches_jnp(rng, shape, groups):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    C = shape[-1]
    scale = jnp.asarray(rng.standard_normal(C), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(C), jnp.float32)
    got = np.asarray(_interp_forward(x, scale, bias, groups))
    want = np.asarray(group_norm_silu(x, (scale, bias), groups))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_bf16_input(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.bfloat16)
    scale = jnp.ones(16, jnp.float32)
    bias = jnp.zeros(16, jnp.float32)
    got = _interp_forward(x, scale, bias, 8)
    assert got.dtype == jnp.bfloat16
    want = group_norm_silu(x, (scale, bias), 8)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want, dtype=np.float32), rtol=2e-2, atol=2e-2
    )


def test_custom_vjp_matches_jnp_grad(rng):
    """Backward of the pallas op (jnp-derived VJP) equals grad of the jnp op."""
    from jax.experimental.pallas import tpu as pltpu

    from clip_codec_tpu.ops.pallas_groupnorm import group_norm_silu_pallas

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(16), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)

    def loss_pallas(x, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(group_norm_silu_pallas(x, s, b, 8, 1e-5) ** 2)

    def loss_jnp(x, s, b):
        y = group_norm_silu(x, (s, b), 8)
        return jnp.sum(y**2)

    g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 64, 16), (1, 128, 40), (4, 96, 8)])
def test_flash_attention_matches_reference(rng, shape):
    from jax.experimental.pallas import tpu as pltpu

    from clip_codec_tpu.ops.pallas_attention import attention_reference, flash_attention

    BH, N, D = shape
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v))
    want = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_flash_attention_extreme_logits(rng):
    """Online softmax must stay stable with large logit ranges."""
    from jax.experimental.pallas import tpu as pltpu

    from clip_codec_tpu.ops.pallas_attention import attention_reference, flash_attention

    q = jnp.asarray(rng.standard_normal((1, 64, 16)) * 30, jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 64, 16)) * 30, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 64, 16)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(flash_attention(q, k, v, scale=1.0))
    want = np.asarray(attention_reference(q, k, v, scale=1.0))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sd_attention_flash_integration(rng):
    """CrossAttention self-attention routes through the flash kernel when
    Pallas is enabled and N>=1024, matching the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from clip_codec_tpu.models.sd.layers import CrossAttention
    from clip_codec_tpu.ops import set_flash_attention

    attn = CrossAttention(16, heads=2)
    x = jnp.asarray(rng.standard_normal((1, 1024, 16)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    base = np.asarray(attn.apply(params, x))
    set_flash_attention(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            flash = np.asarray(attn.apply(params, x))
    finally:
        set_flash_attention(None)
    np.testing.assert_allclose(flash, base, rtol=1e-4, atol=1e-5)
    # cross-attention path (small context) is untouched by the switch
    ctx = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
    a = np.asarray(attn.apply(params, x, ctx))
    set_flash_attention(True)
    try:
        b = np.asarray(attn.apply(params, x, ctx))
    finally:
        set_flash_attention(None)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_vae_attention_flash_integration(rng):
    from jax.experimental.pallas import tpu as pltpu

    from clip_codec_tpu.models.sd.layers import AttnBlockVAE
    from clip_codec_tpu.ops import set_flash_attention

    attn = AttnBlockVAE(8)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 8)), jnp.float32)  # N=1024
    params = attn.init(jax.random.PRNGKey(0), x)
    base = np.asarray(attn.apply(params, x))
    set_flash_attention(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            flash = np.asarray(attn.apply(params, x))
    finally:
        set_flash_attention(None)
    np.testing.assert_allclose(flash, base, rtol=1e-4, atol=1e-5)


def test_flash_attention_grad(rng):
    """jax.grad through the flash kernel (custom VJP via reference math) —
    the SD adapter trainer and inversion guidance differentiate this path."""
    from jax.experimental.pallas import tpu as pltpu

    from clip_codec_tpu.ops.pallas_attention import attention_reference, flash_attention

    q = jnp.asarray(rng.standard_normal((1, 64, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 64, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 64, 16)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    with pltpu.force_tpu_interpret_mode():  # fwd AND bwd kernels interpreted
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_attention_grad_multitile_smallhead(rng):
    """Backward at a shape that exercises the D<=64 512-tile target with
    MULTIPLE q and k tiles (N=1024 -> 2x2 tile grid, the accumulation
    pattern the SD 64x64 stage runs at): tile-boundary state handoff must
    not perturb gradients. Guards the D-dependent _bwd_tile_target retune."""
    from jax.experimental.pallas import tpu as pltpu

    from clip_codec_tpu.ops.pallas_attention import (
        _bwd_tile_target,
        attention_reference,
        flash_attention,
    )

    assert _bwd_tile_target(40) == 512 and _bwd_tile_target(80) == 256

    q = jnp.asarray(rng.standard_normal((1, 1024, 40)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1024, 40)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1024, 40)), jnp.float32)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2) / 1024

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_attention_heads_sharded_fwd_and_grad(rng):
    """The TP-composable (B, H, N, D) wrapper: head-sharded inputs produce
    the same forward AND gradients as the materializing reference, with the
    output sharding propagated (custom partitioning rule, no resharding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from clip_codec_tpu.ops.pallas_attention import (
        attention_reference,
        flash_attention_heads,
    )
    from clip_codec_tpu.parallel import make_mesh

    B, H, N, D = 4, 4, 128, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
        for _ in range(3)
    )

    def ref(q, k, v):
        r3 = lambda a: a.reshape(B * H, N, D)
        return attention_reference(r3(q), r3(k), r3(v)).reshape(B, H, N, D)

    want = np.asarray(ref(q, k, v))
    gw = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2))(q, k, v)

    mesh = make_mesh(8, model_parallel=2)
    sh = NamedSharding(mesh, P("data", "model", None, None))
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    out = jax.jit(flash_attention_heads)(qs, ks, vs)
    assert out.sharding.spec == P("data", "model", None, None)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)

    gs = jax.jit(
        jax.grad(lambda *a: jnp.sum(flash_attention_heads(*a) ** 2), argnums=(0, 1, 2))
    )(qs, ks, vs)
    for a, b in zip(gs, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    # Unsharded single-device path takes the same wrapper.
    out1 = jax.jit(flash_attention_heads)(q, k, v)
    np.testing.assert_allclose(np.asarray(out1), want, rtol=1e-5, atol=1e-6)
