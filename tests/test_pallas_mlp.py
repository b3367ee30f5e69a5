"""Fused transformer-MLP kernel (ops/pallas_mlp.py): interpret-mode kernel
correctness vs the jnp reference, module-level param-tree compatibility, and
sharded execution through the custom partitioner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from clip_codec_tpu.ops.pallas_mlp import (
    _mlp_pallas,
    _pick_tiles,
    mlp_reference,
    transformer_mlp,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _params(rng, C, F, dtype=jnp.float32):
    def a(*shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32)

    return dict(lns=a(C) + 1.0, lnb=a(C), wh=a(C, F), bh=a(F),
                wg=a(C, F), bg=a(F), wo=a(F, C))


@pytest.mark.parametrize(
    "R,C,F",
    [
        (64, 320, 1280),   # SD 320-wide stage geometry (single f tile)
        (64, 640, 2560),   # 640-wide (two f tiles)
        (32, 1280, 5120),  # 1280-wide (weights exceed VMEM -> f-tiled)
    ],
)
def test_kernel_matches_reference(rng, R, C, F):
    p = _params(rng, C, F)
    x = jnp.asarray(rng.standard_normal((R, C)), jnp.float32)
    tiles = _pick_tiles(R, C, F)
    assert tiles is not None
    with pltpu.force_tpu_interpret_mode():
        got = _mlp_pallas(x, p["lns"], p["lnb"], p["wh"], p["bh"],
                          p["wg"], p["bg"], p["wo"], tiles)
    want = mlp_reference(x, p["lns"], p["lnb"], p["wh"], p["bh"],
                         p["wg"], p["bg"], p["wo"])
    # f-tiled runs accumulate the out-projection in a different order than
    # the reference's single matmul -> fp32 reassociation drift only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=5e-4)


def test_kernel_bf16(rng):
    C, F, R = 320, 1280, 64
    p = _params(rng, C, F)
    x32 = jnp.asarray(rng.standard_normal((R, C)), jnp.float32)
    x = x32.astype(jnp.bfloat16)
    tiles = _pick_tiles(R, C, F)
    with pltpu.force_tpu_interpret_mode():
        got = _mlp_pallas(x, p["lns"], p["lnb"],
                          p["wh"].astype(jnp.bfloat16), p["bh"],
                          p["wg"].astype(jnp.bfloat16), p["bg"],
                          p["wo"].astype(jnp.bfloat16), tiles)
    want = mlp_reference(x, p["lns"], p["lnb"], p["wh"], p["bh"],
                         p["wg"], p["bg"], p["wo"])
    assert got.dtype == jnp.bfloat16
    scale = float(jnp.abs(want.astype(jnp.float32)).max())
    err = float(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max())
    assert err / scale < 0.03, err / scale  # bf16 rounding budget


def test_tile_picker():
    assert _pick_tiles(32768, 320, 1280) == (512, 1280)
    tm, tf = _pick_tiles(32768, 1280, 5120)
    assert tf < 5120 and 5120 % tf == 0  # f-tiled: weights exceed VMEM
    assert _pick_tiles(7, 320, 1280) is None  # rows don't tile
    assert _pick_tiles(64, 8, 33) is None  # hidden not 128-aligned


def test_module_param_tree_and_parity(rng):
    """fused_mlp=True declares the EXACT param tree of the unfused modules
    (same names, shapes, init values) and matches their output/gradients —
    any checkpoint serves unchanged through the fused path."""
    from clip_codec_tpu.models.sd.layers import BasicTransformerBlock

    x = jnp.asarray(rng.standard_normal((2, 64, 32)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)
    fused = BasicTransformerBlock(32, 2, fused_mlp=True)
    plain = BasicTransformerBlock(32, 2, fused_mlp=False)
    pf = fused.init(jax.random.PRNGKey(0), x, ctx)["params"]
    pp = plain.init(jax.random.PRNGKey(0), x, ctx)["params"]
    tu = jax.tree_util
    assert tu.tree_map(lambda a: a.shape, pf) == tu.tree_map(lambda a: a.shape, pp)
    for a, b in zip(tu.tree_leaves(pf), tu.tree_leaves(pp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    yf = fused.apply({"params": pp}, x, ctx)
    yp = plain.apply({"params": pp}, x, ctx)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yp), atol=2e-5, rtol=1e-4)

    gf = jax.grad(lambda p: jnp.sum(fused.apply({"params": p}, x, ctx) ** 2))(pp)
    gp = jax.grad(lambda p: jnp.sum(plain.apply({"params": p}, x, ctx) ** 2))(pp)
    for a, b in zip(tu.tree_leaves(gf), tu.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def test_fused_mlp_int8_force_raises(rng):
    """Forcing fused_mlp=True in int8 mode must raise, not silently bypass
    Int8Dense (the 'quant' collection would otherwise lose the MLP entries)."""
    import pytest

    from clip_codec_tpu.models.sd.layers import BasicTransformerBlock, Upsample2D

    x = jnp.asarray(rng.standard_normal((1, 16, 32)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    bad = BasicTransformerBlock(32, 2, fused_mlp=True, int8=True)
    with pytest.raises(ValueError, match="int8"):
        bad.init(jax.random.PRNGKey(0), x, ctx)
    # auto gate (fused_mlp=None) composes fine with int8 — it picks unfused
    ok = BasicTransformerBlock(32, 2, int8=True)
    ok.init(jax.random.PRNGKey(0), x, ctx)

    xi = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    with pytest.raises(ValueError, match="int8"):
        Upsample2D(16, fused=True, int8=True).init(jax.random.PRNGKey(0), xi)
    Upsample2D(16, int8=True).init(jax.random.PRNGKey(0), xi)


def test_sharded_rows_match_single_device(rng):
    """DP-style batch sharding passes straight through the partitioner."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    C, F = 320, 1280
    p = _params(rng, C, F)
    x = jnp.asarray(rng.standard_normal((8, 16, C)), jnp.float32)
    args = (x, p["lns"], p["lnb"], p["wh"], p["bh"], p["wg"], p["bg"], p["wo"])
    want = transformer_mlp(*args)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    rep = [jax.device_put(a, NamedSharding(mesh, P())) for a in args[1:]]
    got = jax.jit(transformer_mlp)(xs, *rep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-3)


def test_tp_hidden_sharding_psums(rng):
    """Megatron column-sharded GEGLU weights: each device computes its local
    hidden shard, the wrapper psums — equal to single-device, and the HLO
    carries NO all-gather (the weights are consumed sharded)."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    C, F = 320, 1280
    p = _params(rng, C, F)
    x = jnp.asarray(rng.standard_normal((2, 16, C)), jnp.float32)
    args = (x, p["lns"], p["lnb"], p["wh"], p["bh"], p["wg"], p["bg"], p["wo"])
    want = transformer_mlp(*args)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("model",))
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    sharded = (
        put(x, P()),
        put(p["lns"], P()), put(p["lnb"], P()),
        put(p["wh"], P(None, "model")), put(p["bh"], P("model")),
        put(p["wg"], P(None, "model")), put(p["bg"], P("model")),
        put(p["wo"], P("model", None)),
    )
    f = jax.jit(transformer_mlp)
    got = f(*sharded)
    # psum reassociates the hidden contraction -> fp32 drift only
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-3)
    hlo = f.lower(*sharded).compile().as_text()
    assert len(re.findall(r"\ball-reduce", hlo)) > 0
    assert len(re.findall(r"\ball-gather", hlo)) == 0, "weights were gathered"


def test_erf_poly_matches_lax_erf():
    """The in-kernel erf polynomial (Mosaic has no erf lowering) is XLA's
    own expansion: ~1 ulp agreement with jax.lax.erf across the real range
    (clamped |x| <= 4 where erf saturates to fp32 1.0)."""
    from clip_codec_tpu.ops.pallas_mlp import _erf_poly

    x = jnp.asarray(np.linspace(-8, 8, 100001), jnp.float32)
    err = float(jnp.abs(_erf_poly(x) - jax.lax.erf(x)).max())
    assert err < 1e-6, err
