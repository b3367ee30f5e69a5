"""Tensor-parallel SD UNet: sharded-vs-single-device equivalence.

The reference has no tensor parallelism (SURVEY.md §2.5); these tests pin the
TPU rebuild's Megatron-style GSPMD sharding (``parallel/tp.py``) on the
8-virtual-device CPU mesh: logically identical outputs, genuinely sharded
parameters, and early validation errors for indivisible configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from clip_codec_tpu.models.sd import SDUNet, SDUNetConfig
from clip_codec_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    sd_unet_tp_specs,
    shard_params_tp,
    validate_tp,
)

TINY = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16, heads=2, freq_dim=8)
TINY4 = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16, heads=4, freq_dim=8)


def _init(cfg, B=4, S=8):
    net = SDUNet(cfg)
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((B, S, S, cfg.in_ch)).astype(np.float32)
    t = np.arange(B, dtype=np.int32) * 7
    ctx = rng.standard_normal((B, 3, cfg.cross_dim)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    return net, params, (lat, t, ctx)


def test_tp_specs_layout():
    _, params, _ = _init(TINY)
    specs = sd_unet_tp_specs(params)
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(specs)
    qs = [p for p in flat if p[-2:] == ("to_q", "kernel") and "attn1" in str(p)]
    assert qs, "no attention projections found"
    for p, s in flat.items():
        if len(p) < 2:
            assert s == P()
        elif p[-2] in ("to_q", "to_k", "to_v") and p[-1] == "kernel":
            assert s == P(None, MODEL_AXIS)
        elif p[-2] in ("to_out", "ff_out") and p[-1] == "kernel":
            assert s == P(MODEL_AXIS, None)
        elif len(p) >= 3 and p[-3] == "ff_geglu" and p[-1] == "kernel":
            assert s == P(None, MODEL_AXIS)
        elif p[-2] == "conv1" or p[-2] == "conv_in":
            assert s == P()


@pytest.mark.parametrize("cfg,n_model", [(TINY, 2), (TINY4, 4)])
def test_tp_forward_matches_single_device(cfg, n_model):
    net, params, (lat, t, ctx) = _init(cfg)
    want = np.asarray(net.apply({"params": params}, lat, t, ctx))

    validate_tp(cfg, n_model)
    mesh = make_mesh(8, model_parallel=n_model)
    tp_params = shard_params_tp(mesh, params)

    # Parameters must be REALLY sharded: a column-parallel kernel's local
    # shard holds 1/n of the columns.
    q_kernel = tp_params["down_0_attn_0"]["block_0"]["attn1"]["to_q"]["kernel"]
    local = q_kernel.addressable_shards[0].data.shape
    assert local[1] * n_model == q_kernel.shape[1]

    data_sh = NamedSharding(mesh, P("data"))
    lat_s = jax.device_put(lat, data_sh)
    t_s = jax.device_put(t, data_sh)
    ctx_s = jax.device_put(ctx, data_sh)

    @jax.jit
    def fwd(p, lat, t, ctx):
        return net.apply({"params": p}, lat, t, ctx)

    got = np.asarray(fwd(tp_params, lat_s, t_s, ctx_s))
    # psum reassociates the row-parallel contractions -> small fp32 drift.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_tp_composes_with_sampling():
    """TP params flow through the DDIM sampler (params-as-arguments jit)."""
    from clip_codec_tpu.diffusion import NoiseSchedule, ddim_sample

    net, params, (lat, t, ctx) = _init(TINY)
    mesh = make_mesh(8, model_parallel=2)
    tp_params = shard_params_tp(mesh, params)
    sched = NoiseSchedule.create(20, "cosine")
    B, S = 4, 8
    fixed_ctx = jnp.asarray(ctx[:, :1, :])

    def model_fn(model_params, x, z, tt):
        return net.apply({"params": model_params}, x, tt, fixed_ctx)

    z = jax.device_put(np.zeros((B, 8), np.float32), NamedSharding(mesh, P("data")))
    out = ddim_sample(model_fn, sched, z, (B, S, S, 4), steps=4, model_params=tp_params)
    out = np.asarray(out)
    assert out.shape == (B, S, S, 4) and np.isfinite(out).all()


def test_validate_tp_rejects_indivisible():
    with pytest.raises(ValueError, match="heads"):
        validate_tp(TINY, 4)  # heads=2, model=4
    bad = SDUNetConfig(block_out=(9, 12), layers_per_block=1, cross_dim=16, heads=2, freq_dim=8)
    with pytest.raises(ValueError, match="width"):
        validate_tp(bad, 2)
    validate_tp(TINY, 1)  # no-op


@pytest.mark.parametrize("n_model", [2, 4])
def test_tp_flash_on_matches_einsum_oracle(n_model):
    """Flash attention COMPOSES with tensor parallelism: the head-batched
    ``flash_attention_heads`` wrapper's custom partitioning rule runs the
    kernel on each device's local heads, so head-sharded TP keeps the kernel
    instead of silently degrading to einsum (round-2 review). Sampled at
    32x32 so the first block's self-attention crosses the N>=1024 flash
    threshold; outputs must match the single-device einsum oracle."""
    cfg = TINY4
    net_flash = SDUNet(cfg, flash=True)
    net_plain = SDUNet(cfg, flash=False)
    rng = np.random.default_rng(1)
    B, S = 4, 32
    lat = rng.standard_normal((B, S, S, cfg.in_ch)).astype(np.float32)
    t = np.arange(B, dtype=np.int32) * 7
    ctx = rng.standard_normal((B, 3, cfg.cross_dim)).astype(np.float32)
    params = net_flash.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    want = np.asarray(net_plain.apply({"params": params}, lat, t, ctx))

    mesh = make_mesh(8, model_parallel=n_model)
    tp_params = shard_params_tp(mesh, params)
    ds = NamedSharding(mesh, P("data"))
    args = [jax.device_put(a, ds) for a in (lat, t, ctx)]
    got = np.asarray(
        jax.jit(lambda p, l, tt, c: net_flash.apply({"params": p}, l, tt, c))(
            tp_params, *args
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_tp_flash_on_has_no_resharding_collectives():
    """With flash ON under TP, the attention stays device-local inside the
    partitioned kernel: still psums only (the row-parallel to_out/ff_out
    all-reduces), zero all-gather/all-to-all."""
    import re

    cfg = TINY4
    net = SDUNet(cfg, flash=True)
    rng = np.random.default_rng(1)
    B, S = 4, 32
    lat = rng.standard_normal((B, S, S, cfg.in_ch)).astype(np.float32)
    t = np.arange(B, dtype=np.int32) * 7
    ctx = rng.standard_normal((B, 3, cfg.cross_dim)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), lat, t, ctx)["params"]
    mesh = make_mesh(8, model_parallel=2)
    tp = shard_params_tp(mesh, params)
    ds = NamedSharding(mesh, P("data"))
    args = [jax.device_put(a, ds) for a in (lat, t, ctx)]
    hlo = (
        jax.jit(lambda p, l, tt, c: net.apply({"params": p}, l, tt, c))
        .lower(tp, *args).compile().as_text()
    )
    counts = {op: len(re.findall(r"\b" + op, hlo))
              for op in ("all-reduce", "all-gather", "all-to-all",
                         "collective-permute", "reduce-scatter")}
    assert counts["all-reduce"] > 0, counts
    for op in ("all-gather", "all-to-all", "collective-permute", "reduce-scatter"):
        assert counts[op] == 0, counts


def test_tp_forward_has_no_resharding_collectives():
    """The Megatron layout's whole point: the TP forward's only collectives
    are psums (all-reduce) after row-parallel contractions — any all-gather /
    all-to-all means an activation got resharded (e.g. the pre-fix fused
    GEGLU split)."""
    import re

    net, params, (lat, t, ctx) = _init(TINY)
    mesh = make_mesh(8, model_parallel=2)
    tp = shard_params_tp(mesh, params)
    ds = NamedSharding(mesh, P("data"))
    args = [jax.device_put(a, ds) for a in (lat, t, ctx)]
    hlo = (
        jax.jit(lambda p, l, tt, c: net.apply({"params": p}, l, tt, c))
        .lower(tp, *args).compile().as_text()
    )
    counts = {op: len(re.findall(r"\b" + op, hlo))
              for op in ("all-reduce", "all-gather", "all-to-all",
                         "collective-permute", "reduce-scatter")}
    assert counts["all-reduce"] > 0, counts
    for op in ("all-gather", "all-to-all", "collective-permute", "reduce-scatter"):
        assert counts[op] == 0, counts
