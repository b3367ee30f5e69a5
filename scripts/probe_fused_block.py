"""Probe: fully-Pallas-fused ResBlock vs the spatial-fold path (VERDICT r4 #2).

The r1 ``affine_silu_conv3x3`` kernel lost to XLA at the headline shape
(B=16 @256: 4.2 vs 2.7 ms — VPU-bound ~37% effective MFU), but the folded
path at B=2 @1024 runs only 28% MFU with identical per-conv row counts
(16*256^2 == 2*1024^2). This probe times a ResBlock built from TWO kernel
calls (GN1 / GN2-FiLM folded into the kernels' per-(batch,channel) affines,
GN2 statistics derived from kernel-1's fp32 moments) against the shipped
paired-fold ResBlock and the direct XLA form, in-scan.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_fused_block.py
"""

from __future__ import annotations

import pathlib
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16
K1, K2 = 4, 12
EPS = 1e-5


def scan_time(body, x0, extras=()):
    @partial(jax.jit, static_argnames=("k",))
    def run(x0, extras, k):
        def step(c, _):
            return body(c, *extras), None

        out, _ = jax.lax.scan(step, x0, None, length=k)
        return jnp.mean(out.astype(jnp.float32))

    ts = {}
    for k in (K1, K2):
        float(run(x0, extras, k))
        t0 = time.time()
        r = float(run(x0, extras, k))
        ts[k] = time.time() - t0
        assert np.isfinite(r)
    return (ts[K2] - ts[K1]) / (K2 - K1)


def gn_affine(x, gamma, beta, groups):
    """Per-(batch, channel) affine (A, B) implementing GroupNorm on x."""
    Bn, H, W, C = x.shape
    xg = x.astype(jnp.float32).reshape(Bn, -1, groups, C // groups)
    m = jnp.mean(xg, axis=(1, 3))                     # (B, G)
    v = jnp.mean(jnp.square(xg), axis=(1, 3)) - m * m
    mc = jnp.repeat(m, C // groups, axis=1)           # (B, C)
    vc = jnp.repeat(v, C // groups, axis=1)
    A = gamma[None, :] * jax.lax.rsqrt(vc + EPS)
    return A, beta[None, :] - mc * A


def gn2_affine_from_moments(mom, hw, fs, fb, gamma, beta, groups):
    """GN2 affine for input y given kernel-1 moments of y, with the FiLM
    y' = y*(1+fs) + fb folded in: returns (A2, B2) such that
    silu-input2 = y*A2 + B2 == GN(FiLM(y)) * gamma + beta."""
    s, ss = mom[:, 0], mom[:, 1]                      # (B, C) sums over HW
    mean_y = s / hw
    ey2 = ss / hw
    f1 = 1.0 + fs
    mean_yp = f1 * mean_y + fb
    ey2p = f1 * f1 * ey2 + 2.0 * f1 * fb * mean_y + fb * fb
    Bn, C = mean_y.shape
    g = groups
    mg = jnp.mean(mean_yp.reshape(Bn, g, C // g), axis=2)
    eg = jnp.mean(ey2p.reshape(Bn, g, C // g), axis=2)
    vg = eg - mg * mg
    mgc = jnp.repeat(mg, C // g, axis=1)
    vgc = jnp.repeat(vg, C // g, axis=1)
    inv = gamma[None, :] * jax.lax.rsqrt(vgc + EPS)
    A2 = f1 * inv
    B2 = (fb - mgc) * inv + beta[None, :]
    return A2, B2


def fused_resblock(x, p, h):
    """ResBlock forward via two affine_silu_conv3x3 calls."""
    from clip_codec_tpu.ops.pallas_resblock import affine_silu_conv3x3

    C = x.shape[-1]
    hw = x.shape[1] * x.shape[2]
    fs = h @ p["w_s"] + p["b_s"]                      # FiLM scale (B, C) f32
    fb = h @ p["w_b"] + p["b_b"]
    A1, B1 = gn_affine(x, p["g1"], p["be1"], 8)
    y, mom = affine_silu_conv3x3(x, A1, B1, p["w1"], p["bias1"], want_moments=True)
    A2, B2 = gn2_affine_from_moments(mom, hw, fs, fb, p["g2"], p["be2"], 8)
    out, _ = affine_silu_conv3x3(y, A2, B2, p["w2"], p["bias2"], add=x)
    return out


def ref_resblock(x, p, h):
    """jnp oracle of the same math (matches models.blocks.ResBlock)."""

    def gn(x, gamma, beta, groups=8):
        Bn, H, W, C = x.shape
        x32 = x.astype(jnp.float32).reshape(Bn, H, W, groups, C // groups)
        m = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
        v = jnp.mean(jnp.square(x32 - m), axis=(1, 2, 4), keepdims=True)
        z = ((x32 - m) * jax.lax.rsqrt(v + EPS)).reshape(Bn, H, W, C)
        return z * gamma + beta

    def conv(x, w9, bias):
        k = w9.reshape(3, 3, w9.shape[1], w9.shape[2]).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y + bias

    z = gn(x, p["g1"], p["be1"])
    z = (z * jax.nn.sigmoid(z)).astype(DT)
    y = conv(z, p["w1"], p["bias1"])
    fs = h @ p["w_s"] + p["b_s"]
    fb = h @ p["w_b"] + p["b_b"]
    y = y * (1.0 + fs[:, None, None, :]) + fb[:, None, None, :]
    z = gn(y.astype(DT), p["g2"], p["be2"])
    z = (z * jax.nn.sigmoid(z)).astype(DT)
    out = conv(z, p["w2"], p["bias2"])
    return (out + x.astype(jnp.float32)).astype(DT)


def make_params(key, C, hdim):
    ks = jax.random.split(key, 8)
    sd = 0.05
    return dict(
        g1=jnp.ones((C,), jnp.float32), be1=jnp.zeros((C,), jnp.float32),
        g2=jnp.ones((C,), jnp.float32), be2=jnp.zeros((C,), jnp.float32),
        w1=jax.random.normal(ks[0], (9, C, C), DT) * sd,
        bias1=jax.random.normal(ks[1], (C,), jnp.float32) * sd,
        w2=jax.random.normal(ks[2], (9, C, C), DT) * sd,
        bias2=jax.random.normal(ks[3], (C,), jnp.float32) * sd,
        w_s=jax.random.normal(ks[4], (hdim, C), jnp.float32) * sd,
        b_s=jnp.zeros((C,), jnp.float32),
        w_b=jax.random.normal(ks[5], (hdim, C), jnp.float32) * sd,
        b_b=jnp.zeros((C,), jnp.float32),
    )


def main():
    from clip_codec_tpu.models.blocks import ResBlock
    from clip_codec_tpu.ops import set_fold_spatial

    key = jax.random.PRNGKey(0)

    def report(name, s, flops):
        print(f"{name:54s} {s*1e3:9.3f} ms  {100*flops/s/197e12:5.1f}% MFU", flush=True)

    import os

    shapes = ((2, 1024, 128), (2, 512, 128), (2, 512, 256), (16, 256, 128))
    if os.environ.get("PROBE_SHAPES"):  # e.g. "2x1024x128,1x1024x128"
        shapes = tuple(
            tuple(int(v) for v in s.split("x"))
            for s in os.environ["PROBE_SHAPES"].split(",")
        )
    for (Bn, H, C) in shapes:
        W = H
        flops = 2 * 2 * 9 * C * C * H * W * Bn
        x = jax.random.normal(key, (Bn, H, W, C), DT)
        h = jax.random.normal(jax.random.PRNGKey(1), (Bn, 256), jnp.float32)
        p = make_params(jax.random.PRNGKey(2), C, 256)

        try:
            # correctness first (small tolerance: bf16 + stat rounding)
            y_f = fused_resblock(x, p, h)
            y_r = ref_resblock(x, p, h)
            err = float(jnp.max(jnp.abs(y_f.astype(jnp.float32) - y_r.astype(jnp.float32))))
            scale_ = float(jnp.max(jnp.abs(y_r.astype(jnp.float32))))
            print(f"  [{Bn}x{H}x{C}] fused-vs-ref max abs err {err:.2e} (scale {scale_:.2f})")

            s = scan_time(lambda c, pp, hh: fused_resblock(c, pp, hh), x, (p, h))
            report(f"fused-pallas ResBlock B={Bn} @{H}x{C}", s, flops)
        except Exception as e:
            print(f"  fused-pallas B={Bn} @{H}x{C} FAILED: {str(e)[:200]}", flush=True)

        rb = ResBlock(C, dtype=DT)
        rbp = jax.jit(rb.init)(key, x[:1], h[:1])
        s = scan_time(lambda c, pp, hh: rb.apply(pp, c, hh), x, (rbp, h))
        report(f"folded ResBlock (shipped) B={Bn} @{H}x{C}", s, flops)

        set_fold_spatial(False)
        s = scan_time(lambda c, pp, hh: rb.apply(pp, c, hh), x, (rbp, h))
        set_fold_spatial(True)
        report(f"direct XLA ResBlock B={Bn} @{H}x{C}", s, flops)


if __name__ == "__main__":
    main()
