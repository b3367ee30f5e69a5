"""On-chip time attribution for the DDIM-50 @256px headline (dev tool).

The axon remote transport exposes no per-op device profile, and standalone
per-op timing is swamped by per-dispatch tunnel latency (a bare U-Net
forward "costs" 65 ms dispatched alone vs 29 ms inside the sampling scan).
So each component is timed ON DEVICE: K iterations inside one ``lax.scan``
within a single jit, returning a scalar — one dispatch, no bulk download.
Per-iteration time = (T(K2) - T(K1)) / (K2 - K1), which also cancels the
dispatch constant. Used to decide which fusion/rewrite is worth building
(VERDICT round-1 item 4).

Run (single TPU process!): python bench_profile.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 16
DT = jnp.bfloat16
K1, K2 = 10, 30


def scan_time(body, x0, extras=()):
    """Seconds per body application, measured on device via two scan lengths."""

    @partial(jax.jit, static_argnames=("k",))
    def run(x0, extras, k):
        def step(c, _):
            return body(c, *extras), None

        out, _ = jax.lax.scan(step, x0, None, length=k)
        return jnp.mean(out.astype(jnp.float32))

    ts = {}
    for k in (K1, K2):
        float(run(x0, extras, k))  # warm-up/compile
        t0 = time.time()
        r = float(run(x0, extras, k))
        ts[k] = time.time() - t0
        assert np.isfinite(r)
    return (ts[K2] - ts[K1]) / (K2 - K1)


def main():
    from flax import linen as nn

    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.models.blocks import ResBlock
    from clip_codec_tpu.ops.groupnorm import group_norm_silu

    key = jax.random.PRNGKey(0)
    rows = []

    def report(name, s, flops=None):
        note = f"{100 * flops / s / 197e12:5.1f}% MFU" if flops else ""
        rows.append((name, s * 1e3, note))
        print(f"{name:52s} {s*1e3:8.3f} ms  {note}", flush=True)

    # ---- full forward inside scan (headline per-step time) -----------------
    net = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3, dtype=DT)
    x = jax.random.normal(key, (B, 256, 256, 3), jnp.float32)
    z = jax.random.normal(key, (B, 512), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(net.init)(key, x[:1], z[:1], t[:1])

    s = scan_time(lambda c, p, zz, tt: net.apply(p, c, zz, tt).astype(jnp.float32),
                  x, (params, z, t))
    report("U-Net forward (B=16 @256 bf16, in-scan)", s, 3.55e12)
    fwd_ms = s * 1e3

    # ---- ResBlock @ 256x256x128 (35% of forward FLOPs lives at this shape) --
    h256 = jax.random.normal(key, (B, 256, 256, 128), DT)
    cond = jax.random.normal(key, (B, 256), jnp.float32)
    rb = ResBlock(128, dtype=DT)
    rbp = jax.jit(rb.init)(key, h256, cond)
    s = scan_time(lambda c, p, cc: rb.apply(p, c, cc), h256, (rbp, cond))
    report("ResBlock @256x128", s, 0.1546e12)

    # ---- elementwise chain at the same shape --------------------------------
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    s = scan_time(lambda c: group_norm_silu(c, (scale, bias), groups=8).astype(DT), h256)
    report("GN+SiLU @256x128 (XLA)", s)

    s_f = jax.random.normal(key, (B, 128), DT)
    b_f = jax.random.normal(key, (B, 128), DT)

    def film_gn_silu(c, sf, bf):
        y = c * (1.0 + sf[:, None, None, :]) + bf[:, None, None, :]
        return group_norm_silu(y, (scale, bias), groups=8).astype(DT)

    s = scan_time(film_gn_silu, h256, (s_f, b_f))
    report("FiLM+GN+SiLU @256x128 (XLA)", s)

    # ---- convs ---------------------------------------------------------------
    conv = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
    cp = jax.jit(conv.init)(key, h256)
    s = scan_time(lambda c, p: conv.apply(p, c), h256, (cp,))
    report("conv3x3 128->128 @256 (XLA)", s, 0.0773e12)

    # transposed conv k4s2 (shape-changing: fold output back into the carry
    # with a strided slice — ~67 MB extra read, noted in the number)
    h128 = jax.random.normal(key, (B, 128, 128, 128), DT)
    ct = nn.ConvTranspose(128, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                          transpose_kernel=True, dtype=DT)
    ctp = jax.jit(ct.init)(key, h128)

    def ct_body(c, p):
        y = ct.apply(p, c)
        return c + y[:, ::2, ::2, :] * jnp.asarray(1e-6, DT)

    s = scan_time(ct_body, h128, (ctp,))
    report("convT k4s2 128->128 @128->256 (XLA, +slice)", s, 0.0687e12)

    # the same operator as 4 phase convs k2s1 + interleave (candidate rewrite)
    from clip_codec_tpu.ops.conv_transpose import conv_transpose_k4s2

    def ps_body(c, p):
        y = conv_transpose_k4s2(c, p["params"]["kernel"], p["params"]["bias"])
        return c + y[:, ::2, ::2, :] * jnp.asarray(1e-6, DT)

    s = scan_time(ps_body, h128, (ctp,))
    report("convT k4s2 as 4-phase conv (+slice)", s, 0.0687e12)

    # ---- summary -------------------------------------------------------------
    print("\n| component | ms | note |")
    print("|---|---|---|")
    for n, ms, note in rows:
        print(f"| {n} | {ms:.3f} | {note} |")
    print(f"\nforward breakdown target: {fwd_ms:.1f} ms/step")


if __name__ == "__main__":
    main()
