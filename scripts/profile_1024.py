"""Attribute the 1024px MFU collapse (0.174 vs 0.697 at 512px/B=16).

Same in-scan differencing method as bench_profile.py, at the 1024px stretch
config (B=2, the largest batch the remote-compile transport accepts for the
full sampler; individual segments probe larger batches to split the
batch-vs-spatial axes). One TPU process at a time.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_1024.py
Results recorded in docs/performance.md (1024px row).
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
K1, K2 = 4, 12  # 1024px bodies are ~10-200 ms; short scans keep programs small


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


def main():
    from flax import linen as nn

    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.models.blocks import ResBlock

    key = jax.random.PRNGKey(0)

    def report(name, s, flops=None):
        note = f"{100 * flops / s / 197e12:5.1f}% MFU" if flops else ""
        print(f"{name:58s} {s*1e3:9.3f} ms  {note}", flush=True)

    # Full forward at the bench config (B=2 @1024): expected ~207 ms/step
    # from the 10.35 s / 50-step headline.
    net = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3, dtype=DT)
    B = 2
    x = jax.random.normal(key, (B, 1024, 1024, 3), jnp.float32)
    z = jax.random.normal(key, (B, 512), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(net.init)(key, x[:1], z[:1], t[:1])
    s = scan_time(lambda c, p, zz, tt: net.apply(p, c, zz, tt).astype(jnp.float32),
                  x, (params, z, t))
    # flops: 177.1 TFLOP/img/50steps => 3.543e12/img/step (bench cost_analysis)
    report("U-Net fwd (B=2 @1024 bf16, in-scan)", s, 2 * 3.543e12)

    # Segments at stage-1 resolution (1024px, 128ch) — B=2 and B=8 to split
    # batch-vs-spatial; FLOPs: conv3x3 = 2*9*C*C*HW*B.
    for b in (2, 8):
        h = jax.random.normal(key, (b, 1024, 1024, 128), DT)
        conv = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
        cp = jax.jit(conv.init)(key, h[:1])
        s = scan_time(lambda c, p: conv.apply(p, c), h, (cp,))
        report(f"conv3x3 128->128 @1024 B={b} (XLA)", s, 2 * 9 * 128 * 128 * 1024 * 1024 * b)

        cond = jax.random.normal(key, (b, 256), jnp.float32)
        rb = ResBlock(128, dtype=DT)
        rbp = jax.jit(rb.init)(key, h[:1], cond[:1])
        s = scan_time(lambda c, p, cc: rb.apply(p, c, cc), h, (rbp, cond))
        report(f"ResBlock @1024x128 B={b}", s, 2 * 2 * 9 * 128 * 128 * 1024 * 1024 * b)

    # Stage-2/3 (512px/512ch-equivalent: ch_mult (1,2,2) -> 256 at 512px)
    h5 = jax.random.normal(key, (2, 512, 512, 256), DT)
    conv5 = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
    cp5 = jax.jit(conv5.init)(key, h5[:1])
    s = scan_time(lambda c, p: conv5.apply(p, c), h5, (cp5,))
    report("conv3x3 256->256 @512 B=2 (XLA)", s, 2 * 9 * 256 * 256 * 512 * 512 * 2)

    # conv_in 3->128 @1024 (K=27 contraction, MXU-hostile shape)
    x3 = jax.random.normal(key, (2, 1024, 1024, 3), DT)
    convi = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
    cpi = jax.jit(convi.init)(key, x3[:1])

    def ci_body(c, p):
        y = convi.apply(p, c)
        return c + y[..., :3] * jnp.asarray(1e-6, DT)

    s = scan_time(ci_body, x3, (cpi,))
    report("conv3x3 3->128 @1024 B=2 (XLA, +residual fold)", s, 2 * 9 * 3 * 128 * 1024 * 1024 * 2)

    # head conv 128->3 @1024 (M=3 output lanes)
    h = jax.random.normal(key, (2, 1024, 1024, 128), DT)
    convo = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
    cpo = jax.jit(convo.init)(key, h[:1])

    def co_body(c, p):
        y = convo.apply(p, c)
        return c + jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, 125))) * jnp.asarray(1e-6, DT)

    s = scan_time(co_body, h, (cpo,))
    report("conv3x3 128->3 @1024 B=2 (XLA, +pad fold)", s, 2 * 9 * 128 * 3 * 1024 * 1024 * 2)

    # convT k4s2 upsample 256ch @512->1024
    hup = jax.random.normal(key, (2, 512, 512, 256), DT)
    ct = nn.ConvTranspose(256, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                          transpose_kernel=True, dtype=DT)
    ctp = jax.jit(ct.init)(key, hup[:1])

    def ct_body(c, p):
        y = ct.apply(p, c)
        return c + y[:, ::2, ::2, :] * jnp.asarray(1e-6, DT)

    s = scan_time(ct_body, hup, (ctp,))
    report("convT k4s2 256 @512->1024 B=2 (XLA, +slice)", s, 2 * 16 * 256 * 256 * 512 * 512 * 2)


if __name__ == "__main__":
    main()
