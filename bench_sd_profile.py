"""On-chip time attribution for the SD-1.5 UNet forward (dev tool).

Same methodology as bench_profile.py: each component timed ON DEVICE via two
scan lengths inside one jit (per-dispatch timing over the axon tunnel is
meaningless). Shapes are the real SD-1.5 stages at 64x64 latents.

Run (single TPU process!): python bench_sd_profile.py [B]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
DT = jnp.bfloat16
K1, K2 = 2, 12


def scan_time(label, module, x_shape, extras=(), flops=None):
    """Per-application seconds for module(x, *extras) measured on device."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), DT)
    extras = tuple(jnp.asarray(e, DT) if hasattr(e, "dtype") or isinstance(e, np.ndarray) else e for e in extras)
    params = module.init(jax.random.PRNGKey(0), x, *extras)["params"]

    @partial(jax.jit, static_argnames=("k",))
    def run(p, x, extras, k):
        def step(c, _):
            return module.apply({"params": p}, c, *extras).astype(c.dtype), None

        out, _ = jax.lax.scan(step, x, None, length=k)
        return jnp.mean(out.astype(jnp.float32))

    ts = {}
    for k in (K1, K2):
        assert np.isfinite(float(run(params, x, extras, k=k)))
        t0 = time.time()
        float(run(params, x, extras, k=k))
        ts[k] = time.time() - t0
    dt = (ts[K2] - ts[K1]) / (K2 - K1)
    note = f", {flops/dt/1e12:.1f} TF/s" if flops else ""
    print(f"[sd-prof] {label}: {dt*1e3:.2f} ms{note}", flush=True)
    return dt


def main():
    from clip_codec_tpu.models.sd.layers import ResnetBlock2D, Transformer2D

    temb = np.random.default_rng(1).standard_normal((B, 1280)).astype(np.float32)
    ctx = np.random.default_rng(2).standard_normal((B, 8, 768)).astype(np.float32)

    total = 0.0
    # down/up stages of SD-1.5 at 64x64 latents: (spatial, width, n_resnets, n_xformers)
    # down: 2x(320@64) +ds, 2x(640@32)+ds, 2x(1280@16)+ds, 2x(1280@8)
    # mid: 2x(1280@8) + 1 xformer; up mirrors down with 3 resnets per stage.
    stages = [
        ("res320@64", 64, 320, 2 + 3),
        ("res640@32", 32, 640, 2 + 3),
        ("res1280@16", 16, 1280, 2 + 3),
        ("res1280@8", 8, 1280, 2 + 2 + 3),
    ]
    for label, s, ch, count in stages:
        dt = scan_time(label, ResnetBlock2D(ch, temb_dim=1280, dtype=DT), (B, s, s, ch), (temb,))
        # up-path resnets see concat skips (2*ch in), approximate with same-ch
        print(f"          x{count} -> {dt*count*1e3:.2f} ms", flush=True)
        total += dt * count

    xstages = [
        ("xf320@64", 64, 320, 2 + 3),
        ("xf640@32", 32, 640, 2 + 3),
        ("xf1280@16", 16, 1280, 2 + 3),
        ("xf1280@8", 8, 1280, 1),  # mid
    ]
    for label, s, ch, count in xstages:
        dt = scan_time(label, Transformer2D(ch, heads=8, dtype=DT), (B, s, s, ch), (ctx,))
        print(f"          x{count} -> {dt*count*1e3:.2f} ms", flush=True)
        total += dt * count

    print(f"[sd-prof] stage sum (B={B}): {total*1e3:.1f} ms (whole forward measured separately by bench_sd.py)", flush=True)


if __name__ == "__main__":
    main()
