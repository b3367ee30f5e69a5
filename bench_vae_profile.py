"""On-chip time attribution for the SD-1.5 VAE DECODER at 512px (dev tool).

VERDICT r3 item 5: the 21.5 ms/image decode had no attribution. Same
two-length in-scan methodology as bench_sd_profile.py; shapes are the real
SD-1.5 decoder stages for a 64x64 latent -> 512px image.

Decoder stage map (models/sd/vae.py VAEDecoder, B=1):
  mid:   2x Resnet512 + 1x AttnBlockVAE(512)      @ 64x64
  up_0:  3x Resnet512 + upsample                  @ 64x64   -> 128
  up_1:  3x Resnet512 + upsample                  @ 128x128 -> 256
  up_2:  3x Resnet(512->256) + upsample           @ 256x256 -> 512
  up_3:  3x Resnet(256->128)                      @ 512x512
  conv_out GN+SiLU+3x3->3                         @ 512x512

Run alone (single TPU process!): python bench_vae_profile.py [B]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
DT = jnp.bfloat16
K1, K2 = 2, 8
PEAK = 197e12


def scan_time(label, module, x_shape, flops=None, out_to_in=None):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), DT)
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    fit = out_to_in or (lambda y, x0: y.astype(x0.dtype))

    @partial(jax.jit, static_argnames=("k",))
    def run(p, x, k):
        def step(c, _):
            return fit(module.apply({"params": p}, c), c), None

        out, _ = jax.lax.scan(step, x, None, length=k)
        return jnp.mean(out.astype(jnp.float32))

    ts = {}
    for k in (K1, K2):
        assert np.isfinite(float(run(params, x, k=k)))
        t0 = time.time()
        float(run(params, x, k=k))
        ts[k] = time.time() - t0
    dt = (ts[K2] - ts[K1]) / (K2 - K1)
    note = f"  ({flops/dt/1e12:5.1f} TF/s, MFU {flops/dt/PEAK:.2f})" if flops else ""
    print(f"[vae-prof] {label:<34} {dt*1e3:8.2f} ms{note}", flush=True)
    return dt


def res_flops(s, cin, cout, b=B):
    # two 3x3 convs (+1x1 shortcut when cin != cout), per application
    f = 2 * b * s * s * 9 * (cin * cout + cout * cout)
    if cin != cout:
        f += 2 * b * s * s * cin * cout
    return f


def main():
    from clip_codec_tpu.models.sd.layers import AttnBlockVAE, ResnetBlock2D, Upsample2D

    total = 0.0
    stages = [
        ("mid res512@64", ResnetBlock2D(512, None, dtype=DT), (B, 64, 64, 512), 2, res_flops(64, 512, 512)),
        ("mid attn512@64", AttnBlockVAE(512, dtype=DT), (B, 64, 64, 512), 1,
         2 * B * (4 * 4096 * 512 * 512 + 2 * 4096 * 4096 * 512)),
        ("up0 res512@64", ResnetBlock2D(512, None, dtype=DT), (B, 64, 64, 512), 3, res_flops(64, 512, 512)),
        ("up0 upsample@64->128", Upsample2D(512, dtype=DT), (B, 64, 64, 512), 1,
         2 * B * 128 * 128 * 9 * 512 * 512),
        ("up1 res512@128", ResnetBlock2D(512, None, dtype=DT), (B, 128, 128, 512), 3, res_flops(128, 512, 512)),
        ("up1 upsample@128->256", Upsample2D(512, dtype=DT), (B, 128, 128, 512), 1,
         2 * B * 256 * 256 * 9 * 512 * 512),
        ("up2 res512->256@256", ResnetBlock2D(256, None, dtype=DT), (B, 256, 256, 512), 1, res_flops(256, 512, 256)),
        ("up2 res256@256", ResnetBlock2D(256, None, dtype=DT), (B, 256, 256, 256), 2, res_flops(256, 256, 256)),
        ("up2 upsample@256->512", Upsample2D(256, dtype=DT), (B, 256, 256, 256), 1,
         2 * B * 512 * 512 * 9 * 256 * 256),
        ("up3 res256->128@512", ResnetBlock2D(128, None, dtype=DT), (B, 512, 512, 256), 1, res_flops(512, 256, 128)),
        ("up3 res128@512", ResnetBlock2D(128, None, dtype=DT), (B, 512, 512, 128), 2, res_flops(512, 128, 128)),
    ]
    for label, mod, shape, count, fl in stages:
        # channel-changing blocks shrink the tensor: refit via a cast/slice
        def fit(y, x0):
            if y.shape == x0.shape:
                return y.astype(x0.dtype)
            # pad channels back up / tile spatial down so the scan carries x0's shape
            return jnp.zeros(x0.shape, x0.dtype) + jnp.mean(y.astype(jnp.float32)).astype(x0.dtype)

        dt = scan_time(label, mod, shape, flops=fl, out_to_in=fit)
        print(f"           x{count} -> {dt*count*1e3:8.2f} ms", flush=True)
        total += dt * count

    print(f"[vae-prof] stage sum (B={B}): {total*1e3:.2f} ms "
          f"(bench_sd.py measures the whole decode separately)", flush=True)


if __name__ == "__main__":
    main()
