"""Re-probe the k4s2 convT upsampler forms under the r5 compiler.

The decoder's three upsamplers are the largest remaining itemized cost at
1024px B=2 (~40 ms of ~119 ms at ~24% MFU — docs/performance.md "1024px
re-measured"). The phase-decomposed form (ops/conv_transpose.py: four dense
2x2 convs + interleave, no zero-dilated MACs) lost end-to-end in r2
(9.2 vs 11.5 img/s headline) and was left default-off — but the r5
compiler shift invalidated several r4-era baselines (docs "1024px
re-measured"), so both the loss and the direct form's 24% MFU need
re-measuring before the front can be called closed.

Times, in-scan (two scan lengths, differenced), each decoder convT shape of
the 1024px B=2 flagship and the 256px B=16 headline:

  direct   — jax.lax.conv_transpose (zero-dilated conv, XLA's choice)
  phase    — conv_transpose_k4s2 (4 dense 2x2 convs + interleave)
  folded   — spatial_fold.folded_conv_transpose_k4s2 where its gate covers

MFU counts the 16*H*W*cin*cout dense-equivalent MACs (what the phase form
executes; the zero-dilated form executes 4x that many nominal MACs, so its
"MFU" here is utilization of the USEFUL math — same convention as the
docs' 24% figure).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_upsampler.py
One TPU process at a time; keep the host core idle.
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
PEAK = 197e12


def scan_time(body, x0, extras=()):
    @partial(jax.jit, static_argnames=("k",))
    def run(x0, extras, k):
        def step(c, _):
            y = body(c, *extras)
            # feed back a same-shape tensor: average-pool the 2x-upsampled
            # output back to the input grid and mix channels to cin — keeps
            # the consumer full-channel (the honest-consumption rule,
            # docs "1024px re-measured" item 4) without growing the carry
            B, H2, W2, co = y.shape
            yp = y.reshape(B, H2 // 2, 2, W2 // 2, 2, co).mean(axis=(2, 4))
            return yp @ extras[-1], None

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
    from clip_codec_tpu.ops.conv_transpose import (
        conv_transpose_k4s2,
        conv_transpose_k4s2_onegemm,
    )
    from clip_codec_tpu.ops.spatial_fold import folded_conv_transpose_k4s2

    key = jax.random.PRNGKey(0)
    # (B, H, cin, cout): the three decoder upsamplers at 1024px B=2, then
    # the same three at the 256px B=16 headline
    shapes = (
        (2, 128, 512, 256), (2, 256, 256, 128), (2, 512, 128, 128),
        (16, 32, 512, 256), (16, 64, 256, 128), (16, 128, 128, 128),
    )
    for (B, H, cin, cout) in shapes:
        W = H
        flops = 2 * 16 * H * W * cin * cout * B
        x = jax.random.normal(key, (B, H, W, cin), DT)
        kern = jax.random.normal(jax.random.PRNGKey(1), (4, 4, cout, cin), DT) * 0.05
        mix = jax.random.normal(jax.random.PRNGKey(2), (cout, cin), DT) * 0.05

        def direct(c, kern, mix):
            return jax.lax.conv_transpose(
                c, kern, strides=(2, 2), padding=((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
            )

        def phase(c, kern, mix):
            return conv_transpose_k4s2(c, kern, None)

        def onegemm(c, kern, mix):
            return conv_transpose_k4s2_onegemm(c, kern, None)

        # correctness cross-check once per shape
        err = float(jnp.max(jnp.abs(
            direct(x, kern, mix).astype(jnp.float32) - phase(x, kern, mix).astype(jnp.float32))))
        ref_scale = float(jnp.max(jnp.abs(direct(x, kern, mix)))) or 1.0

        rows = [("direct", direct), ("phase", phase), ("onegemm", onegemm)]
        if folded_conv_transpose_k4s2(x, kern) is not None:
            rows.append(("folded", lambda c, kern, mix: folded_conv_transpose_k4s2(c, kern)))
        line = f"[convT {B}x{H}x{cin}->{cout}] err={err:.1e}/{ref_scale:.1f}"
        for name, fn in rows:
            s = scan_time(fn, x, (kern, mix))
            line += f"  {name} {s*1e3:7.3f} ms ({100*flops/s/PEAK:4.1f}% MFU)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
