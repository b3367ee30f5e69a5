"""Honest in-conv (3->128) probe: consume ALL output channels.

probe_boundary_conv.py's scan body fed back ``y[..., :3]`` — XLA can
dead-code-eliminate 125 of the GEMM's 128 output columns through that
slice, so its im2col numbers (3.59 ms @1024 B=2) may measure a (27, 3)
GEMM, not the real (27, 128). Here the body consumes a full-channel
reduction so nothing can be DCE'd.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_inconv_honest.py
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
    from clip_codec_tpu.ops.im2col import conv3x3_im2col

    key = jax.random.PRNGKey(0)
    for (Bn, H) in ((2, 1024), (2, 512)):
        W = H
        x = jax.random.normal(key, (Bn, H, W, 3), DT)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 128), DT) * 0.1)
        bias = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32) * 0.1

        def direct(c):
            y = jax.lax.conv_general_dilated(
                c, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ) + bias
            return y.astype(DT)

        def im2col(c):
            return conv3x3_im2col(c, k, bias)

        times = {}
        for name, f in (("direct", direct), ("im2col", im2col)):
            # consume EVERY output channel: reduce to (B, H, W, 1)-ish and
            # add back — no slice for DCE to exploit
            def body(c, f=f):
                y = f(c)
                s = jnp.mean(y.astype(jnp.float32), axis=-1, keepdims=True)
                return c + s.astype(DT) * jnp.asarray(1e-6, DT)

            times[name] = scan_time(body, x)
        print(f"[in 3->128 B={Bn} @{H}] " +
              "  ".join(f"{n} {t*1e3:7.3f} ms" for n, t in times.items()), flush=True)


if __name__ == "__main__":
    main()
