"""On-chip validation + timing of the fused boundary convs (in: 3->128,
head: GN+128->3) vs their XLA forms at the 1024px/512px stretch shapes.
Interpret mode cannot exercise Mosaic's 3-lane padding, so correctness is
asserted HERE on real hardware before the bench relies on the path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_boundary_conv.py
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


def xla_conv(x, k, bias):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + bias


def main():
    from clip_codec_tpu.ops.pallas_resblock import affine_conv3x3, gn_affine

    key = jax.random.PRNGKey(0)

    for (Bn, H) in ((2, 1024), (2, 512), (1, 1024)):
        W = H
        # ---- in conv 3 -> 128 (identity affine) ----
        x = jax.random.normal(key, (Bn, H, W, 3), DT)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 128), DT) * 0.1)
        bias = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32) * 0.1
        ones = jnp.ones((Bn, 3), jnp.float32)
        y_p, _ = jax.jit(lambda x: affine_conv3x3(x, ones, 0 * ones, k.reshape(9, 3, 128), bias))(x)
        y_x = jax.jit(lambda x: xla_conv(x, k, bias).astype(DT))(x)
        err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_x.astype(jnp.float32))))
        print(f"[in  3->128 B={Bn} @{H}] max err {err:.2e} (scale {float(jnp.max(jnp.abs(y_x))):.2f})", flush=True)
        assert err < 0.05

        def body_p(c):
            y = affine_conv3x3(c, ones, 0 * ones, k.reshape(9, 3, 128), bias)[0]
            return c + y[..., :3] * jnp.asarray(1e-6, DT)

        def body_x(c):
            y = xla_conv(c, k, bias).astype(DT)
            return c + y[..., :3] * jnp.asarray(1e-6, DT)

        sp = scan_time(body_p, x)
        sx = scan_time(body_x, x)
        print(f"  in-conv: pallas {sp*1e3:7.3f} ms vs XLA {sx*1e3:7.3f} ms", flush=True)

        # ---- head GN + conv 128 -> 3 ----
        h = jax.random.normal(key, (Bn, H, W, 128), DT)
        kh = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, 128, 3), DT) * 0.1)
        bh = jax.random.normal(jax.random.PRNGKey(4), (3,), jnp.float32) * 0.1
        gs = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (128,), jnp.float32)
        gb = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (128,), jnp.float32)

        def head_p(c):
            A, Bv = gn_affine(c, gs, gb, 8)
            return affine_conv3x3(c, A, Bv, kh.reshape(9, 128, 3), bh)[0]

        def head_x(c):
            from clip_codec_tpu.ops.groupnorm import group_norm

            z = group_norm(c, (gs, gb), groups=8)
            return xla_conv(z, kh, bh).astype(DT)

        y_p = jax.jit(head_p)(h)
        y_x = jax.jit(head_x)(h)
        err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_x.astype(jnp.float32))))
        print(f"[head 128->3 B={Bn} @{H}] max err {err:.2e} (scale {float(jnp.max(jnp.abs(y_x))):.2f})", flush=True)
        assert err < 0.05

        def bp(c):
            return c + jnp.pad(head_p(c), ((0, 0),) * 3 + ((0, 125),)) * jnp.asarray(1e-6, DT)

        def bx(c):
            return c + jnp.pad(head_x(c), ((0, 0),) * 3 + ((0, 125),)) * jnp.asarray(1e-6, DT)

        sp = scan_time(bp, h)
        sx = scan_time(bx, h)
        print(f"  head:    pallas {sp*1e3:7.3f} ms vs XLA(GN+conv) {sx*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
