"""On-chip validation + timing of the boundary convs at the 1024px/512px
stretch shapes (reference unet.py:59,78-79,105 — the 3->base in conv and the
GN + base->3 head conv, which XLA runs at ~1% MFU from 3-lane tiling waste).

Two fronts, measured separately:

* HEAD (GN + 128->3): the fused Pallas ``affine_conv3x3`` pass (GN folded
  into the per-(batch, channel) affine) vs XLA GN + conv. The kernel's input
  has 128 lanes, so Mosaic's HBM-slice alignment rule is satisfied.
* IN (3->128): the fused kernel is IMPOSSIBLE here — Mosaic rejects HBM
  memref slices with a non-128-aligned lane dim ("Slice shape along
  dimension 3 must be aligned to tiling (128), but is 3", measured r5) —
  so the candidates are XLA forms: direct conv, im2col GEMM
  ((B*H*W, 27) @ (27, 128): trades 9x patch materialization for a dense
  MXU matmul), and channel-padded conv (cin 3 -> 32).

Interpret mode cannot exercise Mosaic's lane padding/alignment, so
correctness is asserted HERE on real hardware before the bench relies on it.

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


def im2col_conv(x, k, bias):
    """3x3 conv as (B*H*W, 9*cin) @ (9*cin, cout): for tiny cin the direct
    conv wastes 125/128 lanes; the GEMM contracts over K=27 instead."""
    Bn, H, W, cin = x.shape
    cout = k.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy : dy + H, dx : dx + W, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)  # (B, H, W, 9*cin)
    y = jax.lax.dot_general(
        patches.reshape(Bn * H * W, 9 * cin),
        k.transpose(0, 1, 2, 3).reshape(9 * cin, cout),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(Bn, H, W, cout) + bias


def padded_conv(x, k, bias, cpad=32):
    cin = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad - cin)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))
    return xla_conv(xp, kp, bias)


def main():
    from clip_codec_tpu.ops.pallas_resblock import affine_conv3x3, gn_affine

    key = jax.random.PRNGKey(0)

    for (Bn, H) in ((2, 1024), (2, 512), (1, 1024)):
        W = H
        # ---- head GN + conv 128 -> 3 (fused Pallas vs XLA) ----
        h = jax.random.normal(key, (Bn, H, W, 128), DT)
        kh = (jax.random.normal(jax.random.PRNGKey(3), (3, 3, 128, 3), DT) * 0.1)
        bh = jax.random.normal(jax.random.PRNGKey(4), (3,), jnp.float32) * 0.1
        gs = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (128,), jnp.float32)
        gb = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (128,), jnp.float32)

        def head_p(c):
            A, Bv = gn_affine(c, gs, gb, 8)
            return affine_conv3x3(c, A, Bv, kh.reshape(9, 128, 3), bh.astype(jnp.float32))[0]

        def head_x(c):
            from clip_codec_tpu.ops.groupnorm import group_norm

            z = group_norm(c, (gs, gb), groups=8)
            return xla_conv(z, kh, bh).astype(DT)

        y_p = jax.jit(head_p)(h)
        y_x = jax.jit(head_x)(h)
        err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32) - y_x.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(y_x)))
        print(f"[head 128->3 B={Bn} @{H}] max err {err:.2e} (scale {scale:.2f})", flush=True)
        # bf16 bar: the XLA path rounds the GN output to bf16 BEFORE the
        # conv while the fused kernel keeps it fp32 in-register, so the two
        # differ by one bf16 input rounding (2^-8 relative) times the conv
        assert err < 0.01 * scale

        def bp(c):
            return c + jnp.pad(head_p(c), ((0, 0),) * 3 + ((0, 125),)) * jnp.asarray(1e-6, DT)

        def bx(c):
            return c + jnp.pad(head_x(c), ((0, 0),) * 3 + ((0, 125),)) * jnp.asarray(1e-6, DT)

        sp = scan_time(bp, h)
        sx = scan_time(bx, h)
        print(f"  head:    pallas {sp*1e3:7.3f} ms vs XLA(GN+conv) {sx*1e3:7.3f} ms", flush=True)

        # ---- in conv 3 -> 128: XLA direct vs im2col GEMM vs padded ----
        x = jax.random.normal(key, (Bn, H, W, 3), DT)
        k = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, 128), DT) * 0.1)
        bias = jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32) * 0.1

        forms = {
            "direct": lambda c: xla_conv(c, k, bias).astype(DT),
            "im2col": lambda c: im2col_conv(c, k, bias).astype(DT),
            "pad32": lambda c: padded_conv(c, k, bias).astype(DT),
        }
        y0 = jax.jit(forms["direct"])(x)
        times = {}
        for name, f in forms.items():
            y = jax.jit(f)(x)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - y0.astype(jnp.float32))))
            assert err < 0.05, (name, err)

            def body(c, f=f):
                return c + f(c)[..., :3] * jnp.asarray(1e-6, DT)

            times[name] = scan_time(body, x)
        row = "  ".join(f"{n} {t*1e3:7.3f} ms" for n, t in times.items())
        print(f"  in 3->128: {row}", flush=True)


if __name__ == "__main__":
    main()
