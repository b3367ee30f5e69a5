"""Conv-backward wgrad layout probes (VERDICT r4 item 5b).

The flagship train step floors at MFU 0.588 (scripts/probe_train_floor.py)
and the r4 segment probe attributed the loss to the conv backward pair
(dgrad+wgrad ~0.66 vs fwd 0.90). This probes the WGRAD half specifically at
the hot shape (3x3, 128ch, 256px, B=8 — the full-res stage of the flagship
U-Net, reference models/blocks.py:28-44):

  native    — XLA's own wgrad (vjp of conv_general_dilated wrt the kernel):
              a conv with the batch dim as the contraction
  tap-gemm  — 9 shifted (B*H*W, Ci)^T @ (B*H*W, Co) GEMMs, one per kernel
              tap (einsum reassociation: contraction over batch*space rides
              the MXU as a single huge-K matmul per tap)
  pair      — fwd+dgrad+wgrad via jax.vjp (the full backward context the
              r4 attribution measured at ~0.73 combined)

and fp32 vs bf16 accumulation for each (preferred_element_type). MFU
counts 2*9*Ci*Co*B*H*W MACs-equivalent FLOPs (the wgrad's math).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_wgrad.py
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
K1, K2 = 4, 20  # wgrad is ~1.5 ms-class: >=16-delta for the sub-ms rule
PEAK = 197e12
DN = ("NHWC", "HWIO", "NHWC")


def scan_time(body, carry0, extras=()):
    @partial(jax.jit, static_argnames=("k",))
    def run(c0, extras, k):
        def step(c, _):
            return body(c, *extras), None

        out, _ = jax.lax.scan(step, c0, None, length=k)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.mean(b.astype(jnp.float32)), out, 0.0)

    ts = {}
    for k in (K1, K2):
        float(run(carry0, extras, k))
        t0 = time.time()
        r = float(run(carry0, extras, k))
        ts[k] = time.time() - t0
        assert np.isfinite(r)
    return (ts[K2] - ts[K1]) / (K2 - K1)


def conv(x, k, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN,
        preferred_element_type=acc_dtype,
    )


def native_wgrad(x, dy, acc_dtype):
    """XLA's choice for dL/dkernel of the 3x3 conv. The conv runs in pure
    bf16 like the real model (flax casts both operands; the MXU accumulates
    fp32 internally either way) — a non-DT ``preferred_element_type`` makes
    the vjp's transpose-rule conv see mismatched operand dtypes and is NOT
    what the train step lowers to, so acc_dtype only selects the final cast
    of the returned gradient here."""
    _, vjp = jax.vjp(lambda k: conv(x, k, DT),
                     jnp.zeros((3, 3, x.shape[-1], dy.shape[-1]), x.dtype))
    return vjp(dy.astype(DT))[0].astype(acc_dtype)


def tap_gemm_wgrad(x, dy, acc_dtype):
    """dW[kh,kw] = x_shift(kh,kw)^T @ dy as 9 explicit GEMMs over B*H*W."""
    B, H, W, Ci = x.shape
    Co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dyf = dy.reshape(B * H * W, Co)
    taps = []
    for kh in range(3):
        row = []
        for kw in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, kh, kw, 0), (B, H, W, Ci))
            g = jax.lax.dot_general(
                xs.reshape(B * H * W, Ci), dyf,
                (((0,), (0,)), ((), ())), preferred_element_type=acc_dtype,
            )  # (Ci, Co)
            row.append(g)
        taps.append(jnp.stack(row, axis=0))
    return jnp.stack(taps, axis=0)  # (3, 3, Ci, Co)


def main():
    key = jax.random.PRNGKey(0)
    shapes = ((8, 256, 128, 128), (4, 512, 128, 128))
    for (B, H, Ci, Co) in shapes:
        W = H
        flops = 2 * 9 * Ci * Co * B * H * W
        x = jax.random.normal(key, (B, H, W, Ci), DT)
        dy = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, Co), DT)
        kern = jax.random.normal(jax.random.PRNGKey(2), (3, 3, Ci, Co), DT) * 0.05

        # correctness: tap-gemm == native (fp32 accum)
        g_n = native_wgrad(x, dy, jnp.float32)
        g_t = tap_gemm_wgrad(x, dy, jnp.float32)
        err = float(jnp.max(jnp.abs(g_n - g_t)))
        sc = float(jnp.max(jnp.abs(g_n))) or 1.0
        print(f"[wgrad {B}x{H}x{Ci}->{Co}] tap-gemm vs native err {err:.2e} (scale {sc:.1f})",
              flush=True)

        for acc, acc_name in ((jnp.float32, "f32"), (DT, "bf16")):
            line = f"[wgrad {B}x{H}x{Ci}->{Co}] acc={acc_name}"
            # carry = dy (same shape across iterations); wgrad output is fed
            # back through a tiny projection so the consumer is full-channel
            mixn = jax.random.normal(jax.random.PRNGKey(3), (Ci,), DT) * 0.05

            def native_body(dyc, x, mixn):
                g = native_wgrad(x, dyc, acc)
                # (3,3,Ci,Co) -> scalar-ish -> refresh carry
                s = jnp.einsum("hwio,i->o", g.astype(DT), mixn)
                return dyc + s * 1e-6

            def tap_body(dyc, x, mixn):
                g = tap_gemm_wgrad(x, dyc, acc)
                s = jnp.einsum("hwio,i->o", g.astype(DT), mixn)
                return dyc + s * 1e-6

            for name, body in (("native", native_body), ("tap-gemm", tap_body)):
                s = scan_time(body, dy, (x, mixn))
                line += f"  {name} {s*1e3:7.3f} ms ({100*flops/s/PEAK:4.1f}% MFU)"
            print(line, flush=True)

        # full fwd+bwd pair context (native only, fp32 accum): the number the
        # r4 attribution calls ~0.73 combined
        def pair_body(dyc, x, kern):
            y, vjp = jax.vjp(lambda xx, kk: conv(xx, kk, DT), x, kern)
            dx, dk = vjp(dyc.astype(y.dtype))
            s = jnp.mean(dk.astype(jnp.float32)) + jnp.mean(dx.astype(jnp.float32))
            return dyc + (jnp.mean(y.astype(jnp.float32)) + s).astype(DT) * 1e-6

        s = scan_time(pair_body, dy, (x, kern))
        # NOTE (measured): x/kern are loop-invariant, so XLA hoists the
        # forward conv out of the scan — this row measures dgrad+wgrad only
        # (the >100%-of-3x printout at B=8@256 is the tell). Divide by 2x
        # math, not 3x, when reading it.
        print(f"[wgrad {B}x{H}x{Ci}->{Co}] fwd+dgrad+wgrad pair {s*1e3:7.3f} ms "
              f"({100*3*flops/s/PEAK:4.1f}% MFU of 3x-conv math)", flush=True)


if __name__ == "__main__":
    main()
