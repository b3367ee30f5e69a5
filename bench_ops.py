"""Dev benchmarks: Pallas kernels vs the XLA paths on real TPU.

Run manually (not by the driver): ``python bench_ops.py``. Covers the fused
GroupNorm+SiLU kernel and flash attention (forward and fwd+bwd) at SD shapes.

NOTE on absolute numbers over tunneled transports: the honest completion
barrier (np.asarray) includes one device->host copy per timing loop, which
dominates for large outputs on slow links - compare the XLA/Pallas RATIOS,
not the absolute ms. Latest chip run: GN 0.96-1.12x (parity), attention fwd
1.26x bf16 / 1.03x fp32, attention fwd+bwd 1.12x with O(N) memory.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from clip_codec_tpu.ops.groupnorm import group_norm_silu
from clip_codec_tpu.ops.pallas_groupnorm import group_norm_silu_pallas


def timeit(fn, *args, reps=20):
    np.asarray(fn(*args))  # compile; asarray = honest completion barrier
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    shapes = [
        ((8, 256, 256, 128), 8),   # flagship UNet stage 0 @256px
        ((8, 64, 64, 256), 8),
        ((8, 32, 32, 512), 8),
    ]
    for dtype in (jnp.bfloat16,):
        for shape, g in shapes:
            x = jnp.asarray(rng.standard_normal(shape), dtype)
            C = shape[-1]
            scale = jnp.ones(C, jnp.float32)
            bias = jnp.zeros(C, jnp.float32)

            xla = jax.jit(lambda x: group_norm_silu(x, (scale, bias), g))
            pls = jax.jit(lambda x: group_norm_silu_pallas(x, scale, bias, g))

            # correctness on hardware
            a, b = np.asarray(xla(x), np.float32), np.asarray(pls(x), np.float32)
            err = np.abs(a - b).max()

            t_xla = timeit(xla, x) * 1e3
            t_pls = timeit(pls, x) * 1e3
            gbs = np.prod(shape) * x.dtype.itemsize * 2 / 1e9
            print(
                f"{str(dtype.__name__ if hasattr(dtype,'__name__') else dtype):>9} {str(shape):>22} g={g:<3}"
                f" xla {t_xla:7.3f}ms ({gbs/t_xla*1e3:6.1f} GB/s)  pallas {t_pls:7.3f}ms"
                f" ({gbs/t_pls*1e3:6.1f} GB/s)  speedup {t_xla/t_pls:4.2f}x  maxerr {err:.2e}"
            )


def attention():
    from clip_codec_tpu.ops.pallas_attention import attention_reference, flash_attention

    rng = np.random.default_rng(0)
    BH, N, D = 16, 4096, 40  # SD-1.5 512px self-attention
    for dt in (jnp.bfloat16, jnp.float32):
        q = jnp.asarray(rng.standard_normal((BH, N, D)), dt)
        k = jnp.asarray(rng.standard_normal((BH, N, D)), dt)
        v = jnp.asarray(rng.standard_normal((BH, N, D)), dt)
        ref = jax.jit(attention_reference)
        fla = jax.jit(flash_attention)
        err = np.abs(np.asarray(ref(q, k, v), np.float32) - np.asarray(fla(q, k, v), np.float32)).max()
        t_ref, t_fla = timeit(ref, q, k, v, reps=10) * 1e3, timeit(fla, q, k, v, reps=10) * 1e3
        print(f"attn fwd {dt.__name__ if hasattr(dt,'__name__') else dt}: xla {t_ref:.2f}ms  flash {t_fla:.2f}ms"
              f"  speedup {t_ref/t_fla:.2f}x  maxerr {err:.2e}")

    q = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((BH, N, D)), jnp.bfloat16)
    gf = jax.jit(jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))
    gr = jax.jit(jax.grad(lambda q, k, v: jnp.sum(attention_reference(q, k, v).astype(jnp.float32) ** 2), argnums=(0, 1, 2)))

    def time_grads(f):
        [np.asarray(x) for x in f(q, k, v)]
        t0 = time.time()
        for _ in range(5):
            o = f(q, k, v)
        [np.asarray(x) for x in o]
        return (time.time() - t0) / 5 * 1e3

    tf, tr = time_grads(gf), time_grads(gr)
    print(f"attn fwd+bwd bf16: xla {tr:.1f}ms  flash {tf:.1f}ms  speedup {tr/tf:.2f}x (flash: O(N) memory)")


def resblock_fusion():
    """The SURVEY §2.4 north-star kernel vs the XLA chain, at the hot shape.
    Kept as an executable record of a measured NEGATIVE result (see
    docs/performance.md): correct everywhere, but the layout-forced fp32
    rolls make it VPU-bound — XLA's memory-bound split wins."""
    import jax
    from functools import partial

    from clip_codec_tpu.ops.pallas_resblock import (
        affine_silu_conv3x3,
        affine_silu_conv3x3_reference,
    )

    key = jax.random.PRNGKey(0)
    B, H, W, C = 16, 256, 256, 128
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, H, W, C), jnp.float32).astype(dt)
    A = 0.5 + jax.random.uniform(key, (B, C), jnp.float32)
    Bv = 0.1 * jax.random.normal(key, (B, C), jnp.float32)
    w9 = (0.05 * jax.random.normal(key, (9, C, C), jnp.float32)).astype(dt)
    bias = 0.1 * jax.random.normal(key, (C,), jnp.float32)
    add = jax.random.normal(key, (B, H, W, C), jnp.float32).astype(dt)

    @partial(jax.jit, static_argnames=("k", "use_pallas"))
    def scanloop(x, A, Bv, w9, bias, add, k, use_pallas):
        f = affine_silu_conv3x3 if use_pallas else affine_silu_conv3x3_reference

        def step(c, _):
            y, _ = f(c, A, Bv, w9, bias, add)
            return y, None

        out, _ = jax.lax.scan(step, x, None, length=k)
        return jnp.mean(out.astype(jnp.float32))

    res = {}
    for use_pallas in (False, True):
        ts = {}
        for k in (6, 18):
            float(scanloop(x, A, Bv, w9, bias, add, k, use_pallas))
            t0 = time.time()
            float(scanloop(x, A, Bv, w9, bias, add, k, use_pallas))
            ts[k] = time.time() - t0
        res[use_pallas] = (ts[18] - ts[6]) / 12 * 1e3
    print(f"fused affine+silu+conv3x3+residual @ (16,256,256,128): "
          f"xla {res[False]:.2f}ms  pallas {res[True]:.2f}ms  "
          f"speedup {res[False]/res[True]:.2f}x (<1 = XLA wins; see docs/performance.md)")


if __name__ == "__main__":
    main()
    attention()
    resblock_fusion()
