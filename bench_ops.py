"""Dev benchmark: Pallas fused GroupNorm+SiLU vs the XLA path on real TPU.

Run manually (not by the driver): ``python bench_ops.py``. Decides whether
ops.enable_pallas() is worth switching on for the sampling pipeline.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from clip_codec_tpu.ops.groupnorm import group_norm_silu
from clip_codec_tpu.ops.pallas_groupnorm import group_norm_silu_pallas


def timeit(fn, *args, reps=20):
    fn(*args).block_until_ready()  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
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


if __name__ == "__main__":
    main()
