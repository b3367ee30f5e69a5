"""A/B the fused-MLP kernel and the attention k-tile retune IN CONTEXT
(Transformer2D-320 @64x64, B=8) — the kernel-level probes said -0.37 ms
attention and -0.3..-0.6 ms MLP per block; bench_sd.py moved only -0.5 ms
total. This isolates where the model-level win went. Single TPU process!
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
DT = jnp.bfloat16
K1, K2 = 2, 12


def scan_time(label, module, x_shape, extras=()):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), DT)
    extras = tuple(jnp.asarray(e, DT) for e in extras)
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
    print(f"[mlp-probe] {label:<44} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    import clip_codec_tpu.ops.pallas_attention as pa
    from clip_codec_tpu.models.sd.layers import Transformer2D

    ctx = np.random.default_rng(2).standard_normal((B, 8, 768)).astype(np.float32)

    # full transformer block, all four combos
    for fused in (False, True):
        for ktile in (1024, 2048):
            orig = pa._ktile_target
            pa._ktile_target = lambda d, _t=ktile: _t if d <= 64 else 512
            try:
                scan_time(
                    f"Transformer2D-320 fused_mlp={int(fused)} tk={ktile}",
                    Transformer2D(320, heads=8, dtype=DT, fused_mlp=fused),
                    (B, 64, 64, 320), (ctx,),
                )
            finally:
                pa._ktile_target = orig

    # the MLP tail alone: unfused module chain vs fused kernel
    from flax import linen as nn

    from clip_codec_tpu.models.sd.layers import GEGLU

    class Tail(nn.Module):
        fused: bool

        @nn.compact
        def __call__(self, x):
            if self.fused:
                from clip_codec_tpu.models.sd.layers import (
                    _DenseParams, _GEGLUParams, _LNParams,
                )
                from clip_codec_tpu.ops.pallas_mlp import transformer_mlp

                lns, lnb = _LNParams(320, name="norm3")()
                wh, bh, wg, bg = _GEGLUParams(1280, 320, name="ff_geglu")()
                wo, bo = _DenseParams(320, 1280, name="ff_out")()
                y = transformer_mlp(x.astype(DT), lns, lnb, wh, bh, wg, bg, wo)
                return x + y + bo.astype(DT)
            y = nn.LayerNorm(dtype=DT, name="norm3")(x)
            y = GEGLU(1280, dtype=DT, name="ff_geglu")(y)
            y = nn.Dense(320, dtype=DT, name="ff_out")(y)
            return x + y

    for fused in (False, True):
        scan_time(f"MLP tail alone fused={int(fused)}", Tail(fused), (B, 4096, 320))

    # attention sub-path alone (self-attn only, via CrossAttention)
    from clip_codec_tpu.models.sd.layers import CrossAttention

    for ktile in (1024, 2048):
        orig = pa._ktile_target
        pa._ktile_target = lambda d, _t=ktile: _t if d <= 64 else 512
        try:
            scan_time(
                f"self-attn CrossAttention tk={ktile}",
                CrossAttention(320, 8, dtype=DT, flash=True), (B, 4096, 320),
            )
        finally:
            pa._ktile_target = orig


if __name__ == "__main__":
    main()
