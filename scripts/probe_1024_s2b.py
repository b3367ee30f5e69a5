"""Probe: is the 1024px B=2 collapse fixable by space-to-batch folding?

Measures (in-scan, same method as profile_1024.py):
  1. GN+SiLU @1024x128 at B=2 vs B=8 (quantify the elementwise collapse)
  2. conv3x3 on (2,1024,...) vs reshape-folded (8,256,...) WITHOUT halo
     (cost ceiling; seam-wrong) and WITH 1-row halo chunks (correct form)
Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_1024_s2b.py
"""
import pathlib, time
from functools import partial
import jax, jax.numpy as jnp, numpy as np

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
        t0 = time.time(); r = float(run(x0, extras, k)); ts[k] = time.time() - t0
        assert np.isfinite(r)
    return (ts[K2] - ts[K1]) / (K2 - K1)

def main():
    from flax import linen as nn
    from clip_codec_tpu.ops.groupnorm import group_norm_silu
    key = jax.random.PRNGKey(0)
    def report(name, s, flops=None):
        note = f"{100 * flops / s / 197e12:5.1f}% MFU" if flops else ""
        print(f"{name:58s} {s*1e3:9.3f} ms  {note}", flush=True)

    scale = jnp.ones((128,), jnp.float32); bias = jnp.zeros((128,), jnp.float32)
    for b, h in ((2, 1024), (8, 256)):
        x = jax.random.normal(key, (b, h, 1024, 128), DT)
        s = scan_time(lambda c: group_norm_silu(c, (scale, bias), groups=8).astype(DT), x)
        report(f"GN+SiLU @({b},{h},1024,128) (XLA)", s)

    conv = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)), dtype=DT)
    x2 = jax.random.normal(key, (2, 1024, 1024, 128), DT)
    cp = jax.jit(conv.init)(key, x2[:1])

    # ceiling: reshape-fold (seam-wrong, cost-right)
    def fold_body(c, p):
        y = conv.apply(p, c.reshape(8, 256, 1024, 128)).reshape(2, 1024, 1024, 128)
        return y
    s = scan_time(fold_body, x2, (cp,))
    report("conv3x3 fold->(8,256) no-halo ceiling", s, 2 * 9 * 128 * 128 * 1024 * 1024 * 2)

    # correct: 1-row-halo chunked conv (VALID padding on chunk rows)
    convv = nn.Conv(128, (3, 3), padding=((0, 0), (1, 1)), dtype=DT)
    def halo_body(c, p):
        cpad = jnp.pad(c, ((0, 0), (1, 1), (0, 0), (0, 0)))
        # chunks of 256 rows + 2 halo rows -> (8, 258, 1024, 128)
        chunks = jnp.stack([
            jax.lax.dynamic_slice_in_dim(cpad, i * 256, 258, axis=1)
            for i in range(4)], axis=1).reshape(8, 258, 1024, 128)
        y = convv.apply({"params": {"kernel": p["params"]["kernel"],
                                    "bias": p["params"]["bias"]}}, chunks)
        return y.reshape(2, 4, 256, 1024, 128).reshape(2, 1024, 1024, 128)
    s = scan_time(halo_body, x2, (cp,))
    report("conv3x3 halo-chunked (8,258) correct", s, 2 * 9 * 128 * 128 * 1024 * 1024 * 2)

    # correctness of the halo form vs direct conv
    y_ref = conv.apply(cp, x2)
    y_halo = halo_body(x2, cp)
    print("halo max|err| vs direct:", float(jnp.abs(y_ref - y_halo).max()))

if __name__ == "__main__":
    main()
