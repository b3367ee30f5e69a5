"""A/B the 1024px B=2 flagship UNet forward: fold path vs fused-Pallas path.

The component probes (probe_fused_block.py, probe_boundary_conv.py) show
1.4-4x wins per op, but bench.py e2e moved 0.327 -> 0.332 only. This times
the WHOLE net forward in-scan at the bench shape for each dispatch mode to
localize where the probe wins go missing in context.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_1024_e2e_ab.py
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

K1, K2 = 2, 6
B, S = 2, 1024


def main():
    from clip_codec_tpu.models import CLIPCondUNet

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.bfloat16)

    nets = {
        "fold (fused_pallas=False)": CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3,
                                                  dtype=jnp.bfloat16, fused_pallas=False),
        "auto (fused)": CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3,
                                     dtype=jnp.bfloat16),
        "auto + phase-up": CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3,
                                        dtype=jnp.bfloat16, phase_decomposed_up=True),
    }
    import os
    if os.environ.get("AB_ONLY"):
        keys = os.environ["AB_ONLY"].split(";")
        nets = {k: v for k, v in nets.items() if any(s in k for s in keys)}
    params = jax.jit(next(iter(nets.values())).init)(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32), z[:1],
        jnp.zeros((1,), jnp.int32),
    )

    for name, net in nets.items():
        @partial(jax.jit, static_argnames=("k",))
        def run(x0, k, net=net):
            def step(c, i):
                y = net.apply(params, c.astype(jnp.float32), z, jnp.full((B,), 500, jnp.int32))
                return (c + y * jnp.asarray(1e-3, jnp.bfloat16)).astype(jnp.bfloat16), None

            out, _ = jax.lax.scan(step, x0, jnp.arange(k))
            return jnp.mean(out.astype(jnp.float32))

        ts = {}
        for k in (K1, K2):
            t0 = time.time()
            r = float(run(x0, k))
            ts[f"compile{k}"] = time.time() - t0
            t0 = time.time()
            r = float(run(x0, k))
            ts[k] = time.time() - t0
            assert np.isfinite(r)
        per = (ts[K2] - ts[K1]) / (K2 - K1)
        print(f"[{name}] {per*1e3:8.2f} ms/forward  (runs: k{K1}={ts[K1]:.2f}s k{K2}={ts[K2]:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
