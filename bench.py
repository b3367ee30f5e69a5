"""Headline benchmark: DDIM-50 256px reconstruction throughput (images/sec/chip).

This is BASELINE.json's north-star metric — the reference's hot loop #3
(``cli/reconstruct_diffusion.py`` -> ``DDIMSampler.sample``: a Python loop
with two host syncs per step at batch 1). Here the whole 50-step trajectory is
one compiled ``lax.scan`` over the bf16 U-Net, batched.

``vs_baseline`` compares against an ESTIMATED reference throughput on A100 of
2.0 img/s: the reference samples at batch=1 (its CLI hard-codes shape
(1,3,S,S)) through a ~270 GFLOP/forward U-Net with per-step Python/host
round-trips; 50 steps at ~100 forwards/s gives ~2 img/s. The reference
publishes no measured numbers (BASELINE.md), so this anchor is documented
rather than measured. Raising the anchor lowers vs_baseline proportionally.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: repeat bench runs skip the slow first compile.
jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_REFERENCE_IMGS_PER_SEC = 2.0  # documented estimate, see module docstring

STEPS = 50
SIZE = 256
BATCH = int(os.environ.get("CLIP_CODEC_BENCH_BATCH", "16"))


def main() -> None:
    from clip_codec_tpu.diffusion import NoiseSchedule, ddim_sample
    from clip_codec_tpu.models import CLIPCondUNet

    rng = np.random.default_rng(0)
    net = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3, dtype=jnp.bfloat16)
    z = jnp.asarray(rng.standard_normal((BATCH, 512)), jnp.float32)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, z[:1], jnp.zeros((1,), jnp.int32))

    def model_fn(p, x, zz, t):
        return net.apply(p, x, zz, t)

    shape = (BATCH, SIZE, SIZE, 3)
    sched = NoiseSchedule.create(1000, "cosine")

    def run(key):
        return ddim_sample(model_fn, sched, z, shape, steps=STEPS, rng=key, model_params=params)

    # Warm-up compile. NOTE: block_until_ready is not trustworthy over the
    # axon remote tunnel (returns early); np.asarray forces real completion.
    t0 = time.time()
    np.asarray(run(jax.random.PRNGKey(0)))
    compile_s = time.time() - t0
    print(f"[bench] compile+first-run {compile_s:.1f}s (batch={BATCH})", file=sys.stderr)

    # Timed runs, host-materialized at the end (honest completion barrier).
    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        out = run(jax.random.PRNGKey(i + 1))
    np.asarray(out)
    dt = (time.time() - t0) / n_rep
    imgs_per_sec = BATCH / dt
    print(f"[bench] {dt:.2f}s per DDIM-{STEPS} batch of {BATCH} @ {SIZE}px", file=sys.stderr)

    print(json.dumps({
        "metric": f"DDIM-{STEPS} {SIZE}px images/sec/chip (CLIPCondUNet base=128)",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
