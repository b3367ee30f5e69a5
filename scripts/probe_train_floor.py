"""Train-step floor probes (VERDICT r4 item 5) under the r5 compiler.

Measures the flagship pixel train step (256px B=8 — the reference's max
trainable config, README.md:75) and the 512px B=4 config on chip:

1. default dispatch (fold gate: 2<=B<=4, so 256px B=8 runs DIRECT),
2. fold FORCED for the train step by widening the gate's max_b (item 5a:
   "probe a backward-aware spatial fold ... by relaxing the max_b gate for
   the TRAIN step only"),
3. fold disabled (pure direct XLA),
4. optimizer-moment dtype (mu_dtype=bf16) on the best of 1-3.

The r4-era numbers these probes re-adjudicate: 512px B=4 train fold won
2.43x; the r5 compiler removed the forward-conv pathology that win rode on
(docs/performance.md "1024px re-measured"), so the backward may have moved
too. MFU from jax cost_analysis FLOPs of the whole jitted step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_train_floor.py
One TPU process at a time; keep the host core idle (timing).
"""

from __future__ import annotations

import functools
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK = 197e12


def measure(step_fn, params, opt_state, x0, z, w, n=10):
    # the step donates params/opt_state — run on copies so the caller's
    # trees survive across the probe's modes
    p = jax.tree.map(jnp.copy, params)
    o = jax.tree.map(jnp.copy, opt_state)
    t0 = time.time()
    p, o, loss = step_fn(p, o, x0, z, w, jax.random.PRNGKey(1), False)
    lv = float(loss)  # scalar fetch = real completion barrier over the tunnel
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n):
        p, o, loss = step_fn(p, o, x0, z, w, jax.random.PRNGKey(i + 2), False)
    lv = float(loss)
    dt = (time.time() - t0) / n
    assert np.isfinite(lv)
    # whole-step cost model (the program was just compiled: this lower/
    # compile hits the persistent cache, so it is near-free)
    flops = float(
        step_fn.lower(params, opt_state, x0, z, w, jax.random.PRNGKey(1), False)
        .compile().cost_analysis()["flops"])
    return dt, compile_s, lv, flops


def main():
    from clip_codec_tpu.diffusion import NoiseSchedule
    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.ops import spatial_fold as sf
    from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step

    rng = np.random.default_rng(0)
    sched = NoiseSchedule.create(1000, "cosine")

    for (S, B) in ((256, 8), (512, 4)):
        net = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3,
                           dtype=jnp.bfloat16, fused_pallas=False)
        x0 = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
        z = jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
        w = jnp.ones(B, jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]

        orig_fold_chunks = sf.fold_chunks
        modes = {
            "default": None,
            "fold-forced(max_b=16)": functools.partial(orig_fold_chunks, max_b=16),
            "fold-off": functools.partial(orig_fold_chunks, max_b=0),
        }
        for name, patched in modes.items():
            sf.fold_chunks = patched or orig_fold_chunks
            try:
                tx = optax.adamw(2e-4)
                step_fn = make_train_step(net, sched, tx, DiffusionTrainConfig())
                opt_state = tx.init(params)
                dt, cs, lv, fl = measure(step_fn, params, opt_state, x0, z, w)
                print(f"[train {S}px B={B}] {name:24s} {dt*1e3:8.1f} ms/step "
                      f"-> {B/dt:6.2f} img/s  MFU {fl/dt/PEAK:.3f} "
                      f"(compile {cs:.0f}s, loss {lv:.3f})", flush=True)
            finally:
                sf.fold_chunks = orig_fold_chunks

        # mu_dtype probe on the default dispatch
        tx = optax.adamw(2e-4, mu_dtype=jnp.bfloat16)
        step_fn = make_train_step(net, sched, tx, DiffusionTrainConfig())
        opt_state = tx.init(params)
        dt, cs, lv, fl = measure(step_fn, params, opt_state, x0, z, w)
        print(f"[train {S}px B={B}] {'default+mu_bf16':24s} {dt*1e3:8.1f} ms/step "
              f"-> {B/dt:6.2f} img/s  MFU {fl/dt/PEAK:.3f} "
              f"(compile {cs:.0f}s, loss {lv:.3f})", flush=True)


if __name__ == "__main__":
    main()
