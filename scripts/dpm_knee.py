"""DPM-Solver++(2M) vs DDIM quality knee on a TRAINED model (VERDICT r3 #3).

The README/CLI recommend ``--sampler dpmpp --steps 15`` as the DDIM-50-class
operating point; until now that rested on the solver literature +
convergence-order tests. This script measures it: train the tiny-e2e pixel
config (the largest trainable on this single CPU core), then reconstruct the
training images from their embeddings with ddim-{10,25,50} and
dpmpp-{5,8,10,15,25}, scoring PSNR/SSIM against the SOURCE images — the
reference's own quality protocol (cli/eval.py:56-83). Throughput needs no
separate sweep: both samplers cost exactly one UNet evaluation per step
(diffusion/dpm.py), so img/s scales linearly in steps from the bench.py
headline.

Run (CPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/dpm_knee.py
Results recorded in docs/performance.md; the regression test pinning the
knee lives in tests/test_dpm_knee.py (same protocol, fewer points).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from clip_codec_tpu.diffusion import NoiseSchedule, ddim_sample, dpmpp_sample  # noqa: F401
    from clip_codec_tpu.eval import metrics
    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step

    import os

    Z_DIM = int(os.environ.get("KNEE_ZDIM", "16"))
    BASE = int(os.environ.get("KNEE_BASE", "8"))
    CH, T = (1, 2), int(os.environ.get("KNEE_T", "100"))
    SIZE = int(os.environ.get("KNEE_SIZE", "16"))
    N = int(os.environ.get("KNEE_N", "6"))
    TRAIN_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600

    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE] / SIZE
    imgs = []
    for _ in range(N):
        f = rng.uniform(1.0, 3.0, size=(3, 2))
        ph = rng.uniform(0, 2 * np.pi, size=(3, 2))
        imgs.append(np.stack(
            [np.sin(2 * np.pi * (f[c, 0] * xx + f[c, 1] * yy) + ph[c, 0]) for c in range(3)],
            axis=-1).astype(np.float32))
    x0 = np.stack(imgs)
    z = rng.standard_normal((N, Z_DIM)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)

    net = CLIPCondUNet(z_dim=Z_DIM, base=BASE, ch_mult=CH, img_ch=3)
    sched = NoiseSchedule.create(T, "cosine")
    # 2e-3 diverges on long horizons at base>=32 (loss 0.05 at 600 steps ->
    # ~1.0 by 3.5k, measured r5); KNEE_LR overrides for the converged runs.
    tx = optax.adamw(float(os.environ.get("KNEE_LR", "2e-3")))
    cfg = DiffusionTrainConfig(bf16=False, timesteps=T, recon_w=0.05, tv_w=1e-4)
    step = make_train_step(net, sched, tx, cfg)
    params = net.init(jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]
    opt_state = tx.init(params)
    w = np.ones(N, np.float32)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(TRAIN_STEPS):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, x0, z, w, sub, False)
        if (i + 1) % 100 == 0:
            print(f"[knee] train {i+1}/{TRAIN_STEPS} loss={float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    model_fn = lambda p, x, zz, t: net.apply({"params": p}, x, zz, t)
    rows = []
    for sampler_name, steps_list in (
        ("ddim", (10, 25, 50)),
        ("ddim_std", (10, 25, 50)),
        ("dpmpp", (5, 8, 10, 15, 25)),
    ):
        for steps in steps_list:
            if sampler_name.startswith("ddim"):
                out = ddim_sample(model_fn, sched, jnp.asarray(z), x0.shape, steps,
                                  0.0, jax.random.PRNGKey(0), model_params=params,
                                  standard=sampler_name == "ddim_std")
            else:
                out = dpmpp_sample(model_fn, sched, jnp.asarray(z), x0.shape, steps,
                                   jax.random.PRNGKey(0), model_params=params)
            out = np.clip(np.asarray(out), -1, 1)
            ps = [metrics.psnr(x0[i], out[i]) for i in range(N)]
            ss = [metrics.ssim(x0[i], out[i]) for i in range(N)]
            rows.append((sampler_name, steps, float(np.mean(ps)), float(np.mean(ss))))
            print(f"[knee] {sampler_name:>8}-{steps:<3} psnr={np.mean(ps):6.3f} dB  "
                  f"ssim={np.mean(ss):.4f}", flush=True)

    for anchor_name in ("ddim", "ddim_std"):
        anchor = next(r for r in rows if r[0] == anchor_name and r[1] == 50)
        for name, steps, p, s in rows:
            if name == "dpmpp":
                print(f"[knee] dpmpp-{steps} vs {anchor_name}-50: "
                      f"dPSNR={p-anchor[2]:+.3f} dB dSSIM={s-anchor[3]:+.4f}", flush=True)


if __name__ == "__main__":
    main()
